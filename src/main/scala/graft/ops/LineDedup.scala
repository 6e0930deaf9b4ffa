package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** CCNet-style corpus-level line deduplication: across the WHOLE corpus,
  * keep only the globally-first occurrence of each distinct line ("first"
  * = minimum (docId, lineNo)). Boilerplate lines — nav bars, cookie
  * banners, footers — repeat across millions of pages; dropping all but
  * one occurrence is a standard web-corpus cleaning pass (public CCNet
  * pipeline design).
  *
  * Scale shape (the whole point at 100 TB):
  *  - the winner AGGREGATE shuffles only `(h1, h2, docId, lineNo)` — a
  *    128-bit content surrogate (two independent xxhash64 seeds) plus the
  *    position — with map-side partial `min`, so a boilerplate line with
  *    10^8 copies collapses to one row per map task before the exchange.
  *  - line text rides exactly ONE exchange (the winner-tag join, output
  *    is text-bearing so one is inherent), KEYED on the 16-byte hash
  *    pair, not the text: sort/compare cost is constant-width, and a
  *    hot boilerplate key skews a JOIN partition — which AQE skew-join
  *    splits by size — rather than a text-partitioned `row_number`
  *    window, which pins all 10^8 copies to a single unsplittable task.
  *  - exactness is NOT assumed from the 128 bits: every would-be-dropped
  *    row is text-compared against its bucket winner; rows that hash-
  *    collided with a DIFFERENT text re-dedup exactly among themselves
  *    (all rows of one text share (h1,h2), so the residual set is closed
  *    under text equality and a text-keyed pass over it is exact). The
  *    residual is empty unless xxhash64 double-collides, but the path is
  *    real and tested (spec injects a degenerate hash to force it).
  */
object LineDedup {

  /** Kept lines of `lines` (columns preserved: docId, lineNo, line).
    * Null lines are kept verbatim (nothing to compare). Contract: docId
    * and lineNo are NON-NEGATIVE longs and (docId, lineNo) is unique —
    * the winner aggregate packs the pair into a decimal position key
    * whose ordering matches lexicographic (docId, lineNo) only then.
    */
  def dedupLines(lines: DataFrame, docIdCol: String, lineNoCol: String,
      lineCol: String): DataFrame =
    dedupLinesImpl(lines, docIdCol, lineNoCol, lineCol,
      c => xxhash64(c), c => xxhash64(lit("graft-linededup-h2"), c))

  /** Implementation with injectable hash functions — tests pass a
    * constant "hash" to force every row through the collision-residual
    * path and prove it exact.
    */
  private[graft] def dedupLinesImpl(lines: DataFrame, docIdCol: String,
      lineNoCol: String, lineCol: String,
      h1: Column => Column, h2: Column => Column): DataFrame = {
    val docId = col(docIdCol); val lineNo = col(lineNoCol); val line = col(lineCol)
    val base = lines.select(docId, lineNo, line)
    val nulls = base.filter(line.isNull)
    val keyed = base.filter(line.isNotNull)
      .withColumn("__h1__", h1(line))
      .withColumn("__h2__", h2(line))
    // Narrow shuffle #1: winner (min position) per 128-bit content key.
    // Input projection is (h1, h2, packed position) — Catalyst prunes the
    // text from this exchange entirely (gated in WebCleanSpec).
    //
    // The position is packed as docId*10^19 + lineNo into a
    // Decimal(38,0) — NOT kept as a struct — because min over a struct
    // (or min_by) has a non-mutable aggregation buffer and plans as a
    // SortAggregate, which sorts EVERY input partition by the hash pair
    // before combining: an O(n log n) pass over the whole corpus. The
    // decimal is UnsafeRow-mutable, so the winner aggregate stays a
    // HashAggregate whose map-side combine collapses boilerplate
    // mega-duplicates in O(n). Packing is order-correct for NON-NEGATIVE
    // ids (any real corpus; both longs < 9.3e18 < 10^19, product
    // < 9.3e37 < 10^38). Lexicographic (docId, lineNo) semantics are
    // unchanged — pinned against the struct-min brute force in
    // WebCleanSpec.
    val P = lit(new java.math.BigDecimal("10000000000000000000")) // 10^19
    def packed(d: Column, l: Column): Column =
      d.cast("decimal(38,0)") * P + l.cast("decimal(38,0)")
    val winners = keyed
      .groupBy(col("__h1__"), col("__h2__"))
      .agg(min(packed(docId, lineNo)).as("__wp__"))
    // Winner-tag join: the one text-bearing exchange (see scaladoc) —
    // hash-pair keys, AQE-skew-splittable, winners side one row per
    // distinct content.
    val tagged = keyed.join(winners, Seq("__h1__", "__h2__"))
      .withColumn("__kept__", packed(docId, lineNo) === col("__wp__"))
    val kept = tagged.filter(col("__kept__"))
    // Candidate verify: would-be-dropped rows compare text against their
    // winner. Left side ~ duplicated fraction of the corpus, not all of
    // it; winner side is distinct lines.
    val winText = kept.select(col("__h1__"), col("__h2__"),
      line.as("__wline__"))
    val dropCand = tagged.filter(!col("__kept__"))
      .join(winText, Seq("__h1__", "__h2__"))
    val residual = dropCand.filter(line =!= col("__wline__"))
    // Residual (hash collided, text differs): exact text-keyed pass.
    // Closed under text equality, so this IS the global first occurrence
    // for those texts.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(line).orderBy(docId, lineNo)
    val residualKept = residual
      .withColumn("__rk__", row_number().over(w))
      .filter(col("__rk__") === 1)
    kept.select(docId, lineNo, line)
      .unionByName(residualKept.select(docId, lineNo, line))
      .unionByName(nulls)
  }
}

package graft.ops

import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Incremental (batch-vs-history) exact dedup with a Bloom-filter
  * prefilter: "which of today's crawl documents are NOT already in the
  * historical corpus?" — the standard shape for continuously-ingested
  * training data, where the history is orders of magnitude larger than
  * the new batch.
  *
  * Scale shape:
  *  - the Bloom filter is built DISTRIBUTED over the history with
  *    Spark's own codegen'd `BloomFilterAggregate` (map-side partial
  *    bloom per task, OR-merged up the tree; the same machinery Catalyst
  *    injects for runtime row-level join filters) — driver traffic is
  *    one serialized bitset, never history rows;
  *  - the new batch is filtered by `BloomFilterMightContain` against the
  *    literal bitset: rows the bloom rejects are DEFINITELY new and never
  *    touch a join — at web scale that is almost the whole batch, pruned
  *    with zero shuffle;
  *  - only the bloom-positive sliver (true dups + false positives, rate
  *    set by `numBits`) enters the exact anti-join against the history,
  *    so the result is EXACT regardless of the false-positive rate — the
  *    bloom only prunes, it never decides.
  */
object BloomDedup {

  /** Rows of `newDf` whose `contentCol` value does not occur in
    * `hist`'s `contentCol`. Column set/order of `newDf` preserved.
    *
    * `expectedItems`/`numBits` size the bloom (defaults: 1M items in an
    * 8M-bit = 1 MiB filter, ~3% fp at saturation); at 10^12-row history
    * raise both — the filter stays a single broadcast-sized bitset.
    */
  def newDocs(newDf: DataFrame, hist: DataFrame, contentCol: String,
      expectedItems: Long = 1000000L, numBits: Long = 8388608L): DataFrame = {
    val histHash = Bridge.expression(xxhash64(col(contentCol)))
    val bloomAgg = Bridge.column(
      BloomFilterAggregate(histHash, Literal(expectedItems), Literal(numBits),
          0, 0)
        .toAggregateExpression())
    val bloomBytes = hist.select(bloomAgg.as("bloom")).head() match {
      case r if r.isNullAt(0) => null // empty history
      case r => r.getAs[Array[Byte]](0)
    }
    if (bloomBytes == null) return newDf
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      Bridge.expression(xxhash64(col(contentCol)))))
    val outCols = newDf.columns.toSeq.map(col)
    val definitelyNew = newDf.filter(!mightContain)
    val candidates = newDf.filter(mightContain)
    val survivors = candidates.join(
      hist.select(col(contentCol)).distinct(), Seq(contentCol), "left_anti")
    definitelyNew.select(outCols: _*)
      .unionByName(survivors.select(outCols: _*))
  }
}

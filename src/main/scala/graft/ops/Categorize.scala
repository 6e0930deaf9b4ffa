package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical recode: string column -> dense numeric codes.
  *
  * Rebuilds the reference's `categorize` (`dataframe.py:286-335`) =
  * distinct-scan code assignment (`_recode_column`, `_dataframe.py:300-326`)
  * + lookup join (`_map_dictionary_on_column`, `_dataframe.py:275-297`),
  * with two deliberate deviations (SURVEY.md §7.6 #3):
  *  - codes are assigned in SORTED value order (the reference's
  *    `distinct().collect()` order is nondeterministic; its own tests are
  *    written to dodge that — `test_pipeline.py:22-24`);
  *  - immutable: returns a new (DataFrame, lookup) instead of mutating
  *    wrapper state (the reference documents double-categorize corruption,
  *    `dataframe.py:296-299`).
  *
  * Scale notes: the dictionary is tiny by construction (categorical
  * columns), so the recode join is an explicit `broadcast()` — no shuffle
  * of the fact table. The distinct scan is one shuffle of (column) only —
  * partial aggregation map-side shrinks it to n_distinct per partition.
  */
object Categorize {

  /** Build {value -> code} for a column, codes dense 0..n-1 in sorted
    * value order.
    */
  def buildLookup(df: DataFrame, column: String): Map[String, Double] = {
    val rows = df.select(col(column).cast("string")).na.drop()
      .distinct().orderBy(col(column)).collect()
    rows.zipWithIndex.map { case (r, i) => r.getString(0) -> i.toDouble }.toMap
  }

  /** Recode `column` in-place to its dense code using a supplied or
    * auto-generated lookup. Null / unseen values stay null (nodata is
    * injected later at rasterize time, `_dataframe.py:444-448`).
    */
  def categorize(df: DataFrame, columns: Seq[String],
      lookups: Map[String, Map[String, Double]] = Map.empty)
      : (DataFrame, Map[String, Map[String, Double]]) = {
    columns.foldLeft((df, Map.empty[String, Map[String, Double]])) {
      case ((d, acc), c) =>
        val lookup = lookups.getOrElse(c, buildLookup(d, c))
        val spark = d.sparkSession
        import spark.implicits._
        val mapDf = lookup.toSeq.toDF("__key__", "__value__")
        val joined = d
          .join(broadcast(mapDf), d(c).cast("string") === mapDf("__key__"), "left")
          .withColumn(c, col("__value__"))
          .drop("__key__", "__value__")
        (joined, acc + (c -> lookup))
    }
  }

  /** Distributed dense codes: `(column, codeCol)` rows with codes dense
    * `0..n-1` in sorted value order — DENSE_RANK semantics — WITHOUT the
    * single-partition global window that would funnel a high-cardinality
    * column through one task.
    *
    * Two-phase rank:
    *  1. range-partition the distinct values (partition i holds values
    *     strictly below partition i+1's), pin the partitioning with an
    *     eager localCheckpoint (spark_partition_id is only stable against
    *     a materialized RDD — range-boundary sampling is order-sensitive);
    *  2. collect the per-partition COUNTS only (<= numPartitions rows, a
    *     few hundred bytes at any scale), prefix-sum them on the driver;
    *  3. code = broadcast offset(pid) + partition-local row_number - 1.
    *
    * Every shuffle here is distributed (range exchange + per-pid window
    * hash exchange); no `Exchange SinglePartition` appears in the plan at
    * any cardinality.
    */
  def denseCodes(df: DataFrame, column: String, codeCol: String): DataFrame = {
    val spark = df.sparkSession
    val nParts = math.max(1, spark.sparkContext.defaultParallelism)
    val ranged = df.select(col(column)).na.drop().distinct()
      .repartitionByRange(nParts, col(column))
      .withColumn("__pid__", spark_partition_id())
      .localCheckpoint()
    val counts = ranged.groupBy(col("__pid__")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init).toMap
    val w = Window.partitionBy(col("__pid__")).orderBy(col(column))
    ranged
      .withColumn(codeCol,
        (coalesce(element_at(typedLit(offsets), col("__pid__")), lit(0L)) +
          row_number().over(w) - 1).cast("long"))
      .drop("__pid__")
  }

  /** Pure-plan variant: dense codes joined back onto the rows — no
    * driver-side value collect (only the tiny per-partition counts). The
    * code dictionary joins back via broadcast when small (`hintBroadcast`).
    *
    * For genuinely high-cardinality columns (`hintBroadcast = false`) the
    * join-back must shuffle — and shuffling on the raw string column would
    * carry the full document text twice (fact + dictionary sides), ~2x the
    * corpus bytes at web scale. Instead the shuffle join runs on a 128-bit
    * surrogate key (two independent xxhash64 values of the column): the
    * exchange payload per fact row is (h1, h2, surviving columns), and
    * when the caller's projection drops the text column Catalyst prunes it
    * from the shuffle entirely (gated in PlanSpec). Exactness is preserved
    * — not assumed — by resolving (h1, h2) collisions across DISTINCT
    * dictionary values through a text-keyed broadcast side join (the
    * collided subset; empty at any realistic scale, and the broadcast join
    * never shuffles the fact table). DENSE_RANK-over-value semantics are
    * identical to the broadcast path.
    *
    * NOTE — eager: although this returns a lazy DataFrame, building the
    * plan runs Spark jobs at CALL time ([[denseCodes]] pins its range
    * partitioning and collects per-partition counts; that pinned
    * dictionary input stays in the block manager for the session — see
    * [[graft.core.Pinned.free]]). The join-back dictionary itself is an
    * evictable `persist(MEMORY_AND_DISK)`, not a pinned checkpoint.
    */
  def categorizeColumnPlan(df: DataFrame, column: String, codeCol: String,
      hintBroadcast: Boolean = true): DataFrame = {
    val codes = denseCodes(df, column, codeCol)
    if (hintBroadcast) df.join(broadcast(codes), Seq(column), "left")
    else {
      // Null inputs must stay null-coded: null-guard the hashes so null
      // keys fall out of the equi-join (xxhash64 itself maps null to the
      // seed hash, which could spuriously match a real value).
      def h1(c: Column) = when(c.isNull, lit(null)).otherwise(xxhash64(c))
      def h2(c: Column) =
        when(c.isNull, lit(null)).otherwise(xxhash64(lit("graft-h2"), c))
      // Cache the (value, h1, h2, code) dictionary ONCE (lazy, evictable
      // MEMORY_AND_DISK persist): it feeds three consumers (collision
      // scan, clean, dirty) and an uncached fork would replay the rank
      // window — and its text-bearing exchange — per consumer. persist()
      // rather than localCheckpoint: correctness does not need lineage
      // truncation here (the partition-id-sensitive step is already
      // pinned INSIDE denseCodes), so the cache stays evictable under
      // memory pressure and the API stays lazy — no Spark job runs at
      // plan-construction time. After this point no exchange in the
      // join-back plan carries the values at all (gated in ScaleShapeSpec).
      val dict = codes.select(col(column), h1(col(column)).as("__h1__"),
        h2(col(column)).as("__h2__"), col(codeCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Collision detection shuffles ONLY (h1, h2): the aggregation input
      // is projected to the two longs, and the collided key set (empty at
      // any realistic scale) broadcasts back against the dictionary, so
      // the dictionary's values never re-shuffle after the (inherent)
      // rank exchanges inside denseCodes.
      val collided = dict.groupBy(col("__h1__"), col("__h2__"))
        .agg(count(lit(1)).as("__n__")).filter(col("__n__") > 1)
        .select(col("__h1__"), col("__h2__"))
      val clean = dict.join(broadcast(collided), Seq("__h1__", "__h2__"),
          "left_anti")
        .select(col("__h1__"), col("__h2__"), col(codeCol).as("__clean_code__"))
      val dirty = dict.join(broadcast(collided), Seq("__h1__", "__h2__"),
          "left_semi")
        .select(col(column), col(codeCol).as("__dirty_code__"))
      df.withColumn("__h1__", h1(col(column)))
        .withColumn("__h2__", h2(col(column)))
        .join(broadcast(dirty), Seq(column), "left")
        .join(clean, Seq("__h1__", "__h2__"), "left")
        .withColumn(codeCol, coalesce(col("__dirty_code__"), col("__clean_code__")))
        .drop("__h1__", "__h2__", "__clean_code__", "__dirty_code__")
    }
  }
}

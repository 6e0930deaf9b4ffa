package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Training-sequence packing and deterministic mixture sampling — the
  * last-mile operators between a cleaned corpus and a trainer.
  */
object Pack {

  /** GPT-style concat-then-chunk packing: documents are concatenated in
    * ascending `idCol` order into one virtual token stream, and the
    * stream is cut into fixed-`budget` blocks; each document's pack is
    * the block containing its START offset. Returns the input columns
    * plus (start_offset, pack_id).
    *
    * Scale shape (the categorize/denseCodes pattern): a naive
    * `sum over (order by id)` window is a single-partition sort of the
    * whole corpus. Instead:
    *  1. range-partition by id and PIN the partitioning (eager
    *     localCheckpoint — spark_partition_id is only stable against a
    *     materialized RDD);
    *  2. per-partition running sums via a window keyed on the partition
    *     id (distributed);
    *  3. collect only the per-partition token TOTALS (<= numPartitions
    *     longs), prefix-sum them on the driver, broadcast the offsets.
    * No `Exchange SinglePartition` at any cardinality (gated in
    * WebCleanSpec).
    *
    * NOTE — eager, and pins blocks: unlike a plain DataFrame transform,
    * this runs Spark jobs at CALL time (the pinning checkpoint + the
    * totals collect) and the checkpointed input stays pinned in the
    * block manager until the session ends or the caller frees it via
    * [[graft.core.Pinned.free]] once the returned frame has been fully
    * consumed. The pinning is a correctness requirement, not a cache:
    * `spark_partition_id` is only stable against a materialized,
    * lineage-truncated RDD.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val nParts = math.max(1, spark.sparkContext.defaultParallelism)
    val ranged = df.repartitionByRange(nParts, col(idCol))
      .withColumn("__pid__", spark_partition_id())
      .localCheckpoint(true)
    val totals = ranged.groupBy(col("__pid__"))
      .agg(sum(col(tokensCol)).as("__t__")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] =
      totals.map(_._1).zip(totals.scanLeft(0L)(_ + _._2).init).toMap
    val w = Window.partitionBy(col("__pid__")).orderBy(col(idCol))
    ranged
      .withColumn("__cum__", sum(col(tokensCol)).over(w))
      .withColumn("start_offset",
        coalesce(element_at(typedLit(offsets), col("__pid__")), lit(0L)) +
          col("__cum__") - col(tokensCol))
      .withColumn("pack_id", floor(col("start_offset") / lit(budget)))
      .drop("__pid__", "__cum__")
  }

  /** Deterministic mixture sampling + split assignment: keep a row iff
    * its `uniform` value (caller-supplied deterministic U[0,1) column —
    * id arithmetic, a hash, anything reproducible) falls under its
    * stratum's rate, then deal kept rows into train/val/test by fixed
    * fractions of the SAME uniform (scaled within the kept range so the
    * three splits stay proportional at any rate).
    *
    * `rates` is a (stratumCol, rate) dimension joined broadcast — the
    * per-domain mixture weights a training-data pipeline tunes. Rows
    * whose stratum has no rate row are dropped (rate 0).
    */
  def sampleAndSplit(df: DataFrame, uniform: Column, stratumCol: String,
      rates: DataFrame, rateCol: String,
      valFrac: Double = 0.05, testFrac: Double = 0.05): DataFrame = {
    val u = uniform.cast("double")
    val kept = df.withColumn("__u__", u)
      .join(broadcast(rates), Seq(stratumCol))
      .filter(col("__u__") < col(rateCol))
    // rescale the kept uniform to U[0,1) within its stratum's rate so
    // split fractions are rate-independent
    val r = col("__u__") / col(rateCol)
    kept.withColumn("split",
        when(r < lit(testFrac), lit("test"))
          .when(r < lit(testFrac + valFrac), lit("val"))
          .otherwise(lit("train")))
      .drop("__u__")
  }
}

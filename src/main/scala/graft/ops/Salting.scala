package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew handling by salted repartitioning on hot cells
  * (north-rule: "skew handled by salted repartitioning on hot H3 cells").
  *
  * At web scale the cell distribution is Zipfian — a handful of cells
  * (dense urban squares) hold orders of magnitude more rows than the
  * median. AQE's skew-join splitting only fires inside sort-merge joins;
  * the groupBy-tile materialization path needs pre-shuffle salting, which
  * is what this implements:
  *
  *   1. PRE-PASS: aggregate per-cell counts (one cheap map-side-combined
  *      shuffle of (cell, count) pairs, tiny output).
  *   2. SALT FACTOR: cells whose count exceeds `targetRowsPerTask` get a
  *      salt factor ceil(count / target), broadcast as a tiny map.
  *   3. SALTED KEY: cell#salt with salt = pmod(hash(id), factor) — rows in
  *      cold cells keep salt 0, hot cells fan out to `factor` tasks.
  *
  * The salted key is ONLY a partitioning key: per-tile results are
  * re-merged by the downstream combiner (e.g. rasterize merges partial
  * tile arrays; counts re-aggregate), so output equals the unsalted plan
  * (property-tested in SaltingSpec).
  */
object Salting {

  /** Per-cell counts — the hot-cell pre-pass. */
  def cellCounts(df: DataFrame, cellCol: String): DataFrame =
    df.groupBy(col(cellCol)).agg(count(lit(1)).as("__cnt__"))

  /** Attach a `__salt__` column: 0 for cold cells, 0..factor-1 for hot. */
  def withSalt(df: DataFrame, cellCol: String, saltEntropyCol: String,
      targetRowsPerTask: Long): DataFrame = {
    val factors = cellCounts(df, cellCol)
      .filter(col("__cnt__") > targetRowsPerTask)
      .withColumn("__factor__",
        ceil(col("__cnt__") / targetRowsPerTask).cast("int"))
      .drop("__cnt__")
    df.join(broadcast(factors), Seq(cellCol), "left")
      .withColumn("__salt__",
        when(col("__factor__").isNull, lit(0))
          .otherwise(pmod(hash(col(saltEntropyCol)), col("__factor__"))))
      .drop("__factor__")
  }

  /** Salted repartition: shuffle on (cell, salt) so hot cells spread over
    * multiple tasks while cold cells stay single-task.
    */
  def saltedRepartition(df: DataFrame, cellCol: String, saltEntropyCol: String,
      targetRowsPerTask: Long, numPartitions: Int = 0): DataFrame = {
    val salted = withSalt(df, cellCol, saltEntropyCol, targetRowsPerTask)
    if (numPartitions > 0)
      salted.repartition(numPartitions, col(cellCol), col("__salt__"))
    else salted.repartition(col(cellCol), col("__salt__"))
  }

  /** Two-phase salted aggregation: partial agg on (cell, salt), final agg
    * on cell. Result rows equal a direct groupBy(cell).agg(...) — skew is
    * absorbed in phase 1.
    */
  def saltedCount(df: DataFrame, cellCol: String, saltEntropyCol: String,
      targetRowsPerTask: Long): DataFrame = {
    withSalt(df, cellCol, saltEntropyCol, targetRowsPerTask)
      .groupBy(col(cellCol), col("__salt__"))
      .agg(count(lit(1)).as("__partial__"))
      .groupBy(col(cellCol))
      .agg(sum(col("__partial__")).as("n"))
  }
}

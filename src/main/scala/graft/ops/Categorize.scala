package graft.ops

import org.apache.spark.sql.DataFrame
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

  /** Pure-plan variant: dense codes via window over distinct — no driver
    * collect at all; stays entirely in Catalyst. Used when the lookup map
    * itself isn't needed on the driver.
    */
  def categorizeColumnPlan(df: DataFrame, column: String,
      codeCol: String): DataFrame = {
    val codes = df.select(col(column)).na.drop().distinct()
      .withColumn(codeCol,
        (row_number().over(Window.orderBy(col(column))) - 1).cast("long"))
    df.join(broadcast(codes), Seq(column), "left")
  }
}

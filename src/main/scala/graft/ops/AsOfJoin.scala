package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: each left row matched to the right row with the
  * greatest `rightTime` <= `leftTime` within the same key — declared with
  * the union + running-last-value window pattern so Catalyst plans it as
  * ONE shuffle on (key) + a window sort, no custom physical node needed:
  *
  *   union(tagged left, tagged right)
  *     -> window last_value(right payload ignoring nulls)
  *        over (key ORDER BY time, isLeft ROWS UNBOUNDED PRECEDING)
  *     -> keep left rows
  *
  * Right rows sort before left rows at equal times (asof >= semantics).
  * Ties inside the right side must be pre-deduped by the caller for a
  * deterministic result (same requirement DuckDB's ASOF JOIN has).
  */
object AsOfJoin {

  /** @param left  (key, leftTime, ...leftCols)
    * @param right (key, rightTime, payload)
    * @return left columns + `payload` of the matched right row (null when
    *         no right row precedes)
    */
  def asOf(
      left: DataFrame, key: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: String): DataFrame = {
    val l = left
      .withColumn("__t__", col(leftTime))
      .withColumn("__isleft__", lit(1))
      .withColumn("__p__", lit(null).cast(right.schema(payload).dataType))
    val r = right.select(
      col(rightKey).as(key),
      col(rightTime).as("__t__"),
      lit(0).as("__isleft__"),
      col(payload).as("__p__"))
    val lAligned = l.select(
      (col(key) +: col("__t__") +: col("__isleft__") +: col("__p__") +:
        left.columns.filterNot(_ == key).map(c => col(c))): _*)
    val rAligned = lAligned.columns.foldLeft(r) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null))
    }.select(lAligned.columns.map(col): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("__t__"), col("__isleft__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn(payload, last(col("__p__"), ignoreNulls = true).over(w))
      .filter(col("__isleft__") === 1)
      .drop("__t__", "__isleft__", "__p__")
  }
}

package graft.ops

import graft.core.Constants
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric dtype minimization — the reference's pandas downcast pass
  * (`_table.py:33-66`) as explicit Spark casts: one combined stats job
  * over all numeric columns, then cast each to the smallest Spark type
  * whose range holds its min/max (unsigned reference dtypes map to the
  * next wider signed type, SURVEY.md §1.2). Narrower types shrink
  * shuffle width and cache footprint — the reason the reference does it.
  */
object Downcast {

  private def sparkType(dtype: String): DataType = dtype match {
    case "uint8" | "int8" => ShortType // int8 range fits; uint8 needs short
    case "uint16" | "int16" => IntegerType
    case "uint32" | "int32" => IntegerType
    case "uint64" | "int64" => LongType
    case "float32" => FloatType
    case _ => DoubleType
  }

  // Tighter mapping when the signed range itself fits.
  private def minimalSparkType(lo: Double, hi: Double, integral: Boolean): DataType =
    if (!integral) {
      if (lo >= -3.4028235e38 && hi <= 3.4028235e38) FloatType else DoubleType
    } else if (lo >= Byte.MinValue && hi <= Byte.MaxValue) ByteType
    else if (lo >= Short.MinValue && hi <= Short.MaxValue) ShortType
    else if (lo >= Int.MinValue && hi <= Int.MaxValue) IntegerType
    else LongType

  /** Cast every numeric column to its minimal type. Non-numeric columns
    * pass through untouched.
    */
  def minimize(df: DataFrame): DataFrame = {
    val numeric = df.schema.fields.filter(f => f.dataType match {
      case _: NumericType => true
      case _ => false
    }).map(_.name)
    if (numeric.isEmpty) return df
    val aggs = numeric.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"mn_$c"),
        max(col(c)).cast("double").as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val floats = df.schema.fields.collect {
      case f if f.dataType == FloatType || f.dataType == DoubleType => f.name
    }.toSet
    numeric.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      val lo = Option(row.get(2 * i)).map(_.asInstanceOf[Double]).getOrElse(0d)
      val hi = Option(row.get(2 * i + 1)).map(_.asInstanceOf[Double]).getOrElse(0d)
      val integral = !floats.contains(c) ||
        (lo == math.rint(lo) && hi == math.rint(hi))
      d.withColumn(c, col(c).cast(minimalSparkType(lo, hi, integral)))
    }
  }

  /** Raster-facing variant: reference dtype names + nodata per column
    * (feeds ColumnSpec; see Constants.dtypeAndNodata).
    */
  def rasterDtypes(df: DataFrame, columns: Seq[String]): Map[String, (String, Double)] = {
    val aggs = columns.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    columns.zipWithIndex.map { case (c, i) =>
      val lo = Option(row.get(2 * i)).map(_.asInstanceOf[Double]).getOrElse(0d)
      val hi = Option(row.get(2 * i + 1)).map(_.asInstanceOf[Double]).getOrElse(0d)
      c -> Constants.dtypeAndNodata(lo, hi)
    }.toMap
  }
}

package graft.run

import graft.Bench
import graft.index.IndexExpressions._
import graft.ops.SpatialJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B evidence for the round-4 multi-res kernel rework (the scaling
  * gate's kernel): struct<array<long>,long> single-expression shape
  * (now codegen'd) vs flat chained LONG columns (finest id once, parent
  * steps via [[graft.index.IndexExpressions.h3_parent]]). Same input,
  * same aggregation width, interleaved best-of-N — prints rows/sec for
  * both shapes.
  */
object ProfileMultiRes {

  def structShape(spark: SparkSession, path: String, n: Long): Double = {
    val polys = Bench.polygonDims(spark)
    val t0 = System.nanoTime()
    val pages = spark.read.parquet(path)
      .withColumn("__cells__", spherical_cells_multi(col("x"), col("y"), 7, 12, 12))
      .withColumn("h3_12", col("__cells__.h3s")(0))
      .withColumn("h3_7", col("__cells__.h3s")(5))
      .withColumn("s2_12", col("__cells__.s2"))
      .drop("__cells__")
    val joined = SpatialJoin.pointInPolygon(pages, "x", "y",
      polys, "geometry", resolution = 10000L,
      broadcastPolys = true, predicate = "covers")
    joined.withColumn("bng10", bng_index_point(col("x"), col("y"), 10000L))
      .groupBy(col("bng10"))
      .agg(count(lit(1)).as("rows_in_tile"),
        approx_count_distinct(col("h3_7")).as("h3_coarse"),
        approx_count_distinct(col("h3_12")).as("h3_fine"),
        approx_count_distinct(col("s2_12")).as("s2_cells"))
      .write.format("noop").mode("overwrite").save()
    n / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "32000000").toLong
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("WARN")
    val path = Bench.materializeWebTable(spark, n)
    // symmetric warm-up, then interleaved best-of-3 per shape
    (1 to 2).foreach { _ =>
      structShape(spark, path, n)
      Bench.spatialPipelineThroughputMultiRes(spark, n)
    }
    var bestStruct = 0.0
    var bestFlat = 0.0
    (1 to 3).foreach { _ =>
      bestStruct = math.max(bestStruct, structShape(spark, path, n))
      bestFlat = math.max(bestFlat, Bench.spatialPipelineThroughputMultiRes(spark, n))
    }
    println(f"""{"profile":"multires_shape","struct_rows_per_sec":${bestStruct.round},"flat_rows_per_sec":${bestFlat.round},"ratio":${bestFlat / bestStruct}%.3f,"n":$n}""")
    spark.stop()
  }
}

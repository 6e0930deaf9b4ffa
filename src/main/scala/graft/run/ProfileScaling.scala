package graft.run

import graft.Bench
import graft.index.IndexExpressions._
import graft.ops.SpatialJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-decomposed scaling profile: measures the multi-res kernel's
  * sub-pipelines at two parallelism levels to locate which stage stops
  * scaling 8 -> 32 on this single-box VM:
  *   encode  — scan + full-width indexing, folded to one long (xor agg,
  *             trivial aggregation state);
  *   join    — + broadcast PIP join, count only;
  *   full    — the real kernel (per-tile aggregation with HLL sketches).
  * Per (level, mode): fresh session, 2 warm-ups, best of 3.
  */
object ProfileScaling {

  def pages(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("h3_12", h3_index_point(col("x"), col("y"), 12))
      .withColumn("s2_12", s2_index_point(col("x"), col("y"), 12))
      .withColumn("h3_11", h3_parent(col("h3_12"), 11))
      .withColumn("h3_10", h3_parent(col("h3_11"), 10))
      .withColumn("h3_9", h3_parent(col("h3_10"), 9))
      .withColumn("h3_8", h3_parent(col("h3_9"), 8))
      .withColumn("h3_7", h3_parent(col("h3_8"), 7))

  def run(spark: SparkSession, path: String, n: Long, mode: String): Double = {
    val t0 = System.nanoTime()
    val p = pages(spark, path)
    mode match {
      case "encode" =>
        p.agg(expr("bit_xor(h3_12 ^ h3_11 ^ h3_10 ^ h3_9 ^ h3_8 ^ h3_7 ^ s2_12)"))
          .write.format("noop").mode("overwrite").save()
      case "join" =>
        val joined = SpatialJoin.pointInPolygon(p, "x", "y",
          Bench.polygonDims(spark), "geometry", resolution = 10000L,
          broadcastPolys = true, predicate = "covers")
        joined.agg(expr("bit_xor(h3_12 ^ h3_11 ^ h3_10 ^ h3_9 ^ h3_8 ^ h3_7 ^ s2_12)"),
            count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      case "full" =>
        val joined = SpatialJoin.pointInPolygon(p, "x", "y",
          Bench.polygonDims(spark), "geometry", resolution = 10000L,
          broadcastPolys = true, predicate = "covers")
        joined.withColumn("bng10", bng_index_point(col("x"), col("y"), 10000L))
          .groupBy(col("bng10"))
          .agg(count(lit(1)).as("rows_in_tile"),
            approx_count_distinct(col("h3_7"), 0.15).as("h3_coarse"),
            approx_count_distinct(col("h3_12"), 0.15).as("h3_fine"),
            approx_count_distinct(col("s2_12"), 0.15).as("s2_cells"),
            // bit_xor, not sum: h3 ids reach 2^62 and ANSI sum(long)
            // overflows (same guard shape as the Bench kernel).
            expr("bit_xor(h3_8 ^ h3_9 ^ h3_10 ^ h3_11)").as("mid_res_guard"))
          .write.format("noop").mode("overwrite").save()
    }
    n / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "30000000").toLong
    val modes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_MODES", "encode,join,full")
      .split(',').toSeq
    val levels = sys.env.getOrElse("SPARK_GRAFT_PROFILE_LEVELS", "8,32")
      .split(',').toSeq.map(_.toInt)
    // materialize input once
    locally {
      val s = Bench.session("32"); s.sparkContext.setLogLevel("WARN")
      Bench.materializeWebTable(s, n); s.stop()
    }
    val best = scala.collection.mutable.Map[(Int, String), Double]().withDefaultValue(0.0)
    (0 until 3).foreach { cycle =>
      levels.foreach { lvl =>
        val spark = Bench.session(lvl.toString)
        spark.sparkContext.setLogLevel("WARN")
        val path = Bench.materializeWebTable(spark, n)
        modes.foreach { m =>
          val warms = if (cycle == 0) 2 else 1
          (0 until warms).foreach(_ => run(spark, path, n, m))
          best((lvl, m)) = math.max(best((lvl, m)), run(spark, path, n, m))
        }
        spark.stop()
      }
    }
    val lo = levels.min; val hi = levels.max
    val parts = modes.map { m =>
      val inner = levels.map(l => s""""rps$l":${best((l, m)).round}""").mkString(",")
      f""""$m":{$inner,"eff":${(best((hi, m)) / best((lo, m))) / (hi.toDouble / lo)}%.3f}"""
    }
    println(s"""{"profile":"scaling_stages",${parts.mkString(",")},"n":$n}""")
  }
}

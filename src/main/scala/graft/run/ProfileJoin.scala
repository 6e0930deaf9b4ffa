package graft.run

import graft.Bench
import graft.index.IndexExpressions._
import graft.ops.SpatialJoin
import org.apache.spark.sql.functions._

/** Micro-profiler for the would-be custom CellJoin SparkStrategy
  * (VERDICT round-2 #7): measures how much the broadcast cell join +
  * fused PIP refine adds on top of the scan+encode baseline it would
  * replace. A custom physical operator can only reclaim the DELTA
  * between the two — if that delta is small, the declarative plan is
  * already within reach of the theoretical fused operator and the
  * added complexity is unjustified. Conclusion recorded in BENCH.md.
  */
object ProfileJoin {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "32000000").toLong
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val path = Bench.materializeWebTable(spark, n)
    val polys = Bench.polygonDims(spark)

    def encodeOnly(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(path)
        .withColumn("__cells__", spherical_cells(col("x"), col("y"), 9, 12))
        .withColumn("bng10", bng_index_point(col("x"), col("y"), 10000L))
        .groupBy(col("bng10"))
        .agg(count(lit(1)).as("n"),
          approx_count_distinct(col("__cells__.h3")).as("h3_cells"),
          approx_count_distinct(col("__cells__.s2")).as("s2_cells"))
        .write.format("noop").mode("overwrite").save()
      n / ((System.nanoTime() - t0) / 1e9)
    }
    def withJoin(): Double = Bench.spatialPipelineThroughput(spark, n)

    // symmetric warm-up, then interleaved best-of-3 per variant
    (1 to 2).foreach { _ => encodeOnly(); withJoin() }
    var be = 0.0; var bj = 0.0
    (1 to 3).foreach { _ =>
      be = math.max(be, encodeOnly()); bj = math.max(bj, withJoin())
    }
    val overheadPct = (be / bj - 1.0) * 100.0
    println(f"""{"encode_only_rows_per_sec":${be.round},"with_join_rows_per_sec":${bj.round},"join_overhead_pct":$overheadPct%.1f}""")
    spark.stop()
  }
}

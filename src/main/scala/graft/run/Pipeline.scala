package graft.run

import graft.index.IndexExpressions._
import graft.input.{PartitionMetric, SnapshotLog, WebTable}
import graft.ops.Categorize
import graft.text.TextExtract
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end web-table pipeline — the reference's canonical
  * `from_files -> call_method* -> categorize -> index -> to_zarr` lifecycle
  * (SURVEY.md §3.1) re-expressed Spark-first over the graft's input shape.
  *
  * Stages: synthesize/ingest -> byte-identity text check -> geocode ->
  * BNG cell index (Catalyst expression) -> broadcast lookup join on lang ->
  * group by 10 km tile -> counts. One mandatory shuffle (by tile).
  */
object Pipeline {

  /** Flagship smoke pipeline. Returns per-tile counts (rows > 0). */
  def flagship(spark: SparkSession, nPages: Long): DataFrame = {
    val pages = WebTable.synthesizeGeo(spark, nPages)

    // Byte-identity invariant (north rule): re-extracting from html must
    // reproduce the text column exactly, distributed, before anything else.
    val checked = pages.withColumn("__text_ok__",
      TextExtract.extract_text(col("html")) === col("text"))

    val indexed = checked
      .withColumn("bng10", bng_index_point(col("x"), col("y"), 10000L))

    val coded = Categorize.categorizeColumnPlan(indexed, "lang", "lang_code")

    coded
      .groupBy(col("bng10"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__text_ok__"), 0L).otherwise(1L)).as("text_mismatches"),
        countDistinct(col("lang_code")).as("n_langs"))
  }

  /** Checkpointed variant: each stage commits a snapshot with per-partition
    * row/byte metrics; re-running skips committed stages (resume).
    */
  def runCheckpointed(spark: SparkSession, nPages: Long, workDir: String): DataFrame = {
    val log = new SnapshotLog(workDir)

    val ingestPath = s"$workDir/pages"
    if (log.committed("ingest").isEmpty) {
      val t0 = System.currentTimeMillis()
      val pages = WebTable.synthesizeGeo(spark, nPages)
      pages.write.mode("overwrite").parquet(ingestPath)
      val metrics = collectPartitionMetrics(spark.read.parquet(ingestPath), "url")
      log.commit("ingest", metrics.map(_.rows).sum, ingestPath, metrics,
        System.currentTimeMillis() - t0)
    }

    val indexPath = s"$workDir/indexed"
    if (log.committed("index").isEmpty) {
      val t0 = System.currentTimeMillis()
      val indexed = spark.read.parquet(ingestPath)
        .withColumn("bng10", bng_index_point(col("x"), col("y"), 10000L))
      indexed.write.mode("overwrite").parquet(indexPath)
      val metrics = collectPartitionMetrics(spark.read.parquet(indexPath), "url")
      log.commit("index", metrics.map(_.rows).sum, indexPath, metrics,
        System.currentTimeMillis() - t0)
    }

    val tilesPath = s"$workDir/tiles"
    if (log.committed("tiles").isEmpty) {
      val t0 = System.currentTimeMillis()
      val tiles = spark.read.parquet(indexPath)
        .groupBy(col("bng10")).agg(count(lit(1)).as("n"))
      tiles.write.mode("overwrite").parquet(tilesPath)
      val metrics = collectPartitionMetrics(spark.read.parquet(tilesPath), "bng10")
      log.commit("tiles", metrics.map(_.rows).sum, tilesPath, metrics,
        System.currentTimeMillis() - t0)
    }

    spark.read.parquet(tilesPath)
  }

  /** Per-partition row/byte metrics — the lineage record each snapshot
    * carries (north rule A7). Computed distributed, collected tiny.
    */
  def collectPartitionMetrics(df: DataFrame, sizeCol: String): Seq[PartitionMetric] = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(sizeCol).cast("string"))
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var rows = 0L
        var bytes = 0L
        var lo: String = null
        var hi: String = null
        it.foreach { r =>
          rows += 1
          val s = if (r.isNullAt(0)) "" else r.getString(0)
          bytes += s.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
          if (lo == null || s < lo) lo = s
          if (hi == null || s > hi) hi = s
        }
        Iterator((pid, rows, bytes, Option(lo).getOrElse(""), Option(hi).getOrElse("")))
      }
      .collect()
      .map { case (pid, rows, bytes, lo, hi) => PartitionMetric(pid, rows, bytes, lo, hi) }
      .toSeq
  }
}

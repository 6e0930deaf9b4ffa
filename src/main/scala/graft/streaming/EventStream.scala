package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Structured Streaming surface. The reference is 100% batch (SURVEY.md
  * §1.3); the graft adds the streaming ingest shape a continuously-crawled
  * web table needs: file-source stream -> event-time windowed aggregation
  * with watermark -> sink, plus Trigger.AvailableNow for the
  * batch-equivalent resumable run (checkpointed by Spark's own offset
  * log, complementing the SnapshotLog manifests).
  */
object EventStream {

  /** Hourly windowed counts/sums per event_type with a 1-hour watermark.
    * Watermarks need TIMESTAMP (LTZ); parquet carries NTZ — cast in (UTC
    * session => identical wall-clock) and cast the window start back to
    * NTZ so the output schema matches the batch path.
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").cast("timestamp").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Run the hourly aggregation as a REAL streaming query over a parquet
    * path (AvailableNow: process everything, then stop), collecting to a
    * named in-memory sink; returns the sink contents as a DataFrame.
    */
  def runHourlyAvailableNow(spark: SparkSession, parquetPath: String,
      queryName: String = "graft_stream_hourly"): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    // The file stream source requires a DIRECTORY; stage single files.
    val streamPath = {
      val p = java.nio.file.Paths.get(parquetPath)
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
        java.nio.file.Files.copy(p, d.resolve(p.getFileName))
        d.toString
      } else parquetPath
    }
    val stream = spark.readStream.schema(schema).parquet(streamPath)
    val q = hourlyAgg(stream).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }

  /** Streaming exact deduplication — the continuously-crawled-corpus
    * counterpart of the batch hash dedup (q8): watermarked
    * `dropDuplicates` on a content key keeps ONLY first-seen rows, with
    * state bounded by the watermark horizon (Spark evicts keys older
    * than the watermark — at web scale the state store holds one key per
    * distinct document seen inside the horizon, not the full history).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkCol: String, horizon: String): DataFrame =
    events
      .withColumn(watermarkCol, col(watermarkCol).cast("timestamp"))
      .withWatermark(watermarkCol, horizon)
      .dropDuplicates(keyCols)

  /** Run streaming dedup over a parquet path with AvailableNow; returns
    * the deduped rows from the in-memory sink.
    */
  def runDedupAvailableNow(spark: SparkSession, parquetPath: String,
      keyCols: Seq[String], watermarkCol: String, horizon: String,
      queryName: String): DataFrame = {
    val schema = spark.read.parquet(parquetPath).schema
    val streamPath = {
      val p = java.nio.file.Paths.get(parquetPath)
      if (java.nio.file.Files.isRegularFile(p)) {
        val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
        java.nio.file.Files.copy(p, d.resolve(p.getFileName))
        d.toString
      } else parquetPath
    }
    val stream = spark.readStream.schema(schema).parquet(streamPath)
    val q = dedupStream(stream, keyCols, watermarkCol, horizon).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}

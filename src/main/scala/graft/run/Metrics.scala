package graft.run

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Stage metrics via `Dataset.observe` + a QueryExecutionListener
  * (north-rule A7: row-count / byte metrics per stage, complementing the
  * per-PARTITION metrics in Pipeline.collectPartitionMetrics). `observe`
  * aggregates ride the existing job — zero extra Spark jobs, zero extra
  * scans, exactly how a 100 TB pipeline must collect its telemetry.
  */
object Metrics {

  /** Captured observation values keyed by observation name. */
  val captured: TrieMap[String, Map[String, Any]] = TrieMap.empty

  @volatile private var registered = false

  def register(spark: SparkSession): Unit = synchronized {
    if (!registered) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit = {
          qe.observedMetrics.foreach { case (name, row) =>
            captured.put(name,
              row.schema.fieldNames.zip(row.toSeq).toMap)
          }
        }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
      registered = true
    }
  }

  /** Attach a row-count/byte observation to a stage. `sizeCol` is the
    * column whose serialized width approximates the stage's bytes.
    */
  def observeStage(df: DataFrame, stage: String, sizeCol: String): DataFrame =
    df.observe(stage,
      count(lit(1)).as("rows"),
      sum(length(col(sizeCol).cast("string"))).as("bytes"))
}

package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Targeted release of the block-manager blocks behind an eager
  * `localCheckpoint(true)` frame. A locally-checkpointed RDD is
  * lineage-truncated and therefore NOT evictable under memory pressure
  * — every iteration of an iterative op (connected components, cap-
  * doubling spherical kNN) that pins a new label table without freeing
  * the superseded one accumulates immovable blocks for the life of the
  * session. `df.rdd.unpersist` does NOT work for this: `.rdd` builds a
  * fresh derived RDD, so the helper walks the analyzed plan for the
  * `LogicalRDD` leaves that actually hold the pinned blocks.
  */
object Pinned {
  /** Unpersist every checkpointed/persisted RDD leaf backing `df`.
    * Call ONLY once the frame is superseded — a lineage-truncated RDD
    * cannot be recomputed after unpersisting.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}

package graft

import graft.index.IndexExpressions._
import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join strategy for repeated joins on the
  * same key at 100 TB: both tables pre-bucketed on the cell id join with
  * NO exchange on either side. (At sandbox scale this verifies the plan
  * shape; at cluster scale it's the difference between re-shuffling
  * 100 TB per join and never shuffling it again.)
  */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("cell-bucketed tables join without any Exchange") {
    // warehouse dir is a static conf — default (spark-warehouse under cwd)
    // is fine for the temp tables, dropped at the end
    val pts = graft.run.GraftQueries.docPoints(spark, sf0)
      .withColumn("cell", bng_cell_id(col("x").cast("double"),
        col("y").cast("double"), 10000L))

    pts.select("doc_id", "cell", "lang").write
      .bucketBy(8, "cell").sortBy("cell")
      .mode("overwrite").saveAsTable("docs_a")
    pts.select(col("doc_id").as("doc_id_b"), col("cell")).write
      .bucketBy(8, "cell").sortBy("cell")
      .mode("overwrite").saveAsTable("docs_b")

    val joined = spark.table("docs_a").join(
      spark.table("docs_b").hint("merge"), Seq("cell"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join still shuffles:\n${plan.take(1500)}")

    // row-set equals the unbucketed join
    val expected = pts.select("doc_id", "cell")
      .join(pts.select(col("doc_id").as("doc_id_b"), col("cell")), Seq("cell"))
      .count()
    assert(joined.count() == expected)

    spark.sql("DROP TABLE IF EXISTS docs_a")
    spark.sql("DROP TABLE IF EXISTS docs_b")
  }
}

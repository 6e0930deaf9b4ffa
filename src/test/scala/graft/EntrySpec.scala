package graft

import org.apache.spark.sql.functions._

class EntrySpec extends SparkSpec {

  test("flagship entry returns tiles with zero text mismatches") {
    val df = SparkEntry.entry(spark)
    val agg = df.agg(sum("n").as("rows"), sum("text_mismatches").as("bad")).head()
    assert(df.count() > 0)
    assert(agg.getLong(0) == 20000L)
    assert(agg.getLong(1) == 0L, "byte-identity text invariant violated")
  }

  test("every oracle query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf0).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("queries and oracleSql keys line up") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}

package graft

/** Round-7 optimization harness (guide §1.4): per-query noop-sink timing
  * and `.explain("formatted")` capture for any subset of the catalogue,
  * WITHOUT touching the frozen driver contract (Bench.scala / Verify.scala).
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra [--reps N] [--plans DIR TAG] q15_knn q20_minhash_lsh ..."
  *   sbt "runMain graft.BenchExtra all"
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS   (default 32).
  * Session config is IDENTICAL to graft.Bench.session so numbers are
  * comparable with the driver's catalogue phase.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var reps = 2
    var plansSpec: Option[(String, String)] = None // (dir, tag)
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--plans" => // --plans <dir> <tag>
          plansSpec = Some((args(i + 1), args(i + 2))); i += 3
        case q => names += q; i += 1
      }
    }
    val selected =
      if (names.isEmpty || names.contains("all")) SparkEntry.queries.keys.toSeq.sorted
      else names.toSeq

    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("WARN")

    def freeCheckpoints(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      System.gc()
    }

    val results = selected.map { name =>
      val fn = SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(name)
      plansSpec.foreach { case (dir, tag) =>
        try {
          val plan = fn(spark, sfDir).queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"${name}_$tag.txt"), plan)
        } catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name plan failed: ${e.getMessage}")
        }
        freeCheckpoints()
      }
      var ok = reps <= 0 // plans-only mode: no timing pass
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          ok = true
        } catch { case e: Throwable =>
          System.err.println(s"[benchextra] $name failed: ${e.getMessage}")
        }
        val t = (System.nanoTime() - t0) / 1e9
        freeCheckpoints()
        t
      }
      spark.sparkContext.setJobDescription(null)
      val best = if (times.isEmpty) Double.NaN else times.min
      println(f"EXTRA $name%-24s best=$best%7.3f  all=${times.map(t => f"$t%.3f").mkString(",")}  ok=$ok")
      name -> (best, ok)
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"benchextra":true,"reps":$reps,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

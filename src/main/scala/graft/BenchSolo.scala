package graft

/** Fresh-JVM solo measurements: run named SparkEntry queries (or the
  * dedup kernel) in a JVM that has executed NOTHING else, so the number
  * is steady-state rather than whatever the catalogue JVM has aged into
  * (round-3 finding: accumulated checkpoint blocks, streaming state
  * providers, and broadcast debris made q41 run 3-4x slower in-catalogue
  * than solo; freeing helped but a residue remained). [[Bench]] spawns
  * this as a child process and merges the numbers into its JSON line.
  *
  * Protocol per target: one untimed warm-up, then best of two timed runs
  * (same methodology as the catalogue loop).
  */
object BenchSolo {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1)
    val targets = args.drop(2).toSeq
    val spark = Bench.session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    targets.foreach {
      case "kernel:dedup" =>
        val n = cpus.toLong * 6000L
        Bench.dedupThroughput(spark, 20000L) // warm
        val dps = (1 to 2).map(_ => Bench.dedupThroughput(spark, n)).max
        println(s"SOLO kernel:dedup ${dps}")
      case t if t.startsWith("kernel:multires:sync:") =>
        // Synchronized-window variant for the loaded-box (SPECrate-style)
        // pair: warm up, busy-wait until the shared start timestamp, then
        // loop the kernel until the shared deadline — so every concurrent
        // child measures under FULL cross-instance contention (without
        // the barrier, JVM-spinup stagger lets some timed runs execute on
        // a partly idle box and overstate the N level).
        val parts = t.split(':')
        val n = parts(3).toLong
        val startMs = parts(4).toLong
        val endMs = parts(5).toLong
        Bench.spatialPipelineThroughputMultiRes(spark, n) // warm
        while (System.currentTimeMillis() < startMs) Thread.sleep(50)
        val t0 = System.nanoTime()
        var rows = 0L
        while (System.currentTimeMillis() < endMs) {
          Bench.spatialPipelineThroughputMultiRes(spark, n)
          rows += n
        }
        val rps = rows / ((System.nanoTime() - t0) / 1e9)
        println(s"SOLO $t ${rps}")
      case t if t.startsWith("kernel:multires:") =>
        // full-width indexing kernel at an explicit row count, solo
        val n = t.substring("kernel:multires:".length).toLong
        (1 to 2).foreach(_ => Bench.spatialPipelineThroughputMultiRes(spark, n))
        val rps = (1 to 3).map(_ => Bench.spatialPipelineThroughputMultiRes(spark, n)).max
        println(s"SOLO $t ${rps}")
      case name =>
        val fn = SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm
        val secs = (1 to 2).map(_ => once()).min
        println(s"SOLO $name ${secs}")
    }
    spark.stop()
  }
}

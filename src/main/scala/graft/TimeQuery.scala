package graft

/** Dev harness: time one declared query in isolation.
  * `runMain graft.TimeQuery <queryName> [sfDir] [cpus] [reps]` —
  * warms the session the way Bench does, then reports per-rep
  * elapsed seconds. Keeps plan-tuning feedback tight without paying
  * for a full Bench sweep. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val reps = if (args.length > 3) args(3).toInt else 1
    val spark = graft.core.Sessions.local(cpus)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    // window canary (see Bench.canary): compare against the committed
    // canary_ref in BENCH_BASELINE.json — a hot sample means this
    // window's timings are weather, not code
    println(f"TIMEQ_CANARY secs=${Bench.canary(spark)}%.3f")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"TIMEQ $name rep=$r rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    println(f"TIMEQ_CANARY secs=${Bench.canary(spark)}%.3f")
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

object Bench {

  /** Fixed-cost WINDOW CANARY: a CPU-bound distributed job whose cost
    * depends only on the host's available compute — no file I/O (page
    * cache can't flatter it), no shuffle (disk/fsync noise can't
    * inflate it), constant work (2e9 modular reductions across 32
    * tasks). A capture window where even the BEST canary sample reads
    * far above its committed quiet-window reference is measuring the
    * host's weather, not the code — r15/r16 shipped official captures
    * whose totals spanned 1.7× on identical code, which made every
    * per-query ratio unfalsifiable. The gate (tools/bench_gate.py)
    * REFUSES such a capture (exit 2, "window invalid, re-run")
    * instead of reporting phantom regressions. Three samples bracket
    * the two sweeps, so the min-of-two-passes per-query protocol is
    * validated by the min canary: if ANY part of the window was
    * quiet, both survive. */
  @volatile private var canaryWarmed = false
  def canary(spark: SparkSession): Double = {
    def job(): Unit = spark.range(0L, 2000000000L, 1L, 32)
      .selectExpr("sum(id % 1000007)").collect()
    // first call in a JVM pays codegen/JIT compile (~2s measured) —
    // that is session warmth, not window load; burn it untimed
    if (!canaryWarmed) { job(); canaryWarmed = true }
    val t0 = System.nanoTime()
    job()
    (System.nanoTime() - t0) / 1e9
  }

  /** One full pass over every declared query plus the two BASELINE.md
    * flow items. Queries that persist/localCheckpoint intermediates
    * release their handles, but the blocks stay in the block manager
    * until the ContextCleaner GCs the RDD object; over a 40-query
    * sweep sharing one session that accumulation caused 4x slowdowns
    * on later memory-hungry queries (round-3 minhash: 43s in-sweep vs
    * 2s isolated). Each query is an independent job in production, so
    * [[graft.core.Sessions.settle]] drops orphaned blocks BLOCKING
    * before the next timer starts (round 4 measured 2-6x inflation on
    * small queries when the drops overlapped the next timed window).
    * A failed query reports -1, never a plausible elapsed time — a
    * regression that breaks a query must not make the bench look
    * faster. */
  private def sweep(spark: SparkSession, sfDir: String): Seq[(String, Double)] = {
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
      }
      val secs = (System.nanoTime() - t0) / 1e9
      graft.core.Sessions.settle(spark)
      name -> (if (ok) secs else -1.0)
    }
    // BASELINE.md protocol items (a)+(b): full chunked ingest of
    // lineitem into WORK staging, then promote T1-T5 + K2 merge.
    val flowTimes: Seq[(String, Double)] = {
      import graft.app.ResyncJob
      import graft.core.{Clock, DatasetRef, LakePaths}
      val lakeRoot = java.nio.file.Files.createTempDirectory("graft-bench-lake")
      val lake = LakePaths(lakeRoot.toString)
      val ref = DatasetRef("bench", "tpch", "lineitem")
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime()
        try { f; (System.nanoTime() - t0) / 1e9 } catch {
          case e: Throwable =>
            System.err.println(s"[bench] flow failed: ${e.getMessage}"); -1.0
        } finally graft.core.Sessions.settle(spark)
      }
      val stats = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)),
          org.apache.spark.sql.functions.max("l_orderkey")).head()
      val (rows, maxKey) = (stats.getLong(0), stats.getLong(1))
      val ingest = timed {
        ResyncJob.runInt(
          spark,
          ResyncJob.MongoRanged(graft.sources.MongoLikeSource(s"$sfDir/lineitem.parquet")),
          pc = "l_orderkey", ref = ref, lake = lake,
          cliEnd = Some(maxKey),
          estimatedRows = rows, withRecovery = false, sleep = _ => ())
      }
      val promote = timed {
        ResyncJob.promote(spark, ref, lake,
          skIds = Seq("l_orderkey", "l_linenumber"), hyphen = true,
          clock = Clock.ForOracle)
      }
      // repeated bench runs must not accumulate staged copies in /tmp
      new graft.core.LakeStorage(spark.sparkContext.hadoopConfiguration)
        .truncate(lakeRoot.toString)
      Seq("flow_ingest_lineitem" -> ingest, "flow_promote_merge" -> promote)
    }
    results ++ flowTimes
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.core.Sessions.local(cpus)
    // Warm the JVM/codegen/parquet-footer paths so the first timed
    // query doesn't absorb session cold-start.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // TWO full sweeps, per-query MINIMUM. local[32] shares its host
    // with whatever else the machine is doing, and single-shot
    // timings carried 5-9x bursts on individual queries (round 5:
    // ext_ann_ivf 32.3s in the driver's one-shot sweep vs 3.6s for
    // the same commit in a clean run minutes earlier). The minimum of
    // two temporally-separated sweeps estimates the cost of the CODE
    // rather than the host's weather, and the first pass pins the
    // page-cache state so the measured condition is "hot data,
    // independent query" — the posture a production operator is
    // actually judged on. Failures stay sticky: a query that fails in
    // EITHER pass reports -1 (a flaky crash must not hide behind the
    // pass that happened to work).
    val c1 = canary(spark)
    val pass1 = sweep(spark, sfDir)
    val c2 = canary(spark)
    val pass2 = sweep(spark, sfDir)
    val c3 = canary(spark)
    val all = pass1.zip(pass2).map { case ((n1, t1), (n2, t2)) =>
      require(n1 == n2, s"sweep order mismatch: $n1 vs $n2")
      n1 -> (if (t1 < 0 || t2 < 0) -1.0 else math.min(t1, t2))
    }
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString
    val canaries = s"[${fmt(c1)},${fmt(c2)},${fmt(c3)}]"
    val qs = all.map { case (k, v) => graft.core.Json.quote(k) + ":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = all.collect { case (_, v) if v >= 0 => v }.sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","passes":2,"agg":"min","canary":$canaries}"""
    // The full single-line record goes to a stable file for the local
    // gate (tools/bench_gate.py) and any reader with unbounded input.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), line + "\n")
    spark.stop()
    // Stdout is read through a BOUNDED (~2 KB) tail buffer by the
    // driver — at 150+ queries the full ms-precision map can NEVER
    // fit it (r7 lost 16 entries, r8/r9 parsed null even after the
    // part split: parts 1-2 scrolled out and the summary line had no
    // "queries" key for the scraper). So the tail-facing contract is
    // now: small {"bench_part":k,...} lines first (<=600 bytes each,
    // reassembling the full map for any unbounded reader), then ONE
    // final line carrying every contract field INCLUDING a compact
    // "queries" map — the headline set (d1-d9 + the two BASELINE.md
    // flow items), which is what the contract's "headline queries"
    // asks for and what fits a 2 KB tail with room to spare. The
    // complete map always lands in bench_out.json.
    val entries = all.map { case (k, v) => graft.core.Json.quote(k) + ":" + fmt(v) }
    val parts = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    var partLen = 0
    entries.foreach { e =>
      if (partLen + e.length > 560 && parts.last.nonEmpty) {
        parts += scala.collection.mutable.ArrayBuffer.empty[String]
        partLen = 0
      }
      parts.last += e
      partLen += e.length + 1
    }
    val n = parts.length
    parts.zipWithIndex.foreach { case (p, i) =>
      println(s"""{"bench_part":${i + 1},"of":$n,"queries":{${p.mkString(",")}}}""")
    }
    val headline = all.filter { case (k, _) =>
      k.matches("d[0-9].*") || k.startsWith("flow_ingest") || k.startsWith("flow_promote")
    }.map { case (k, v) => graft.core.Json.quote(k) + ":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$headline,"sf":"$sfDir","passes":2,"agg":"min","n_queries":${all.length},"bench_parts":$n,"canary":$canaries,"full":"bench_out.json"}""")
    System.out.flush()
  }
}

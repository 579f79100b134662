package graft

/** Prints physical plans for selected declared queries — the
  * scale-readiness audit loop (`.explain("formatted")`): filter/
  * column pushdown into scans, broadcast vs shuffle joins, and
  * whole-stage codegen coverage.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.core.Sessions.local(4)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

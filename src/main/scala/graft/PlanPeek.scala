package graft
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local(4)
    for (q <- args) {
      val p = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"===$q===")
      println(p.linesIterator.filter(l => l.contains("Exchange") ||
        l.contains("Join") || l.contains("Generate")).mkString("\n"))
    }
    spark.stop()
  }
}

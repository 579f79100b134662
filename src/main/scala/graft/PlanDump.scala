package graft

import java.nio.file.{Files, Paths}

/** Dev harness: write `.explain("formatted")` of declared queries to
  * files — the r18 optimization round's plan-evidence capture
  * (`plans/r18/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query...>
  * (suffix = "before" | "after"). Note: a declared query's fn may
  * perform setup work (write a corpus, build an index) before
  * returning its DataFrame — the dump pays that setup, so plan
  * capture costs roughly one un-timed execution of the query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = graft.core.Sessions.local(cpus)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      } finally graft.core.Sessions.settle(spark)
    }
    spark.stop()
  }
}

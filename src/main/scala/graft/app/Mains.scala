package graft.app

import graft.core.{DatasetRef, LakePaths, Sessions}
import graft.planner.ConnStrings
import graft.sources.{JdbcSource, MongoLikeSource}
import java.time.LocalDate

/** CLI entry points mirroring the reference's four resync scripts +
  * the promote flow (SURVEY.md §3). Flags follow the reference's
  * argparse names (`carga_date.py:35-50`): `--dataset`,
  * `--partition_column`, `--start_date`/`--end_date` (or
  * `--start_id`/`--end_id`), plus engine flags for the lake root and
  * source location.
  */
private[app] object Args {
  def parse(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0,
      s"flags come in --key value pairs; got odd argument list: ${args.mkString(" ")}")
    args.sliding(2, 2).map {
      case Array(k, v) =>
        require(k.startsWith("--"), s"expected a --flag, got '$k'")
        require(!v.startsWith("--"),
          s"flag $k is missing a value (next token is '$v')")
        k.drop(2) -> v
    }.toMap
  }

  def req(m: Map[String, String], k: String): String =
    m.getOrElse(k, sys.error(s"missing required flag --$k"))
}

private[app] object Common {
  def spark() = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
  def lake(m: Map[String, String]) = LakePaths(Args.req(m, "lake_root"))
  def ref(m: Map[String, String]) = DatasetRef(
    m.getOrElse("environment", "production"),
    Args.req(m, "namespace"), Args.req(m, "dataset"))
  /** `--status_endpoint http://…` wires the reference's HTTP status
    * callback (`utils.py:14-27`); absent → no-op reporter. */
  def reporter(m: Map[String, String]): graft.ingest.StatusReporter =
    m.get("status_endpoint")
      .map(new graft.ingest.HttpStatusReporter(_))
      .getOrElse(graft.ingest.StatusReporter.Noop)

  /** `--id_request <id>` — the explicit request id the reference's
    * scheduler threads through every status POST (`carga_date.py:43`,
    * `utils.py:14-27`); absent → namespace.dataset. */
  def idRequest(m: Map[String, String]): Option[String] = m.get("id_request")

  /** P7-derived JDBC source: the driver class is routed from the URL
    * (`utils.py:253-267`) unless `--driver` overrides it. */
  def jdbcSource(m: Map[String, String], url: String): JdbcSource =
    JdbcSource(url, m.getOrElse("user", ""), m.getOrElse("password", ""),
      driver = m.get("driver").orElse(ConnStrings.jdbcDriverClass(url)))

  /** `--log_dir <lake path>` wires the §2.6 dual logging sink
    * (console echo + batched log objects, [[graft.core.LakeLogger]]);
    * absent → console only. Start/finish/failure bracket the run and
    * the buffer always flushes, success or not. */
  def runLogged(
      m: Map[String, String],
      spark: org.apache.spark.sql.SparkSession,
      job: String)(body: => Unit): Unit = {
    val logger = m.get("log_dir").map(d =>
      new graft.core.LakeLogger(spark.sparkContext.hadoopConfiguration, d, job))
    try {
      logger.foreach(_.info(s"$job started"))
      body
      logger.foreach(_.info(s"$job finished"))
    } catch {
      case e: Throwable =>
        logger.foreach(_.error(s"$job failed: ${e.getMessage}"))
        throw e
    } finally logger.foreach(_.close())
  }
}

/** JDBC source, date partition column (carga_date.py archetype). */
object CargaDate {
  def main(args: Array[String]): Unit = {
    val m = Args.parse(args)
    val url = ConnStrings.withSslDisabled(Args.req(m, "url")) // P7
    val src = Common.jdbcSource(m, url)
    val spark = Common.spark()
    Common.runLogged(m, spark, "carga_date") {
      ResyncJob.runDate(
        spark,
        ResyncJob.JdbcRanged(src, Args.req(m, "dataset")),
        pc = Args.req(m, "partition_column"),
        ref = Common.ref(m), lake = Common.lake(m),
        cliStart = m.get("start_date").map(LocalDate.parse),
        cliEnd = m.get("end_date").map(LocalDate.parse),
        estimatedRows = m.getOrElse("estimated_rows", "0").toLong,
        reporter = Common.reporter(m),
        idRequest = Common.idRequest(m))
    }
  }
}

/** JDBC source, integer partition column (carga_int.py archetype). */
object CargaInt {
  def main(args: Array[String]): Unit = {
    val m = Args.parse(args)
    val url = ConnStrings.withSslDisabled(Args.req(m, "url"))
    val src = Common.jdbcSource(m, url)
    val spark = Common.spark()
    Common.runLogged(m, spark, "carga_int") {
      ResyncJob.runInt(
        spark,
        ResyncJob.JdbcRanged(src, Args.req(m, "dataset")),
        pc = Args.req(m, "partition_column"),
        ref = Common.ref(m), lake = Common.lake(m),
        cliStart = m.get("start_id").map(_.toLong),
        cliEnd = m.get("end_id").map(_.toLong),
        estimatedRows = m.getOrElse("estimated_rows", "0").toLong,
        reporter = Common.reporter(m),
        idRequest = Common.idRequest(m))
    }
  }
}

/** Document source, date partition column (mongodb_carga_date.py:
  * retry without checkpoint recovery — SURVEY.md §3.3). */
object CargaMongoDate {
  def main(args: Array[String]): Unit = {
    val m = Args.parse(args)
    val spark = Common.spark()
    val schema = ResyncJob.resolveSchema(
      spark, Common.lake(m), Common.ref(m), m.get("schema_registry_dir"))
    Common.runLogged(m, spark, "mongodb_carga_date") {
      ResyncJob.runDate(
        spark,
        ResyncJob.MongoRanged(MongoLikeSource(Args.req(m, "source_path")), schema),
        pc = Args.req(m, "partition_column"),
        ref = Common.ref(m), lake = Common.lake(m),
        cliStart = m.get("start_date").map(LocalDate.parse),
        cliEnd = m.get("end_date").map(LocalDate.parse),
        estimatedRows = m.getOrElse("estimated_rows", "0").toLong,
        withRecovery = false,
        reporter = Common.reporter(m),
        idRequest = Common.idRequest(m))
    }
  }
}

/** Document source, integer partition column (mongodb_carga_int.py). */
object CargaMongoInt {
  def main(args: Array[String]): Unit = {
    val m = Args.parse(args)
    val spark = Common.spark()
    val schema = ResyncJob.resolveSchema(
      spark, Common.lake(m), Common.ref(m), m.get("schema_registry_dir"))
    Common.runLogged(m, spark, "mongodb_carga_int") {
      ResyncJob.runInt(
        spark,
        ResyncJob.MongoRanged(MongoLikeSource(Args.req(m, "source_path")), schema),
        pc = Args.req(m, "partition_column"),
        ref = Common.ref(m), lake = Common.lake(m),
        cliStart = m.get("start_id").map(_.toLong),
        cliEnd = m.get("end_id").map(_.toLong),
        estimatedRows = m.getOrElse("estimated_rows", "0").toLong,
        withRecovery = false,
        reporter = Common.reporter(m),
        idRequest = Common.idRequest(m))
    }
  }
}

/** Promote WORK → TRUSTED (the reference's 4th flow, §3.4). */
object PromoteApp {
  def main(args: Array[String]): Unit = {
    val m = Args.parse(args)
    val spark = Common.spark()
    Common.runLogged(m, spark, "promote") {
      ResyncJob.promote(
        spark,
        ref = Common.ref(m), lake = Common.lake(m),
        skIds = Args.req(m, "sk_keys").split(",").toSeq,
        hyphen = m.get("hyphen").exists(_.toBoolean))
    }
  }
}

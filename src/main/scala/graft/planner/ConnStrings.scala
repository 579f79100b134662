package graft.planner

/** P7 connection-string surgery (SURVEY.md §2.5) — pure string
  * functions, ported verbatim from the reference.
  */
object ConnStrings {

  /** Driver name extraction (reference
    * `shared_etls/etls/utils.py:253-267`): `"mongodb"` when the URL
    * contains it, else the scheme part after the first `:` of the
    * segment before the first `/` — e.g.
    * `jdbc:mysql://host/db` → `mysql`. */
  def driverName(url: String): String =
    if (url.contains("mongodb")) "mongodb"
    else url.split("/")(0).split(":")(1)

  /** JDBC driver class for a P7 [[driverName]], for routing the
    * reference derives from the URL (`utils.py:253-267` feeds the
    * reader's driver option). Unknown schemes → None (Spark falls
    * back to `DriverManager` auto-resolution from the URL). */
  def jdbcDriverClass(url: String): Option[String] =
    driverName(url) match {
      case "mysql" => Some("com.mysql.cj.jdbc.Driver")
      case "postgresql" => Some("org.postgresql.Driver")
      case "sqlserver" => Some("com.microsoft.sqlserver.jdbc.SQLServerDriver")
      case "oracle" => Some("oracle.jdbc.OracleDriver")
      case "derby" => Some("org.apache.derby.jdbc.EmbeddedDriver")
      case _ => None
    }

  /** MySQL `useSSL=false` appender (reference `utils.py:629-656`):
    * only for mysql URLs; `&`-aware when a query string exists, `?`
    * otherwise; idempotent when the flag is already present. */
  def withSslDisabled(url: String): String =
    if (!url.contains("mysql") || url.contains("useSSL=false")) url
    else if (url.contains("?")) url + "&useSSL=false"
    else url + "?useSSL=false"

  private val DbNameRe = "database=(\\w+)".r

  /** Mongo database-name extraction (reference `utils.py:30-47`):
    * regex `database=(\w+)` over the URI, else the namespace
    * fallback. */
  def mongoDatabaseName(uri: String, fallbackNamespace: String): String =
    DbNameRe.findFirstMatchIn(uri).map(_.group(1)).getOrElse(fallbackNamespace)
}

package graft

import graft.sources.JdbcSource
import java.sql.DriverManager
import org.scalatest.funsuite.AnyFunSuite

/** S1-S3 against a real JDBC endpoint (embedded Derby, which ships
  * with the Spark distribution) — verifies that the reference's
  * subquery-pushdown shapes (`utils.py:282-287`,
  * `load_utils.py:343, 497`) execute server-side and parse back.
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private lazy val seeded: JdbcSource = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      "CREATE TABLE events_t (id INT NOT NULL, ts DATE NOT NULL, v VARCHAR(10))")
    val ins = conn.prepareStatement("INSERT INTO events_t VALUES (?, ?, ?)")
    for (i <- 1 to 100) {
      ins.setInt(1, i)
      ins.setDate(2, java.sql.Date.valueOf(f"2024-01-${i % 28 + 1}%02d"))
      ins.setString(3, s"v$i")
      ins.executeUpdate()
    }
    conn.close()
    JdbcSource(url, "", "", driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))
  }

  test("S1 ranged scan pushes a half-open subquery into the database") {
    val df = seeded.readRange(spark, "events_t", "ts", "2024-01-05", "2024-01-07")
    val ids = df.collect().map(_.getAs[java.sql.Date]("TS").toString).distinct.sorted
    assert(ids.sameElements(Array("2024-01-05", "2024-01-06")))
  }

  test("S2 min scalar probe") {
    val v = seeded.minValue(spark, "events_t", "id")
    assert(v.asInstanceOf[Number].intValue() == 1)
  }

  test("S3 max scalar probe applies the +300000 margin") {
    assert(seeded.maxIntWithMargin(spark, "events_t", "id") == 100L + 300000L)
  }

  test("S3 coerces a string-typed max like the reference") {
    val v = seeded
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE strmax_t (id VARCHAR(10) NOT NULL)")
    val ins = conn.prepareStatement("INSERT INTO strmax_t VALUES (?)")
    Seq("10", "55", "31").foreach { s => ins.setString(1, s); ins.executeUpdate() }
    conn.close()
    assert(v.maxIntWithMargin(spark, "strmax_t", "id") == 55L + 300000L)
  }
}

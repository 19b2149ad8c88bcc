package graft.etl

import java.sql.DriverManager

import graft.SparkSpec

/** Exercises the JDBC upsert path against embedded Derby (on the Spark
  * classpath) with the portable update-then-insert dialect; the MySQL dialect's statement
  * text is asserted against the reference's shape.
  */
class JdbcUpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private val dbDir = java.nio.file.Files.createTempDirectory("derby").toString
  private val url = s"jdbc:derby:$dbDir/updb;create=true"
  // a top-level-bound connect fn so the foreachPartition closure doesn't
  // capture the (non-serializable) suite instance
  private val connectFn: () => java.sql.Connection = {
    val u = url
    () => DriverManager.getConnection(u)
  }

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def readAll(): Map[String, (Double, String)] = withConn { c =>
    val rs = c.createStatement().executeQuery(
      "SELECT violation_id, fine_amount, agency FROM violations_t")
    val b = Map.newBuilder[String, (Double, String)]
    while (rs.next()) b += rs.getString(1) -> ((rs.getDouble(2), rs.getString(3)))
    b.result()
  }

  test("MySQL dialect emits the reference's ON DUPLICATE KEY UPDATE shape") {
    val sql = JdbcUpsertSink.MySqlDialect.upsertSql(
      "violations", Seq("violation_id", "fine_amount"), Seq("violation_id"))
    assert(sql ==
      "INSERT INTO violations (violation_id, fine_amount) VALUES (?, ?) " +
        "ON DUPLICATE KEY UPDATE fine_amount=VALUES(fine_amount)")
  }

  test("upsert over JDBC: insert, update on key collision, null handling") {
    withConn(_.createStatement().executeUpdate(
      """CREATE TABLE violations_t (
        |  violation_id VARCHAR(50) PRIMARY KEY,
        |  fine_amount DOUBLE,
        |  agency VARCHAR(100))""".stripMargin))

    val first = Seq(
      ("a", 100.0, "MPD"), ("b", 50.0, "DDOT"))
      .toDF("violation_id", "fine_amount", "agency")
      .coalesce(1) // Derby embedded: single connection writer
    JdbcUpsertSink.upsert(first, "violations_t", Seq("violation_id"),
      connectFn,
      dialect = JdbcUpsertSink.UpdateInsertDialect, batchSize = 1)
    assert(readAll() == Map("a" -> ((100.0, "MPD")), "b" -> ((50.0, "DDOT"))))

    val second = Seq(
      ("b", 75.0, "MPD"), ("c", 25.0, null.asInstanceOf[String]))
      .toDF("violation_id", "fine_amount", "agency")
      .coalesce(1)
    JdbcUpsertSink.upsert(second, "violations_t", Seq("violation_id"),
      connectFn,
      dialect = JdbcUpsertSink.UpdateInsertDialect, batchSize = 1)
    val after = readAll()
    assert(after("a") == ((100.0, "MPD")))
    assert(after("b") == ((75.0, "MPD"))) // last-writer-wins
    assert(after("c")._1 == 25.0 && after("c")._2 == null)

    // idempotent replay (DEPLOYMENT.md:244-249)
    JdbcUpsertSink.upsert(second, "violations_t", Seq("violation_id"),
      connectFn,
      dialect = JdbcUpsertSink.UpdateInsertDialect, batchSize = 1)
    assert(readAll() == after)
  }
}

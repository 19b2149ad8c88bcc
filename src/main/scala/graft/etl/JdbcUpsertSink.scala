package graft.etl

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.DataFrame

/** JDBC upsert sink — the reference-parity write path to a relational
  * store (SURVEY.md §2.1 S7: `INSERT ... ON DUPLICATE KEY UPDATE` with
  * `executemany` batching, ref: etl/full_load/violation_etl_history.py:
  * 127-154, etl/daily_load/weather_etl_daily.py:175-210).
  *
  * Executes as `foreachPartition` with one connection + one prepared
  * statement per partition, `addBatch`/`executeBatch` every `batchSize`
  * rows, one commit per partition — the distributed recast of the
  * reference's one-commit-per-day executemany. Key-upsert SQL is
  * dialect-pluggable:
  *  - [[MySqlDialect]]: the reference's exact statement shape;
  *  - [[AnsiMergeDialect]]: standard `MERGE INTO` (Derby/Postgres 15+/
  *    Oracle), used by the test suite against embedded Derby.
  */
object JdbcUpsertSink {

  sealed trait Dialect

  /** A dialect whose upsert is one batched statement. */
  sealed trait SingleStatementDialect extends Dialect {
    def upsertSql(table: String, cols: Seq[String], keys: Seq[String]): String
  }

  /** INSERT ... ON DUPLICATE KEY UPDATE col=VALUES(col)... — byte-for-byte
    * the statement family the reference issues.
    */
  case object MySqlDialect extends SingleStatementDialect {
    override def upsertSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
      val updates = cols.filterNot(keys.contains)
        .map(c => s"$c=VALUES($c)").mkString(", ")
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
        s"ON DUPLICATE KEY UPDATE $updates"
    }
  }

  /** Portable two-statement upsert: UPDATE by key, INSERT when no row
    * matched. Works on any JDBC store (Derby/Postgres/Oracle/...); trades
    * the batched single round trip for universality.
    */
  case object UpdateInsertDialect extends Dialect {
    def updateSql(table: String, cols: Seq[String], keys: Seq[String]): String = {
      val sets = cols.filterNot(keys.contains).map(c => s"$c = ?").mkString(", ")
      val where = keys.map(k => s"$k = ?").mkString(" AND ")
      s"UPDATE $table SET $sets WHERE $where"
    }
    def insertSql(table: String, cols: Seq[String]): String =
      s"INSERT INTO $table (${cols.mkString(", ")}) " +
        s"VALUES (${cols.map(_ => "?").mkString(", ")})"
  }

  /** Upserts every row of `df` into `table` over JDBC.
    *
    * @param connect connection factory evaluated on each executor
    *   partition (credentials resolution stays caller-side, mirroring the
    *   reference's Secrets-Manager-then-connect, S10).
    */
  def upsert(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      connect: () => Connection,
      dialect: Dialect = MySqlDialect,
      batchSize: Int = 1000): Unit = {
    val cols = df.schema.fieldNames.toSeq
    // JDBC type codes for null binding (Types.NULL is not portable)
    val sqlTypes: Seq[Int] = df.schema.fields.toSeq.map(_.dataType match {
      case org.apache.spark.sql.types.StringType => java.sql.Types.VARCHAR
      case org.apache.spark.sql.types.DoubleType => java.sql.Types.DOUBLE
      case org.apache.spark.sql.types.FloatType => java.sql.Types.FLOAT
      case org.apache.spark.sql.types.LongType => java.sql.Types.BIGINT
      case org.apache.spark.sql.types.IntegerType => java.sql.Types.INTEGER
      case org.apache.spark.sql.types.BooleanType => java.sql.Types.BOOLEAN
      case org.apache.spark.sql.types.DateType => java.sql.Types.DATE
      case org.apache.spark.sql.types.TimestampType => java.sql.Types.TIMESTAMP
      case _ => java.sql.Types.OTHER
    })
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          def bind(st: PreparedStatement, row: org.apache.spark.sql.Row,
              order: Seq[Int]): Unit =
            order.zipWithIndex.foreach { case (colIdx, pos) =>
              val v = row.get(colIdx)
              if (v == null) st.setNull(pos + 1, sqlTypes(colIdx))
              else st.setObject(pos + 1, v)
            }
          dialect match {
            case d: SingleStatementDialect =>
              val st = conn.prepareStatement(d.upsertSql(table, cols, keys))
              var inBatch = 0
              rows.foreach { row =>
                bind(st, row, cols.indices)
                st.addBatch()
                inBatch += 1
                if (inBatch >= batchSize) { st.executeBatch(); inBatch = 0 }
              }
              if (inBatch > 0) st.executeBatch()
              st.close()
            case UpdateInsertDialect =>
              val d = UpdateInsertDialect
              val up = conn.prepareStatement(d.updateSql(table, cols, keys))
              val ins = conn.prepareStatement(d.insertSql(table, cols))
              val nonKeyIdx = cols.indices.filterNot(i => keys.contains(cols(i)))
              val keyIdx = cols.indices.filter(i => keys.contains(cols(i)))
              rows.foreach { row =>
                bind(up, row, nonKeyIdx ++ keyIdx)
                if (up.executeUpdate() == 0) {
                  bind(ins, row, cols.indices)
                  ins.executeUpdate()
                }
              }
              up.close(); ins.close()
          }
          conn.commit()
        } catch {
          case e: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw e
        } finally conn.close()
      }
    }
  }
}

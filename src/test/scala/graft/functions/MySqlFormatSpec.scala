package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure translation tests for the MySQL → Java DATE_FORMAT pattern map
  * (the Spark-side behavior is pinned in RefQueriesSpec's original-text
  * run).
  */
class MySqlFormatSpec extends AnyFunSuite {

  test("the reference's pattern translates (%Y-%m)") {
    assert(MySqlFormat.toJavaPattern("%Y-%m") == "yyyy-MM")
  }

  test("date, time, and name specifiers") {
    assert(MySqlFormat.toJavaPattern("%Y-%m-%d %H:%i:%s") == "yyyy-MM-dd HH:mm:ss")
    assert(MySqlFormat.toJavaPattern("%W, %M %e") == "EEEE, MMMM d")
  }

  test("literal letters are quoted, %% is a literal percent") {
    assert(MySqlFormat.toJavaPattern("%Yq") == "yyyy'q'")
    assert(MySqlFormat.toJavaPattern("100%%") == "100%")
  }

  test("unknown or dangling specifiers fail fast") {
    intercept[IllegalArgumentException](MySqlFormat.toJavaPattern("%V"))
    intercept[IllegalArgumentException](MySqlFormat.toJavaPattern("broken%"))
  }
}

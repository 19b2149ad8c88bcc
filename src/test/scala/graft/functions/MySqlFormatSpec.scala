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

/** Spark-side law for the translation: the translated pattern rendered
  * through `date_format` must agree with Spark's own field-extraction
  * functions on generated 1900–2100 timestamps. The extraction
  * expressions are an independent code path from DateFormatClass, so a
  * wrong specifier mapping cannot hide behind itself (the pure tests
  * above only pin the string-to-string translation).
  */
class MySqlFormatLawSpec extends graft.SparkSpec {

  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("property: %Y-%m-%d %H:%i:%s, %W, %j agree with extraction functions") {
    val ts = GenSoup.sample(GenSoup.timestampGen, n = 64, seedBase = 0x7E57)
    val d = ts.toDF("ts")
    val dayNames = Seq(
      "Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday", "Saturday")
    val want = concat(
      lpad(year(col("ts")).cast("string"), 4, "0"), lit("-"),
      lpad(month(col("ts")).cast("string"), 2, "0"), lit("-"),
      lpad(dayofmonth(col("ts")).cast("string"), 2, "0"), lit(" "),
      lpad(hour(col("ts")).cast("string"), 2, "0"), lit(":"),
      lpad(minute(col("ts")).cast("string"), 2, "0"), lit(":"),
      lpad(second(col("ts")).cast("string"), 2, "0"))
    val diff = d.select(
        date_format(col("ts"), MySqlFormat.toJavaPattern("%Y-%m-%d %H:%i:%s")).as("got"),
        want.as("want"),
        date_format(col("ts"), MySqlFormat.toJavaPattern("%W")).as("gotW"),
        element_at(typedLit(dayNames), dayofweek(col("ts"))).as("wantW"),
        date_format(col("ts"), MySqlFormat.toJavaPattern("%j")).as("gotJ"),
        lpad(dayofyear(col("ts")).cast("string"), 3, "0").as("wantJ"))
      .filter(col("got") =!= col("want") ||
        col("gotW") =!= col("wantW") || col("gotJ") =!= col("wantJ"))
    assert(diff.count() == 0)
  }
}

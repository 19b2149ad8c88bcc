package graft.functions

/** MySQL `DATE_FORMAT` `%`-specifier → Java `DateTimeFormatter` pattern
  * translation, so the reference's original query text
  * (`DATE_FORMAT(weather_date, '%Y-%m')`, ref: sql/analysis_queries.sql:47)
  * runs through `spark.sql` unchanged.
  *
  * Spark's builtin `date_format` shares MySQL's name but takes Java
  * patterns; [[FieldExpr.register]] shadows it with a hybrid: a foldable
  * format literal containing `%` is translated here at plan-build time
  * (zero runtime cost — the rewritten literal feeds the same codegen'd
  * DateFormatClass), anything else passes through untouched, so Spark-
  * pattern callers keep their semantics.
  */
object MySqlFormat {

  /** Specifiers used by MySQL DATE_FORMAT (the common subset; %U/%u/%V/
    * %v/%X/%x week-numbering variants are intentionally unsupported —
    * their mod-based week rules have no Java pattern equivalent).
    */
  private val specifiers: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'M' -> "MMMM", 'b' -> "MMM",
    'm' -> "MM", 'c' -> "M", 'd' -> "dd", 'e' -> "d", 'j' -> "DDD",
    'W' -> "EEEE", 'a' -> "EEE", 'H' -> "HH", 'k' -> "H", 'h' -> "hh",
    'I' -> "hh", 'l' -> "h", 'i' -> "mm", 's' -> "ss", 'S' -> "ss",
    'f' -> "SSSSSS", 'p' -> "a", 'r' -> "hh:mm:ss a", 'T' -> "HH:mm:ss")

  /** Translates a MySQL format string to a Java pattern. Literal ASCII
    * letters outside a specifier are single-quoted (Java treats bare
    * letters as pattern characters; MySQL passes them through), `%%` is a
    * literal percent, and an unknown specifier fails fast rather than
    * silently formatting garbage.
    */
  def toJavaPattern(mysql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < mysql.length) {
      val c = mysql.charAt(i)
      if (c == '%') {
        if (i + 1 >= mysql.length)
          throw new IllegalArgumentException(s"dangling % in DATE_FORMAT pattern: $mysql")
        val s = mysql.charAt(i + 1)
        if (s == '%') out.append('%')
        else out.append(specifiers.getOrElse(s,
          throw new IllegalArgumentException(s"unsupported DATE_FORMAT specifier %$s in: $mysql")))
        i += 2
      } else {
        if (c.isLetter && c < 128) out.append('\'').append(c).append('\'')
        else if (c == '\'') out.append("''")
        else out.append(c)
        i += 1
      }
    }
    out.toString
  }
}

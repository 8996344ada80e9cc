package graft.spec

/** Python strftime → Spark datetime-pattern conversion.
  *
  * The reference converts Python strftime codes to Rust chrono codes
  * (`/root/reference/src/fastdataframe/polars/datetime_format.py:77-133`,
  * map at :11-50, expansions %D→%m/%d/%y, %F→%Y-%m-%d, %R→%H:%M,
  * %T→%H:%M:%S, %r→%I:%M:%S %p, unsupported codes ⇒ ValueError).
  * Our engine targets Spark's `to_date`/`to_timestamp` datetime patterns
  * (java.time.DateTimeFormatter dialect documented at
  * spark.apache.org/docs/latest/sql-ref-datetime-pattern.html), so the same
  * conversion lands on `yyyy-MM-dd`-style patterns instead.
  *
  * Literal text containing letters is single-quoted (e.g. the ISO 'T'
  * separator); `'` itself becomes `''`.
  */
object StrftimeFormat {

  private val map: Map[String, String] = Map(
    "%Y" -> "yyyy", // year with century
    "%y" -> "yy", // 2-digit year
    "%m" -> "MM", // month 01-12
    "%b" -> "MMM", // abbreviated month name
    "%B" -> "MMMM", // full month name
    "%d" -> "dd", // day of month 01-31
    "%a" -> "EEE", // abbreviated weekday
    "%A" -> "EEEE", // full weekday
    "%j" -> "DDD", // day of year
    "%H" -> "HH", // hour 00-23
    "%I" -> "hh", // hour 01-12
    "%M" -> "mm", // minute
    "%S" -> "ss", // second
    "%f" -> "SSSSSS", // microsecond (6-digit fraction)
    "%p" -> "a", // AM/PM
    "%z" -> "xx", // +HHmm offset
    "%Z" -> "zzz", // timezone name
    // expansions, mirroring datetime_format.py:28,31,39,41,44
    "%D" -> "MM/dd/yy",
    "%F" -> "yyyy-MM-dd",
    "%R" -> "HH:mm",
    "%T" -> "HH:mm:ss",
    "%r" -> "hh:mm:ss a",
    "%%" -> "'%'",
    "%t" -> "\t",
    "%n" -> "\n",
  )

  /** Codes the reference accepts but Spark's pattern dialect cannot express;
    * kept distinct so error messages name the code, matching the reference's
    * unsupported-code ValueError behavior (`datetime_format.py:110-131`). */
  private val knownButUnsupported = Set("%w", "%u", "%U", "%W", "%x", "%X", "%c", "%s")

  /** Convert a Python strftime format to a Spark datetime pattern.
    * @throws IllegalArgumentException on unsupported/unknown format codes,
    *         message `"Unsupported format codes: %q"` (parity with
    *         `datetime_format.py:131`). */
  def toSparkPattern(pythonFormat: String): String = {
    val out = new StringBuilder
    val literal = new StringBuilder
    val unsupported = scala.collection.mutable.ListBuffer.empty[String]

    def flushLiteral(): Unit = {
      if (literal.nonEmpty) {
        val s = literal.toString
        if (s.exists(ch => ch.isLetter || ch == '\''))
          out.append("'").append(s.replace("'", "''")).append("'")
        else out.append(s)
        literal.clear()
      }
    }

    var i = 0
    while (i < pythonFormat.length) {
      val ch = pythonFormat.charAt(i)
      if (ch == '%') {
        if (i + 1 >= pythonFormat.length) { unsupported += "%"; i += 1 }
        else {
          val code = pythonFormat.substring(i, i + 2)
          map.get(code) match {
            case Some(java) => flushLiteral(); out.append(java)
            case None => unsupported += code
          }
          i += 2
        }
      } else {
        literal.append(ch)
        i += 1
      }
    }
    flushLiteral()
    if (unsupported.nonEmpty)
      throw new IllegalArgumentException(
        s"Unsupported format codes: ${unsupported.mkString(", ")}")
    out.toString
  }

  /** True iff the strftime format carries a time-of-day component — the
    * reference's `"%H" in fmt or "%T" in fmt` dispatch for str→datetime
    * (`_cast_functions.py:46-47`). */
  def hasTimePart(pythonFormat: String): Boolean =
    pythonFormat.contains("%H") || pythonFormat.contains("%T")

  /** The str→time variant: %H/%M/%S/%T (`_cast_functions.py:65-70`). */
  def hasAnyTimeCode(pythonFormat: String): Boolean =
    Seq("%H", "%M", "%S", "%T").exists(pythonFormat.contains)

  def isSupported(pythonFormat: String): Boolean =
    try { toSparkPattern(pythonFormat); true }
    catch { case _: IllegalArgumentException => false }
}

package graft.spec

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Port of `/root/reference/tests/polars/test_datetime_format.py` semantics,
  * retargeted at Spark's DateTimeFormatter pattern dialect. */
class StrftimeFormatSpec extends AnyFunSuite {
  import StrftimeFormat._

  test("identity-ish mappings") {
    assert(toSparkPattern("%Y-%m-%d") === "yyyy-MM-dd")
    assert(toSparkPattern("%Y-%m-%d %H:%M:%S") === "yyyy-MM-dd HH:mm:ss")
    assert(toSparkPattern("%Y-%m-%dT%H:%M:%S.%f") === "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    assert(toSparkPattern("%d/%m/%Y") === "dd/MM/yyyy")
  }

  test("expansions per datetime_format.py:28,31,39,41,44") {
    assert(toSparkPattern("%F") === "yyyy-MM-dd") // %F -> %Y-%m-%d
    assert(toSparkPattern("%D") === "MM/dd/yy") // %D -> %m/%d/%y
    assert(toSparkPattern("%R") === "HH:mm")
    assert(toSparkPattern("%T") === "HH:mm:ss")
    assert(toSparkPattern("%r") === "hh:mm:ss a")
  }

  test("timezone and 12-hour codes") {
    assert(toSparkPattern("%Y-%m-%d %H:%M:%S %z") === "yyyy-MM-dd HH:mm:ss xx")
    assert(toSparkPattern("%I:%M %p") === "hh:mm a")
  }

  test("literal percent and literal letters get quoted") {
    assert(toSparkPattern("%%") === "'%'")
    assert(toSparkPattern("%Y year") === "yyyy' year'")
  }

  test("unsupported codes raise with code name (datetime_format.py:131)") {
    val e = intercept[IllegalArgumentException](toSparkPattern("%Y-%Q"))
    assert(e.getMessage.contains("Unsupported format codes: %Q"))
    val e2 = intercept[IllegalArgumentException](toSparkPattern("%"))
    assert(e2.getMessage.contains("Unsupported format codes: %"))
    assert(!isSupported("%E"))
    assert(isSupported("%Y-%m-%d"))
  }

  test("time-part detection mirrors _cast_functions.py dispatch") {
    assert(hasTimePart("%Y-%m-%d %H:%M:%S"))
    assert(hasTimePart("%T"))
    assert(!hasTimePart("%Y-%m-%d"))
    assert(hasAnyTimeCode("%M"))
    assert(!hasAnyTimeCode("%Y"))
  }

  test("produced patterns are valid java.time patterns") {
    val fmt = DateTimeFormatter.ofPattern(toSparkPattern("%Y-%m-%d"))
    assert(LocalDate.parse("2024-03-09", fmt) === LocalDate.of(2024, 3, 9))
  }
}

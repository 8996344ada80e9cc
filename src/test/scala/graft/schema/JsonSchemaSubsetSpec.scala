package graft.schema

import org.json4s._
import org.json4s.jackson.JsonMethods.parse
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Port of the reference's subset-lattice matrix
  * (`/root/reference/tests/core/test_types.py:9-61`) — the core correctness
  * contract for type checking. Each row's pydantic `TypeAdapter(T).json_schema()`
  * output is reproduced literally below. */
class JsonSchemaSubsetSpec extends AnyFunSuite {
  import JsonSchemaSubset.isSubset

  private def j(s: String): JValue = parse(s)

  // pydantic TypeAdapter json_schema renderings
  val int = """{"type": "integer"}"""
  val num = """{"type": "number"}"""
  val str = """{"type": "string"}"""
  val bool = """{"type": "boolean"}"""
  val obj = """{}""" // TypeAdapter(object) -> empty schema
  val nul = """{"type": "null"}"""
  val optInt = s"""{"anyOf": [$int, $nul]}"""
  val optStr = s"""{"anyOf": [$str, $nul]}"""
  val intOrStr = s"""{"anyOf": [$int, $str]}"""
  val floatOrInt = s"""{"anyOf": [$num, $int]}"""
  val intFloatStr = s"""{"anyOf": [$int, $num, $str]}"""
  val date = """{"type": "string", "format": "date"}"""
  val datetime = """{"type": "string", "format": "date-time"}"""
  val listInt = s"""{"type": "array", "items": $int}"""
  val listStr = s"""{"type": "array", "items": $str}"""
  val listAny = """{"type": "array", "items": {}}"""
  val decimal = s"""{"anyOf": [$num, $str]}"""

  // (left, right, expected) — byte-for-byte the reference matrix
  val matrix: Seq[(String, String, Boolean, String)] = Seq(
    (int, int, true, "int vs int"),
    (int, num, false, "int vs float"),
    (int, obj, false, "int is not a subset of object (empty schema)"),
    (optInt, int, true, "Optional[int] vs int"),
    (int, intOrStr, false, "int vs int|str"),
    (intOrStr, int, true, "int|str vs int"),
    (str, str, true, "str vs str"),
    (str, int, false, "str vs int"),
    (optStr, str, true, "Optional[str] vs str"),
    (date, str, false, "date requires format"),
    (datetime, str, false, "datetime requires format"),
    (date, date, true, "date vs date"),
    (date, datetime, false, "date vs datetime"),
    (num, int, false, "float vs int"),
    (int, floatOrInt, false, "int vs float|int"),
    (floatOrInt, int, true, "float|int is a superset of int"),
    (nul, int, false, "None vs int"),
    (int, nul, false, "int vs None"),
    (bool, bool, true, "bool vs bool"),
    (bool, int, false, "bool vs int"),
    (listInt, listInt, true, "list[int] vs list[int]"),
    (listInt, listStr, false, "list[int] vs list[str]"),
    (listInt, listAny, false, "list[int] vs unconstrained list"),
    (listAny, listInt, false, "unconstrained list vs list[int]"),
    (decimal, num, true, "Decimal vs float"),
    (decimal, decimal, true, "Decimal vs Decimal"),
    (num, decimal, false, "float vs Decimal"),
    (intFloatStr, floatOrInt, true, "int|float|str vs int|float"),
  )

  matrix.foreach { case (l, r, expected, desc) =>
    test(s"subset matrix: $desc => $expected") {
      assert(isSubset(j(l), j(r)) === expected)
    }
  }

  test("numeric constraints: left must be no more restrictive") {
    assert(isSubset(j("""{"type":"integer","minimum":0}"""),
      j("""{"type":"integer","minimum":5}""")))
    assert(!isSubset(j("""{"type":"integer","minimum":5}"""),
      j("""{"type":"integer","minimum":0}""")))
    assert(isSubset(j("""{"type":"integer","maximum":10}"""),
      j("""{"type":"integer","maximum":5}""")))
    assert(!isSubset(j("""{"type":"integer","maximum":5}"""),
      j("""{"type":"integer","maximum":10}""")))
    // multipleOf: right must be a multiple of left (core/types.py:66-71)
    assert(isSubset(j("""{"type":"integer","multipleOf":2}"""),
      j("""{"type":"integer","multipleOf":4}""")))
    assert(!isSubset(j("""{"type":"integer","multipleOf":4}"""),
      j("""{"type":"integer","multipleOf":2}""")))
    // left constrained, right unconstrained is fine
    assert(isSubset(j("""{"type":"integer","minimum":5}"""), j(int)))
  }

  test("string constraints: pattern None-or-equal, lengths widen") {
    assert(isSubset(j("""{"type":"string","pattern":"^a$"}"""),
      j("""{"type":"string","pattern":"^a$"}""")))
    assert(!isSubset(j("""{"type":"string","pattern":"^a$"}"""),
      j("""{"type":"string","pattern":"^b$"}""")))
    assert(isSubset(j("""{"type":"string","minLength":1,"maxLength":99}"""),
      j("""{"type":"string","minLength":2,"maxLength":10}""")))
    assert(!isSubset(j("""{"type":"string","minLength":3}"""),
      j("""{"type":"string","minLength":2}""")))
  }

  test("object: left may have extra properties but must cover right's") {
    val l = """{"type":"object","properties":{"a":{"type":"integer"},"b":{"type":"string"}}}"""
    val r = """{"type":"object","properties":{"a":{"type":"integer"}}}"""
    assert(isSubset(j(l), j(r)))
    assert(!isSubset(j(r), j("""{"type":"object","properties":{"z":{"type":"integer"}}}""")))
  }

  test("get_type_name rendering drives message bytes") {
    assert(JsonSchemaSubset.typeName(j(int)) === "integer")
    assert(JsonSchemaSubset.typeName(j(date)) === "date")
    assert(JsonSchemaSubset.typeName(j(optInt)) === "union[integer, null]")
    assert(JsonSchemaSubset.typeName(j(obj)) === "None")
  }

  // property upgrades the reference lacks (SURVEY.md §5)
  private val scalarGen: Gen[JValue] =
    Gen.oneOf(Seq(int, num, str, bool, nul, date, datetime).map(j))
  private val schemaGen: Gen[JValue] = Gen.frequency(
    4 -> scalarGen,
    1 -> Gen.listOfN(2, scalarGen).map(opts => JObject("anyOf" -> JArray(opts))),
    1 -> scalarGen.map(s => JObject("type" -> JString("array"), "items" -> s)),
  )

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("property: reflexivity") {
    samples(schemaGen, 200).foreach(s => assert(isSubset(s, s), s))
  }

  test("property: union widening — anyOf[s, t] covers s and t") {
    val xs = samples(scalarGen, 100)
    for ((s, t) <- xs.zip(xs.reverse)) {
      val union = JObject("anyOf" -> JArray(List(s, t)))
      assert(isSubset(union, s))
      assert(isSubset(union, t))
    }
  }

  test("property: transitivity over scalar schemas") {
    val xs = samples(scalarGen, 30)
    for (a <- xs; b <- xs; c <- xs
         if isSubset(a, b) && isSubset(b, c))
      assert(isSubset(a, c), s"$a <= $b <= $c")
  }
}

package graft.schema

import org.json4s._

/** The type-compatibility lattice: `isSubset(left, right)` is true iff every
  * value valid under `right` is also valid under `left` (left ⊇ right).
  *
  * Re-implements, over json4s ASTs, the semantics of the reference's
  * `json_schema_is_subset` (`/root/reference/src/fastdataframe/core/types.py:143-232`)
  * and its helpers `constraints_are_superset` (:40-83),
  * `array_schema_is_subset` (:86-104), `object_schema_is_subset` (:107-122),
  * `format_is_superset` (:125-140), `normalize_type`/`get_type_name` (:8-19).
  * Catalyst's `DataType.equalsIgnoreNullability` is far too weak for this
  * (no unions, formats, or value constraints), so this is pure driver-side
  * code — it never touches data (cf. SURVEY.md §2.2 #19).
  */
object JsonSchemaSubset {

  private val minLike = Set("minimum", "exclusiveMinimum", "minLength", "minItems")
  private val maxLike = Set("maximum", "exclusiveMaximum", "maxLength", "maxItems")

  def empty: JObject = JObject(Nil)

  private def get(schema: JValue, key: String): Option[JValue] =
    schema \ key match {
      case JNothing => None
      case v => Some(v)
    }

  /** `normalize_type` (:9-14): the `type` field as a set of names. */
  def normalizeType(schema: JValue): Set[String] =
    get(schema, "type") match {
      case Some(JString(s)) => Set(s)
      case Some(JArray(xs)) => xs.collect { case JString(s) => s }.toSet
      case _ => Set.empty
    }

  /** `get_union_options` (:33-37): anyOf preferred over oneOf. */
  def unionOptions(schema: JValue): Option[List[JValue]] =
    get(schema, "anyOf").orElse(get(schema, "oneOf")).collect {
      case JArray(xs) => xs
    }

  /** `get_type_name` (:16-19) — drives the TypeMismatch message bytes:
    * unions render `union[a, b]`; otherwise `format` else `type` else "None",
    * with Python repr for list-valued `type`. */
  def typeName(schema: JValue): String =
    unionOptions(schema) match {
      case Some(opts) => s"union[${opts.map(typeName).mkString(", ")}]"
      case None =>
        get(schema, "format").orElse(get(schema, "type")) match {
          case Some(JString(s)) => s
          case Some(JArray(xs)) =>
            // Python str(list) rendering: ['a', 'b']
            xs.map { case JString(s) => s"'$s'"; case v => v.toString }
              .mkString("[", ", ", "]")
          case Some(v) => v.values.toString
          case None => "None"
        }
    }

  private def asBigDecimal(v: JValue): Option[BigDecimal] = v match {
    case JInt(i) => Some(BigDecimal(i))
    case JLong(l) => Some(BigDecimal(l))
    case JDouble(d) => Some(BigDecimal(d))
    case JDecimal(d) => Some(d)
    case _ => None
  }

  /** `constraints_are_superset` (:40-83): left must be no more restrictive
    * than right for each key; right-unconstrained keys are skipped. */
  def constraintsAreSuperset(left: JValue, right: JValue, keys: Seq[String]): Boolean =
    keys.forall { key =>
      get(right, key) match {
        case None => true
        case Some(rVal) =>
          val lOpt = get(left, key)
          if (minLike(key))
            lOpt.forall(l => (asBigDecimal(l), asBigDecimal(rVal)) match {
              case (Some(lv), Some(rv)) => lv <= rv
              case _ => false
            })
          else if (maxLike(key))
            lOpt.forall(l => (asBigDecimal(l), asBigDecimal(rVal)) match {
              case (Some(lv), Some(rv)) => lv >= rv
              case _ => false
            })
          else if (key == "multipleOf")
            lOpt.forall(l => (asBigDecimal(l), asBigDecimal(rVal)) match {
              case (Some(lv), Some(rv)) => lv != 0 && (rv % lv) == 0
              case _ => false
            })
          else if (key == "pattern")
            lOpt.forall(_ == rVal)
          else if (key == "uniqueItems")
            // right False requires left False (:77-82)
            !(rVal == JBool(false) && !lOpt.contains(JBool(false)))
          else true
      }
    }

  /** `array_schema_is_subset` (:86-104). */
  def arrayIsSubset(left: JValue, right: JValue): Boolean = {
    if (!constraintsAreSuperset(left, right, Seq("minItems", "maxItems", "uniqueItems")))
      return false
    val lItems = get(left, "items").filterNot(isEmptySchema)
    val rItems = get(right, "items").filterNot(isEmptySchema)
    (lItems, rItems) match {
      case (_, None) => lItems.isEmpty // right unconstrained ⇒ left must be too
      case (None, Some(_)) => false
      case (Some(l), Some(r)) => isSubset(l, r)
    }
  }

  /** `object_schema_is_subset` (:107-122): left may carry extra properties
    * but must cover every right property as a superset.
    *
    * DOCUMENTED DEVIATION: the reference never inspects
    * `additionalProperties`, so any map type vacuously accepts any other map
    * type (`dict[str,int]` ⊇ `dict[str,str]` under its code). We recurse into
    * `additionalProperties` (the map value schema, `iceberg/json_schema.py:89-98`)
    * — strictly safer; no reference test row depends on the looser behavior. */
  def objectIsSubset(left: JValue, right: JValue): Boolean = {
    val lProps = get(left, "properties").collect { case JObject(fs) => fs.toMap }.getOrElse(Map.empty)
    val rProps = get(right, "properties").collect { case JObject(fs) => fs.toMap }.getOrElse(Map.empty)
    val propsOk =
      rProps.forall { case (k, rv) => lProps.get(k).exists(lv => isSubset(lv, rv)) }
    val lAp = get(left, "additionalProperties").filterNot(isEmptySchema)
    val rAp = get(right, "additionalProperties").filterNot(isEmptySchema)
    val apOk = (lAp, rAp) match {
      case (None, _) => true // left unconstrained: permits anything
      case (Some(_), None) => false // left constrains what right leaves open
      case (Some(l), Some(r)) => isSubset(l, r)
    }
    propsOk && apOk
  }

  /** `format_is_superset` (:125-140). */
  def formatIsSuperset(left: JValue, right: JValue): Boolean =
    (get(left, "format"), get(right, "format")) match {
      case (lf, None) => lf.isEmpty
      case (lf, rf) => lf == rf
    }

  private def isEmptySchema(v: JValue): Boolean = v match {
    case JObject(Nil) => true
    case JNothing => true
    case _ => false
  }

  /** `json_schema_is_subset` (:143-232). */
  def isSubset(left: JValue, right: JValue): Boolean = {
    if (left == right) return true
    // empty right accepts anything; only an empty left is a superset (:170-174)
    if (isEmptySchema(right)) return isEmptySchema(left)

    val lUnion = unionOptions(left)
    val rUnion = unionOptions(right)

    rUnion match {
      case Some(rOpts) =>
        // every right option must be covered (:181-192)
        rOpts.forall { rOpt =>
          lUnion match {
            case None => isSubset(left, rOpt)
            case Some(lOpts) => lOpts.exists(lOpt => isSubset(lOpt, rOpt))
          }
        }
      case None =>
        lUnion match {
          case Some(lOpts) =>
            // left union vs scalar right: any covering option suffices (:193-197)
            lOpts.exists(lOpt => isSubset(lOpt, right))
          case None =>
            val lTypes = normalizeType(left)
            val rTypes = normalizeType(right)
            if (!rTypes.subsetOf(lTypes)) false
            else if (!constraintsAreSuperset(left, right,
              Seq("minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum", "multipleOf"))) false
            else if (!constraintsAreSuperset(left, right,
              Seq("minLength", "maxLength", "pattern"))) false
            else if (!formatIsSuperset(left, right)) false
            else if (get(left, "type").contains(JString("array")) &&
              get(right, "type").contains(JString("array"))) arrayIsSubset(left, right)
            else if (get(left, "type").contains(JString("object")) &&
              get(right, "type").contains(JString("object"))) objectIsSubset(left, right)
            else true
        }
    }
  }
}

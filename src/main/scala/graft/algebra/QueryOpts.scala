package graft.algebra

import org.json4s._
import org.json4s.jackson.JsonMethods

/** One filter of the JSON query algebra (reference query.py:122-218).
  * `p` dispatches the kind: `"<iri>[ hops][ <prop>]"`, `"id"`, `"fts ..."`,
  * `"regex ..."`, `"semantic"`, or `""` (reverse reference when `o` is an
  * IRI/bnode). `op` combines subject sets: should/or → UNION, must/and →
  * INTERSECT, not → EXCEPT (always applied last). */
final case class FilterQ(
    p: String = "",
    o: String = "",
    g: String = "",
    op: String = "should")

/** Label-cleaning options for sorting (reference query.py:261-285).
  * `lower` defaults to true only in `lex` mode. */
final case class CleanOpts(
    removeQuotes: Boolean = false,
    collapseSpace: Boolean = false,
    stripPunct: Boolean = false,
    trim: Boolean = true,
    lower: Boolean = true)

/** One order rule (reference query.py:316-344). Only the FIRST rule is
  * applied (query.py:329) — list accepted for API parity. */
final case class OrderRule(
    by: String = "label",
    lang: Seq[String] = Seq("de", "en"),
    dir: String = "asc",
    nulls: String = "last",
    mode: String = "lex",
    natural: Boolean = false,
    clean: Option[CleanOpts] = None,
    prop: Option[String] = None,
    via: Option[String] = None) {
  def cleanOrDefault: CleanOpts =
    clean.getOrElse(CleanOpts(trim = true, lower = mode == "lex",
      removeQuotes = false, collapseSpace = false, stripPunct = false))
}

final case class QueryOpts(
    filters: Seq[FilterQ] = Nil,
    size: Int = 999,
    start: Int = 0,
    aggregates: Seq[String] = Nil,
    order: Seq[OrderRule] = Nil,
    paths: Seq[String] = Nil,
    onlyProperties: Seq[String] = Nil,
    excludeProperties: Seq[String] = Nil)

object QueryOpts {

  /** Parse the reference's JSON opts dict. Coercion quirks preserved:
    * non-string p/o/g are stringified then space-stripped (query.py:123-125),
    * non-int size/start fall back to defaults (query.py:620-627), `order`
    * accepts dict | [dict] | [[dict]] (query.py:230-242). */
  def fromJson(json: String): QueryOpts = fromJValue(JsonMethods.parse(json))

  def fromJValue(j: JValue): QueryOpts = {
    def str(v: JValue): String = v match {
      case JString(s) => s
      case JInt(i) => i.toString
      case JLong(i) => i.toString
      case JDouble(d) => d.toString
      case JDecimal(d) => d.toString
      case JBool(b) => if (b) "True" else "False" // python str() parity
      case JNothing | JNull => ""
      case other => JsonMethods.compact(JsonMethods.render(other))
    }
    def intOr(v: JValue, dflt: Int): Int = v match {
      case JInt(i) => i.toInt
      case JLong(i) => i.toInt
      case JString(s) => try s.trim.toInt catch { case _: Exception => dflt }
      case JDouble(d) => d.toInt
      case _ => dflt
    }
    def strList(v: JValue): Seq[String] = v match {
      case JArray(items) => items.map(str)
      case JNothing | JNull => Nil
      case single => Seq(str(single))
    }
    def bool(v: JValue, dflt: Boolean): Boolean = v match {
      case JBool(b) => b
      case JNothing | JNull => dflt
      case JString(s) => s.nonEmpty
      case JInt(i) => i != 0
      case _ => dflt
    }

    val filters = (j \ "filters") match {
      case JArray(items) => items.collect { case o: JObject =>
        FilterQ(
          p = str(o \ "p").trim,
          o = str(o \ "o").trim,
          g = str(o \ "g").trim,
          // reference parity (query.py:643): only an ABSENT key defaults
          // to should; a present non-string op (op: 5, op: null) matches
          // none of the should/must/not branches and the filter
          // contributes nothing — coercing it to should would silently
          // union in a filter the reference ignores
          op = (o \ "op") match {
            case JString(s) => s
            case JNothing => "should"
            case _ => "__nonstring_op__"
          })
      }
      case _ => Nil
    }

    def parseClean(v: JValue): Option[CleanOpts] = v match {
      case o: JObject => Some(CleanOpts(
        removeQuotes = bool(o \ "remove_quotes", dflt = false),
        collapseSpace = bool(o \ "collapse_space", dflt = false),
        stripPunct = bool(o \ "strip_punct", dflt = false),
        trim = bool(o \ "trim", dflt = true),
        lower = bool(o \ "lower", dflt = true)))
      case _ => None
    }
    def parseRule(v: JValue): Option[OrderRule] = v match {
      case o: JObject => Some(OrderRule(
        by = ((o \ "by") match { case JString(s) => s; case _ => "label" }).toLowerCase,
        lang = (o \ "lang") match { case JArray(xs) => xs.map(str); case _ => Seq("de", "en") },
        dir = ((o \ "dir") match { case JString(s) => s; case _ => "asc" }).toLowerCase,
        nulls = ((o \ "nulls") match { case JString(s) => s; case _ => "last" }).toLowerCase,
        mode = ((o \ "mode") match { case JString(s) => s; case _ => "lex" }).toLowerCase,
        natural = bool(o \ "natural", dflt = false),
        clean = parseClean(o \ "clean"),
        prop = (o \ "prop") match { case JString(s) => Some(s); case _ => None },
        via = (o \ "via") match { case JString(s) => Some(s); case _ => None }))
      case _ => None
    }
    // dict | [dict] | [[dict]] normalization (query.py:230-242)
    val order = (j \ "order") match {
      case o: JObject => parseRule(o).toSeq
      case JArray((inner: JArray) +: _) => inner.arr.flatMap(parseRule)
      case JArray(items) => items.flatMap(parseRule)
      case _ => Nil
    }

    QueryOpts(
      filters = filters,
      size = intOr(j \ "size", 999),
      start = intOr(j \ "start", 0),
      aggregates = strList(j \ "aggregates"),
      order = order,
      paths = strList(j \ "paths"),
      onlyProperties = strList(j \ "only_properties"),
      excludeProperties = strList(j \ "exclude_properties"))
  }
}

package graft.model

/** RDF term utilities over the N3 surface forms the engine stores.
  *
  * The engine (like the reference, /root/reference/src/bikidata/main.py:22-36,
  * 39-63) never decomposes terms in storage: an IRI is kept as `<iri>`, a
  * blank node as `_:x`, a literal as `"text"`, `"text"@lang` or
  * `"1.5"^^<datatype>`. These helpers parse/render at the edges only.
  */
object Term {

  /** Is this surface form a literal? (dictionary split rule: first char is
    * a double quote — main.py:198-204). */
  def isLiteral(term: String): Boolean = term.nonEmpty && term.charAt(0) == '"'

  def isIri(term: String): Boolean =
    term.length >= 2 && term.charAt(0) == '<' && term.charAt(term.length - 1) == '>'

  def isBNode(term: String): Boolean = term.startsWith("_:")

  def iri(value: String): String = s"<$value>"

  /** `<iri>` -> `iri`; anything else unchanged. */
  def stripIri(term: String): String =
    if (isIri(term)) term.substring(1, term.length - 1) else term

  def plainLiteral(value: String): String = "\"" + value + "\""
  def langLiteral(value: String, lang: String): String = "\"" + value + "\"@" + lang
  def typedLiteral(value: String, datatype: String): String =
    "\"" + value + "\"^^<" + datatype + ">"

  /** Split a literal surface form into (value, language, datatype) —
    * replicates `literal_to_parts` (main.py:22-36): value is the span up to
    * the LAST quote; a malformed literal yields (None, None, None).
    */
  def literalToParts(literal: String): (Option[String], Option[String], Option[String]) = {
    if (!literal.startsWith("\"")) return (None, None, None)
    val endIndex = literal.lastIndexOf('"')
    if (endIndex <= 0) return (None, None, None)
    val value = literal.substring(1, endIndex)
    val remainder = literal.substring(endIndex + 1).trim
    if (remainder.startsWith("@")) (Some(value), Some(remainder.substring(1)), None)
    else if (remainder.startsWith("^^")) (Some(value), None, Some(remainder.substring(2)))
    else (Some(value), None, None)
  }

  /** Decode `\uXXXX` and `\UXXXXXXXX` escapes (N-Triples UCHAR,
    * main.py:39-63). `\U` forms are substituted first, then `\u` — same
    * two-pass order as the reference. Lone surrogates produced by `\uD83D`
    * style escapes survive as chars (and will fail UTF-8 encoding checks
    * downstream, mirroring the reference's skip-with-error behavior).
    */
  def decodeUnicodeEscapes(s: String): String = {
    if (s.indexOf("\\u") < 0 && s.indexOf("\\U") < 0) return s
    val afterU = PatternU8.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        new String(Character.toChars(Integer.parseInt(m.group(1), 16)))))
    Pattern4.replaceAllIn(afterU, m => {
      val cp = Integer.parseInt(m.group(1), 16)
      // A lone surrogate is representable in a JVM String; keep it so the
      // encode-time validity check can reject the term like the reference.
      scala.util.matching.Regex.quoteReplacement(cp.toChar.toString)
    })
  }

  private val Pattern4 = """\\u([0-9a-fA-F]{4})""".r
  private val PatternU8 = """\\U([0-9a-fA-F]{8})""".r

  /** The reference drops quads whose terms can't be UTF-8 encoded (unpaired
    * surrogates from JSON-style escapes, main.py:173-180). */
  def isEncodable(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isHighSurrogate(c)) {
        if (i + 1 >= s.length || !Character.isLowSurrogate(s.charAt(i + 1))) return false
        i += 1
      } else if (Character.isLowSurrogate(c)) return false
      i += 1
    }
    true
  }
}

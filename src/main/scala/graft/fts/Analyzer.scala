package graft.fts

import java.text.Normalizer

/** Text analyzer replicating the reference's FTS defaults
  * (/root/reference/src/bikidata/main.py:206-220): split on
  * `[^a-zA-Z0-9]+`, strip accents, lowercase, Porter-stem.
  *
  * Used at both index time (postings build) and query time, as a plain
  * Scala function — hot paths call it inside codegen'd higher-order
  * functions or mapPartitions, never via a Python UDF.
  */
object Analyzer {

  val DefaultSeparator = "[^a-zA-Z0-9]+"

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  /** NON-EMPTY tokens of `s` under the DEFAULT separator — a character
    * scan equivalent to `DefaultSeparator.r.split(s).filter(_.nonEmpty)`
    * (maximal ASCII-alnum runs; pinned against the regex in FtsSpec)
    * without the regex engine, which dominates the per-document cost of
    * the corpus-wide index/embedding analysis passes. Supplementary code
    * points are surrogate chars, neither of which is ASCII alnum, so
    * they separate exactly as the code-point regex does. */
  private[graft] def splitDefault(s: String): Array[String] = {
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[String](8)
    var i = 0
    while (i < n) {
      while (i < n && !isAlnum(s.charAt(i))) i += 1
      val start = i
      while (i < n && isAlnum(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  /** NFD-decompose then drop combining marks — DuckDB's strip_accents. */
  def stripAccents(s: String): String = {
    // fast path: pure ASCII needs no normalization
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 128) ascii = false; i += 1 }
    if (ascii) s
    else Normalizer.normalize(s, Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", "")
  }

  def tokenize(text: String, stem: Boolean = true): Array[String] = {
    if (text == null) return Array.empty
    val cleaned = stripAccents(text).toLowerCase
    val raw = splitDefault(cleaned) // already non-empty
    if (!stem) return raw
    val out = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) { out(i) = PorterStemmer.stem(raw(i)); i += 1 }
    out
  }

  /** Settings-driven raw tokenization (DuckDB `tokenize` macro order:
    * strip_accents → lower → ignore-regex → split). No stemming and no
    * stopword filtering here — the index and query sides apply those
    * differently ([[FtsSettings.indexTokens]] / [[FtsSettings.queryTokens]]). */
  def tokenize(text: String, settings: FtsSettings): Array[String] = {
    if (text == null) return Array.empty
    var cleaned = if (settings.stripAccents) stripAccents(text) else text
    if (settings.lower) cleaned = cleaned.toLowerCase
    settings.splitIgnore(cleaned).filter(_.nonEmpty)
  }
}

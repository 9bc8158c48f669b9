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

  // compiled once: tokenize(text, stem) runs per corpus document on the
  // embedding-build pass — String.split would re-compile per call
  private val DefaultSeparatorRe = java.util.regex.Pattern.compile(DefaultSeparator)

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
    val raw = DefaultSeparatorRe.split(cleaned)
    val out = new scala.collection.mutable.ArrayBuffer[String](raw.length)
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (t.nonEmpty) out += (if (stem) PorterStemmer.stem(t) else t)
      i += 1
    }
    out.toArray
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

package graft.fts

/** FTS analyzer settings mirroring DuckDB `create_fts_index` options as
  * the reference uses them (main.py:206-219): `ignore` separator regex,
  * `strip_accents`, `lower`, `stemmer`, plus the `stopwords` option the
  * reference leaves at DuckDB's `'english'` default. Users override via
  * the same `BIKIDATA_FTS_SETTINGS` environment variable, with the same
  * `key = 'value'` pragma syntax (the whole string replaces the
  * defaults, as in the reference).
  */
final case class FtsSettings(
    ignore: String = "[^a-zA-Z0-9]+",
    stripAccents: Boolean = true,
    lower: Boolean = true,
    stemmer: String = "porter", // "porter" | "none"
    stopwords: String = "english") { // "english" | "none"

  def stopwordSet: Set[String] =
    if (stopwords == "english") Stopwords.English else Set.empty

  // hot-path caches: the index build calls indexTokens once per corpus
  // row — the separator regex and stopword set must compile/resolve once
  // per settings instance, not once per document (transient: recomputed
  // after deserialization on each executor, still once per task at most)
  @transient private lazy val ignoreRe: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(ignore)
  @transient private lazy val swCached: Set[String] = stopwordSet
  @transient private lazy val defaultIgnore: Boolean = ignore == Analyzer.DefaultSeparator

  /** Split on [[ignore]]: the DEFAULT separator takes the character-scan
    * fast path (regex-equivalent, pinned in FtsSpec); custom separators
    * use the once-compiled pattern — `Pattern.split` is exactly
    * `String.split(regex)` semantics without the per-call compile. May
    * drop empty tokens (the analyzer filters them anyway). */
  private[fts] def splitIgnore(s: String): Array[String] =
    if (defaultIgnore) Analyzer.splitDefault(s) else ignoreRe.split(s)

  /** Index-side analysis (DuckDB terms build): tokenize, drop stopwords
    * on the UNSTEMMED token, then stem. */
  def indexTokens(text: String): Array[String] = {
    val sw = swCached
    Analyzer.tokenize(text, this).collect {
      case t if !sw.contains(t) => applyStem(t)
    }
  }

  /** Query-side analysis (DuckDB match_bm25 `tokens` CTE): distinct
    * STEMMED tokens, NO stopword filter — a conjunctive query containing
    * a stopword therefore matches nothing, because the stopword never
    * reached the dict. Deliberate reference parity. */
  def queryTokens(text: String): Array[String] =
    Analyzer.tokenize(text, this).map(applyStem).distinct

  private def applyStem(t: String): String =
    if (stemmer == "none") t else PorterStemmer.stem(t)

  def toJsonFragment: String =
    s""""ignore":${FtsSettings.q(ignore)},"strip_accents":$stripAccents,""" +
      s""""lower":$lower,"stemmer":${FtsSettings.q(stemmer)},"stopwords":${FtsSettings.q(stopwords)}"""
}

object FtsSettings {

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** Settings for a build: `BIKIDATA_FTS_SETTINGS` wins wholesale when
    * set (reference main.py:206-216), else defaults with the caller's
    * stemmer choice (reference `build(paths, stemmer)`). */
  def resolve(stemmer: String = "porter",
      env: Map[String, String] = sys.env): FtsSettings =
    env.get("BIKIDATA_FTS_SETTINGS")
      .map(parse)
      .getOrElse(FtsSettings(stemmer = stemmer))

  /** Parse the DuckDB pragma option syntax:
    * `ignore = '[^a-zA-Z0-9]+', strip_accents = 1, lower=1, stemmer='porter'`.
    * Unknown keys are ignored; missing keys keep their defaults. */
  def parse(s: String): FtsSettings = {
    // split on commas OUTSIDE single quotes
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { inQuote = !inQuote; cur += c }
      else if (c == ',' && !inQuote) { parts += cur.toString; cur.clear() }
      else cur += c
      i += 1
    }
    if (cur.nonEmpty) parts += cur.toString
    parts.foldLeft(FtsSettings()) { (acc, part) =>
      part.split("=", 2) match {
        case Array(k, v) =>
          val key = k.trim.toLowerCase
          val value = v.trim.stripPrefix("'").stripSuffix("'")
          key match {
            case "ignore" => acc.copy(ignore = value)
            case "strip_accents" => acc.copy(stripAccents = value == "1" || value.equalsIgnoreCase("true"))
            case "lower" => acc.copy(lower = value == "1" || value.equalsIgnoreCase("true"))
            case "stemmer" => acc.copy(stemmer = value)
            case "stopwords" => acc.copy(stopwords = value)
            case _ => acc
          }
        case _ => acc
      }
    }
  }
}

package graft.fts

/** Self-contained implementation of the Porter stemming algorithm
  * (M.F. Porter, "An algorithm for suffix stripping", Program 14(3) 1980 —
  * public algorithm; this matches the canonical definition, which is also
  * what DuckDB's FTS `stemmer='porter'` option selects via Snowball).
  *
  * Operates on lowercase ASCII words; non-matching input passes through.
  */
object PorterStemmer {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word
    w = step1a(w); w = step1b(w); w = step1c(w)
    w = step2(w); w = step3(w); w = step4(w); w = step5(w)
    w
  }

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** The measure m of the stem: number of VC sequences. */
  private def measure(w: String): Int = {
    var m = 0; var i = 0; val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // skip initial consonants
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1 // vowel run
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    (0 until w.length).exists(isVowel(w, _))

  private def endsDoubleConsonant(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    if (n < 3) return false
    val last = w.charAt(n - 1)
    !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      last != 'w' && last != 'x' && last != 'y'
  }

  /** Canonical rule application for the list steps: the LONGEST matching
    * suffix is selected FIRST, and if its measure condition fails the
    * step does nothing — it must NOT fall through to a shorter suffix
    * (Porter 1980: "the longest match wins"; e.g. step 4 on "agreement"
    * matches `ement` with m=1, so the word survives unchanged — falling
    * through to `ent` would wrongly yield "agreem"). */
  private def applyLongest(w: String, rules: Seq[(String, String)], minM: Int): String =
    rules.filter { case (suf, _) => w.endsWith(suf) }
      .sortBy(-_._1.length).headOption match {
      case Some((suf, rep)) =>
        val stem = w.substring(0, w.length - suf.length)
        if (measure(stem) > minM) stem + rep else w
      case None => w
    }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      val stem = w.dropRight(3)
      if (measure(stem) > 0) w.dropRight(1) else w
    } else {
      val trimmed =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      trimmed match {
        case None => w
        case Some(t) =>
          if (t.endsWith("at") || t.endsWith("bl") || t.endsWith("iz")) t + "e"
          else if (endsDoubleConsonant(t) && !"lsz".contains(t.last)) t.dropRight(1)
          else if (measure(t) == 1 && endsCvc(t)) t + "e"
          else t
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val Step2Rules = Seq(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private def step2(w: String): String = applyLongest(w, Step2Rules, 0)

  private val Step3Rules = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private def step3(w: String): String = applyLongest(w, Step3Rules, 0)

  private val Step4Suffixes = Seq(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def step4(w: String): String = {
    // longest match across the whole step-4 list, "ion" included; its
    // extra condition ("ion" only strips after s or t) belongs to the
    // selected rule — a failed condition ends the step, no fallthrough
    val candidates = Step4Suffixes ++ Seq("ion")
    candidates.filter(w.endsWith).sortBy(-_.length).headOption match {
      case Some(suf) =>
        val stem = w.substring(0, w.length - suf.length)
        val ionOk = suf != "ion" ||
          (stem.nonEmpty && (stem.last == 's' || stem.last == 't'))
        if (measure(stem) > 1 && ionOk) stem else w
      case None => w
    }
  }

  private def step5(w: String): String = {
    var r = w
    if (r.endsWith("e")) {
      val stem = r.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) r = stem
    }
    if (r.endsWith("ll") && measure(r) > 1) r = r.dropRight(1)
    r
  }
}

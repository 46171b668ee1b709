package graft.analysis

/**
 * Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
 * stripping", Program 14(3) 1980) — implemented from the published
 * algorithm description. Optional stage of the analysis chain; the
 * reference's `text_en` Solr field type ends in PorterStemFilter
 * (`/root/reference/code/ingest/src/test/resources/solr/configsets/preanalyze/conf/schema.xml:39-60`).
 *
 * Pure function, lowercase ASCII input assumed (the V1 tokenizer
 * guarantees it).
 */
object PorterStemmer extends Serializable {

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = step1a(word)
    w = step1b(w)
    w = step1c(w)
    w = step2(w)
    w = step3(w)
    w = step4(w)
    w = step5a(w)
    w = step5b(w)
    w
  }

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m of the stem: number of VC sequences in [C](VC)^m[V]. */
  private def measure(w: String): Int = {
    var m = 0; var i = 0; val n = w.length
    while (i < n && !isVowel(w, i)) i += 1 // leading consonants
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1 // vowel run
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean =
    (0 until w.length).exists(isVowel(w, _))

  private def endsDoubleC(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      !isVowel(w, w.length - 1)

  /** *o: stem ends cvc where second c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    if (n < 3) return false
    if (isVowel(w, n - 1) || !isVowel(w, n - 2) || isVowel(w, n - 3)) return false
    val c = w.charAt(n - 1)
    c != 'w' && c != 'x' && c != 'y'
  }

  private def step1a(w: String): String =
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(2)
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s")) w.dropRight(1)
    else w

  private def step1b(w: String): String = {
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w.dropRight(1) else w
    } else {
      val stem =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stem match {
        case None => w
        case Some(s) =>
          if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
          else if (endsDoubleC(s) && !s.endsWith("l") && !s.endsWith("s") && !s.endsWith("z")) s.dropRight(1)
          else if (measure(s) == 1 && endsCvc(s)) s + "e"
          else s
      }
    }
  }

  private def step1c(w: String): String =
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w.dropRight(1) + "i" else w

  private val step2Suffixes = List(
    "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
    "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
    "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
    "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
    "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")

  private val step3Suffixes = List(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4Suffixes = List(
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")

  private def replaceSuffix(w: String, rules: List[(String, String)], minM: Int): String = {
    rules.collectFirst {
      case (suf, rep) if w.endsWith(suf) && measure(w.dropRight(suf.length)) > minM - 1 =>
        w.dropRight(suf.length) + rep
      case (suf, _) if w.endsWith(suf) => w // matched but measure too small: stop
    }.getOrElse(w)
  }

  private def step2(w: String): String = replaceSuffix(w, step2Suffixes, 1)
  private def step3(w: String): String = replaceSuffix(w, step3Suffixes, 1)

  private def step4(w: String): String = {
    step4Suffixes.collectFirst {
      case suf if w.endsWith(suf) =>
        val stem = w.dropRight(suf.length)
        val ok = measure(stem) > 1 &&
          (suf != "ion" || stem.endsWith("s") || stem.endsWith("t"))
        if (ok) stem else w
    }.getOrElse {
      // "ion" needs the s/t precondition, handled separately
      if (w.endsWith("ion")) {
        val stem = w.dropRight(3)
        if (measure(stem) > 1 && (stem.endsWith("s") || stem.endsWith("t"))) stem else w
      } else w
    }
  }

  private def step5a(w: String): String =
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) stem else w
    } else w

  private def step5b(w: String): String =
    if (measure(w) > 1 && endsDoubleC(w) && w.endsWith("l")) w.dropRight(1) else w
}

package graft.functions

/**
 * The full Snowball English stemmer ("Porter2") — the `english_porter`
 * analyzer arm. The reference exposes Milvus `analyzer_params` whose
 * `stemmer` filter is exactly this algorithm; the minimal Lucene stemmer
 * (`TextFns.minEnglishStem`, the `english_stem` arm) only strips plurals,
 * so derivational forms ("relational" → "relat") never meet their base
 * ("relate" → "relat") under it. Implemented from the published algorithm
 * description at snowballstem.org/algorithms/english/stemmer.html — no
 * third-party code.
 *
 * THREE spellings must agree token-for-token (the both-sides analyzer
 * contract): [[stem]] (driver-side query terms), the array UDF the
 * engine's postings build applies ([[graft.Engine.analyzeCol]] routes the
 * `english_porter` arm through one whole-array UDF — a scalar per-token
 * expression tree for six suffix-rule steps would defeat codegen anyway,
 * and the build is the offline batch path), and [[sqlCtes]] (the DuckDB
 * oracle replay — a per-step CTE chain, because a single scalar expression
 * would nest each step's output into the next and blow up exponentially).
 */
object Porter2 {

  // On the MARKED word ('y' → 'Y' when it is a consonant), the vowel set
  // is fixed: lowercase y that survived marking IS a vowel.
  private val vowels = "aeiouy"

  private[graft] val exceptions1: Seq[(String, String)] = Seq(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")
  private val exc1Map = exceptions1.toMap

  private[graft] val exceptions2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt"

  private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  /** Ends in a short syllable: vowel between non-vowels at the end (final
    * non-vowel not w/x/Y), or the whole word is vowel + non-vowel. */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    (n == 2 && isV(w(0)) && !isV(w(1))) ||
      (n >= 3 && !isV(w(n - 3)) && isV(w(n - 2)) && !isV(w(n - 1)) &&
        "wxY".indexOf(w(n - 1)) < 0)
  }

  /** First region-start at or after `from`: the position after the first
    * non-vowel that follows a vowel (both inside [from, len)); len if none. */
  private def regionScan(w: String, from: Int): Int = {
    var i = from + 1
    while (i < w.length) {
      if (!isV(w(i)) && isV(w(i - 1))) return i + 1
      i += 1
    }
    w.length
  }

  /** Stem one lowercase token. Null-safe; non-letters flow through the
    * character tests as consonants (whitespace tokens may carry
    * punctuation — the algorithm is total over any string). */
  def stem(word0: String): String = {
    if (word0 == null) return null
    var w = word0
    if (w.startsWith("'")) w = w.substring(1)
    if (w.length <= 2) return w
    exc1Map.get(w).foreach(r => return r)

    // mark consonant y: initial y, or y following a (still-)vowel char
    val sb = new StringBuilder(w)
    if (sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isV(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    val r1 =
      if (w.startsWith("gener")) 5
      else if (w.startsWith("commun")) 6
      else if (w.startsWith("arsen")) 5
      else regionScan(w, 0)
    val r2 = regionScan(w, math.max(r1, 0))
    def inR1(sfxLen: Int): Boolean = w.length - sfxLen >= r1
    def inR2(sfxLen: Int): Boolean = w.length - sfxLen >= r2

    // step 0: longest of 's' / 's / '
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.length >= 2 && w.endsWith("s") &&
        w.substring(0, w.length - 2).exists(isV))
      w = w.dropRight(1)

    if (exceptions2(w)) return w.replace('Y', 'y')

    def isShort(x: String): Boolean = endsShortSyllable(x) && r1 >= x.length

    // step 1b — longest of eedly ingly edly eed ing ed
    Seq("eedly", "ingly", "edly", "eed", "ing", "ed").find(w.endsWith) match {
      case Some(sfx @ ("eedly" | "eed")) =>
        if (w.length - sfx.length >= r1) w = w.dropRight(sfx.length) + "ee"
      case Some(sfx) =>
        val st = w.dropRight(sfx.length)
        if (st.exists(isV)) {
          w = st
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
          else if (w.length >= 2 && doubles(w.takeRight(2))) w = w.dropRight(1)
          else if (isShort(w)) w += "e"
        }
      case None => ()
    }

    // step 1c: final y/Y after a non-vowel that is not the first letter
    if (w.length > 2 && (w.last == 'y' || w.last == 'Y') && !isV(w(w.length - 2)))
      w = w.dropRight(1) + "i"

    // step 2 — longest match wins; if its condition fails, nothing happens
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive",
      "tional" -> "tion", "biliti" -> "ble", "lessli" -> "less",
      "entli" -> "ent", "ation" -> "ate", "alism" -> "al", "aliti" -> "al",
      "ousli" -> "ous", "iviti" -> "ive", "fulli" -> "ful",
      "enci" -> "ence", "anci" -> "ance", "abli" -> "able", "izer" -> "ize",
      "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      val ok = s match {
        case "ogi" => inR1(3) && w.length >= 4 && w(w.length - 4) == 'l'
        case "li" => inR1(2) && w.length >= 3 && liEnding.indexOf(w(w.length - 3)) >= 0
        case _ => inR1(s.length)
      }
      if (ok) w = w.dropRight(s.length) + r
    }

    // step 3
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "",
      "ical" -> "ic", "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      val ok = if (s == "ative") inR2(5) else inR1(s.length)
      if (ok) w = w.dropRight(s.length) + r
    }

    // step 4 — delete in R2 (ion additionally needs a preceding s/t)
    val step4: Seq[String] = Seq(
      "ement",
      "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    step4.find(w.endsWith).foreach { s =>
      val ok = inR2(s.length) &&
        (s != "ion" || (w.length >= 4 && "st".indexOf(w(w.length - 4)) >= 0))
      if (ok) w = w.dropRight(s.length)
    }

    // step 5
    if (w.endsWith("e") &&
        (w.length - 1 >= r2 ||
          (w.length - 1 >= r1 && !endsShortSyllable(w.dropRight(1)))))
      w = w.dropRight(1)
    else if (w.endsWith("l") && w.length - 1 >= r2 &&
        w.length >= 2 && w(w.length - 2) == 'l')
      w = w.dropRight(1)

    w.replace('Y', 'y')
  }

  /** DuckDB replay of [[stem]] over an unnested token relation — one CTE
    * per algorithm step, so each step's output is referenced by NAME
    * (linear SQL size; a single nested scalar expression would duplicate
    * each step's text into every reference and grow exponentially).
    * Region positions are computed once (suffix edits never move the
    * word's prefix, so R1/R2 offsets stay valid — the same invariant the
    * Scala pass relies on). Input: relation `rel` with columns `$carry`
    * and token column `tok`; output CTE `<p>out` with `$carry` and the
    * stemmed `tok`. */
  def sqlCtes(rel: String, carry: String, tok: String, p: String): String = {
    val exc1 = exceptions1.map { case (k, v) => s"WHEN '$k' THEN '$v'" }
      .mkString(" ")
    val exc2 = exceptions2.toSeq.sorted.map(s => s"'$s'").mkString(", ")
    val dbl = doubles.toSeq.sorted.map(s => s"'$s'").mkString(", ")
    val liEnds = liEnding.map(c => s"'$c'").mkString(", ")
    val rgn = "'^[^aeiouy]*[aeiouy]+[^aeiouy]'"
    // ends-in-short-syllable over a word expression (referenced 3x — cheap)
    def shortSyl(w: String): String =
      s"((length($w) = 2 AND regexp_matches($w, '^[aeiouy][^aeiouy]$$'))" +
        s" OR regexp_matches($w, '[^aeiouy][aeiouy][^aeiouywxY]$$'))"
    def sfx(w: String, s: String) = s"$w LIKE '%${s.replace("'", "''")}'"
    def drop(w: String, k: Int) = s"substr($w, 1, length($w) - $k)"
    // step 2/3/4 arms as one ordered CASE (longest suffix first — the
    // FIRST matching arm decides; a failed condition falls into the
    // matched arm's ELSE, never a shorter suffix)
    def among(w: String, arms: Seq[(String, String, String)]): String = {
      // (suffix, replacement, extra condition or "")
      val cases = arms.map { case (s, r, cond) =>
        val base = s"length($w) - ${s.length} >= r1"
        val c = if (cond.isEmpty) base else s"$base AND $cond"
        s"WHEN ${sfx(w, s)} THEN CASE WHEN $c THEN ${drop(w, s.length)} || '$r' ELSE $w END"
      }.mkString("\n        ")
      s"CASE $cases\n        ELSE $w END"
    }
    val step2Arms: Seq[(String, String, String)] = Seq(
      ("ization", "ize", ""), ("ational", "ate", ""), ("fulness", "ful", ""),
      ("ousness", "ous", ""), ("iveness", "ive", ""),
      ("tional", "tion", ""), ("biliti", "ble", ""), ("lessli", "less", ""),
      ("entli", "ent", ""), ("ation", "ate", ""), ("alism", "al", ""),
      ("aliti", "al", ""), ("ousli", "ous", ""), ("iviti", "ive", ""),
      ("fulli", "ful", ""),
      ("enci", "ence", ""), ("anci", "ance", ""), ("abli", "able", ""),
      ("izer", "ize", ""), ("ator", "ate", ""), ("alli", "al", ""),
      ("bli", "ble", ""),
      ("ogi", "og", "substr(w4, length(w4) - 3, 1) = 'l'"),
      ("li", "", "substr(w4, length(w4) - 2, 1) IN (" + liEnds + ")"))
    val step3Arms: Seq[(String, String, String)] = Seq(
      ("ational", "ate", ""), ("tional", "tion", ""), ("alize", "al", ""),
      ("icate", "ic", ""), ("iciti", "ic", ""),
      ("ative", "", "length(w5) - 5 >= r2"),
      ("ical", "ic", ""), ("ness", "", ""), ("ful", "", ""))
    // step 4 conditions use R2 (among() bakes R1) — spell it directly
    val step4Sfx: Seq[String] = Seq(
      "ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    val step4Cases = step4Sfx.map { s =>
      val extra =
        if (s == "ion") " AND substr(w6, length(w6) - 3, 1) IN ('s', 't')" else ""
      s"WHEN ${sfx("w6", s)} THEN CASE WHEN length(w6) - ${s.length} >= r2$extra " +
        s"THEN ${drop("w6", s.length)} ELSE w6 END"
    }.mkString("\n        ")
    s"""${p}a AS (
       |  SELECT $carry,
       |    CASE WHEN $tok LIKE '''%' THEN substr($tok, 2) ELSE $tok END AS w0
       |  FROM $rel),
       |${p}b AS (
       |  SELECT $carry, w0,
       |    CASE w0 $exc1 ELSE NULL END AS exc,
       |    regexp_replace(regexp_replace(w0, '^y', 'Y'), '([aeiouy])y', '\\1Y', 'g') AS w
       |  FROM ${p}a),
       |${p}c AS (
       |  SELECT $carry, w0, exc, w,
       |    (length(w0) <= 2 OR exc IS NOT NULL) AS fin,
       |    CASE WHEN w LIKE 'gener%' THEN 5
       |         WHEN w LIKE 'commun%' THEN 6
       |         WHEN w LIKE 'arsen%' THEN 5
       |         WHEN regexp_extract(w, $rgn) = '' THEN length(w)
       |         ELSE length(regexp_extract(w, $rgn)) END AS r1
       |  FROM ${p}b),
       |${p}d AS (
       |  SELECT $carry, w0, exc, w, fin, r1,
       |    CASE WHEN regexp_extract(substr(w, r1 + 1), $rgn) = '' THEN length(w)
       |         ELSE r1 + length(regexp_extract(substr(w, r1 + 1), $rgn)) END AS r2
       |  FROM ${p}c),
       |${p}e AS ( -- step 0 + step 1a
       |  SELECT $carry, w0, exc, fin, r1, r2,
       |    CASE WHEN fin THEN w1 WHEN w1 IN ($exc2) THEN w1 ELSE NULL END AS fin1w,
       |    w1
       |  FROM (
       |    SELECT *,
       |      CASE WHEN fin THEN wz
       |           WHEN ${sfx("wz", "sses")} THEN ${drop("wz", 2)}
       |           WHEN ${sfx("wz", "ied")} OR ${sfx("wz", "ies")} THEN
       |             CASE WHEN length(wz) > 4 THEN ${drop("wz", 2)}
       |                  ELSE ${drop("wz", 1)} END
       |           WHEN ${sfx("wz", "us")} OR ${sfx("wz", "ss")} THEN wz
       |           WHEN length(wz) >= 2 AND ${sfx("wz", "s")}
       |                AND regexp_matches(substr(wz, 1, length(wz) - 2), '[aeiouy]')
       |             THEN ${drop("wz", 1)}
       |           ELSE wz END AS w1
       |    FROM (
       |      SELECT *,
       |        CASE WHEN fin THEN w
       |             WHEN ${sfx("w", "'s'")} THEN ${drop("w", 3)}
       |             WHEN ${sfx("w", "'s")} THEN ${drop("w", 2)}
       |             WHEN ${sfx("w", "'")} THEN ${drop("w", 1)}
       |             ELSE w END AS wz
       |      FROM ${p}d) z0) z1),
       |${p}f AS ( -- step 1b
       |  SELECT $carry, w0, exc, fin, fin1w, r1, r2,
       |    CASE
       |      WHEN fin OR fin1w IS NOT NULL THEN w1
       |      WHEN ${sfx("w1", "eedly")} THEN
       |        CASE WHEN length(w1) - 5 >= r1 THEN ${drop("w1", 5)} || 'ee' ELSE w1 END
       |      WHEN ${sfx("w1", "ingly")} OR ${sfx("w1", "edly")} THEN
       |        CASE WHEN NOT regexp_matches(st, '[aeiouy]') THEN w1
       |             WHEN ${sfx("st", "at")} OR ${sfx("st", "bl")} OR ${sfx("st", "iz")}
       |               THEN st || 'e'
       |             WHEN substr(st, length(st) - 1, 2) IN ($dbl) THEN ${drop("st", 1)}
       |             WHEN ${shortSyl("st")} AND r1 >= length(st) THEN st || 'e'
       |             ELSE st END
       |      WHEN ${sfx("w1", "eed")} THEN
       |        CASE WHEN length(w1) - 3 >= r1 THEN ${drop("w1", 3)} || 'ee' ELSE w1 END
       |      WHEN ${sfx("w1", "ing")} OR ${sfx("w1", "ed")} THEN
       |        CASE WHEN NOT regexp_matches(st, '[aeiouy]') THEN w1
       |             WHEN ${sfx("st", "at")} OR ${sfx("st", "bl")} OR ${sfx("st", "iz")}
       |               THEN st || 'e'
       |             WHEN substr(st, length(st) - 1, 2) IN ($dbl) THEN ${drop("st", 1)}
       |             WHEN ${shortSyl("st")} AND r1 >= length(st) THEN st || 'e'
       |             ELSE st END
       |      ELSE w1 END AS w2
       |  FROM (
       |    SELECT *,
       |      CASE WHEN ${sfx("w1", "ingly")} OR ${sfx("w1", "edly")} THEN
       |             CASE WHEN ${sfx("w1", "ingly")} THEN ${drop("w1", 5)}
       |                  ELSE ${drop("w1", 4)} END
       |           WHEN ${sfx("w1", "ing")} THEN ${drop("w1", 3)}
       |           WHEN ${sfx("w1", "ed")} THEN ${drop("w1", 2)}
       |           ELSE w1 END AS st
       |    FROM ${p}e) z2),
       |${p}g AS ( -- step 1c
       |  SELECT $carry, w0, exc, fin, fin1w, r1, r2,
       |    CASE WHEN fin OR fin1w IS NOT NULL THEN w2
       |         WHEN length(w2) > 2 AND (${sfx("w2", "y")} OR ${sfx("w2", "Y")})
       |              AND NOT regexp_matches(substr(w2, length(w2) - 1, 1), '[aeiouy]')
       |           THEN ${drop("w2", 1)} || 'i'
       |         ELSE w2 END AS w4
       |  FROM ${p}f),
       |${p}h AS ( -- step 2
       |  SELECT $carry, w0, exc, fin, fin1w, r1, r2,
       |    CASE WHEN fin OR fin1w IS NOT NULL THEN w4 ELSE
       |      ${among("w4", step2Arms)} END AS w5
       |  FROM ${p}g),
       |${p}i AS ( -- step 3
       |  SELECT $carry, w0, exc, fin, fin1w, r1, r2,
       |    CASE WHEN fin OR fin1w IS NOT NULL THEN w5 ELSE
       |      ${among("w5", step3Arms)} END AS w6
       |  FROM ${p}h),
       |${p}j AS ( -- step 4
       |  SELECT $carry, w0, exc, fin, fin1w, r1, r2,
       |    CASE WHEN fin OR fin1w IS NOT NULL THEN w6 ELSE
       |      CASE $step4Cases
       |        ELSE w6 END END AS w7
       |  FROM ${p}i),
       |${p}k AS ( -- step 5
       |  SELECT $carry, w0, exc, fin, fin1w, r1, r2,
       |    CASE WHEN fin OR fin1w IS NOT NULL THEN w7
       |         WHEN ${sfx("w7", "e")} AND (length(w7) - 1 >= r2
       |              OR (length(w7) - 1 >= r1
       |                  AND NOT ${shortSyl(drop("w7", 1))}))
       |           THEN ${drop("w7", 1)}
       |         WHEN ${sfx("w7", "l")} AND length(w7) - 1 >= r2
       |              AND substr(w7, length(w7) - 1, 1) = 'l'
       |           THEN ${drop("w7", 1)}
       |         ELSE w7 END AS w8
       |  FROM ${p}j),
       |${p}out AS (
       |  SELECT $carry,
       |    CASE WHEN exc IS NOT NULL THEN exc
       |         WHEN fin THEN w0
       |         WHEN fin1w IS NOT NULL THEN replace(fin1w, 'Y', 'y')
       |         ELSE replace(w8, 'Y', 'y') END AS tok
       |  FROM ${p}k)""".stripMargin
  }
}

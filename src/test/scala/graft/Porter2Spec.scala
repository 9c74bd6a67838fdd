package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Porter2, TextFns}

/** The full Snowball English stemmer (english_porter analyzer arm).
  * Vectors are hand-derived from the published algorithm
  * (snowballstem.org/algorithms/english/stemmer.html) step by step; the
  * DuckDB CTE spelling is cross-validated against this Scala spelling
  * over the ENTIRE corpus vocabulary by scripts/check_porter_parity.py
  * (hash-green q288 is the graded form of that parity). */
class Porter2Spec extends AnyFunSuite {

  test("derivational suffixes: the forms the minimal stemmer can never merge") {
    assert(Porter2.stem("relational") == "relat")
    assert(Porter2.stem("relate") == "relat")
    assert(Porter2.stem("conditional") == "condit")
    assert(Porter2.stem("condition") == "condit")
    assert(Porter2.stem("rational") == "ration")
    assert(Porter2.stem("generously") == "generous")
    assert(Porter2.stem("generous") == "generous")
    assert(Porter2.stem("generate") == "generat")
    assert(Porter2.stem("beautiful") == "beauti")
    assert(Porter2.stem("beautifully") == "beauti")
    // the minimal stemmer provably diverges on these
    assert(TextFns.minEnglishStem("relational") == "relational")
    assert(TextFns.minEnglishStem("relate") == "relate")
    assert(TextFns.minEnglishStem("generously") == "generously")
  }

  test("step 1a/1b/1c mechanics") {
    assert(Porter2.stem("flies") == "fli")     // ies after >1 letter -> i
    assert(Porter2.stem("dies") == "die")      // ies after 1 letter -> ie
    assert(Porter2.stem("gaps") == "gap")      // s with earlier vowel
    assert(Porter2.stem("gas") == "gas")       // vowel only right before s
    assert(Porter2.stem("this") == "this")
    assert(Porter2.stem("agreed") == "agre")   // eed in R1 -> ee; step5 drops e
    assert(Porter2.stem("feed") == "feed")     // eed before R1
    assert(Porter2.stem("hopping") == "hop")   // undouble pp
    assert(Porter2.stem("hoping") == "hope")   // short word -> +e
    assert(Porter2.stem("cry") == "cri")       // y after consonant -> i
    assert(Porter2.stem("say") == "say")       // y after vowel stays
    assert(Porter2.stem("tables") == "tabl")
    assert(Porter2.stem("queries") == "queri")
  }

  test("exceptional forms and invariants") {
    assert(Porter2.stem("dying") == "die")
    assert(Porter2.stem("skies") == "sky")
    assert(Porter2.stem("news") == "news")
    assert(Porter2.stem("sky") == "sky")
    assert(Porter2.stem("exceed") == "exceed")
    assert(Porter2.stem("inning") == "inning")
    // length <= 2 untouched; null safe; leading apostrophe stripped
    assert(Porter2.stem("by") == "by")
    assert(Porter2.stem("a") == "a")
    assert(Porter2.stem(null) == null)
    assert(Porter2.stem("'cause") == "caus")
  }

  test("analyzer wiring: english_porter runs stoplist then stem on the query side") {
    val out = Engine.analyzeQueryTerms(
      Seq("the", "relate", "tables", "generously"), "english_porter")
    assert(out == Seq("relat", "tabl", "generous"))
    // and composes with the length filter (len LAST, on the stemmed form)
    val out2 = Engine.analyzeQueryTerms(
      Seq("the", "relate", "ties"), "english_porter|len:5:24")
    assert(out2 == Seq("relat"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MilvusExpr

/** The Milvus-expr → Spark SQL translator behind [[Engine.retrieve]]
  * (vdb.py:218-223 passes raw Milvus expr strings). Pure-function tests
  * here; the end-to-end round trip lives in EngineSpec. */
class MilvusExprSpec extends AnyFunSuite {

  private val cols = Set("doc_id", "text", "lang", "n_chars", "meta")

  private def tr(e: String, dyn: Option[String] = None): String =
    MilvusExpr.toSparkSql(e, cols, dyn)

  test("comparisons: == becomes =, ordered comparisons pass through") {
    assert(tr("""lang == "en"""").replaceAll("\\s+", " ").trim == "lang = 'en'")
    assert(tr("n_chars >= 400").contains(">="))
    assert(tr("n_chars != 7").contains("!="))
  }

  test("boolean spellings: && / || translate; and/or/not pass through") {
    val s = tr("""lang == "en" && n_chars > 4 || not (lang == "de")""")
      .replaceAll("\\s+", " ")
    assert(s == "lang = 'en' and n_chars > 4 or not (lang = 'de')")
  }

  test("in-lists: brackets become parens; strings re-quote") {
    val s = tr("""lang in ["en", "de"]""").replaceAll("\\s+", " ")
    assert(s == "lang in ( 'en', 'de' )".replaceAll("\\s+", " ")
      || s == "lang in ('en', 'de')")
  }

  test("operator characters inside string literals are never rewritten") {
    val s = tr("""text like "a==b&&c[%" """).trim
    assert(s.endsWith("'a==b&&c[%'"))
    assert(s.startsWith("text like"))
  }

  test("single-quoted literals work; embedded double quote survives") {
    assert(tr("""lang == 'a"b'""").replaceAll("\\s+", " ").trim
      == """lang = 'a"b'""")
  }

  test("JSON path access becomes get_json_object") {
    val s = tr("""meta["lang"] == "en"""").replaceAll("\\s+", " ")
    assert(s == "get_json_object(`meta`, '$.lang') = 'en'")
  }

  test("dynamic fields: unknown identifiers route through the $meta column") {
    val s = tr("""source == "src3" && lang == "en"""", Some("$meta"))
      .replaceAll("\\s+", " ")
    assert(s == "get_json_object(`$meta`, '$.source') = 'src3' and lang = 'en'")
  }

  test("keywords and known columns are not treated as dynamic fields") {
    val s = tr("""lang in ["en"] and true""", Some("$meta"))
    assert(!s.contains("$.lang") && !s.contains("$.and") && !s.contains("$.true"))
  }

  test("array operators rewrite to Spark array functions") {
    val c = cols + "tags"
    val s1 = MilvusExpr.toSparkSql("""array_contains(tags, "data")""", c)
      .replaceAll("\\s+", " ")
    assert(s1 == "array_contains(`tags`, 'data')")
    val s2 = MilvusExpr.toSparkSql("""array_contains_all(tags, ["a", "b"])""", c)
      .replaceAll("\\s+", " ")
    assert(s2 == "size(array_except(array('a', 'b'), `tags`)) = 0")
    val s3 = MilvusExpr.toSparkSql("""array_contains_any(tags, [1, 2])""", c)
      .replaceAll("\\s+", " ")
    assert(s3 == "arrays_overlap(`tags`, array(1, 2))")
    val s4 = MilvusExpr.toSparkSql("array_length(tags) >= 12", c)
      .replaceAll("\\s+", " ")
    assert(s4 == "size(`tags`) >= 12")
  }

  test("array operators compose with boolean spellings and not") {
    val c = cols + "tags"
    val s = MilvusExpr.toSparkSql(
      """array_contains(tags, "x") && not array_contains(tags, "y") || array_length(tags) < 9""", c)
      .replaceAll("\\s+", " ")
    assert(s == "array_contains(`tags`, 'x') and not array_contains(`tags`, 'y') " +
      "or size(`tags`) < 9")
  }

  test("json_contains materializes the JSON array; element type from the probe") {
    // over a json path access
    val s1 = MilvusExpr.toSparkSql("""json_contains(meta["tags"], "en")""", cols)
      .replaceAll("\\s+", " ")
    assert(s1 == "array_contains(from_json(get_json_object(`meta`, '$.tags'), " +
      "'array<string>'), 'en')")
    // numeric probe → double elements (JSON numbers are doubles: a stored
    // [5.0] must match an integer probe 5; Spark coerces the probe)
    val s2 = MilvusExpr.toSparkSql("""json_contains(meta["ids"], 7)""", cols)
    assert(s2.contains("'array<double>'") && s2.contains(", 7)"))
    // over a dynamic field: the identifier routes through $meta first
    val s3 = MilvusExpr.toSparkSql("""json_contains(tags, "en")""", cols, Some("$meta"))
      .replaceAll("\\s+", " ")
    assert(s3 == "array_contains(from_json(get_json_object(`$meta`, '$.tags'), " +
      "'array<string>'), 'en')")
    val s4 = MilvusExpr.toSparkSql("""json_contains_all(meta["tags"], ["a","b"])""", cols)
    assert(s4.contains("array_except(array('a', 'b')".replaceAll("\\s+", " "))
      || s4.contains("array_except(array('a','b')"))
    val s5 = MilvusExpr.toSparkSql("""json_contains_any(meta["tags"], ["a"])""", cols)
    assert(s5.contains("arrays_overlap(from_json("))
  }

  test("TEXT_MATCH rewrites to arrays_overlap over the field tokenization") {
    val s1 = tr("""TEXT_MATCH(text, "Dup  merge") && n_chars > 300""")
      .replaceAll("\\s+", " ")
    assert(s1 == """arrays_overlap(split(trim(lower(`text`)), '\\s+'), """ +
      "array('dup', 'merge')) and n_chars > 300")
    intercept[IllegalArgumentException](tr("""text_match(text, "  ")"""))
  }

  test("exists becomes IS NOT NULL over the json access") {
    val s1 = MilvusExpr.toSparkSql("""exists meta["opt"]""", cols)
      .replaceAll("\\s+", " ")
    assert(s1 == "get_json_object(`meta`, '$.opt') IS NOT NULL")
    val s2 = MilvusExpr.toSparkSql("""not exists opt && lang == "en"""", cols, Some("$meta"))
      .replaceAll("\\s+", " ")
    assert(s2 == "not get_json_object(`$meta`, '$.opt') IS NOT NULL and lang = 'en'")
  }

  test("** power operator rewrites to power(); dynamic base routes through $meta") {
    val s1 = tr("n_chars ** 2 > 100000").replaceAll("\\s+", " ")
    assert(s1 == "power(`n_chars`, 2) > 100000")
    val s2 = MilvusExpr.toSparkSql("score ** 2 < 0.5", cols, Some("$meta"))
      .replaceAll("\\s+", " ")
    assert(s2 == "power(get_json_object(`$meta`, '$.score'), 2) < 0.5")
    val s3 = MilvusExpr.toSparkSql("""meta["score"] ** 2 < 0.5""", cols)
      .replaceAll("\\s+", " ")
    assert(s3 == "power(get_json_object(`meta`, '$.score'), 2) < 0.5")
  }

  test("arithmetic operators and like-over-json pass through as valid SQL") {
    // Milvus exprs allow + - * / % in predicates; Spark SQL spells them
    // identically, so they flow through the translator untouched
    val s1 = tr("n_chars % 2 == 0 && n_chars + 10 > 400").replaceAll("\\s+", " ")
    assert(s1 == "n_chars % 2 = 0 and n_chars + 10 > 400")
    val s2 = tr("""meta["k"] like "pre%"""").replaceAll("\\s+", " ")
    assert(s2 == "get_json_object(`meta`, '$.k') like 'pre%'")
  }

  test("edge spellings: uppercase EXISTS, negative probes, not-in lists") {
    val s1 = tr("""EXISTS meta["opt"]""").replaceAll("\\s+", " ")
    assert(s1 == "get_json_object(`meta`, '$.opt') IS NOT NULL")
    val s2 = MilvusExpr.toSparkSql("array_contains(tags, -7)", cols + "tags")
      .replaceAll("\\s+", " ")
    assert(s2 == "array_contains(`tags`, -7)")
    val s3 = tr("""lang not in ["en", "de"]""").replaceAll("\\s+", " ")
    assert(s3.contains("not in") && s3.contains("'en'") && s3.contains("'de'")
      && !s3.contains("["), s3)
    // a json probe with a decimal value types the array as double
    val s4 = MilvusExpr.toSparkSql("""json_contains(meta["xs"], 1.5)""", cols)
    assert(s4.contains("'array<double>'") && s4.contains(", 1.5)"))
  }

  test("chained comparisons split into a parenthesized conjunction") {
    val s1 = tr("100 <= n_chars < 200").replaceAll("\\s+", " ")
    assert(s1 == "(100 <= n_chars and n_chars < 200)")
    val s2 = tr("200 > n_chars >= 100").replaceAll("\\s+", " ")
    assert(s2 == "(200 > n_chars and n_chars >= 100)")
    // over a json path: the placeholder restores at BOTH occurrences
    val s3 = tr("""10 <= meta["stars"] < 20""").replaceAll("\\s+", " ")
    assert(s3 == "(10 <= get_json_object(`meta`, '$.stars') and " +
      "get_json_object(`meta`, '$.stars') < 20)")
    // the full n-ary chain rewrites in one pass
    val s4 = tr("1 < n_chars < n_tok < 9").replaceAll("\\s+", " ")
    assert(s4 == "(1 < n_chars and n_chars < n_tok and n_tok < 9)")
    // mixed directions never chain
    val s5 = tr("n_chars > 5 && n_tok < 9").replaceAll("\\s+", " ")
    assert(s5 == "n_chars > 5 and n_tok < 9")
  }

  test("not binds below the whole chain (Milvus precedence), not the first arm") {
    val s = tr("not 100 <= n_chars < 200").replaceAll("\\s+", " ")
    assert(s == "not (100 <= n_chars and n_chars < 200)")
    // and the same under a boolean composition
    val s2 = tr("""lang == "en" and not 1 < n_chars < 9""").replaceAll("\\s+", " ")
    assert(s2 == "lang = 'en' and not (1 < n_chars and n_chars < 9)")
  }

  test("a power-operand chain works: power() protects first, then chains") {
    val s = tr("1 < n_chars ** 2 < 900").replaceAll("\\s+", " ")
    assert(s == "(1 < power(`n_chars`, 2) and power(`n_chars`, 2) < 900)", s)
  }

  test("a chained comparison with an arithmetic middle operand fails loudly") {
    val e = intercept[IllegalArgumentException](tr("10 <= n_chars + 1 < 20"))
    assert(e.getMessage.contains("chained comparison"), e.getMessage)
    // parenthesizing the arithmetic clears the ambiguity: two plain arms
    val ok = tr("(10 <= n_chars + 1) and (n_chars + 1 < 20)")
    assert(ok.contains("and"))
    // two independent comparisons joined by && are NOT a residual chain
    assert(tr("n_chars >= 1 && n_chars <= 9").contains("and"))
  }

  test("a chained comparison with an arithmetic EDGE operand fails loudly") {
    // leading arithmetic: OPND would bind the bare literal and splice a
    // boolean into the subtraction — must throw at the translator, not
    // leak Spark's numeric-vs-boolean analyzer error
    for (e <- Seq("n_chars - 5 < doc_id < 10", "n_chars + 1 < doc_id < 10",
      "n_chars -5 < doc_id < 10", "5 < doc_id < 10 + 1",
      "5 < doc_id < 10 * 2")) {
      val ex = intercept[IllegalArgumentException](tr(e))
      assert(ex.getMessage.contains("chained comparison"), s"$e → ${ex.getMessage}")
    }
    // a NEGATIVE head literal with no abutting term is a plain chain
    val ok = tr("-5 < n_chars < 10").replaceAll("\\s+", " ")
    assert(ok == "(-5 < n_chars and n_chars < 10)", ok)
    // splitting the range (the error's advice) translates fine
    assert(tr("(n_chars - 5 < doc_id) and (doc_id < 10)").contains("and"))
  }

  test("comparisons on both sides of an (in)equality are NOT a chain") {
    // ==/!= rewrite to SQL only after the residual-chain check — the sep
    // regex must still treat them as connectives
    val s1 = tr("n_chars < 100 == doc_id < 10").replaceAll("\\s+", " ")
    assert(s1 == "n_chars < 100 = doc_id < 10", s1)
    val s2 = tr("n_chars < 100 != doc_id < 10").replaceAll("\\s+", " ")
    assert(s2 == "n_chars < 100 != doc_id < 10", s2)
  }

  test("nested powers: parenthesized forms translate, bare chains throw") {
    val s1 = tr("(n_chars ** 2) ** 3 > 1").replaceAll("\\s+", " ")
    assert(s1 == "(power(`n_chars`, 2)) ** 3 > 1".replaceAll("\\s+", " ")
      || s1 == "power((power(`n_chars`, 2)), 3) > 1", s1)
    val s2 = tr("n_chars ** (2 ** 3) > 1").replaceAll("\\s+", " ")
    assert(s2 == "power(`n_chars`, (power(2, 3))) > 1", s2)
    // a bare double power is ambiguous — translator-level rejection, not
    // a raw ** leaking into Spark's parser
    val ex = intercept[IllegalArgumentException](tr("n_chars ** 2 ** 3 > 1"))
    assert(ex.getMessage.contains("power"), ex.getMessage)
    // multiplication around a power still flows through
    val s3 = tr("n_chars ** 2 * 3 > 1").replaceAll("\\s+", " ")
    assert(s3 == "power(`n_chars`, 2) * 3 > 1", s3)
    val s4 = tr("3 * n_chars ** 2 > 1").replaceAll("\\s+", " ")
    assert(s4 == "3 * power(`n_chars`, 2) > 1", s4)
  }

  test("IS NULL / IS NOT NULL / not like pass through, incl. dynamic + json") {
    val s1 = tr("lang is null").replaceAll("\\s+", " ")
    assert(s1 == "lang is null")
    val s2 = tr("""meta["opt"] IS NOT NULL""").replaceAll("\\s+", " ")
    assert(s2 == "get_json_object(`meta`, '$.opt') IS NOT NULL")
    val s3 = tr("stars is null", Some("$meta")).replaceAll("\\s+", " ")
    assert(s3 == "get_json_object(`$meta`, '$.stars') is null")
    val s4 = tr("""text not like "spam%"""").replaceAll("\\s+", " ")
    assert(s4 == "text not like 'spam%'")
  }

  test("between passes through; boolean json probes type as array<boolean>") {
    val s1 = tr("n_chars between 300 and 600").replaceAll("\\s+", " ")
    assert(s1 == "n_chars between 300 and 600")
    val s2 = MilvusExpr.toSparkSql("""json_contains(meta["flags"], true)""", cols)
    assert(s2.contains("'array<boolean>'") && s2.contains(", true)"), s2)
  }

  test("TEXT_MATCH is analyzer-aware on both sides") {
    // english: stopword query terms drop; field tokens stop-filter in SQL
    val s1 = MilvusExpr.toSparkSql(
      """TEXT_MATCH(text, "the tables")""", cols, None, "english")
    assert(s1.trim.endsWith("array('tables'))"), s1) // 'the' dropped
    assert(s1.contains("filter(split(trim(lower(`text`))") && s1.contains("NOT IN"), s1)
    // english_stem: the query term stems AND the field tokens stem
    val s2 = MilvusExpr.toSparkSql(
      """TEXT_MATCH(text, "tables")""", cols, None, "english_stem")
    assert(s2.contains("array('table')"), s2)
    assert(s2.contains("transform(filter("), s2)
    // the length filter drops short terms and wraps the doc tokenization
    val s3 = MilvusExpr.toSparkSql(
      """TEXT_MATCH(text, "dup tables")""", cols, None, "english|len:4:24")
    assert(s3.trim.endsWith("array('tables'))"), s3) // 'dup' (3) dropped
    assert(s3.contains("length(__t) >= 4 AND length(__t) <= 24"), s3)
    // all terms removed by the analyzer fails loudly
    intercept[IllegalArgumentException](MilvusExpr.toSparkSql(
      """TEXT_MATCH(text, "the and of")""", cols, None, "english"))
    // unknown analyzers fail loudly
    intercept[IllegalArgumentException](MilvusExpr.toSparkSql(
      """TEXT_MATCH(text, "x")""", cols, None, "nosuch"))
    intercept[IllegalArgumentException](MilvusExpr.toSparkSql(
      """TEXT_MATCH(text, "x")""", cols, None, "english|len:9:2"))
  }

  test("empty expression rejects") {
    intercept[IllegalArgumentException](tr("   "))
  }

  test("unterminated literal rejects") {
    intercept[IllegalArgumentException](tr("""lang == "en"""))
  }
}

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

  test("empty expression rejects") {
    intercept[IllegalArgumentException](tr("   "))
  }

  test("unterminated literal rejects") {
    intercept[IllegalArgumentException](tr("""lang == "en"""))
  }
}

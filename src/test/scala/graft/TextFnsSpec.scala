package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Scalar text-function semantics (parity with crawler/utils.py:5-36). */
class TextFnsSpec extends SparkSpec {

  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(1).toDF("x").select(c).collect().head

  test("cleanText strips control chars and collapses whitespace") {
    val got = one(TextFns.cleanText(lit("  ab\n\nc\t d  "))).getString(0)
    assert(got == "a b c d")
  }

  test("minEnglishStem: Lucene EnglishMinimalStemmer semantics, both spellings") {
    val cases = Seq(
      "tables" -> "table",   // plain plural
      "queries" -> "query",  // ies → y
      "merges" -> "merge",   // consonant + es → strip s
      "glass" -> "glass",    // ss keeps
      "virus" -> "virus",    // us keeps
      "goes" -> "goes",      // oes keeps
      "dies" -> "dy",        // Lucene's documented 4-char ies rewrite
      "ies" -> "ies",        // too short for the rewrite; ies keeps
      "as" -> "as",          // len < 3
      "rows" -> "row")
    cases.foreach { case (in, want) =>
      assert(TextFns.minEnglishStem(in) == want, s"string spelling: $in")
      val got = one(TextFns.minEnglishStem(lit(in))).getString(0)
      assert(got == want, s"column spelling: $in -> $got")
    }
  }

  test("cleanText of empty/whitespace is empty") {
    assert(one(TextFns.cleanText(lit("  \n\t "))).getString(0) == "")
  }

  test("joinContent appends periods and joins (utils.py:21-36)") {
    val got = one(TextFns.joinContent(array(lit("hello"), lit("world!"), lit("x \n y"))))
      .getString(0)
    assert(got == "hello. world! x y.")
  }

  test("chunk id round-trip (F5: vdb.py:70 / vdb.py:188-190)") {
    val df = Seq(("doc9", 3)).toDF("idx", "pos")
    val got = df.select(
        TextFns.parentId(TextFns.chunkId(col("idx"), col("pos"))).as("p"))
      .collect().head.getString(0)
    assert(got == "doc9")
  }

  test("tokenCount and punctCount") {
    assert(one(TextFns.tokenCount(lit("a b  c"))).getInt(0) == 3)
    assert(one(TextFns.tokenCount(lit(""))).getInt(0) == 0)
    assert(one(TextFns.punctCount(lit("a, b. c!"))).getInt(0) == 3)
  }

  test("langId heuristic picks stopword-dominant language and CJK") {
    assert(one(TextFns.langId(lit("der hund und die katze ist nicht das"))).getString(0) == "de")
    assert(one(TextFns.langId(lit("el perro y la casa que es un"))).getString(0) == "es")
    assert(one(TextFns.langId(lit("the cat and the dog of a house"))).getString(0) == "en")
    assert(one(TextFns.langId(lit("数据集搜索引擎"))).getString(0) == "zh")
  }

  test("qualityScore is in [0,1] on real docs") {
    val q = spark.read.parquet(s"$sf/documents.parquet")
      .select(TextFns.qualityScore(col("text")).as("q")).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("fingerprint: deterministic, order-sensitive") {
    val a = one(TextFns.fingerprint(lit("alpha beta gamma"))).getLong(0)
    val b = one(TextFns.fingerprint(lit("alpha beta gamma"))).getLong(0)
    val c = one(TextFns.fingerprint(lit("gamma beta alpha"))).getLong(0)
    assert(a == b)
    assert(a != c)
  }

  test("htmlToMarkdown: headings, lists, links, emphasis, entities, script-drop (F6)") {
    val html = "<html><body><h1>Title</h1><p>Hello <b>bold</b> &amp; " +
      "<i>italic</i></p><ul><li><a href=\"https://x.y/z\">link</a></li>" +
      "<li>plain</li></ul><script>var a = 1;\nvar b = 2;</script></body></html>"
    val md = one(TextFns.htmlToMarkdown(lit(html))).getString(0)
    assert(md.startsWith("# Title"))
    assert(md.contains("**bold** & *italic*"))
    assert(md.contains("- [link](https://x.y/z)"))
    assert(md.contains("- plain"))
    assert(!md.contains("var a"), "script content must be dropped")
    assert(!md.contains("<"), "no tags survive")
  }

  test("htmlToMarkdown: tables become | -separated markdown rows (F6)") {
    // the shape trafilatura's markdown output preserves from real pages
    val html = "<table><thead><tr><th>name</th><th>count</th></tr></thead>" +
      "<tbody><tr><td>alpha</td>\n<td>3</td></tr>" +
      "<tr><td>beta</td><td>7</td></tr></tbody></table>"
    val md = one(TextFns.htmlToMarkdown(lit(html))).getString(0)
    assert(md.contains("| name | count |"), md)
    assert(md.contains("| alpha | 3 |"), md)
    assert(md.contains("| beta | 7 |"), md)
    // rows land on separate lines, scaffolding tags vanish
    assert(md.linesIterator.count(_.startsWith("|")) == 3, md)
    assert(!md.contains("<"), md)
  }

  test("htmlToMarkdown: nested lists keep every item; list boundaries break lines (F6)") {
    val html = "<ul><li>top one<ul><li>sub a</li><li>sub b</li></ul></li>" +
      "<li>top two</li></ul>"
    val md = one(TextFns.htmlToMarkdown(lit(html))).getString(0)
    val items = md.linesIterator.filter(_.startsWith("- ")).toSeq
    assert(items == Seq("- top one", "- sub a", "- sub b", "- top two"), md)
  }

  test("phraseHits counts overlapping token-adjacent occurrences per doc") {
    import graft.operators.InvertedIndex
    val docs = Seq(
      (1L, "a b a b a"),   // "a b" twice, "b a" twice
      (2L, "a a a"),       // "a a" twice (overlapping)
      (3L, "b b"),         // no "a b"
      (4L, "a b")          // once
    ).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      posexplode(graft.functions.TextFns.tokens(col("text"))).as(Seq("pos", "tok")))
    def hits(p: String*): Map[Long, Long] =
      InvertedIndex.phraseHits(toks, "doc_id", p)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits("a", "b") == Map(1L -> 2L, 4L -> 1L))
    assert(hits("a", "a") == Map(2L -> 2L))
    assert(hits("a", "b", "a") == Map(1L -> 2L))
  }

  test("htmlToMarkdown: single-quoted hrefs, blockquote, code, comments, entities (F6)") {
    val html = "<!-- nav --><blockquote>wise words</blockquote>" +
      "<p>see <a href='http://a.b/c?d=1'>the docs</a> and " +
      "<code>spark.read</code> &#39;quoted&#39; &gt;</p>"
    val md = one(TextFns.htmlToMarkdown(lit(html))).getString(0)
    assert(!md.contains("nav"), md)
    assert(md.contains("> wise words"), md)
    assert(md.contains("[the docs](http://a.b/c?d=1)"), md)
    assert(md.contains("`spark.read`"), md)
    assert(md.contains("'quoted' >"), md)
  }
}

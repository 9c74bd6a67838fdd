package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text/scalar function library (SURVEY.md §2.8 F1–F10 and §2.7 chunker).
 *
 * Everything here is a composition of built-in `org.apache.spark.sql.functions`
 * — no UDFs — so the whole library stays inside whole-stage codegen and every
 * function has a portable ANSI-SQL spelling for the DuckDB oracle.
 *
 * Reference semantics being re-expressed (cited, not copied):
 *  - clean_text / join_content: reference `src/coldata/crawler/utils.py:5-36`
 *  - sha256 identity:           reference `src/coldata/crawler/uci.py:51`
 *  - chunker (size/overlap):    reference `src/coldata/vdb/vdb.py:41-43,66-74`
 *  - chunk id make/split:       reference `src/coldata/vdb/vdb.py:70,188-190`
 */
object TextFns {

  // ---------------------------------------------------------------- F1 clean
  /** Strip control chars, collapse whitespace runs to one space, trim.
    * Mirrors `clean_text` (reference crawler/utils.py:5-18). Pattern kept to
    * explicit byte classes so Java regex (Spark) and RE2 (DuckDB) agree. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(text, "[\\x00-\\x1F\\x7F]", " "), "\\s+", " "))

  /** DuckDB spelling of [[cleanText]] for oracle SQL. */
  def cleanTextSql(col: String): String =
    s"trim(regexp_replace(regexp_replace($col, '[\\x00-\\x1F\\x7F]', ' ', 'g'), '\\s+', ' ', 'g'))"

  // ------------------------------------------------------------ F2 join_content
  /** Clean each fragment, then join with a single space — reproducing
    * `join_content` (reference crawler/utils.py:21-36) exactly: only a
    * MULTI-fragment list gets the add-punctuation + drop-empties treatment
    * (`if len(content_list) > 1`); a single fragment passes through
    * untouched beyond cleaning. Terminal punctuation = ASCII
    * `string.punctuation`, which is what both Java's `\p{Punct}` and RE2's
    * `[[:punct:]]` denote. */
  def joinContent(fragments: Column): Column = {
    val cleaned = transform(fragments, s => cleanText(s))
    val punctuated = transform(
      filter(cleaned, c => length(c) > 0),
      c => when(c.rlike("[\\p{Punct}]$"), c).otherwise(concat(c, lit("."))))
    concat_ws(" ", when(size(cleaned) > 1, punctuated).otherwise(cleaned))
  }

  /** DuckDB spelling of [[joinContent]] over a list-typed SQL expression. */
  def joinContentSql(listExpr: String): String = {
    val cleaned = s"list_transform($listExpr, s -> ${cleanTextSql("s")})"
    s"""(CASE WHEN len($cleaned) > 1
       | THEN array_to_string(list_transform(list_filter($cleaned, x -> length(x) > 0),
       |   x -> CASE WHEN regexp_matches(x, '[[:punct:]]$$') THEN x ELSE x || '.' END), ' ')
       | ELSE array_to_string($cleaned, ' ') END)""".stripMargin.replace("\n", " ")
  }

  // ---------------------------------------------------------------- F3 sha id
  /** sha256-hex identity of a URL/string (reference uci.py:51, crawler.py:40). */
  def sha256Id(c: Column): Column = sha2(c, 256)

  // ---------------------------------------------------------------- F5 chunk id
  /** chunk id `{parent}_{pos}` (reference vdb.py:70). */
  def chunkId(parent: Column, pos: Column): Column = concat_ws("_", parent, pos)

  /** Recover parent id from a chunk id (reference vdb.py:188-190). */
  def parentId(chunkId: Column): Column = substring_index(chunkId, "_", 1)

  // ---------------------------------------------------------------- chunker
  /**
   * Overlapping character chunker (reference vdb.py:41-43: chunk_size /
   * chunk_overlap / add_start_index). Deterministic sliding window:
   * stride = size - overlap; chunk i covers [i*stride, i*stride + size);
   * nChunks = max(ceil((len - overlap) / stride), 1); empty text -> no chunks.
   *
   * Pure built-ins (`sequence` + `transform` + `substr`) so it is codegen'd
   * and exactly reproducible in DuckDB via generate_series + substring.
   */
  def chunk(text: Column, size: Int, overlap: Int): Column = {
    require(size > 0 && overlap >= 0 && overlap < size, s"bad chunk params ($size,$overlap)")
    val stride = size - overlap
    val len = length(text)
    val n = greatest(
      (floor((len - lit(overlap) - 1).cast(DoubleType) / lit(stride)) + 1).cast(IntegerType),
      lit(1))
    when(text.isNull || len === 0, array().cast(ArrayType(StringType)))
      .otherwise(transform(sequence(lit(0), n - 1),
        i => text.substr(i * stride + 1, lit(size))))
  }

  /** Scala mirror of [[chunk]] for unit/property tests. */
  def chunkText(text: String, size: Int, overlap: Int): Seq[String] = {
    require(size > 0 && overlap >= 0 && overlap < size)
    if (text == null || text.isEmpty) Seq.empty
    else {
      val stride = size - overlap
      val n = math.max((math.floor((text.length - overlap - 1).toDouble / stride) + 1).toInt, 1)
      (0 until n).map(i => text.substring(i * stride, math.min(i * stride + size, text.length)))
    }
  }

  // ---------------------------------------------------------------- tokens
  /** Whitespace tokens of cleaned text; empty text -> empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  // ------------------------------------------------------- minimal stemmer
  /**
   * Minimal English plural stemmer — Lucene's `EnglishMinimalStemmer`
   * semantics (the `english_stem` analyzer arm): strip a trailing plural
   * `s` unless preceded by `u`/`s`; rewrite `Xies` → `Xy` (unless the
   * stem would end in `a`/`e`); keep `ies/aes/oes/ees` short forms.
   * Pure built-ins (CASE over substrings) so it codegens and replays in
   * DuckDB via [[minEnglishStemSql]]. Apply AFTER stopword filtering —
   * Lucene's filter order.
   */
  def minEnglishStem(t: Column): Column = {
    val n = length(t)
    when(n < 3 || t.substr(n, lit(1)) =!= "s", t)
      .when(t.substr(n - 1, lit(2)).isin("us", "ss"), t)
      .when(n > 3 && t.substr(n - 2, lit(3)) === "ies" &&
        !t.substr(n - 3, lit(1)).isin("a", "e"),
        concat(t.substr(lit(1), n - 3), lit("y")))
      .when(t.substr(n - 1, lit(2)) === "es" &&
        t.substr(n - 2, lit(1)).isin("i", "a", "o", "e"), t)
      .otherwise(t.substr(lit(1), n - 1))
  }

  /** Driver-side spelling of [[minEnglishStem]] (query-term analysis). */
  def minEnglishStem(t: String): String = {
    val n = t.length
    if (n < 3 || t.last != 's') t
    else if (t.endsWith("us") || t.endsWith("ss")) t
    else if (n > 3 && t.endsWith("ies") && t(n - 4) != 'a' && t(n - 4) != 'e')
      t.substring(0, n - 3) + "y"
    else if (t.endsWith("es") && "iaoe".contains(t(n - 3))) t
    else t.substring(0, n - 1)
  }

  /** DuckDB spelling of [[minEnglishStem]] for oracle SQL. */
  def minEnglishStemSql(x: String): String =
    s"CASE WHEN length($x) < 3 OR substr($x, length($x), 1) <> 's' THEN $x" +
      s" WHEN substr($x, length($x)-1, 2) IN ('us', 'ss') THEN $x" +
      s" WHEN length($x) > 3 AND substr($x, length($x)-2, 3) = 'ies'" +
      s" AND substr($x, length($x)-3, 1) NOT IN ('a', 'e')" +
      s" THEN substr($x, 1, length($x)-3) || 'y'" +
      s" WHEN substr($x, length($x)-1, 2) = 'es'" +
      s" AND substr($x, length($x)-2, 1) IN ('i', 'a', 'o', 'e') THEN $x" +
      s" ELSE substr($x, 1, length($x)-1) END"

  /** Word n-gram shingles over whitespace tokens. Implemented as a Scala
    * UDF rather than transform/element_at expressions: higher-order
    * functions evaluate interpreted and re-split the text once per array
    * element (O(tokens·n) regex splits per document); the UDF splits once
    * and slides a window — ~10× faster on shingle-heavy corpora. */
  def shingles(text: Column, n: Int): Column = shinglesUdf(n)(text)

  private def shinglesUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { text: String =>
      if (text == null) Array.empty[String]
      else {
        val toks = text.trim.split("\\s+").filter(_.nonEmpty)
        if (toks.length < n) Array.empty[String]
        else Array.tabulate(toks.length - n + 1)(i => toks.slice(i, i + n).mkString(" "))
      }
    }

  // ---------------------------------------------------------------- analytics
  /** BPE-ish sub-word segmentation regex: letter runs, digit runs, and
    * single non-alphanumeric marks — the pre-tokenization split GPT-style
    * BPE vocabularies start from (CJK text degrades to one mark per
    * character, matching byte-level BPE behavior). Portable to DuckDB
    * (`regexp_extract_all`). */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token count under [[BpePattern]] — the "BPE-ish regex" counter of the
    * token-counting mandate; pairs with the whitespace [[tokenCount]]. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Count of punctuation chars, via the length-difference trick (portable —
    * DuckDB lacks regexp_count in 1.0). */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.!?,;:]", ""))

  private val enStop = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are English stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(filter(toks, t => t.isin(enStop: _*))).cast(DoubleType) /
        size(toks).cast(DoubleType))
  }

  /**
   * Heuristic document quality score in [0,1] — the text-analysis op mandated
   * by BASELINE.json (length saturation + punctuation sanity + stopword
   * presence), deterministic and oracle-portable.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast(DoubleType)
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    val punctRatio = when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast(DoubleType) / length(text).cast(DoubleType))
    val punctScore = greatest(lit(1.0) - punctRatio * 10.0, lit(0.0))
    val stopScore = least(stopwordRatio(text) * 4.0, lit(1.0))
    // floor(x*1e4 + 0.5)/1e4 instead of round(): the formula lands on exact
    // .00005 boundaries constantly, where Spark's BigDecimal.valueOf round
    // (shortest-decimal re-parse) and the oracle's raw-double round disagree
    floor((lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3) * 10000.0 + 0.5) / 10000.0
  }

  private val deStop = Seq("der", "die", "das", "und", "nicht", "ist", "ein")
  private val esStop = Seq("el", "la", "los", "las", "que", "y", "es", "un")
  private val frStop = Seq("le", "les", "et", "une", "est", "dans")

  /** n-gram/stopword language-ID heuristic (BASELINE.json text-analysis op):
    * CJK codepoints -> zh, else argmax stopword hits, default en. */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    def hits(ws: Seq[String]) = size(filter(toks, t => t.isin(ws: _*)))
    val (en, de, es, fr) = (hits(enStop), hits(deStop), hits(esStop), hits(frStop))
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .when(de > en && de >= es && de >= fr, lit("de"))
      .when(es > en && es > de && es >= fr, lit("es"))
      .when(fr > en && fr > de && fr > es, lit("fr"))
      .otherwise(lit("en"))
  }

  // ---------------------------------------------------------------- F6 html→md
  /**
   * HTML→markdown extraction (SURVEY §2.8 F6 — the reference's trafilatura
   * call at uci.py:56, re-expressed as a deterministic ordered
   * regexp_replace chain so it stays inside codegen AND has an exact DuckDB
   * spelling). Handles the common structural tags (headings, paragraphs,
   * lists, links, emphasis), drops script/style, strips the rest, decodes
   * the basic entities. Lowercase-tag HTML; a full parser lives behind the
   * same Column signature if fidelity ever demands it.
   *
   * Patterns avoid backreferences and use only (?s)/lazy quantifiers —
   * the RE2 subset, so Java regex (Spark) and RE2 (DuckDB) agree.
   */
  def htmlToMarkdown(html: Column): Column =
    trim(htmlChain.foldLeft(html) { case (c, (pat, repl, _)) =>
      regexp_replace(c, pat, repl)
    })

  /** DuckDB spelling of [[htmlToMarkdown]] — same chain, same order. */
  def htmlToMarkdownSql(expr: String): String = {
    val inner = htmlChain.foldLeft(expr) { case (e, (pat, _, duckRepl)) =>
      val p = pat.replace("'", "''")
      s"regexp_replace($e, '$p', $duckRepl, 'g')"
    }
    s"trim($inner)"
  }

  /** (pattern, Spark replacement, DuckDB replacement SQL expr), in order.
    * Dotall is the inline `(?s)` flag — the spelling both engines share.
    *
    * Coverage tracks the shapes `trafilatura.extract(output_format=
    * 'markdown')` (uci.py:56) emits on real pages: headings, paragraphs,
    * line breaks, (nested) lists, tables (cells → `| `-separated rows —
    * each <li>/<tr> lands on its own line; DEPTH indentation of a nested
    * list is stateful and out of regex reach, documented lossiness),
    * blockquotes, code/pre, links in either quote style, emphasis, entity
    * decoding. Everything else strips. */
  private val htmlChain: Seq[(String, String, String)] = Seq(
    ("(?s)<script[^>]*>.*?</script>", "", "''"),
    ("(?s)<style[^>]*>.*?</style>", "", "''"),
    ("(?s)<!--.*?-->", "", "''"),
    ("<br[^>]*>", "\n", "chr(10)"),
    ("</p>", "\n\n", "chr(10) || chr(10)"),
    ("<p[^>]*>", "", "''"),
    ("<h1[^>]*>", "# ", "'# '"),
    ("<h2[^>]*>", "## ", "'## '"),
    ("<h3[^>]*>", "### ", "'### '"),
    ("</h[1-6]>", "\n\n", "chr(10) || chr(10)"),
    ("<h[4-6][^>]*>", "", "''"),
    // list scaffolding: items one per line; a nested <ul>/<ol> opens on a
    // fresh line (its items keep the flat "- " marker)
    ("</?[uo]l[^>]*>", "\n", "chr(10)"),
    ("<li[^>]*>", "- ", "'- '"),
    ("</li>", "\n", "chr(10)"),
    // tables: cell boundaries become " | ", each row its own "| … |" line
    // (\b keeps <thead>/<tbody>/<table> out of the td/th patterns; those
    // strip via the generic rule below)
    ("(?s)</t[dh]>\\s*<t[dh]\\b[^>]*>", " | ", "' | '"),
    ("<t[dh]\\b[^>]*>", "| ", "'| '"),
    ("</t[dh]>", " |", "' |'"),
    ("</tr>", "\n", "chr(10)"),
    ("<blockquote[^>]*>", "> ", "'> '"),
    ("</blockquote>", "\n\n", "chr(10) || chr(10)"),
    ("(?s)<pre[^>]*>", "```\n", "'```' || chr(10)"),
    ("</pre>", "\n```\n", "chr(10) || '```' || chr(10)"),
    ("</?code\\b[^>]*>", "`", "'`'"),
    ("<a href=\"([^\"]*)\"[^>]*>([^<]*)</a>", "[$2]($1)", "'[\\2](\\1)'"),
    ("<a href='([^']*)'[^>]*>([^<]*)</a>", "[$2]($1)", "'[\\2](\\1)'"),
    ("</?(b|strong)\\b[^>]*>", "**", "'**'"),
    ("</?(i|em)\\b[^>]*>", "*", "'*'"),
    ("<[^>]+>", "", "''"),
    ("&amp;", "&", "'&'"),
    ("&lt;", "<", "'<'"),
    ("&gt;", ">", "'>'"),
    ("&quot;", "\"", "'\"'"),
    ("&#39;", "'", "''''"),
    ("&apos;", "'", "''''"),
    ("&nbsp;", " ", "' '"),
    ("\n{3,}", "\n\n", "chr(10) || chr(10)"))

  // ---------------------------------------------------------------- fingerprint
  private val FpPrime = 1000000007L

  /** Stable 64-bit-ish token hash: first 8 hex chars of sha256, mod prime.
    * Portable: DuckDB `cast(('0x'||substr(sha256(t),1,8)) as bigint)`. */
  def tokenHash(t: Column): Column =
    conv(substring(sha2(t, 256), 1, 8), 16, 10).cast(LongType) % FpPrime

  /**
   * Rolling-hash document fingerprint over whitespace tokens
   * (BASELINE.json text-analysis op). foldl1 over token hashes with
   * h = (h*31 + v) mod p — matches DuckDB list_reduce (which seeds from the
   * first element, hence the slice).
   */
  def fingerprint(text: Column): Column = {
    val hs = transform(tokens(text), t => tokenHash(t))
    when(size(hs) === 0, lit(null).cast(LongType))
      .otherwise(aggregate(
        slice(hs, lit(2), greatest(size(hs) - 1, lit(0))),
        element_at(hs, 1),
        (acc, v) => (acc * 31L + v) % FpPrime))
  }

  /**
   * Content-defined chunk-boundary predicate (the Rabin-fingerprint split
   * rule of dedup storage — LBFS/restic-style): position `pos` (1-based)
   * in `text` is a boundary when the hash of the `window`-char substring
   * starting there lands in the zero residue class mod `mask`, giving
   * expected chunk length ≈ `mask` chars. Unlike fixed-size chunking
   * (chunk §2.7), an insertion early in a document shifts every fixed
   * boundary after it but leaves content-defined boundaries untouched —
   * the property that makes chunk-level dedup stable under edits at
   * 100 TB. The hash is the engine-portable sha256-prefix trick
   * (bucket64's spelling), so a SQL oracle replays it exactly; `pos`
   * must satisfy pos + window - 1 <= length(text).
   */
  def cdcBoundary(text: Column, pos: Column, window: Int, mask: Int): Column =
    conv(substring(sha2(call_function("substring", text, pos, lit(window)), 256),
      2, 15), 16, 10).cast(LongType) % mask === 0
}

package graft.functions

/**
 * Milvus filter-expression dialect → Spark SQL translation, backing
 * [[graft.Engine.retrieve]] (the reference passes raw Milvus expr STRINGS:
 * `vdb.py:218-223`'s `collection.query(expr=epr, limit=self.page_limit)`).
 * Supported subset — the operators Milvus documents for scalar filtering:
 *
 *  - comparisons `== != > >= < <=` (`==` becomes SQL `=`); CHAINED
 *    ranges `10 <= f < 20` split into conjoined arms (SQL has no
 *    chained comparison); `f between a and b` passes through (SQL's own
 *    BETWEEN)
 *  - arithmetic `+ - * / %` pass through (identical SQL spellings);
 *    `**` rewrites to `power(..)` (no SQL spelling)
 *  - boolean `&& || and or not`
 *  - membership `f in [v1, v2]` / `f not in [...]` (brackets → parens)
 *  - `like "pat%"` (SQL LIKE, translated literals; works over JSON
 *    paths — get_json_object yields the string the pattern tests)
 *  - JSON path access `meta["key"]` → `get_json_object(meta, '$.key')`
 *  - ARRAY field operators (the Milvus ARRAY datatype filter set):
 *    `array_contains(f, v)`, `array_contains_all(f, [..])`,
 *    `array_contains_any(f, [..])`, `array_length(f)` — rewritten to
 *    Spark's `array_contains`/`array_except`/`arrays_overlap`/`size`
 *  - JSON array membership (the Milvus `json_contains` family) over a
 *    JSON path, a physical JSON column, or a dynamic field: the stored
 *    JSON array is materialized with `from_json` (element type inferred
 *    from the probe values: strings → `array<string>`, else numeric)
 *  - `TEXT_MATCH(field, "t1 t2 …")` — OR keyword match over ANALYZED
 *    tokens (the engine's configured analyzer runs on both the query
 *    terms and the field tokenization), composable with scalar arms
 *    (→ `arrays_overlap`; the search-time gate has an index-priced
 *    sibling in `Engine.searchTextMatch` — same analyzer, same matches)
 *  - `exists meta["key"]` / `exists dynfield` — Milvus's key-presence
 *    test → `get_json_object(..) IS NOT NULL` (a dynamic row simply
 *    lacks the key when the producer column was null: `to_json` drops
 *    null fields, so presence IS the Milvus semantics)
 *  - dynamic fields (Milvus `enable_dynamic_field`): an identifier that is
 *    not a physical column resolves through the hidden `$meta` JSON column
 *    when one exists — exactly Milvus's behavior for undeclared fields
 *  - string literals in single OR double quotes (Milvus accepts both);
 *    operator characters inside literals are never rewritten
 *
 * The translation is purely syntactic: literals are lifted out first, the
 * skeleton is rewritten with ordered regex passes, generated fragments are
 * protected from later passes, and literals are restored last as
 * single-quoted SQL strings. Anything outside the subset flows through
 * unchanged and fails (loudly) in Spark's own SQL parser — never silently.
 */
object MilvusExpr {

  private val keywords = Set(
    "and", "or", "not", "in", "like", "true", "false", "null", "is",
    "between", "exists")

  /** Driver-side term analysis — delegates to the ONE shared query-side
    * pipeline (`Engine.analyzeQueryTerms`: stoplist → stem → length,
    * Lucene's filter order); a separate copy here is exactly how the
    * expr route and the postings route would silently diverge again. */
  private def analyzeDriverTerms(toks: Seq[String], analyzer: String): Seq[String] =
    graft.Engine.analyzeQueryTerms(toks, analyzer)

  /** SQL spelling of the document-side analyzer pipeline over a field
    * reference — the same stoplist-then-stem-then-length order the
    * postings build uses (`Engine.analyzeCol`), so the expr route and the
    * index route tokenize identically. The stem CASE is the cross-engine
    * `minEnglishStemSql` spelling (valid Spark SQL: substr/length/||/CASE). */
  private def analyzedTokensSql(fieldSql: String, analyzer: String): String = {
    val (baseName, len) = graft.Engine.parseAnalyzer(analyzer)
    // trim BEFORE splitting — TextFns.tokens trims first, and without it
    // leading whitespace yields an empty leading token on the expr route
    // only (harmless for arrays_overlap, a divergence for anything that
    // counts tokens)
    val base = s"split(trim(lower($fieldSql)), '\\\\s+')"
    lazy val stop = graft.Engine.englishStopwords.toSeq.sorted
      .map(w => s"'$w'").mkString(", ")
    val based = baseName match {
      case "english" => s"filter($base, __t -> __t NOT IN ($stop))"
      case "english_stem" =>
        s"transform(filter($base, __t -> __t NOT IN ($stop)), " +
          s"__t -> ${TextFns.minEnglishStemSql("__t")})"
      case "english_porter" =>
        // the full Snowball stemmer has no inline-SQL spelling (six suffix
        // steps); Engine.registerPorter puts porter_stem on the session
        s"transform(filter($base, __t -> __t NOT IN ($stop)), " +
          s"__t -> porter_stem(__t))"
      case _ => base
    }
    len.fold(based) { case (lo, hi) =>
      s"filter($based, __t -> length(__t) >= $lo AND length(__t) <= $hi)" }
  }

  private val LIT = '\u0001' // string-literal placeholder delimiter
  private val GEN = '\u0002' // generated-fragment placeholder delimiter

  /**
   * Translate a Milvus expr to a Spark SQL boolean expression string.
   *
   * @param epr     the Milvus filter expression
   * @param columns the store's physical column names (dynamic-field
   *                resolution: identifiers outside this set route through
   *                `$meta` when `dynamicField` names it)
   * @param dynamicField the hidden JSON column to resolve unknown
   *                identifiers through, if the store has one
   * @param analyzer the engine's configured lexical analyzer
   *                 (`EngineConfig.analyzer`) — TEXT_MATCH must tokenize
   *                 BOTH the query terms and the field text exactly the
   *                 way the engine's postings do, or a stemming/stopword
   *                 analyzer makes the expr route silently diverge from
   *                 `Engine.searchTextMatch` (the classic analyzer-mismatch
   *                 zero-recall bug, here between two routes of one engine)
   */
  def toSparkSql(epr: String, columns: Set[String],
                 dynamicField: Option[String] = None,
                 analyzer: String = "standard"): String = {
    require(epr != null && epr.trim.nonEmpty, "empty expression")

    // 1. lift string literals (either quote style; Milvus has no embedded
    // escape subtleties we must honor — a quote char ends the literal)
    val lits = scala.collection.mutable.ArrayBuffer.empty[String]
    val sk = new StringBuilder
    var i = 0
    while (i < epr.length) {
      val c = epr.charAt(i)
      if (c == '"' || c == '\'') {
        val end = epr.indexOf(c, i + 1)
        require(end > i, s"unterminated string literal in expr: $epr")
        sk.append(LIT).append(lits.length).append(LIT)
        lits += epr.substring(i + 1, end)
        i = end + 1
      } else { sk.append(c); i += 1 }
    }
    var s = sk.toString

    // 2. generated fragments are protected from later passes
    val gens = scala.collection.mutable.ArrayBuffer.empty[String]
    def protect(fragment: String): String = {
      gens += fragment; s"$GEN${gens.length - 1}$GEN"
    }

    // 3. JSON path access: ident[<string literal>] → get_json_object
    val jsonPath = ("""([A-Za-z_$][A-Za-z0-9_$]*)\s*\[\s*""" + LIT +
      """(\d+)""" + LIT + """\s*\]""").r
    s = jsonPath.replaceAllIn(s, m => {
      val fld = m.group(1)
      // `in [<string>]` parses identically to a json access — the keyword
      // head disambiguates (Milvus field names can't be keywords either)
      if (keywords.contains(fld.toLowerCase))
        java.util.regex.Matcher.quoteReplacement(m.matched)
      else {
        val key = lits(m.group(2).toInt)
        java.util.regex.Matcher.quoteReplacement(
          protect(s"get_json_object(`$fld`, '$$.$key')"))
      }
    })

    // 3b. ARRAY / JSON-array operators — before the bracket pass (their
    // list argument is a [..] literal) and before dynamic-field routing
    // (the function names are not fields). Each rewrite is protected.
    // The field argument may be a json-path placeholder from pass 3, a
    // physical column, or (json_contains family only, in practice) an
    // undeclared identifier that routes through the dynamic column.
    def fieldRef(raw: String): String = {
      // NO trim: placeholder delimiters are control chars, which trim eats
      val t = raw
      if (t.nonEmpty && t.charAt(0) == GEN) t // nested placeholder, restored later
      else if (columns.contains(t)) s"`$t`"
      else dynamicField
        .map(mf => protect(s"get_json_object(`$mf`, '$$.$t')"))
        .getOrElse(t)
    }
    // element type of a JSON array probe: strings and booleans are typed
    // by the probe; ALL numeric probes materialize as array<double> (JSON
    // numbers are doubles — a stored [5.0] must match an integer probe 5,
    // which an array<bigint> read would silently null away; Spark's type
    // coercion widens the integer probe to double at the compare).
    // Caveat, documented not guarded: integers beyond 2^53 lose precision
    // in the double domain — exactly JSON's own numeric contract.
    def jsonArrType(args: String): String =
      if (args.indexOf(LIT) >= 0) "array<string>"
      else if (args.trim.toLowerCase.split("""\s*,\s*""").forall(a => a == "true" || a == "false"))
        "array<boolean>"
      else "array<double>"
    val IDF = """([A-Za-z_$][A-Za-z0-9_$]*|""" + GEN + """\d+""" + GEN + ")"
    val VAL = "(" + LIT + """\d+""" + LIT + """|-?\d+(?:\.\d+)?|(?i:true|false))"""
    val LST = """\[\s*([^\]]*?)\s*\]"""
    def qr(r: String) = r.r
    s = qr("""(?i)\barray_contains_all\s*\(\s*""" + IDF + """\s*,\s*""" + LST + """\s*\)""")
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        protect(s"size(array_except(array(${m.group(2)}), ${fieldRef(m.group(1))})) = 0")))
    s = qr("""(?i)\barray_contains_any\s*\(\s*""" + IDF + """\s*,\s*""" + LST + """\s*\)""")
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        protect(s"arrays_overlap(${fieldRef(m.group(1))}, array(${m.group(2)}))")))
    s = qr("""(?i)\barray_contains\s*\(\s*""" + IDF + """\s*,\s*""" + VAL + """\s*\)""")
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        protect(s"array_contains(${fieldRef(m.group(1))}, ${m.group(2)})")))
    s = qr("""(?i)\barray_length\s*\(\s*""" + IDF + """\s*\)""")
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        protect(s"size(${fieldRef(m.group(1))})")))
    s = qr("""(?i)\bjson_contains_all\s*\(\s*""" + IDF + """\s*,\s*""" + LST + """\s*\)""")
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        protect(s"size(array_except(array(${m.group(2)}), " +
          s"from_json(${fieldRef(m.group(1))}, '${jsonArrType(m.group(2))}'))) = 0")))
    s = qr("""(?i)\bjson_contains_any\s*\(\s*""" + IDF + """\s*,\s*""" + LST + """\s*\)""")
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        protect(s"arrays_overlap(from_json(${fieldRef(m.group(1))}, " +
          s"'${jsonArrType(m.group(2))}'), array(${m.group(2)}))")))
    s = qr("""(?i)\bjson_contains\s*\(\s*""" + IDF + """\s*,\s*""" + VAL + """\s*\)""")
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        protect(s"array_contains(from_json(${fieldRef(m.group(1))}, " +
          s"'${jsonArrType(m.group(2))}'), ${m.group(2)})")))
    // Milvus TEXT_MATCH(field, "t1 t2 …") inside a filter expr — OR
    // semantics over ANALYZED tokens, composable with scalar arms. This
    // spelling evaluates against the FIELD TEXT (arrays_overlap over the
    // tokenization) so it composes anywhere a predicate can appear;
    // [[graft.Engine.searchTextMatch]] remains the postings-backed route
    // for the search-time gate (same semantics, index-priced). BOTH sides
    // run the engine's configured analyzer — query terms driver-side,
    // field tokens via the same stoplist/stem pipeline in SQL — so a
    // stemming analyzer can't make the two TEXT_MATCH routes disagree
    // (e.g. under english_stem, TEXT_MATCH(text, "tables") matches docs
    // containing 'table' on both routes).
    s = qr("""(?i)\btext_match\s*\(\s*""" + IDF + """\s*,\s*(""" + LIT + """\d+""" + LIT + """)\s*\)""")
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement({
        val raw = lits(m.group(2).replace(LIT.toString, "").toInt)
          .toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toSeq
        require(raw.nonEmpty, s"TEXT_MATCH needs at least one term")
        val terms = analyzeDriverTerms(raw, analyzer).distinct
        require(terms.nonEmpty,
          s"TEXT_MATCH terms all removed by the '$analyzer' analyzer")
        val arr = terms.map(t => "'" + t.replace("'", "''") + "'").mkString(", ")
        protect(s"arrays_overlap(${analyzedTokensSql(fieldRef(m.group(1)), analyzer)}, " +
          s"array($arr))")
      }))
    // Milvus `exists` — key presence on a json path or dynamic field. The
    // operand must be a json access (a physical column always "exists";
    // Milvus likewise only allows exists on JSON/dynamic keys), so bare
    // identifiers route through the dynamic column when one is configured.
    s = qr("""(?i)\bexists\s+""" + IDF)
      .replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
        protect(s"${fieldRef(m.group(1))} IS NOT NULL")))

    // 3c'. `**` rewrites BEFORE the chain pass (Milvus's power operator
    // has no SQL spelling; the base routes through fieldRef so dynamic
    // fields and json-path placeholders resolve). Order matters: the
    // protected power() fragment is then an ATOMIC operand the chain
    // grammar accepts, so `1 < f ** 2 < 9` chains correctly — with the
    // chain pass first it would bind the bare exponent (`2 < f ... `)
    // and emit garbage. The pass LOOPS to fixpoint so explicitly
    // parenthesized nesting works — `(f ** 2) ** 3` protects the inner
    // power on pass one and the outer (whose base is then `(GEN)`) on
    // pass two. A bare `f ** 2 ** 3` is ambiguous (Milvus does not
    // document ** associativity) and is REJECTED below rather than
    // silently picking a grouping or leaking a raw `**` to Spark's
    // parser as a baffling syntax error.
    locally {
      val atom = IDF.drop(1).dropRight(1) + """|\d+(?:\.\d+)?"""
      val parenGen = """\(\s*""" + GEN + """\d+""" + GEN + """\s*\)"""
      // the lookarounds keep a bare double-power (`f ** 2 ** 3`) from
      // matching either arm, so it reaches the residual throw instead of
      // silently picking an associativity; single `*` neighbors
      // (multiplication around a power) still match
      val powRe = qr("""(?<!\*\*[ \t]{0,8})(""" + parenGen + "|" + atom +
        """)\s*\*\*\s*(""" + parenGen + "|" + GEN + """\d+""" + GEN +
        """|\d+(?:\.\d+)?)(?![ \t]*\*\*)""")
      var prev = ""
      while (prev != s) {
        prev = s
        s = powRe.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement({
          val base = m.group(1)
          val ref =
            if (base.matches("""\d+(?:\.\d+)?""") || base.charAt(0) == '(' ||
              base.charAt(0) == GEN) base
            else fieldRef(base)
          protect(s"power($ref, ${m.group(2)})")
        }))
      }
      if (s.contains("**"))
        throw new IllegalArgumentException(
          "unsupported power expression (** base/exponent must be a field, " +
            s"number, or parenthesized power; parenthesize to disambiguate): $epr")
    }

    // 3c. chained comparisons — Milvus allows `10 <= height < 20` (one
    // range, N comparators); SQL has no chained comparison, so the FULL
    // n-ary chain is matched in ONE pass and rewritten to a
    // PARENTHESIZED conjunction: `(10 <= height and height < 20)`. The
    // parentheses are the correctness of the rewrite under a preceding
    // `not`: Milvus's `not` binds below the whole chain, while an
    // unparenthesized `not 10 <= f and f < 20` re-associates in SQL to
    // `(NOT 10 <= f) AND (f < 20)` — silently wrong rows, no error.
    // Operands duplicate verbatim (a LIT/GEN placeholder restores at
    // every occurrence; a bare dynamic identifier routes at pass 6 in
    // every arm). One direction per chain: `a < b > c` is not a range.
    val OPND = "(?:" + LIT + """\d+""" + LIT + "|" + GEN + """\d+""" + GEN +
      """|[A-Za-z_$][A-Za-z0-9_$]*|-?\d+(?:\.\d+)?)"""
    for (cmp <- Seq("<=|<", ">=|>")) {
      val chain = qr(OPND + """(?:\s*(?:""" + cmp + """)\s*""" + OPND + """){2,}""")
      val opRe = ("(" + cmp + ")").r
      s = chain.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement({
        val whole = m.matched
        // an arithmetic EDGE operand (`a - 5 < f < 10`, `5 < f < 10 + 1`):
        // the OPND grammar matched only the bare head/tail literal, so the
        // rewrite would splice a boolean conjunction into the arithmetic —
        // Spark's analyzer then emits a baffling numeric-vs-boolean error.
        // Detect the abutting arithmetic token and fail HERE instead (the
        // residual check below only catches arithmetic MIDDLE operands). A
        // head operand that starts with `-` directly after an identifier,
        // digit, `)`, or placeholder is a subtraction in disguise
        // (`a -5 < f < 10`) — same rejection.
        val arith = Set('+', '-', '*', '/', '%')
        val pre = m.before.toString.reverse.dropWhile(_.isWhitespace).headOption
        val post = m.after.toString.dropWhile(_.isWhitespace).headOption
        // …but a preceding KEYWORD (`and -60 <= f <= 99`) is a connective,
        // not a left operand — the `-` is a genuine negative literal there
        val prevWord = """([A-Za-z_$][A-Za-z0-9_$]*)\s*$""".r
          .findFirstMatchIn(m.before).map(_.group(1).toLowerCase)
        val negSub = whole.charAt(0) == '-' && pre.exists(c =>
          c.isLetterOrDigit || c == '_' || c == '$' || c == ')' || c == GEN) &&
          !prevWord.exists(keywords.contains)
        if (pre.exists(arith) || post.exists(arith) || negSub)
          throw new IllegalArgumentException(
            "unsupported chained comparison (arithmetic edge operand; " +
              s"parenthesize or split the range): $epr")
        val ops = opRe.findAllIn(whole).toSeq
        val opnds = ("""\s*(?:""" + cmp + """)\s*""").r.split(whole).toSeq
        "(" + ops.indices.map(i =>
          s"${opnds(i)} ${ops(i)} ${opnds(i + 1)}").mkString(" and ") + ")"
      }))
    }
    // A residual `cmp … cmp` with no boolean connective between the two
    // comparators is a chain the operand grammar could not match (an
    // arithmetic middle operand: `10 <= f + 1 < 20`) — fail HERE with a
    // translator-level message instead of letting Spark's analyzer
    // produce a baffling boolean-vs-numeric type error on
    // `(10 <= f + 1) < 20`.
    locally {
      val cmpTok = """<=|>=|<|>""".r
      // `&&`/`||` count as connectives too — they rewrite to and/or only
      // at pass 4, after this check. Likewise `==`/`!=` (rewritten at
      // pass 4) and bare `=`: a valid expression with ordered comparisons
      // on both sides of an (in)equality (`a < b == c < d`) is NOT a
      // residual chain. A bare `=` also covers the `=` inside `!=`; the
      // `=` of `<=`/`>=` never appears in the between-substring because
      // cmpTok consumes the full two-char comparator.
      val sep = """(?i)=|&&|\|\||[(),\[\]]|\b(and|or|between)\b""".r
      cmpTok.findAllMatchIn(s).toSeq.sliding(2).foreach {
        case Seq(a, b) if sep.findFirstIn(s.substring(a.end, b.start)).isEmpty =>
          throw new IllegalArgumentException(
            "unsupported chained comparison (only plain field/literal middle " +
              s"operands chain; parenthesize or split the range): $epr")
        case _ => ()
      }
    }

    // 4. remaining operator spellings (** already handled at 3c')
    s = s.replace("==", " = ").replace("&&", " and ").replace("||", " or ")
    // 5. remaining brackets are in-lists
    s = s.replace("[", "(").replace("]", ")")

    // 6. dynamic-field resolution: unknown identifiers route through $meta
    dynamicField.foreach { mf =>
      val ident = """\b([A-Za-z_][A-Za-z0-9_]*)\b""".r
      s = ident.replaceAllIn(s, m => {
        val t = m.group(1)
        if (keywords.contains(t.toLowerCase) || columns.contains(t)) t
        else java.util.regex.Matcher.quoteReplacement(
          protect(s"get_json_object(`$mf`, '$$.$t')"))
      })
    }

    // 7. restore generated fragments (may nest inside each other: repeat)
    val genRef = (GEN + """(\d+)""" + GEN).r
    while (s.indexOf(GEN) >= 0)
      s = genRef.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(gens(m.group(1).toInt)))

    // 8. restore string literals as single-quoted SQL
    val litRef = (LIT + """(\d+)""" + LIT).r
    s = litRef.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        "'" + lits(m.group(1).toInt).replace("'", "''") + "'"))
    s
  }
}

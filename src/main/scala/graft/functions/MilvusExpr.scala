package graft.functions

/**
 * Milvus filter-expression dialect → Spark SQL translation, backing
 * [[graft.Engine.retrieve]] (the reference passes raw Milvus expr STRINGS:
 * `vdb.py:218-223`'s `collection.query(expr=epr, limit=self.page_limit)`).
 * Supported subset — the operators Milvus documents for scalar filtering:
 *
 *  - comparisons `== != > >= < <=` (`==` becomes SQL `=`)
 *  - boolean `&& || and or not`
 *  - membership `f in [v1, v2]` / `f not in [...]` (brackets → parens)
 *  - `like "pat%"` (SQL LIKE, translated literals)
 *  - JSON path access `meta["key"]` → `get_json_object(meta, '$.key')`
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
   */
  def toSparkSql(epr: String, columns: Set[String],
                 dynamicField: Option[String] = None): String = {
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

    // 4. operator spellings
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

package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}
import graft.functions.MilvusExpr

/** Property-fuzz for the Milvus-expr translator: every generated case is
  * an AST that renders BOTH a Milvus expr string (randomized keyword
  * case, quote style, spacing, && / and spellings) AND a directly
  * constructed Spark Column predicate. The translated string must filter
  * exactly like the hand-built Column on a fixture frame that covers the
  * nasty corners: NULL scalars, dynamic-field keys present/absent, JSON
  * paths with missing keys, empty arrays, negative numbers. The grammar
  * has grown to 11 keyword families — this generator is the regression
  * net under every future arm (1,000 cases per run, fixed seed:
  * FIXTURES.md bans nondeterministic tests).
  *
  * Null semantics ride through `coalesce(p, false)` on BOTH sides —
  * filter semantics (NULL drops the row), which is exactly what
  * Engine.retrieve does with the translated predicate.
  */
class MilvusExprFuzzSpec extends SparkSpec {

  private val physCols = Set("doc_id", "lang", "n_chars", "text", "tags", "meta")

  private def fixture: DataFrame = {
    val rows = (0 until 150).map { i =>
      val lang: String =
        Seq("en", "de", "fr", null, "es", "eng")(i % 6)
      val nChars: Long = (i.toLong * 37 % 900) - 50
      val text = Seq(" dup merge table", "the quick fox", "",
        "alpha beta gamma", "data data dup", "Xy zzy dup")(i % 6)
      val tags: Seq[String] =
        Seq(Seq("data", "the"), Seq.empty[String], Seq("x", "y", "z", "data"),
          null, Seq("dup"), Seq("data", "dup", "merge"))(i % 6)
      val meta: String =
        if (i % 7 == 0) null
        else if (i % 4 == 0) s"""{"stars":${i % 20},"xs":[]}"""
        else s"""{"k":"v${i % 3}","stars":${i % 20},"xs":[1,${i % 5}],"flags":[true]}"""
      val dyn: String =
        if (i % 3 == 0) s"""{"score":${i % 13}}""" else """{"other":1}"""
      (i.toLong, lang, nChars, text, tags, meta, dyn)
    }
    spark.createDataFrame(rows)
      .toDF("doc_id", "lang", "n_chars", "text", "tags", "meta", "$meta")
  }

  /** One fuzz case: the Milvus spelling, the hand-built predicate, and the
    * node's top-level operator ('l' leaf, 'a' and, 'o' or, 'n' not) — the
    * renderer parenthesizes a child ONLY where Milvus/SQL precedence
    * (not > and > or, both languages) would otherwise re-associate the
    * string away from the AST: an or-child under and, and any composite
    * under not. Leaves stay bare, so leaf-level precedence (chained
    * ranges under bare `not`, arithmetic vs comparison) is genuinely
    * fuzzed. */
  private case class Case(milvus: String, direct: Column, op: Char = 'l')

  private val sp: Gen[String] = Gen.chooseNum(0, 2).map(" " * _)
  // keyword spelling variants (Milvus accepts either case)
  private def kw(w: String): Gen[String] = Gen.oneOf(w, w.toUpperCase)
  private def quoted(s: String): Gen[String] =
    Gen.oneOf(s"\"$s\"", s"'$s'")

  private val numLeaf: Gen[Case] = for {
    op <- Gen.oneOf("==", "!=", ">", ">=", "<", "<=")
    v <- Gen.chooseNum(-100, 850)
    a <- sp; b <- sp
  } yield Case(s"n_chars$a$op$b$v", op match {
    case "==" => col("n_chars") === v
    case "!=" => col("n_chars") =!= v
    case ">"  => col("n_chars") > v
    case ">=" => col("n_chars") >= v
    case "<"  => col("n_chars") < v
    case "<=" => col("n_chars") <= v
  })

  private val strLeaf: Gen[Case] = for {
    op <- Gen.oneOf("==", "!=")
    v <- Gen.oneOf("en", "de", "fr", "eng", "nope")
    q <- quoted(v); a <- sp
  } yield Case(s"lang$a$op$a$q",
    if (op == "==") col("lang") === v else col("lang") =!= v)

  private val chainLeaf: Gen[Case] = for {
    lo <- Gen.chooseNum(-60, 300)
    w <- Gen.chooseNum(1, 500)
    o1 <- Gen.oneOf("<", "<=")
    o2 <- Gen.oneOf("<", "<=")
    down <- Gen.oneOf(false, true)
    a <- sp
  } yield {
    val hi = lo + w
    if (!down) Case(s"$lo$a$o1${a}n_chars$a$o2$a$hi",
      (if (o1 == "<") col("n_chars") > lo else col("n_chars") >= lo) &&
        (if (o2 == "<") col("n_chars") < hi else col("n_chars") <= hi))
    else Case(s"$hi$a${o1.replace("<", ">")}${a}n_chars$a${o2.replace("<", ">")}$a$lo",
      (if (o1 == "<") col("n_chars") < hi else col("n_chars") <= hi) &&
        (if (o2 == "<") col("n_chars") > lo else col("n_chars") >= lo))
  }

  private val betweenLeaf: Gen[Case] = for {
    lo <- Gen.chooseNum(-60, 400)
    w <- Gen.chooseNum(0, 400)
    b <- kw("between"); an <- kw("and")
  } yield Case(s"n_chars $b $lo $an ${lo + w}", col("n_chars").between(lo, lo + w))

  private val inLeaf: Gen[Case] = for {
    vs <- Gen.nonEmptyListOf(Gen.oneOf("en", "de", "fr", "es")).map(_.distinct)
    neg <- Gen.oneOf(true, false)
    i <- kw("in"); n <- kw("not")
    qs <- Gen.sequence[List[String], String](vs.map(quoted))
  } yield {
    val base = col("lang").isin(vs: _*)
    Case(s"lang ${if (neg) s"$n " else ""}$i [${qs.mkString(", ")}]",
      if (neg) !base else base)
  }

  private val likeLeaf: Gen[Case] = for {
    pat <- Gen.oneOf("e%", "%n", "d_", "%e%", "zz%")
    neg <- Gen.oneOf(true, false)
    l <- kw("like"); n <- kw("not")
    q <- quoted(pat)
  } yield Case(s"lang ${if (neg) s"$n " else ""}$l $q",
    if (neg) !col("lang").like(pat) else col("lang").like(pat))

  private val nullLeaf: Gen[Case] = for {
    fld <- Gen.oneOf("lang", "meta")
    notNull <- Gen.oneOf(true, false)
    is <- kw("is"); n <- kw("not"); nl <- kw("null")
  } yield Case(s"$fld $is ${if (notNull) s"$n " else ""}$nl",
    if (notNull) col(fld).isNotNull else col(fld).isNull)

  private val arrayLeaf: Gen[Case] = Gen.oneOf(
    for { v <- Gen.oneOf("data", "dup", "zzz"); q <- quoted(v); f <- kw("array_contains") }
      yield Case(s"$f(tags, $q)", array_contains(col("tags"), v)),
    for { k <- Gen.chooseNum(0, 5); op <- Gen.oneOf(">=", "<", "=="); f <- kw("array_length") }
      yield Case(s"$f(tags) $op $k", op match {
        case ">=" => size(col("tags")) >= k
        case "<"  => size(col("tags")) < k
        case _    => size(col("tags")) === k
      }))

  private val jsonLeaf: Gen[Case] = Gen.oneOf(
    for { v <- Gen.oneOf("v0", "v1", "v2", "vx"); q <- quoted(v); kq <- quoted("k") }
      yield Case(s"meta[$kq] == $q", get_json_object(col("meta"), "$.k") === v),
    for { v <- Gen.chooseNum(0, 19); op <- Gen.oneOf(">", "<=", "=="); kq <- quoted("stars") }
      yield Case(s"meta[$kq] $op $v", op match {
        case ">"  => get_json_object(col("meta"), "$.stars") > v
        case "<=" => get_json_object(col("meta"), "$.stars") <= v
        case _    => get_json_object(col("meta"), "$.stars") === v
      }),
    for { v <- Gen.chooseNum(0, 4); f <- kw("json_contains"); kq <- quoted("xs") }
      yield Case(s"$f(meta[$kq], $v)",
        array_contains(from_json(get_json_object(col("meta"), "$.xs"),
          ArrayType(DoubleType)), v.toDouble)),
    for { e <- kw("exists"); kq <- quoted("k") }
      yield Case(s"$e meta[$kq]", get_json_object(col("meta"), "$.k").isNotNull))

  private val dynLeaf: Gen[Case] = for {
    v <- Gen.chooseNum(0, 12)
    op <- Gen.oneOf(">", "==", "<=")
  } yield Case(s"score $op $v", op match {
    case ">"  => get_json_object(col("$meta"), "$.score") > v
    case "<=" => get_json_object(col("$meta"), "$.score") <= v
    case _    => get_json_object(col("$meta"), "$.score") === v
  })

  private val textMatchLeaf: Gen[Case] = for {
    ts <- Gen.nonEmptyListOf(Gen.oneOf("dup", "Merge", "fox", "zzy", "none")).map(_.take(3))
    f <- kw("text_match")
  } yield {
    val terms = ts.map(_.toLowerCase).distinct
    Case(s"$f(text, ${"\"" + ts.mkString(" ") + "\""})",
      arrays_overlap(split(trim(lower(col("text"))), "\\s+"),
        array(terms.map(lit): _*)))
  }

  private val arithLeaf: Gen[Case] = Gen.oneOf(
    for { m <- Gen.chooseNum(2, 9); r <- Gen.chooseNum(0, 8); a <- sp }
      yield Case(s"n_chars$a%$a$m == $r", col("n_chars") % m === r),
    for { c <- Gen.chooseNum(-50, 50); v <- Gen.chooseNum(-100, 900); a <- sp }
      yield Case(s"n_chars$a+$a$c > $v", col("n_chars") + c > v),
    for { v <- Gen.chooseNum(0, 700000); a <- sp }
      yield Case(s"n_chars$a**${a}2 > $v", pow(col("n_chars"), 2) > v))

  private val leaf: Gen[Case] = Gen.frequency(
    4 -> numLeaf, 3 -> strLeaf, 3 -> chainLeaf, 2 -> betweenLeaf,
    2 -> inLeaf, 2 -> likeLeaf, 2 -> nullLeaf, 2 -> arrayLeaf,
    3 -> jsonLeaf, 2 -> dynLeaf, 1 -> textMatchLeaf, 2 -> arithLeaf)

  // parenthesize an and-child that is an or (or would re-associate)
  private def andChild(c: Case): String =
    if (c.op == 'o') s"(${c.milvus})" else c.milvus

  private def node(depth: Int): Gen[Case] =
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for {
        l <- node(depth - 1); r <- node(depth - 1)
        c <- Gen.oneOf("&&", "and", "AND"); a <- sp
      } yield Case(s"${andChild(l)} $c $a${andChild(r)}", l.direct && r.direct, 'a')),
      2 -> (for {
        l <- node(depth - 1); r <- node(depth - 1)
        c <- Gen.oneOf("||", "or", "OR")
      } yield Case(s"${l.milvus} $c ${r.milvus}", l.direct || r.direct, 'o')),
      1 -> (for {
        e <- node(depth - 1); n <- kw("not")
        parens <- Gen.oneOf(true, false)
      } yield
        if (parens || e.op != 'l') Case(s"$n (${e.milvus})", !e.direct, 'n')
        else Case(s"$n ${e.milvus}", !e.direct, 'n')),
      1 -> node(depth - 1).map(e => Case(s"(${e.milvus})", e.direct)))

  test("1,000 generated exprs: translate->filter == the hand-built Spark predicate") {
    val df = fixture.cache()
    df.count()
    val params = Gen.Parameters.default.withSize(20)
    val seed0 = rng.Seed(42L)
    val cases = Gen.listOfN(1000, node(3)).pureApply(params, seed0)
    assert(cases.length == 1000)
    var checked = 0
    cases.grouped(50).foreach { group =>
      val colsOut = group.zipWithIndex.flatMap { case (c, i) =>
        val translated = expr(MilvusExpr.toSparkSql(c.milvus, physCols, Some("$meta")))
        Seq(coalesce(translated, lit(false)).as(s"t$i"),
          coalesce(c.direct, lit(false)).as(s"d$i"))
      }
      val rows = df.select(colsOut: _*).collect()
      group.indices.foreach { i =>
        rows.zipWithIndex.foreach { case (r, ri) =>
          val t = r.getBoolean(2 * i); val d = r.getBoolean(2 * i + 1)
          assert(t == d,
            s"row $ri diverged on expr <${group(i).milvus}> " +
              s"(translated=${MilvusExpr.toSparkSql(group(i).milvus, physCols, Some("$meta"))}): " +
              s"translated=$t direct=$d")
        }
        checked += 1
      }
    }
    assert(checked == 1000)
    df.unpersist()
  }

  test("fuzz: arithmetic edge operands in chains throw at the translator, never at Spark") {
    // every shape the d41593d/round-14 guards reject: arithmetic abutting
    // the chain's HEAD, its TAIL, and the negative-subtraction disguise —
    // each must fail with the translator's message (the alternative is
    // Spark's baffling numeric-vs-boolean analyzer error downstream)
    val gen = for {
      lo <- Gen.chooseNum(-50, 200)
      w <- Gen.chooseNum(1, 300)
      o1 <- Gen.oneOf("<", "<=")
      o2 <- Gen.oneOf("<", "<=")
      k <- Gen.chooseNum(1, 9)
      op <- Gen.oneOf("+", "-", "*", "/", "%")
      side <- Gen.oneOf(0, 1, 2)
      a <- Gen.oneOf("", " ")
    } yield side match {
      case 0 => s"n_chars $op $k $o1 doc_id $o2 ${lo + w}"
      case 1 => s"$lo $o1 n_chars $o2 $k $op 2"
      case 2 => s"doc_id$a-$k $o1 n_chars $o2 ${lo + w}"
    }
    val params = Gen.Parameters.default.withSize(20)
    val cases = Gen.listOfN(300, gen).pureApply(params, rng.Seed(43L))
    assert(cases.length == 300)
    cases.foreach { e =>
      val ex = intercept[IllegalArgumentException](
        MilvusExpr.toSparkSql(e, physCols, Some("$meta")))
      assert(ex.getMessage.contains("chained comparison"),
        s"<$e> -> ${ex.getMessage}")
    }
  }
}

package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Properties of the training-data curation queries (q69–q72) that the
  * equality oracle can't express: split disjointness/proportions, planted
  * contamination recall, scrub completeness, exact quota satisfaction. */
class PipelineSpec extends SparkSpec {

  private def run(name: String) = PipelineQueries.queries(name)(spark, sf)

  test("q69 split is exhaustive, disjoint, and near the 51/6/7-of-64 proportions") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val total = docs.count()
    val agg = run("q69_train_split")
      .groupBy("split").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(agg.keySet == Set("train", "val", "test"))
    assert(agg.values.sum == total) // exhaustive + disjoint (each doc once)
    // hash buckets are uniform: expect ~79.7% / 9.4% / 10.9%, allow wide slack
    val train = agg("train").toDouble / total
    assert(train > 0.70 && train < 0.90, s"train fraction $train")
    // determinism: a re-run is byte-identical
    assert(run("q69_train_split").collect().sameElements(run("q69_train_split").collect()))
  }

  test("q70 flags every planted contaminated doc with at least the sentinel grams") {
    val flagged = run("q70_decontaminate")
      .select("doc_id", "n_overlap").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val planted = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 13 === 0 && length(trim(col("text"))) > 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(flagged.contains(id), s"planted doc $id not flagged")
      // the 9-word sentinel contributes 5 distinct 5-grams, all shared
      assert(flagged(id) >= 5, s"doc $id overlap ${flagged(id)} < 5")
    }
  }

  test("q71 scrub leaves no matchable PII and counts the planted fixtures") {
    val out = run("q71_pii_scrub")
    // every 7th doc was planted with exactly one email and one phone tail
    val planted = out.filter(col("doc_id") % 7 === 0)
    assert(planted.count() == out.count()) // nothing else matched
    assert(planted.filter(col("n_emails") =!= 1 || col("n_phones") =!= 1).count() == 0)
    // re-running the scrub over already-clean text changes nothing: the
    // redaction tokens themselves contain no matchable PII
    assert(!"[EMAIL] [PHONE]".matches(".*@.*"))
  }

  test("q73 two-level prefix sum equals the naive global window, bins respect the budget") {
    import org.apache.spark.sql.expressions.Window
    val budget = 2048L
    // naive single-task spelling (fine at spec scale, the thing q73 avoids)
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        when(length(trim(col("text"))) > 0, size(split(lower(trim(col("text"))), "\\s+")))
          .otherwise(0).cast("long").as("n_toks"))
    val naive = toks
      .withColumn("prev_cum", coalesce(sum(col("n_toks")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", floor(col("prev_cum") / budget))
      .groupBy("bin").agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("bin").collect()
    val twoLevel = run("q73_pack_sequences").collect()
    assert(twoLevel.sameElements(naive))
    // a bin overflows only by the straddling doc: total < budget + max doc size
    val maxDoc = toks.agg(max("n_toks")).head.getLong(0)
    twoLevel.dropRight(1).foreach { r => // last bin may be underfull
      val tok = r.getAs[Long]("n_tokens")
      assert(tok < budget + maxDoc, s"bin ${r.getAs[Long]("bin")} has $tok tokens")
    }
  }

  test("q74 vocabulary respects the df floor and the top-100 cut") {
    val rows = run("q74_vocab").collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_docs") >= 20))
    // ordered by occurrences desc (token breaks ties)
    val occ = rows.map(_.getAs[Long]("n_occurrences"))
    assert(occ.zip(occ.tail).forall { case (a, b) => a >= b })
  }

  test("q75 relevance ranks are dense per doc with non-increasing scores") {
    val byDoc = run("q75_tfidf").collect()
      .groupBy(_.getAs[Long]("doc_id")).values
    byDoc.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.length <= 5)
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("rel_score_bp"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q72 mixture hits every per-source quota exactly") {
    val rows = run("q72_source_mix").collect()
    assert(rows.length == 20) // src0..src19
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") == r.getAs[Long]("quota"),
        s"${r.getAs[String]("source")}: kept ${r.getAs[Long]("n_kept")} != quota ${r.getAs[Long]("quota")}")
    }
    // even sources keep 50%, odd 20% — quotas reflect the weights
    val bySrc = rows.map(r => r.getAs[String]("source") -> r.getAs[Long]("quota")).toMap
    assert(bySrc("src0") > bySrc("src1"))
  }

  test("q76 segment dedup: kept ≤ total everywhere, the planted boilerplate survives once") {
    val rows = run("q76_segment_dedup").collect()
    rows.foreach { r =>
      val (segs, kept) = (r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept"))
      assert(kept >= 0 && kept <= segs, s"doc ${r.getAs[Long]("doc_id")}: $kept of $segs")
    }
    // planted docs (doc_id % 9 == 0) carry the 20-token boilerplate prefix =
    // 2 whole segments; every planted doc EXCEPT the global first occurrence
    // must lose at least those two
    val planted = rows.filter(r => r.getAs[Long]("doc_id") % 9 == 0)
      .sortBy(_.getAs[Long]("doc_id"))
    assert(planted.length >= 2, "fixture missing")
    planted.drop(1).foreach { r =>
      assert(r.getAs[Long]("n_segs") - r.getAs[Long]("n_kept") >= 2,
        s"doc ${r.getAs[Long]("doc_id")} kept its boilerplate segments")
    }
  }

  test("LinkRank.pageRank matches a driver-side integer reference on random graphs") {
    import graft.operators.LinkRank
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 12 + rnd.nextInt(10)
      val undirected = Seq.fill(40)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      val directed = (undirected ++ undirected.map(_.swap)).distinct
      val got = LinkRank.pageRank(directed.toDF("src", "dst"), 5).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap

      // plain-Scala integer power iteration — the semantics LinkRank claims
      val out = directed.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var rank = out.keySet.map(_ -> LinkRank.RankUnit).toMap
      for (_ <- 1 to 5) {
        val inflow = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for ((u, vs) <- out; v <- vs)
          inflow(v) += rank(u) * 85 / (vs.size * 100)
        rank = out.keySet.map(v => v -> (LinkRank.RankUnit * 15 / 100 + inflow(v))).toMap
      }
      assert(got == rank)
      // damping conserves mass up to floor losses: never above N·unit, and
      // each division loses < 1 unit per edge per round
      val mass = got.values.sum
      assert(mass <= directed.map(_._1).distinct.size * LinkRank.RankUnit)
      assert(mass > (directed.map(_._1).distinct.size * LinkRank.RankUnit * 99L) / 100L)
    }
  }

  test("q78 LM scores are valid conditional-likelihood means (0 < bp ≤ 10000)") {
    val rows = run("q78_lm_score").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bp = r.getAs[Long]("lm_score_bp")
      // each per-bigram bp is floor(c12/c1 · 10⁴) ∈ (0, 10⁴]; a mean of such
      // values stays in range — 0 or >10⁴ would mean the fit is broken
      assert(bp > 0 && bp <= 10000, s"doc ${r.getAs[Long]("doc_id")}: $bp")
    }
  }
}

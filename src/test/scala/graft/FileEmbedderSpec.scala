package graft

import graft.functions.FileEmbedder
import org.apache.spark.sql.functions._

/** The checkpoint-file model seam (verdict task: update+search under a
  * weights-from-disk embedder; see FileEmbedder.scala for why the forward
  * pass is a linear layer rather than onnxruntime in this sandbox). */
class FileEmbedderSpec extends SparkSpec {

  private def freshModel(seed: Long): FileEmbedder.Model =
    FileEmbedder.Model("aeiounst".toCharArray, FileEmbedder.syntheticWeights(seed, 8, 8))

  test("checkpoint save/load round-trips weights bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val m = freshModel(7L)
    FileEmbedder.save(s"$dir/m.ckpt", m)
    FileEmbedder.load(s"$dir/m.ckpt") match {
      case loaded: FileEmbedder.Model =>
        assert(loaded.features.sameElements(m.features))
        assert(loaded.w.length == m.w.length)
        loaded.w.zip(m.w).foreach { case (a, b) => assert(a.sameElements(b)) }
      case other => fail(s"expected the linear shape, loaded $other")
    }
  }

  test("MLP checkpoint: topology lives in the file — layers/widths/activations round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mlp").toString
    val m = FileEmbedder.MlpModel("aeiounst".toCharArray, List(
      FileEmbedder.Layer(FileEmbedder.syntheticWeights(7L, 6, 8), "relu"),
      FileEmbedder.Layer(FileEmbedder.syntheticWeights(13L, 10, 6), "relu"),
      FileEmbedder.Layer(FileEmbedder.syntheticWeights(29L, 8, 10), "none")))
    FileEmbedder.saveMlp(s"$dir/m.ckpt", m)
    FileEmbedder.load(s"$dir/m.ckpt") match {
      case loaded: FileEmbedder.MlpModel =>
        assert(loaded.dim == 8 && loaded.layers.length == 3)
        assert(loaded.layers.map(_.activation) == List("relu", "relu", "none"))
        loaded.layers.zip(m.layers).foreach { case (a, b) =>
          a.w.zip(b.w).foreach { case (ra, rb) => assert(ra.sameElements(rb)) }
        }
        // forward parity: the loaded stack computes what the in-memory one does
        val texts = Seq("a note on spark joins", "neural network training corpus", "")
        val (got, want) = (loaded.forward(texts), m.forward(texts))
        got.zip(want).foreach { case (g, w2) => assert(g.sameElements(w2)) }
        // the embedder seam serves it like any other model
        val e = FileEmbedder(s"$dir/m.ckpt")
        assert(e.dim == 8)
        assert(e.embedBatch(texts).head.sameElements(want.head))
      case other => fail(s"expected the MLP shape, loaded $other")
    }
    // relu actually gates: a hand-built 1-layer relu MLP zeroes negatives
    val neg = FileEmbedder.MlpModel(Array('a'), List(
      FileEmbedder.Layer(Array(Array(-1.0), Array(1.0)), "relu"),
      FileEmbedder.Layer(Array(Array(1.0, 0.0), Array(0.0, 1.0)), "none")))
    val v = neg.forward(Seq("aaa")).head // counts=[3] → h=[-3→0, 3] → x=[0, 3] → [0, 1]
    assert(v(0) == 0.0f && math.abs(v(1) - 1.0f) < 1e-6f, v.toSeq.toString)
  }

  test("one checkpoint load per JVM per path — instances and tasks hit the cache") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val path = s"$dir/m.ckpt"
    FileEmbedder.save(path, freshModel(11L))
    val before = FileEmbedder.loadCount.get()
    val e1 = FileEmbedder(path)
    val e2 = FileEmbedder(path)
    // dim forces materialization on both instances; the file is read once
    assert(e1.dim == 8 && e2.dim == 8)
    assert(FileEmbedder.loadCount.get() == before + 1)
    // and a distributed embed over many partitions still loads at most once
    // more per executor JVM (local mode: zero more — same JVM, cache warm)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").repartition(4)
    val n = graft.functions.VectorFns
      .embedPartitions(docs, "text", "vec", e1.dim, 16, e1.embedBatch)
      .count()
    assert(n > 0)
    assert(FileEmbedder.loadCount.get() == before + 1)
  }

  test("forward pass: batch contract, unit norm, zero-feature texts stay zero") {
    val m = freshModel(42L)
    val vecs = m.forward(Seq("the quick brown fox", "xyz", ""))
    assert(vecs.length == 3)
    val n0 = math.sqrt(vecs.head.map(v => v.toDouble * v.toDouble).sum)
    assert(math.abs(n0 - 1.0) < 1e-6)
    // "xyz" has no aeiounst chars except none → all-zero counts → zero vector
    assert(vecs(1).forall(_ == 0.0f) || math.abs(
      math.sqrt(vecs(1).map(v => v.toDouble * v.toDouble).sum) - 1.0) < 1e-6)
    assert(vecs(2).forall(_ == 0.0f))
  }

  test("config-driven model selection: vdb.embedding.model_path wires FileEmbedder") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-cfg").toString
    val ckpt = s"$dir/m.ckpt"
    FileEmbedder.save(ckpt, freshModel(42L))
    val yaml =
      s"""store_path: $dir/store
         |index_path: $dir/index
         |vdb:
         |  embedding:
         |    model_path: $ckpt
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/config.yml"), yaml)
    val cfg = EngineConfig.load(s"$dir/config.yml")
    assert(cfg.modelPath == ckpt)
    val eng = new Engine(spark, cfg) // no injected embedder: config decides
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    eng.ingest(docs)
    eng.update()
    val viaConfig = eng.search(Seq("graph node edge label")).collect()
    // identical to an engine with the SAME checkpoint injected explicitly
    val dir2 = java.nio.file.Files.createTempDirectory("graft-ckpt-cfg2").toString
    val eng2 = new Engine(spark, EngineConfig(
      storePath = s"$dir2/store", indexPath = s"$dir2/index"), FileEmbedder(ckpt))
    eng2.ingest(docs)
    eng2.update()
    val viaInject = eng2.search(Seq("graph node edge label")).collect()
    assert(viaConfig.map(_.toString).toSeq == viaInject.map(_.toString).toSeq)
  }

  test("Engine update + search run end-to-end under the checkpoint model") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-eng").toString
    val path = s"$dir/m.ckpt"
    FileEmbedder.save(path, freshModel(42L))
    val eng = new Engine(spark, EngineConfig(
      storePath = s"$dir/store", indexPath = s"$dir/index"), FileEmbedder(path))
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    eng.ingest(docs)
    eng.update()
    val hits = eng.search(Seq("a note on spark joins")).collect()
    assert(hits.length == 4) // k=4 ranked hits for the one query
    assert(hits.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
    val scores = hits.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(scores.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  private def freshAttn: FileEmbedder.AttnModel = FileEmbedder.AttnModel(
    "etaoinsh".toCharArray, 8,
    pos = FileEmbedder.syntheticWeights(17L, 8, 8),
    we = FileEmbedder.syntheticWeights(23L, 8, 8),
    wq = FileEmbedder.syntheticWeights(29L, 8, 8),
    wk = FileEmbedder.syntheticWeights(31L, 8, 8),
    wv = FileEmbedder.syntheticWeights(37L, 8, 8),
    w2 = FileEmbedder.syntheticWeights(41L, 8, 8))

  test("GRAFT-ATTN checkpoint: six tensors round-trip; forward parity through the seam") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attn").toString
    val m = freshAttn
    FileEmbedder.saveAttn(s"$dir/m.ckpt", m)
    FileEmbedder.load(s"$dir/m.ckpt") match {
      case loaded: FileEmbedder.AttnModel =>
        assert(loaded.dim == 8 && loaded.maxlen == 8)
        assert(loaded.features.sameElements(m.features))
        for ((a, b) <- Seq(loaded.pos -> m.pos, loaded.we -> m.we, loaded.wq -> m.wq,
            loaded.wk -> m.wk, loaded.wv -> m.wv, loaded.w2 -> m.w2))
          a.zip(b).foreach { case (ra, rb) => assert(ra.sameElements(rb)) }
        val texts = Seq("a note on spark joins", "neural network training corpus",
          "one two three four five six seven eight nine ten", "")
        loaded.forward(texts).zip(m.forward(texts)).foreach {
          case (g, w) => assert(g.sameElements(w))
        }
        val e = FileEmbedder(s"$dir/m.ckpt")
        assert(e.dim == 8)
        assert(e.embedBatch(texts).head.sameElements(m.forward(texts).head))
      case other => fail(s"expected the attention shape, loaded $other")
    }
  }

  test("attention forward: unit norm, empty text zero, context truncates at maxlen") {
    val m = freshAttn
    val Seq(v1, vEmpty, vLong, vTrunc) = m.forward(Seq(
      "the quick brown fox", "  ",
      "one two three four five six seven eight extra tokens ignored",
      "one two three four five six seven eight"))
    assert(math.abs(math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum) - 1.0) < 1e-6)
    assert(vEmpty.forall(_ == 0.0f))
    // tokens beyond maxlen=8 cannot change the embedding
    assert(vLong.sameElements(vTrunc))
    // attention actually mixes tokens: permuting tokens changes the vector
    // (a bag-of-tokens pool could not — position embeddings + attention do)
    val Seq(ab, ba) = m.forward(Seq("alpha beta", "beta alpha"))
    assert(!ab.sameElements(ba))
  }

  test("exp2pl: exact at integers, monotone, clamped to [-8, 8]") {
    assert(FileEmbedder.exp2pl(0.0) == 1.0)
    assert(FileEmbedder.exp2pl(3.0) == 8.0)
    assert(FileEmbedder.exp2pl(-2.0) == 0.25)
    assert(FileEmbedder.exp2pl(100.0) == 256.0 && FileEmbedder.exp2pl(-100.0) == 0.00390625)
    val xs = (-80 to 80).map(i => FileEmbedder.exp2pl(i / 10.0))
    xs.sliding(2).foreach { case Seq(a, b) => assert(a < b) case _ => () }
  }

  private def freshAttn2: FileEmbedder.Attn2Model = {
    def sw(seed: Long) = FileEmbedder.syntheticWeights(seed, 8, 8)
    def vecOf(seed: Long, f: Double => Double) =
      FileEmbedder.syntheticWeights(seed, 1, 8).head.map(f)
    def blk(s: Long) = FileEmbedder.AttnBlock(
      sw(s), sw(s + 2), sw(s + 4), sw(s + 6), sw(s + 8),
      vecOf(s + 10, x => 1.0 + x / 4), vecOf(s + 12, _ / 4),
      vecOf(s + 14, x => 1.0 + x / 4), vecOf(s + 16, _ / 4))
    FileEmbedder.Attn2Model("etaoinsh".toCharArray, maxlen = 8, heads = 2,
      pos = sw(17L), we = sw(23L), blocks = List(blk(29L), blk(67L)))
  }

  test("GRAFT-ATTN 2: heads/blocks/layernorm topology round-trips; forward bit-parity") {
    val dir = java.nio.file.Files.createTempDirectory("graft-attn2").toString
    val m = freshAttn2
    FileEmbedder.saveAttn2(s"$dir/m.ckpt", m)
    FileEmbedder.load(s"$dir/m.ckpt") match {
      case loaded: FileEmbedder.Attn2Model =>
        assert(loaded.dim == 8 && loaded.maxlen == 8)
        assert(loaded.heads == 2 && loaded.blocks.length == 2 && loaded.dh == 4)
        assert(loaded.features.sameElements(m.features))
        loaded.blocks.zip(m.blocks).foreach { case (a, b) =>
          for ((wa, wb) <- Seq(a.wq -> b.wq, a.wk -> b.wk, a.wv -> b.wv,
              a.wo -> b.wo, a.w2 -> b.w2))
            wa.zip(wb).foreach { case (ra, rb) => assert(ra.sameElements(rb)) }
          for ((va, vb) <- Seq(a.g1 -> b.g1, a.b1 -> b.b1, a.g2 -> b.g2, a.b2 -> b.b2))
            assert(va.sameElements(vb))
        }
        val texts = Seq("a note on spark joins", "neural network training corpus",
          "one two three four five six seven eight nine ten", "")
        loaded.forward(texts).zip(m.forward(texts)).foreach {
          case (g, w) => assert(g.sameElements(w))
        }
        val e = FileEmbedder(s"$dir/m.ckpt")
        assert(e.dim == 8)
        assert(e.embedBatch(texts).head.sameElements(m.forward(texts).head))
      case other => fail(s"expected the deep attention shape, loaded $other")
    }
  }

  test("GRAFT-ATTN 2 forward: unit norm, empty zero, truncation, head/layer validation") {
    val m = freshAttn2
    val Seq(v1, vEmpty, vLong, vTrunc) = m.forward(Seq(
      "the quick brown fox", "  ",
      "one two three four five six seven eight extra tokens ignored",
      "one two three four five six seven eight"))
    assert(math.abs(math.sqrt(v1.map(x => x.toDouble * x.toDouble).sum) - 1.0) < 1e-6)
    assert(vEmpty.forall(_ == 0.0f))
    assert(vLong.sameElements(vTrunc))
    // token order matters (position embeddings + attention)
    val Seq(ab, ba) = m.forward(Seq("alpha beta", "beta alpha"))
    assert(!ab.sameElements(ba))
    // a second block really runs: truncating the stack changes the output
    val shallow = m.copy(blocks = m.blocks.take(1))
    assert(!shallow.forward(Seq("alpha beta")).head.sameElements(ab))
    // heads must divide dim; layernorm vectors must be dim-sized
    intercept[IllegalArgumentException](m.copy(heads = 3))
    intercept[IllegalArgumentException](m.copy(blocks =
      List(m.blocks.head.copy(g1 = Array(1.0, 2.0)))))
    // layernorm really normalizes: each block-output token state has
    // near-zero mean under g=1,b=0 (scaled/shifted only by the gains)
    val id = m.copy(blocks = m.blocks.map(b =>
      b.copy(g1 = Array.fill(8)(1.0), b1 = Array.fill(8)(0.0),
        g2 = Array.fill(8)(1.0), b2 = Array.fill(8)(0.0))))
    val (states, mask) = id.tokenStates("alpha beta gamma")
    states.zip(mask).filter(_._2 == 1.0).map(_._1).foreach { st =>
      assert(math.abs(st.sum / st.length) < 1e-9, s"mean not ~0: ${st.toSeq}")
      val vr = st.map(x => x * x).sum / st.length
      assert(vr > 0.5 && vr < 1.5, s"variance not ~1: $vr")
    }
  }

  test("GRAFT-ATTN 2 pooling parity with the V2 masked mean-pool") {
    val m = freshAttn2
    val texts = Seq("a note on spark joins and shuffles", "single")
    val rows = texts.map { t =>
      val (g, mask) = m.tokenStates(t)
      (t, g.map(_.toSeq).toSeq, mask.toSeq)
    }
    val df = spark.createDataFrame(rows).toDF("text", "tok_vecs", "mask")
    val pooled = df.select(graft.functions.VectorFns
      .maskedMeanPool(col("tok_vecs"), col("mask")).as("p"))
      .collect().map(_.getSeq[Double](0))
    texts.zip(pooled).foreach { case (t, viaV2) =>
      assert(viaV2.toArray.sameElements(m.pooled(t)),
        s"pool divergence on '$t': $viaV2 vs ${m.pooled(t).toSeq}")
    }
  }

  test("pooling parity: the transformer's pool IS the V2 masked mean-pool (embed.py:44-49)") {
    val m = freshAttn
    val texts = Seq("a note on spark joins and shuffles",
      "neural network training corpus", "single")
    // drive the V2 pool (VectorFns.maskedMeanPool — the q57-graded column
    // op) over the transformer's OWN token states; the model's pooled
    // vector must be exactly what the V2 pool computes (identical op
    // sequence: sum(token_emb * mask) in ascending order, then / sum(mask))
    val rows = texts.map { t =>
      val (g, mask) = m.tokenStates(t)
      (t, g.map(_.toSeq).toSeq, mask.toSeq)
    }
    val df = spark.createDataFrame(rows).toDF("text", "tok_vecs", "mask")
    val pooled = df.select(graft.functions.VectorFns
      .maskedMeanPool(col("tok_vecs"), col("mask")).as("p"))
      .collect().map(_.getSeq[Double](0))
    texts.zip(pooled).foreach { case (t, viaV2) =>
      assert(viaV2.toArray.sameElements(m.pooled(t)),
        s"pool divergence on '$t': $viaV2 vs ${m.pooled(t).toSeq}")
    }
  }
}

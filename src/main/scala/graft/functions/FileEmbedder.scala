package graft.functions

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/**
 * An [[graft.Engine.Embedder]] whose parameters live in a CHECKPOINT FILE
 * rather than in code — the production seam for a real model
 * (`src/coldata/vdb/embed.py:21-39` loads transformer weights from the HF
 * cache and runs tokenize → forward → pool → normalize per batch).
 *
 * The sandbox has no ML runtime (zero egress: onnxruntime / DJL never
 * resolve), so the forward pass here is a dense linear projection over
 * character-count features — but every piece of *plumbing* a real model
 * needs is real and tested:
 *
 *   - weights serialized to a versioned checkpoint on shared storage
 *     ([[FileEmbedder.save]] / [[FileEmbedder.load]] round-trip exactly);
 *   - the task closure ships only the PATH (the case class is a few bytes);
 *     parameters are materialized lazily on the executor via
 *     `@transient lazy val`, exactly how an ONNX `OrtSession` or JNI handle
 *     must be held (it is not serializable);
 *   - one load per executor JVM per checkpoint, not per task — a process-wide
 *     cache keyed by path ([[FileEmbedder.loadCount]] lets tests assert
 *     this), because on a 1000-executor cluster re-reading a multi-GB
 *     checkpoint per task is the classic inference-pipeline bottleneck;
 *   - a batched forward contract (`texts.length` in → `texts.length`
 *     vectors out) driven through
 *     [[graft.functions.VectorFns.embedPartitions]]'s fixed-size batching.
 *
 * Swapping in a real transformer = replace [[FileEmbedder.Model.forward]]'s
 * body with the runtime call; nothing else moves.
 */
final case class FileEmbedder(modelPath: String) extends graft.Engine.Embedder {
  @transient private lazy val model: FileEmbedder.Ckpt = FileEmbedder.load(modelPath)
  def dim: Int = model.dim
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = model.forward(texts)
}

object FileEmbedder {

  /** A loaded checkpoint: any topology with the batched-forward contract.
    * [[Model]] is the single linear layer; [[MlpModel]] an arbitrary stack
    * of weight tensors with per-layer activation tags — the seam must
    * prove arbitrary model TOPOLOGIES round-trip the checkpoint file, not
    * one hardcoded shape. */
  sealed trait Ckpt extends Serializable {
    def dim: Int
    def forward(texts: Seq[String]): Seq[Array[Float]]
  }

  /** Per-character count features for input text `t`: c_j = count of
    * `features(j)` in `t` — the deterministic "tokenizer" both model
    * shapes share and a SQL oracle replays with the length-difference
    * trick. */
  private def charCounts(features: Array[Char], t: String): Array[Double] = {
    val nf = features.length
    val c = new Array[Double](nf)
    var j = 0
    while (j < nf) {
      var cnt = 0; var k = 0
      while (k < t.length) { if (t.charAt(k) == features(j)) cnt += 1; k += 1 }
      c(j) = cnt.toDouble
      j += 1
    }
    c
  }

  /** L2-normalize with the double-accumulate / float-cast contract of
    * [[VectorFns.hashEmbed]], so a SQL oracle replays it bit-exactly. */
  private def normalize(x: Array[Double]): Array[Float] = {
    var n2 = 0.0; var i = 0
    while (i < x.length) { n2 += x(i) * x(i); i += 1 }
    val out = new Array[Float](x.length)
    if (n2 > 0) {
      val inv = 1.0 / math.sqrt(n2)
      i = 0
      while (i < x.length) { out(i) = (x(i) * inv).toFloat; i += 1 }
    }
    out
  }

  /** One dense matrix-multiply, accumulated in input order (j ascending) so
    * the SQL literal sum `w0*c0 + w1*c1 + …` replays it bit-exactly. */
  private def dense(w: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val out = new Array[Double](w.length)
    var i = 0
    while (i < w.length) {
      var s = 0.0; var j = 0
      val row = w(i)
      while (j < row.length) { s += row(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }

  /** A dense linear layer over per-character count features: x = W·c, then
    * L2-normalized. The `GRAFT-LINEAR 1` checkpoint shape. */
  final case class Model(features: Array[Char], w: Array[Array[Double]]) extends Ckpt {
    val dim: Int = w.length
    require(w.forall(_.length == features.length),
      s"weight rows must match feature count ${features.length}")
    def forward(texts: Seq[String]): Seq[Array[Float]] =
      texts.map(t => normalize(dense(w, charCounts(features, t))))
  }

  /** One MLP layer: a weight tensor + an activation tag. Activations are
    * restricted to the EXACTLY-replayable set (selection functions, no
    * transcendentals — an oracle must reproduce the forward pass
    * bit-for-bit; a real runtime swaps this enum for its own kernel). */
  final case class Layer(w: Array[Array[Double]], activation: String) {
    require(activation == "relu" || activation == "none",
      s"unknown activation '$activation' (relu|none)")
  }

  /** A multi-layer perceptron over the same count features: an ARBITRARY
    * list of weight tensors with activation tags, chained shape-checked —
    * h⁰ = counts; hᵏ = actₖ(Wₖ·hᵏ⁻¹); output = normalize(hᴸ). The
    * `GRAFT-MLP 1` checkpoint shape: the seam now proves a topology the
    * loader has never seen (layer count, widths, activations all live in
    * the FILE, not the code). */
  final case class MlpModel(features: Array[Char], layers: List[Layer]) extends Ckpt {
    require(layers.nonEmpty, "an MLP needs at least one layer")
    require(layers.head.w.forall(_.length == features.length),
      s"layer-1 width must match feature count ${features.length}")
    layers.sliding(2).foreach {
      case List(a, b) =>
        require(b.w.forall(_.length == a.w.length),
          s"layer widths don't chain: ${a.w.length} -> rows expect ${b.w.head.length}")
      case _ => ()
    }
    val dim: Int = layers.last.w.length
    def forward(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
      var v = charCounts(features, t)
      layers.foreach { l =>
        val y = dense(l.w, v)
        if (l.activation == "relu") {
          var i = 0
          while (i < y.length) { if (!(y(i) > 0)) y(i) = 0.0; i += 1 }
        }
        v = y
      }
      normalize(v)
    }
  }

  /** Exact powers of two for the piecewise-linear exp2 — indexed by
    * exponent + 8 (domain [-8, 8]); every entry is an exact double AND has
    * an exact decimal spelling, so a SQL literal parses to the same bits. */
  private[graft] val pow2Table: Array[Double] =
    Array.tabulate(17)(i => java.lang.Math.scalb(1.0, i - 8))

  /** SQL spelling of the [[pow2Table]] lookup over an integer expression —
    * a 17-branch CASE of exact power-of-two literals (powers of two have
    * finite decimal spellings, so the SQL parser recovers the same bits). */
  private[graft] def pow2CaseSql(arg: String): String =
    "CASE " + arg + pow2Table.zipWithIndex.map { case (v, i) =>
      s" WHEN ${i - 8} THEN $v"
    }.mkString + " END"

  /** Piecewise-linear base-2 exponential over [-8, 8]: 2^⌊s⌋·(1 + frac(s)).
    * Built ONLY from IEEE-exact ops (floor, multiply, add — each correctly
    * rounded and identical on every IEEE-754 engine), so a DuckDB oracle
    * reproduces softmax weights bit-for-bit; a libm `exp` differs across
    * runtimes by ULPs, which a hash-compared pipeline cannot tolerate.
    * Monotone, continuous, exact at integers — a standard exp2
    * approximation (the float-hack family: Schraudolph 1999). */
  private[graft] def exp2pl(s0: Double): Double = {
    val s = math.max(-8.0, math.min(8.0, s0))
    val fs = math.floor(s)
    pow2Table(fs.toInt + 8) * (1.0 + (s - fs))
  }

  /**
   * A tiny deterministic TRANSFORMER — the reference's one never-executed
   * component (`embed.py:21-49` tokenize → forward → masked mean-pool →
   * normalize) run for real on the JVM, no weights download: token char
   * counts project through We (+ learned-position embeddings), one
   * single-head self-attention layer (Wq/Wk/Wv, scaled dot product,
   * piecewise-linear-exp2 softmax), one position-wise FFN layer (W2,
   * relu), masked mean-pool over real tokens (`sum(h·mask)/sum(mask)`,
   * embed.py:44-49), L2-normalize. Every op is IEEE-exact (+ − × ÷ sqrt
   * floor min max), accumulated in fixed ascending order, so the forward
   * is bit-reproducible across engines — the property the DuckDB oracle
   * grades. The `GRAFT-ATTN 1` checkpoint shape: all six tensors live in
   * the FILE.
   */
  final case class AttnModel(features: Array[Char], maxlen: Int,
      pos: Array[Array[Double]], we: Array[Array[Double]],
      wq: Array[Array[Double]], wk: Array[Array[Double]],
      wv: Array[Array[Double]], w2: Array[Array[Double]]) extends Ckpt {
    val dim: Int = we.length
    require(maxlen >= 1 && pos.length == maxlen && pos.forall(_.length == dim),
      s"pos must be maxlen x dim ($maxlen x $dim)")
    require(we.forall(_.length == features.length),
      s"We rows must match feature count ${features.length}")
    for ((w, n) <- Seq((wq, "Wq"), (wk, "Wk"), (wv, "Wv"), (w2, "W2")))
      require(w.length == dim && w.forall(_.length == dim), s"$n must be $dim x $dim")

    private def tokenize(t: String): Array[String] = {
      val s = if (t == null) "" else t.trim
      if (s.isEmpty) Array.empty
      else s.split("\\s+").filter(_.nonEmpty).take(maxlen)
    }

    /** Per-token layer-2 states padded to `maxlen`, plus the 0/1 attention
      * mask — the pair [[graft.functions.VectorFns.maskedMeanPool]] pools,
      * exposed so the pooling-parity spec can drive the V2 pool over the
      * transformer's own token states. */
    def tokenStates(t: String): (Array[Array[Double]], Array[Double]) = {
      val toks = tokenize(t)
      val n = toks.length
      val mask = Array.tabulate(maxlen)(i => if (i < n) 1.0 else 0.0)
      val g = Array.fill(maxlen)(new Array[Double](dim))
      if (n == 0) return (g, mask)
      // h_i = We·counts(tok_i) + pos_i
      val h = Array.tabulate(n) { i =>
        val c = charCounts(features, toks(i))
        Array.tabulate(dim)(r => dense1(we(r), c) + pos(i)(r))
      }
      // single-head attention: q scaled by 1/dim, scores by 1/dim^2 —
      // power-of-two divisors (dim = 8) keep the scaling IEEE-exact
      val q = Array.tabulate(n)(i => Array.tabulate(dim)(r => dense1(wq(r), h(i)) / dim))
      val k = Array.tabulate(n)(i => Array.tabulate(dim)(r => dense1(wk(r), h(i))))
      val v = Array.tabulate(n)(i => Array.tabulate(dim)(r => dense1(wv(r), h(i))))
      var i = 0
      while (i < n) {
        val e = Array.tabulate(n)(j => exp2pl(dense1(q(i), k(j)) / (dim * dim)))
        var den = 0.0; var j = 0
        while (j < n) { den += e(j); j += 1 }
        val o = new Array[Double](dim)
        var r = 0
        while (r < dim) {
          var acc = 0.0; j = 0
          while (j < n) { acc += (e(j) / den) * v(j)(r); j += 1 }
          o(r) = acc
          r += 1
        }
        // layer 2: position-wise FFN, relu
        r = 0
        while (r < dim) {
          val y = dense1(w2(r), o)
          g(i)(r) = if (y > 0) y else 0.0
          r += 1
        }
        i += 1
      }
      (g, mask)
    }

    /** Masked mean-pool of the layer-2 states (embed.py:44-49 semantics:
      * `sum(token_emb * mask) / sum(mask)`), before normalization. */
    def pooled(t: String): Array[Double] = {
      val (g, mask) = tokenStates(t)
      val n = mask.sum
      if (n == 0) new Array[Double](dim)
      else Array.tabulate(dim) { r =>
        var acc = 0.0; var i = 0
        while (i < maxlen) { acc += g(i)(r) * mask(i); i += 1 }
        acc / n
      }
    }

    def forward(texts: Seq[String]): Seq[Array[Float]] =
      texts.map(t => normalize(pooled(t)))
  }

  /** Layernorm epsilon — a power of two (2⁻¹⁰) so the literal has an exact
    * decimal spelling and `var + eps` is the same double on both engines. */
  private[graft] val LnEps: Double = java.lang.Math.scalb(1.0, -10)

  /** IEEE-exact layernorm: mean and variance divide by `dim` (a power of
    * two — exact), `1/sqrt(var+eps)` is two correctly-rounded ops, and the
    * affine is `g·((x−mean)·inv) + b` with that exact parenthesization —
    * every engine replaying the same operand order gets the same bits. */
  private def layerNorm(x: Array[Double], g: Array[Double],
                        b: Array[Double]): Array[Double] = {
    val d = x.length
    var mn = 0.0; var i = 0
    while (i < d) { mn += x(i); i += 1 }
    mn = mn / d
    var vr = 0.0; i = 0
    while (i < d) { val c = x(i) - mn; vr += c * c; i += 1 }
    vr = vr / d
    val inv = 1.0 / math.sqrt(vr + LnEps)
    Array.tabulate(d)(r => g(r) * ((x(r) - mn) * inv) + b(r))
  }

  /** One encoder block of the [[Attn2Model]]: multi-head attention tensors
    * (Wq/Wk/Wv sliced into `heads` row-blocks, Wo mixing the concatenated
    * heads), the position-wise FFN tensor, and the two post-sublayer
    * layernorms' gain/bias vectors. All shapes are validated by the model,
    * not here — the FILE carries the topology. */
  final case class AttnBlock(wq: Array[Array[Double]], wk: Array[Array[Double]],
      wv: Array[Array[Double]], wo: Array[Array[Double]], w2: Array[Array[Double]],
      g1: Array[Double], b1: Array[Double], g2: Array[Double], b2: Array[Double])

  /**
   * The ARCHITECTURE-COMPLETE deterministic transformer — [[AttnModel]]
   * (single-head, single-layer, no norm) extended to the real encoder
   * shape of `embed.py:21-39`'s e5 family: `heads ≥ 1` attention heads
   * (Wq/Wk/Wv row-blocks of width dim/heads, Wo mixing the concatenation),
   * `layers ≥ 1` stacked post-LN encoder blocks, each sublayer wrapped
   * `x + Sublayer(x)` then layernormed (Vaswani et al. 2017's post-LN
   * ordering, the BERT/e5 lineage). Still bit-reproducible: the softmax is
   * the piecewise-linear exp2, divisions are by powers of two (dim, head
   * width), layernorm is [[layerNorm]]'s fixed-order mean/var/1-over-sqrt
   * — so a DuckDB oracle replays the whole forward hash-exactly. The
   * `GRAFT-ATTN 2` checkpoint shape: head count, layer count, and every
   * tensor live in the FILE.
   */
  final case class Attn2Model(features: Array[Char], maxlen: Int, heads: Int,
      pos: Array[Array[Double]], we: Array[Array[Double]],
      blocks: List[AttnBlock]) extends Ckpt {
    val dim: Int = we.length
    require(maxlen >= 1 && pos.length == maxlen && pos.forall(_.length == dim),
      s"pos must be maxlen x dim ($maxlen x $dim)")
    require(we.forall(_.length == features.length),
      s"We rows must match feature count ${features.length}")
    require(heads >= 1 && dim % heads == 0,
      s"heads ($heads) must divide dim ($dim)")
    require(blocks.nonEmpty, "need at least one encoder block")
    /** Head width — a power of two in practice so the q/score scaling
      * divisions are IEEE-exact. */
    val dh: Int = dim / heads
    blocks.zipWithIndex.foreach { case (blk, l) =>
      for ((w, n) <- Seq((blk.wq, "Wq"), (blk.wk, "Wk"), (blk.wv, "Wv"),
          (blk.wo, "Wo"), (blk.w2, "W2")))
        require(w.length == dim && w.forall(_.length == dim),
          s"layer $l $n must be $dim x $dim")
      for ((v, n) <- Seq((blk.g1, "g1"), (blk.b1, "b1"), (blk.g2, "g2"), (blk.b2, "b2")))
        require(v.length == dim, s"layer $l $n must have $dim entries")
    }

    private def tokenize(t: String): Array[String] = {
      val s = if (t == null) "" else t.trim
      if (s.isEmpty) Array.empty
      else s.split("\\s+").filter(_.nonEmpty).take(maxlen)
    }

    /** Final-block token states padded to `maxlen` + the 0/1 mask — the
      * same contract as [[AttnModel.tokenStates]] so the pooling-parity
      * spec drives the V2 pool over this model's states too. */
    def tokenStates(t: String): (Array[Array[Double]], Array[Double]) = {
      val toks = tokenize(t)
      val n = toks.length
      val mask = Array.tabulate(maxlen)(i => if (i < n) 1.0 else 0.0)
      val out = Array.fill(maxlen)(new Array[Double](dim))
      if (n == 0) return (out, mask)
      var h = Array.tabulate(n) { i =>
        val c = charCounts(features, toks(i))
        Array.tabulate(dim)(r => dense1(we(r), c) + pos(i)(r))
      }
      blocks.foreach { blk =>
        // multi-head attention: head hd owns rows [hd·dh, (hd+1)·dh);
        // q rows scaled by 1/dim, scores by 1/dim² ([[AttnModel]]'s own
        // spelling, per head) — power-of-two divisors stay IEEE-exact
        val q = Array.tabulate(n)(i =>
          Array.tabulate(dim)(r => dense1(blk.wq(r), h(i)) / dim))
        val k = Array.tabulate(n)(i => Array.tabulate(dim)(r => dense1(blk.wk(r), h(i))))
        val v = Array.tabulate(n)(i => Array.tabulate(dim)(r => dense1(blk.wv(r), h(i))))
        val next = new Array[Array[Double]](n)
        var i = 0
        while (i < n) {
          val o = new Array[Double](dim)
          var hd = 0
          while (hd < heads) {
            val base = hd * dh
            val e = Array.tabulate(n) { j =>
              var s = 0.0; var r = base
              while (r < base + dh) { s += q(i)(r) * k(j)(r); r += 1 }
              exp2pl(s / (dim * dim))
            }
            var den = 0.0; var j = 0
            while (j < n) { den += e(j); j += 1 }
            var r = base
            while (r < base + dh) {
              var acc = 0.0; j = 0
              while (j < n) { acc += (e(j) / den) * v(j)(r); j += 1 }
              o(r) = acc
              r += 1
            }
            hd += 1
          }
          // Wo head-mix, residual, LN1, FFN(relu), residual, LN2
          val r1 = Array.tabulate(dim)(r => h(i)(r) + dense1(blk.wo(r), o))
          val ln1 = layerNorm(r1, blk.g1, blk.b1)
          val r2 = Array.tabulate(dim) { r =>
            val y = dense1(blk.w2(r), ln1)
            ln1(r) + (if (y > 0) y else 0.0)
          }
          next(i) = layerNorm(r2, blk.g2, blk.b2)
          i += 1
        }
        h = next
      }
      var i = 0
      while (i < n) { out(i) = h(i); i += 1 }
      (out, mask)
    }

    /** Masked mean-pool of the final-block states (embed.py:44-49). */
    def pooled(t: String): Array[Double] = {
      val (g, mask) = tokenStates(t)
      val n = mask.sum
      if (n == 0) new Array[Double](dim)
      else Array.tabulate(dim) { r =>
        var acc = 0.0; var i = 0
        while (i < maxlen) { acc += g(i)(r) * mask(i); i += 1 }
        acc / n
      }
    }

    def forward(texts: Seq[String]): Seq[Array[Float]] =
      texts.map(t => normalize(pooled(t)))
  }

  /** Row-vector dot product accumulated in ascending index order — the ONE
    * accumulation order every engine must share for bit-equal sums. */
  private def dense1(row: Array[Double], v: Array[Double]): Double = {
    var s = 0.0; var j = 0
    while (j < row.length) { s += row(j) * v(j); j += 1 }
    s
  }

  /** Checkpoint loads per JVM — the spec asserts repeated instances /
    * tasks hit the cache instead of re-reading the file. */
  val loadCount = new AtomicInteger(0)

  private val cache = new ConcurrentHashMap[String, Ckpt]()

  /** Versioned plain-text checkpoint:
    * {{{
    * GRAFT-LINEAR 1
    * features aeiounst
    * dim 8
    * 0.927 -0.314 ... (one row per output dimension)
    * }}}
    * Weights print via `Double.toString` (shortest round-trip decimal), so
    * save → load is bit-exact. */
  def save(path: String, model: Model): Unit = {
    val sb = new StringBuilder
    sb.append("GRAFT-LINEAR 1\n")
    sb.append("features ").append(new String(model.features)).append('\n')
    sb.append("dim ").append(model.dim).append('\n')
    model.w.foreach { row => sb.append(row.mkString(" ")).append('\n') }
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Multi-layer checkpoint — the topology lives in the FILE:
    * {{{
    * GRAFT-MLP 1
    * features aeiounst
    * layers 2
    * layer 8 8 relu     (rows cols activation)
    * …8 weight rows…
    * layer 8 8 none
    * …8 weight rows…
    * }}} */
  def saveMlp(path: String, model: MlpModel): Unit = {
    val sb = new StringBuilder
    sb.append("GRAFT-MLP 1\n")
    sb.append("features ").append(new String(model.features)).append('\n')
    sb.append("layers ").append(model.layers.length).append('\n')
    model.layers.foreach { l =>
      sb.append(s"layer ${l.w.length} ${l.w.head.length} ${l.activation}\n")
      l.w.foreach { row => sb.append(row.mkString(" ")).append('\n') }
    }
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Transformer checkpoint — six named tensors, the topology in the FILE:
    * {{{
    * GRAFT-ATTN 1
    * features etaoinsh
    * dim 8
    * maxlen 8
    * tensor pos 8 8
    * …8 weight rows…
    * tensor we 8 8
    * …   (then wq, wk, wv, w2)
    * }}} */
  def saveAttn(path: String, model: AttnModel): Unit = {
    val sb = new StringBuilder
    sb.append("GRAFT-ATTN 1\n")
    sb.append("features ").append(new String(model.features)).append('\n')
    sb.append("dim ").append(model.dim).append('\n')
    sb.append("maxlen ").append(model.maxlen).append('\n')
    for ((name, w) <- Seq("pos" -> model.pos, "we" -> model.we, "wq" -> model.wq,
        "wk" -> model.wk, "wv" -> model.wv, "w2" -> model.w2)) {
      sb.append(s"tensor $name ${w.length} ${w.head.length}\n")
      w.foreach { row => sb.append(row.mkString(" ")).append('\n') }
    }
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  /** Architecture-complete transformer checkpoint — heads/layers and
    * every tensor in the FILE:
    * {{{
    * GRAFT-ATTN 2
    * features etaoinsh
    * dim 8
    * maxlen 8
    * heads 2
    * layers 2
    * tensor pos 8 8
    * …rows…
    * tensor we 8 8
    * …rows…
    * block 0
    * tensor wq 8 8   (then wk, wv, wo, w2)
    * vector g1 8     (one row; then b1, g2, b2)
    * block 1
    * …
    * }}} */
  def saveAttn2(path: String, model: Attn2Model): Unit = {
    val sb = new StringBuilder
    sb.append("GRAFT-ATTN 2\n")
    sb.append("features ").append(new String(model.features)).append('\n')
    sb.append("dim ").append(model.dim).append('\n')
    sb.append("maxlen ").append(model.maxlen).append('\n')
    sb.append("heads ").append(model.heads).append('\n')
    sb.append("layers ").append(model.blocks.length).append('\n')
    def tensor(name: String, w: Array[Array[Double]]): Unit = {
      sb.append(s"tensor $name ${w.length} ${w.head.length}\n")
      w.foreach { row => sb.append(row.mkString(" ")).append('\n') }
    }
    def vector(name: String, v: Array[Double]): Unit =
      sb.append(s"vector $name ${v.length}\n").append(v.mkString(" ")).append('\n')
    tensor("pos", model.pos); tensor("we", model.we)
    model.blocks.zipWithIndex.foreach { case (blk, l) =>
      sb.append(s"block $l\n")
      tensor("wq", blk.wq); tensor("wk", blk.wk); tensor("wv", blk.wv)
      tensor("wo", blk.wo); tensor("w2", blk.w2)
      vector("g1", blk.g1); vector("b1", blk.b1)
      vector("g2", blk.g2); vector("b2", blk.b2)
    }
    Files.write(Paths.get(path), sb.toString.getBytes(StandardCharsets.UTF_8))
  }

  def load(path: String): Ckpt =
    cache.computeIfAbsent(path, p => {
      loadCount.incrementAndGet()
      val lines = new String(Files.readAllBytes(Paths.get(p)), StandardCharsets.UTF_8)
        .split("\n").filter(_.nonEmpty)
      lines(0) match {
        case "GRAFT-LINEAR 1" =>
          val features = lines(1).stripPrefix("features ").toCharArray
          val dim = lines(2).stripPrefix("dim ").toInt
          val w = lines.slice(3, 3 + dim).map(_.split(" ").map(_.toDouble))
          Model(features, w)
        case "GRAFT-MLP 1" =>
          val features = lines(1).stripPrefix("features ").toCharArray
          val nLayers = lines(2).stripPrefix("layers ").toInt
          var at = 3
          val layers = List.fill(nLayers) {
            val Array(_, rows, _, act) = lines(at).split(" ")
            val w = lines.slice(at + 1, at + 1 + rows.toInt)
              .map(_.split(" ").map(_.toDouble))
            at += 1 + rows.toInt
            Layer(w, act)
          }
          MlpModel(features, layers)
        case "GRAFT-ATTN 1" =>
          val features = lines(1).stripPrefix("features ").toCharArray
          val maxlen = lines(3).stripPrefix("maxlen ").toInt
          var at = 4
          val tensors = scala.collection.mutable.Map.empty[String, Array[Array[Double]]]
          while (at < lines.length) {
            val Array(_, name, rows, _) = lines(at).split(" ")
            tensors(name) = lines.slice(at + 1, at + 1 + rows.toInt)
              .map(_.split(" ").map(_.toDouble))
            at += 1 + rows.toInt
          }
          AttnModel(features, maxlen, tensors("pos"), tensors("we"),
            tensors("wq"), tensors("wk"), tensors("wv"), tensors("w2"))
        case "GRAFT-ATTN 2" =>
          val features = lines(1).stripPrefix("features ").toCharArray
          val maxlen = lines(3).stripPrefix("maxlen ").toInt
          val heads = lines(4).stripPrefix("heads ").toInt
          val nBlocks = lines(5).stripPrefix("layers ").toInt
          var at = 6
          def tensor(): Array[Array[Double]] = {
            val Array(_, _, rows, _) = lines(at).split(" ")
            val w = lines.slice(at + 1, at + 1 + rows.toInt)
              .map(_.split(" ").map(_.toDouble))
            at += 1 + rows.toInt
            w
          }
          def vector(): Array[Double] = { at += 2; lines(at - 1).split(" ").map(_.toDouble) }
          val pos = tensor(); val we = tensor()
          val blocks = List.fill(nBlocks) {
            at += 1 // "block N"
            AttnBlock(tensor(), tensor(), tensor(), tensor(), tensor(),
              vector(), vector(), vector(), vector())
          }
          Attn2Model(features, maxlen, heads, pos, we, blocks)
        case h => throw new IllegalArgumentException(s"unknown checkpoint format: $h")
      }
    })

  /** Deterministic "trained" parameters from a seed (an LCG over a
    * 3-decimal grid in [-1, 1]) — a pure function of (seed, dim, nfeat),
    * so the engine side and the DuckDB oracle derive the SAME literals
    * independently, and 3-decimal values round-trip exactly through
    * `Double.toString` / SQL decimal literals. */
  def syntheticWeights(seed: Long, dim: Int, nfeat: Int): Array[Array[Double]] = {
    var st = seed
    def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st }
    Array.fill(dim, nfeat) { ((math.floorMod(next() >>> 16, 2001L)) - 1000L) / 1000.0 }
  }
}

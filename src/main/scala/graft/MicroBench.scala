package graft

/** Dev tool: Spark-free microbenchmarks of per-row kernels (hashEmbed and
  * friends) — wall-noise-resistant A/B checks for per-task-work changes
  * (optimization guide §1.2 step 2). `runMain graft.MicroBench` */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    val vocab = Array.tabulate(5000)(i => s"tok${rnd.nextInt(99999)}_$i")
    val texts = Array.tabulate(30000) { _ =>
      Array.fill(24)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    def timed(label: String)(body: => Unit): Unit = {
      (1 to 3).foreach(_ => body) // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-28s min=${times.min}%8.1f ms  med=${times.sorted.apply(2)}%8.1f ms")
    }
    timed("hashEmbed dim=64") {
      var i = 0
      while (i < texts.length) {
        graft.functions.VectorFns.hashEmbed(texts(i), 64); i += 1
      }
    }
  }
}

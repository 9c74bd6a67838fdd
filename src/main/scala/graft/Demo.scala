package graft

import org.apache.spark.sql.SparkSession

/**
 * Smoke driver AND interactive search console.
 *
 * Default (no args): the flagship-query smoke (t1 contract) — prints the
 * ranked, hydrated semantic-search hits from `SparkEntry.entry` on
 * sf0.001 and `ROWS=n`.
 *
 * `runMain graft.Demo interactive [sfDir]`: the reference's search UI
 * (`demo.py:22-68` — a Gradio page with a query box and a top-k slider
 * feeding `vdb.search`) as its sandbox-appropriate counterpart, a console
 * loop over a REAL Engine: each input line is `[k] <free text query>`;
 * the corpus ingests + indexes once at startup (the same
 * ingest→update→search lifecycle `main.py` drives), then every line is
 * one `search` round-trip printing the hydrated top-k. Empty line or EOF
 * exits. The two "boxes" are the two fields of the input line; swapping
 * the console for Gradio/HTTP is presentation, not engine, work.
 *
 * Piped/interactive stdin reaches the JVM when launched directly:
 * `java --add-exports=java.base/sun.nio.ch=ALL-UNNAMED
 *   -cp "target/scala-2.13/classes:/opt/spark/jars/&#42;" graft.Demo
 *   interactive [sfDir]`
 * (a glob star after jars/ — spelled as an entity here because Scala
 * nests comments; sbt's batch mode does not forward its stdin pipe even
 * with `run / connectInput`).
 */
object Demo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // fork-free local-FS permissions (graft.util.NioLocalFileSystem):
      // stock Hadoop shells out to /bin/chmod per created file
      .config("spark.hadoop.fs.file.impl", "graft.util.NioLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("interactive")) interactive(spark, args)
    else {
      val result = SparkEntry.entry(spark)
      result.show(20, truncate = false)
      println(s"ROWS=${result.count()}")
    }
    spark.stop()
  }

  private def interactive(spark: SparkSession, args: Array[String]): Unit = {
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val tmp = java.nio.file.Files.createTempDirectory("graft_demo_").toString
    val cfg = EngineConfig(storePath = s"$tmp/store", indexPath = s"$tmp/index")
    val eng = new Engine(spark, cfg)
    println(s"[demo] indexing $sfDir/documents.parquet ...")
    eng.ingest(spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text"))
    eng.update()
    println("[demo] ready — enter `[k] query text` (empty line to exit)")
    val in = scala.io.Source.stdin.getLines()
    var live = true
    while (live && in.hasNext) {
      val line = in.next().trim
      if (line.isEmpty) live = false
      else {
        val (k, q) = line.split("\\s+", 2) match {
          // a leading all-digit token within int range and > 0 is the k
          // "box"; anything else (overflow, 0, no second field) is query
          // text — a typo must not kill the console
          case Array(n, rest) if n.length <= 9 && n.forall(_.isDigit) && n.toInt > 0 =>
            (n.toInt, rest)
          case _ => (cfg.limit, line)
        }
        val hits = new Engine(spark, cfg.copy(limit = k)).search(Seq(q))
        hits.show(k, truncate = false)
      }
    }
    println("[demo] bye")
  }
}

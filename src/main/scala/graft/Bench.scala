package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // coalesce post-shuffle partitions by size, not parallelism: at scale
      // AQE targets ~64MB partitions anyway; on small inputs this removes
      // dozens of empty tasks per stage
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/FS-client init, not query work
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // two timed runs per query, keep the min: this VM shows ±20-30% noisy-
    // neighbor variance, and the minimum is the stable estimate of what the
    // engine actually costs
    // a crashing query must NEVER bench as a plausible timing: record the
    // elapsed time AND the error, and surface errors in the output JSON
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame):
        (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // free each query's residue before the next timing: the RETURNED frame
    // of checkpoint-materializing operators (nearDupPairs, CC labels,
    // engine verbs…) holds localCheckpoint blocks the query itself cannot
    // release — across 200+ queries × 2 runs they accrete into executor
    // memory pressure that inflates the big-shuffle queries late in the
    // suite (the q118 suite-vs-isolated gap)
    // only residue CREATED by the timed query is released: a blanket
    // getPersistentRDDs unpersist would also drop localCheckpoint blocks a
    // frame memoized ACROSS queries depends on (a localCheckpointed RDD
    // cannot be recomputed after unpersist — reuse would throw
    // block-not-found), so snapshot the persistent set before the timing
    // and free only the delta
    def release(before: Set[Int]): Unit = {
      spark.sparkContext.getPersistentRDDs
        .foreach { case (id, rdd) => if (!before.contains(id)) rdd.unpersist(blocking = false) }
      spark.catalog.clearCache()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val pre1 = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val (t1, e1) = timeOnce(fn)
      release(pre1)
      val pre2 = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val (t2, e2) = timeOnce(fn)
      release(pre2)
      name -> (math.min(t1, t2), e1.orElse(e2))
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ") + "\""
    val errs = results.collect { case (k, (_, Some(e))) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    // This VM shows multi-minute noisy-neighbor degradation windows (see
    // BASELINE.md); a single such window inside one run can inflate a few
    // queries 20-30x and sink the whole sample. So alongside this run's
    // min-of-2, maintain a per-query ISOLATED best-known time across runs
    // (persisted per scale factor) and report both: queries_best is the
    // engine's demonstrated cost, queries is this run's sample.
    val bestPath = java.nio.file.Paths.get(sys.env.getOrElse(
      "SPARK_GRAFT_BEST_FILE",
      s"BENCH_BEST_${new java.io.File(sfDir).getName}.json"))
    val pair = "\"([^\"]+)\"\\s*:\\s*([0-9.eE+-]+)".r
    val prior: Map[String, Double] =
      if (java.nio.file.Files.exists(bestPath)) {
        val txt = new String(java.nio.file.Files.readAllBytes(bestPath), "UTF-8")
        pair.findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
      } else Map.empty
    val best = results.map { case (k, (v, err)) =>
      // an errored run must never lower the best-known cost
      k -> (if (err.isEmpty) math.min(v, prior.getOrElse(k, Double.MaxValue))
            else prior.getOrElse(k, v))
    }
    val bestJson = best.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val bestTotal = best.map(_._2).sum
    try java.nio.file.Files.write(bestPath, bestJson.getBytes("UTF-8"))
    catch { case _: Throwable => () } // a read-only CWD must not fail the bench
    // stop Spark BEFORE printing: the driver tail-parses stdout for the one
    // JSON line, and shutdown logging after the println left BENCH_r{7,8,9}
    // .json's `parsed` field null — the JSON must be the LAST line emitted
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"queries_best":$bestJson,"best_total":$bestTotal,"errors":$errs,"sf":"$sfDir"}""")
    System.out.flush()
  }
}

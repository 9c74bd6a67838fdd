package graft

import graft.operators.{Compaction, Sketches}
import org.apache.spark.sql.functions._

/** Invariants for the count-min sketch MV (q129) and the small-file
  * compaction rewrite (q128). */
class SketchesSpec extends SparkSpec {

  private def tokenCounts = {
    spark.read.parquet(s"$sf/documents.parquet")
      .filter(length(trim(col("text"))) > 0)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
  }

  test("count-min estimates are upper bounds and mass is conserved per row") {
    val depth = 4; val width = 1024
    val counts = tokenCounts.localCheckpoint()
    val sketch = Sketches.cmSketch(counts, col("token"), col("n_exact"), depth, width)
      .localCheckpoint()

    // each of the `depth` salted rows holds the full corpus mass
    val total = counts.agg(sum("n_exact")).collect().head.getLong(0)
    val perSalt = sketch.groupBy("salt").agg(sum("cnt").as("mass"))
      .collect().map(_.getAs[Long]("mass"))
    assert(perSalt.length == depth && perSalt.forall(_ == total))

    // CM guarantee: est(k) >= true(k), for EVERY key (not just heavy ones)
    val under = Sketches.cmEstimate(counts, "token", sketch, depth, width)
      .filter(col("n_est") < col("n_exact")).count()
    assert(under == 0)

    // probing keys the sketch has never seen returns an estimate (usually
    // 0 on a sparse sketch), never a silently-dropped row
    val unseen = spark.range(3)
      .select(concat(lit("graft-unseen-key-"), col("id")).as("token"))
    val probed = Sketches.cmEstimate(unseen, "token", sketch, depth, width)
      .collect()
    assert(probed.length == 3, "unseen keys must not vanish from the output")
    assert(probed.forall(_.getAs[Long]("n_est") >= 0L))

    // sketches of disjoint batches merge by cell-wise addition
    val half1 = counts.filter(col("token") < "m")
    val half2 = counts.filter(col("token") >= "m")
    val merged = Sketches.cmSketch(half1, col("token"), col("n_exact"), depth, width)
      .unionAll(Sketches.cmSketch(half2, col("token"), col("n_exact"), depth, width))
      .groupBy("salt", "bucket").agg(sum("cnt").as("cnt"))
    val whole = sketch.withColumnRenamed("cnt", "w")
    val drift = merged.join(whole, Seq("salt", "bucket"), "full")
      .filter(coalesce(col("cnt"), lit(0L)) =!= coalesce(col("w"), lit(0L))).count()
    assert(drift == 0)
  }

  test("selective compaction rewrites only fragmented dirs and salts the hot one") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_sel_")
    val path = s"$base/layout"
    // kb=0 is HOT (every even orderkey, ~4× a healthy dir); kb 0,1
    // fragmented into 16 batch files; kb 3,5,7 written healthy (1 file)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("kb",
        when(pmod(col("l_orderkey"), lit(2L)) === 0, lit(0L))
          .otherwise(pmod(col("l_orderkey"), lit(8L))))
    li.filter(col("kb") <= 1).repartition(16)
      .write.mode("overwrite").partitionBy("kb").parquet(path)
    li.filter(col("kb") > 1).repartition(col("kb"))
      .write.mode("append").partitionBy("kb").parquet(path)

    def names(v: String): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$path/kb=$v")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
    }
    val pre = Compaction.partitionStats(spark, path, "kb")
    assert(pre.filter(_.value.toLong <= 1).forall(_.files == 16))
    val healthyPre = pre.filter(_.value.toLong > 1).map(s => s.value -> names(s.value)).toMap
    assert(healthyPre.values.forall(_.size == 1))
    // decimal sum: double addition is order-sensitive and the rewrite
    // reorders rows — the checksum must not depend on float summation order
    val before = li.agg(count(lit(1)), sum("l_orderkey"),
      sum(col("l_extendedprice").cast("decimal(18,2)"))).collect().head

    val hotBytes = pre.map(_.bytes).max
    val rewritten = Compaction.compactSelective(spark, path, "kb", "l_orderkey",
      maxFilesPerDir = 4, targetFileBytes = math.max(1L, (hotBytes + 3) / 4))
    assert(rewritten.toSet.map((v: String) => v.toLong) == Set(0L, 1L),
      s"exactly the fragmented dirs must be rewritten, got $rewritten")

    val post = Compaction.partitionStats(spark, path, "kb").map(s => s.value -> s).toMap
    // (a) healthy dirs untouched: identical file sets, not rewritten copies
    healthyPre.foreach { case (v, fset) => assert(names(v) == fset, s"kb=$v was touched") }
    // (b) hot dir fanned across multiple writer tasks — no straggler rewrite
    assert(post("0").files >= 2 && post("0").files <= 4,
      s"hot dir files = ${post("0").files}, want 2..4")
    // (c) rewritten dirs within the files-per-dir bound
    assert(post("1").files <= 4)
    // lossless
    val after = spark.read.parquet(path)
      .agg(count(lit(1)), sum("l_orderkey"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))).collect().head
    assert(before == after)
    // idempotent: the layout is now healthy, a second pass is a no-op
    val second = Compaction.compactSelective(spark, path, "kb", "l_orderkey",
      maxFilesPerDir = 4, targetFileBytes = math.max(1L, (hotBytes + 3) / 4))
    assert(second.isEmpty,
      s"second pass rewrote $second; post: ${Compaction.partitionStats(spark, path, "kb")}")
  }

  test("compaction rewrites a fragmented layout to one file per directory, losslessly") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_spec_")
    val frag = s"$base/frag"
    val out = s"$base/out"
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("kb", pmod(col("l_orderkey"), lit(4L)))
    li.repartition(8).write.mode("overwrite").partitionBy("kb").parquet(frag)
    def filesPerDir(path: String) = spark.read.parquet(path)
      .select(col("kb"), col("_metadata.file_path").as("fn"))
      .groupBy("kb").agg(countDistinct(col("fn")).as("nf"))
    val filesBefore = filesPerDir(frag).agg(max("nf")).collect().head.getLong(0)
    assert(filesBefore > 1, "fixture must actually be fragmented")

    Compaction.compact(spark, frag, out, "kb")
    val perDir = filesPerDir(out).collect()
    assert(perDir.nonEmpty && perDir.forall(_.getAs[Long]("nf") == 1L))

    // lossless: same rows, same checksum
    val a = li.agg(count(lit(1)), sum("l_orderkey"), sum("l_linenumber")).collect().head
    val b = spark.read.parquet(out)
      .agg(count(lit(1)), sum("l_orderkey"), sum("l_linenumber")).collect().head
    assert(a == b)

    // maxRecordsPerFile still splits oversized directories during compaction
    val out2 = s"$base/out2"
    Compaction.compact(spark, frag, out2, "kb", maxRecordsPerFile = 100L)
    val splitDirs = filesPerDir(out2).agg(min("nf")).collect().head.getLong(0)
    assert(splitDirs > 1, "a 100-record bound must split every directory")

    // sortCols cluster rows INSIDE each rewritten file (zone-map repair):
    // every file must be internally non-decreasing on the sort key
    val out3 = s"$base/out3"
    Compaction.compact(spark, frag, out3, "kb", sortCols = Seq("l_orderkey"))
    val disorder = spark.read.parquet(out3)
      .select(col("_metadata.file_path").as("fn"), col("l_orderkey"))
      .mapPartitions { rows =>
        var prevFile: String = null; var prevKey = Long.MinValue; var bad = 0L
        rows.foreach { r =>
          val f = r.getString(0); val k = r.getLong(1)
          if (f != prevFile) { prevFile = f; prevKey = Long.MinValue }
          if (k < prevKey) bad += 1
          prevKey = k
        }
        Iterator.single(bad)
      }(org.apache.spark.sql.Encoders.scalaLong)
      .reduce(_ + _)
    assert(disorder == 0L, s"$disorder out-of-order rows inside compacted files")
  }
}

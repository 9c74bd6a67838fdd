package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import QHelpers._

/**
 * Source/sink coverage (SURVEY §2.1 S5 CSV scan — kaggle.py:44-47; §2.2 K4
 * parquet checkpoint — utils.py:16-28): round-trip the data through the
 * format and prove identity against the oracle's direct view of the table.
 */
object SourceQueries {

  private def tmp(dir: String, name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_${name}_" +
      Integer.toHexString(dir.hashCode)

  val queries: Map[String, Q] = Map(
    // S5: CSV write + schema'd read-back (pd.read_csv equivalent)
    "q31_csv_roundtrip" -> ((s, dir) => {
      val path = tmp(dir, "csv_region")
      t(s, dir, "region").coalesce(1).write.mode("overwrite")
        .option("header", "true").csv(path)
      s.read.option("header", "true")
        .schema(StructType(Seq(
          StructField("r_regionkey", IntegerType),
          StructField("r_name", StringType))))
        .csv(path)
        .orderBy(col("r_regionkey"))
    }),

    // K4: parquet checkpoint round-trip
    "q32_parquet_roundtrip" -> ((s, dir) => {
      val path = tmp(dir, "pq_nation")
      t(s, dir, "nation").write.mode("overwrite").parquet(path)
      s.read.parquet(path).orderBy(col("n_nationkey"))
    }),

    // bounded-file write (write hygiene at corpus scale: maxRecordsPerFile
    // caps output file size so no downstream consumer ever faces a
    // multi-GB part file; the per-file bound itself is asserted in
    // BoundedWriteSpec — file names aren't deterministic, so the GRADED
    // result is the read-back aggregate proving the data survived intact)
    "q67_bounded_files" -> ((s, dir) => {
      val path = tmp(dir, "pq_bounded_lineitem")
      t(s, dir, "lineitem").write.mode("overwrite")
        .option("maxRecordsPerFile", "10000").parquet(path)
      s.read.parquet(path)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // Small-file compaction (operators/Compaction.scala): a fragmented
    // hive layout — 16 round-robin ingest "batches" each scattering files
    // into every partition directory, the shape streaming appends leave
    // behind — is rewritten to ONE file per directory (one shuffle on the
    // partition column; maxRecordsPerFile still bounds the other extreme).
    // Graded: the read-back per-partition aggregate proves the data
    // survived byte-identically, was_fragmented proves the input really
    // had the small-file disease, and compact_ok (files-per-dir == 1,
    // via input_file_name) proves the rewrite cured it.
    "q128_compact_files" -> ((s, dir) => {
      import graft.operators.Compaction
      val frag = tmp(dir, "li_fragmented")
      val compacted = tmp(dir, "li_compacted")
      t(s, dir, "lineitem")
        .withColumn("kb", pmod(col("l_orderkey"), lit(8L)))
        .repartition(16)
        .write.mode("overwrite").partitionBy("kb").parquet(frag)
      val fragFiles = s.read.parquet(frag)
        .select(col("kb").cast("long").as("kb"), col("_metadata.file_path").as("fn"))
        .groupBy(col("kb"))
        .agg((countDistinct(col("fn")) > 1).as("was_fragmented"))
      Compaction.compact(s, frag, compacted, "kb", sortCols = Seq("l_orderkey"))
      s.read.parquet(compacted)
        .select(col("kb").cast("long").as("kb"), col("l_extendedprice"),
          col("_metadata.file_path").as("fn"))
        .groupBy(col("kb"))
        .agg(count(lit(1)).as("n_rows"),
          dsum(col("l_extendedprice")).as("sum_price"),
          (countDistinct(col("fn")) === 1).as("compact_ok"))
        .join(fragFiles, "kb")
        .select(col("kb"), col("n_rows"), col("sum_price"),
          col("was_fragmented"), col("compact_ok"))
        .orderBy(col("kb"))
    }),

    // Partition-SELECTIVE skew-safe compaction (Compaction.compactSelective
    // — the Delta OPTIMIZE file-selection shape): a layout where only SOME
    // directories are fragmented (kb 0,1: 16 ingest batches each; kb
    // 3,5,7: already one file) and one directory is HOT (kb=0 holds ~4× a
    // healthy dir's rows — every even orderkey). The rewrite must (a) touch
    // only the fragmented dirs — healthy dirs keep byte-identical file
    // sets, zero IO; (b) fan the hot dir across MULTIPLE writer tasks via
    // the per-dir salt (no single-straggler rewrite); (c) keep every
    // rewritten dir within the files-per-dir bound. Graded: per-dir rows +
    // checksum prove losslessness; `rewritten` proves selectivity matched
    // the planted fragmentation; `post_ok` folds (a)-(c) into a per-dir
    // boolean the oracle pins to true.
    "q149_compact_selective" -> ((s, dir) => {
      import graft.operators.Compaction
      val path = tmp(dir, "li_selective")
      val li = t(s, dir, "lineitem")
        .withColumn("kb",
          when(pmod(col("l_orderkey"), lit(2L)) === 0, lit(0L))
            .otherwise(pmod(col("l_orderkey"), lit(8L))))
      li.filter(col("kb") <= 1).repartition(16)
        .write.mode("overwrite").partitionBy("kb").parquet(path)
      li.filter(col("kb") > 1).repartition(col("kb"))
        .write.mode("append").partitionBy("kb").parquet(path)
      val pre = Compaction.partitionStats(s, path, "kb")
      def names(v: String): Set[String] = {
        val p = new org.apache.hadoop.fs.Path(s"$path/kb=$v")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
      }
      val preNames = pre.map(st => st.value -> names(st.value)).toMap
      // target = hot/4 → the hot dir salts into ~4 writer tasks at any sf
      val hotBytes = pre.map(_.bytes).max
      val rewritten = Compaction.compactSelective(s, path, "kb", "l_orderkey",
        maxFilesPerDir = 4, targetFileBytes = math.max(1L, (hotBytes + 3) / 4)).toSet
      val post = Compaction.partitionStats(s, path, "kb")
      val flags = post.map { st =>
        val wasRewritten = rewritten.contains(st.value)
        val ok =
          if (wasRewritten) st.files <= 4 && (st.value != "0" || st.files >= 2)
          else names(st.value) == preNames(st.value) // untouched ⇒ same file set
        (st.value.toLong, wasRewritten, ok)
      }
      val flagDf = s.createDataFrame(flags).toDF("kb", "rewritten", "post_ok")
      s.read.parquet(path)
        .select(col("kb").cast("long").as("kb"), col("l_extendedprice"))
        .groupBy(col("kb"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
        .join(flagDf, "kb")
        .orderBy(col("kb"))
    }),

    // DSv2 AGGREGATE pushdown (SupportsPushDownAggregates on the corpus
    // source): COUNT(*)/MIN/MAX over dense synthetic ids are metadata, so
    // the scan answers them as ONE literal row instead of generating and
    // counting 2M rows — the same contract parquet-footer COUNT pushdown
    // gives a 100 TB table. The require proves the planner actually
    // accepted the push (a silent fallback would compute identical values
    // the slow way); non-answerable aggregates fall back, spec-gated.
    "q187_agg_pushdown" -> ((s, dir) => {
      import graft.sources.SyntheticCorpusSource
      val before = SyntheticCorpusSource.aggPushes.get()
      val out = s.read.format("graft-corpus")
        .option("rows", "2000000").option("partitions", "8").load()
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .localCheckpoint(true)
      require(SyntheticCorpusSource.aggPushes.get() > before,
        "q187: the aggregate did not push into the scan")
      out
    }),

    // DYNAMIC partition overwrite — the correction-batch write verb: a
    // revised slice must replace ONLY the partition directories it
    // touches (static overwrite mode would wipe the whole table first —
    // at 100 TB that turns a one-partition fix into a full rewrite). The
    // click partition is rewritten with doubled values; every other
    // directory must keep its exact pre-write file set (require-gated via
    // the filesystem, the q149 discipline), and the read-back aggregate
    // must show doubled clicks next to untouched siblings.
    "q186_dynamic_overwrite" -> ((s, dir) => {
      val path = tmp(dir, "dyn_overwrite")
      val ev = t(s, dir, "events")
      ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
      def files(part: String): Set[String] = {
        val p = new org.apache.hadoop.fs.Path(s"$path/event_type=$part")
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSet
      }
      val viewBefore = files("view")
      val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try {
        ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.mode("overwrite").partitionBy("event_type").parquet(path)
      } finally saved match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      require(files("view") == viewBefore,
        "q186: dynamic overwrite touched an unrelated partition directory")
      s.read.parquet(path)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // hive-style partitioned layout + partition pruning: the filter on the
    // partition column must skip whole directories, not just row groups
    "q41_partitioned_write" -> ((s, dir) => {
      val path = tmp(dir, "events_bytype")
      t(s, dir, "events").write.mode("overwrite")
        .partitionBy("event_type").parquet(path)
      s.read.parquet(path)
        .filter(col("event_type") === "click")
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_clicks"), dsum(col("value")).as("sum_value"))
        .orderBy(col("hour"))
    }),

    // Z-order layout + 2-D box pruning: events written partitioned by the
    // Morton bucket of (user_id, value), then a (user range × value range)
    // box query reads ONLY the grid cells the box overlaps (bucket set
    // enumerated over the 8×8 grid, never the data) plus the exact residual
    // filter. The oracle applies the box directly to the raw table — so a
    // wrong bucket enumeration (a dropped cell) loses rows and fails the
    // hash, which is precisely the Z-layout's correctness contract. The
    // coordinates wrap mod 2048 by design: wrapped aliases only ever ADD
    // candidate rows (superset), which the residual filter removes.
    "q80_zorder_layout" -> ((s, dir) => {
      import graft.operators.ZOrder
      val path = tmp(dir, "events_zorder")
      val x = col("user_id") % 2048
      val y = floor(col("value") * 2).cast("long") % 2048
      t(s, dir, "events")
        .withColumn("zbucket", ZOrder.bucket(x, y))
        .write.mode("overwrite").partitionBy("zbucket").parquet(path)
      val buckets = ZOrder.bucketsForBox(100L, 299L, 200L, 600L)
      s.read.parquet(path)
        .filter(col("zbucket").isin(buckets: _*))
        .filter(col("user_id").between(100, 299) &&
          col("value") >= 100.0 && col("value") < 300.0)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("value")).as("sum_value"))
        .orderBy(col("event_type"))
    }),

    // Schema evolution under mergeSchema: two ingest batches with drifted
    // schemas (columns added/dropped between crawls — the reference's A3
    // schema-frequency concern, lived rather than measured) land in one
    // layout; the merged read unions the schemas, missing columns read as
    // NULL, and the per-batch null profile + checksums prove the merge
    // padded exactly the right cells.
    "q84_schema_evolution" -> ((s, dir) => {
      val path = tmp(dir, "part_evolving")
      val p = t(s, dir, "part")
      p.select(col("p_partkey"), col("p_name"))
        .write.mode("overwrite").parquet(s"$path/batch=1")
      p.select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
        .write.mode("overwrite").parquet(s"$path/batch=2")
      s.read.option("mergeSchema", "true").option("basePath", path)
        .parquet(s"$path/batch=1", s"$path/batch=2")
        .groupBy(col("batch"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("p_name").isNull, 1L).otherwise(0L)).as("n_name_nulls"),
          sum(when(col("p_retailprice").isNull, 1L).otherwise(0L)).as("n_price_nulls"),
          dsum(coalesce(col("p_retailprice"), lit(0.0))).as("sum_price"))
        .orderBy(col("batch"))
    }),

    // ORC round-trip (columnar sibling of parquet; same pushdown story)
    "q52_orc_roundtrip" -> ((s, dir) => {
      val path = tmp(dir, "orc_supplier")
      t(s, dir, "supplier").write.mode("overwrite").orc(path)
      s.read.orc(path)
        .filter(col("s_acctbal") > 0)
        .orderBy(col("s_suppkey"))
    }),

    // JSON-lines round-trip with an explicit read schema (schema-on-read
    // without nondeterministic inference)
    "q53_jsonl_roundtrip" -> ((s, dir) => {
      val path = tmp(dir, "jsonl_part")
      val p0 = t(s, dir, "part").select("p_partkey", "p_name", "p_brand", "p_retailprice")
      p0.write.mode("overwrite").json(path)
      s.read.schema(p0.schema).json(path)
        .filter(col("p_retailprice") > 900)
        .orderBy(col("p_partkey"))
    }),

    // plain-text corpus round-trip — the .txt dump format LLM corpora
    // actually ship as: one "id<TAB>cleaned-text" line per document
    // (cleanText guarantees no embedded tabs/newlines survive), read back
    // via the line source and re-split
    "q63_text_roundtrip" -> ((s, dir) => {
      val path = tmp(dir, "txt_docs")
      t(s, dir, "documents")
        .select(concat_ws("\t", col("doc_id"),
          graft.functions.TextFns.cleanText(col("text"))).as("value"))
        .coalesce(1).write.mode("overwrite").text(path)
      s.read.text(path)
        .select(split(col("value"), "\t", 2).as("p"))
        .select(col("p")(0).cast("long").as("doc_id"), col("p")(1).as("text"))
        .orderBy(col("doc_id"))
    }),

    // DataSource V2 synthetic corpus scan (graft.sources — deterministic
    // generation, column pruning; no DuckDB oracle possible → rows-only)
    "q44_dsv2_corpus" -> ((s, dir) => {
      s.read.format("graft-corpus")
        .option("rows", 2000).option("partitions", 8).load()
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("source"))
    }),

    // S4 SDK/catalog scan through the per-partition-client operator
    // (Ingest.fetchCatalog: one client per partition, bounded retry with
    // backoff on transient errors — I4 — and call pacing — I5). The fake
    // client is deterministic ('cat-' || id) with a planted transient
    // failure on every 7th id, so the RETRY PATH executes inside the query
    // while the data contract stays exactly oracle-checkable.
    "q60_catalog_fetch" -> ((s, dir) => {
      val ids = t(s, dir, "documents").select(col("doc_id"))
      val clientFor = (pid: Int) => {
        val failedOnce = scala.collection.mutable.Set.empty[Long]
        (id: Long) => {
          if (id % 7 == 0 && failedOnce.add(id))
            throw new graft.operators.TransientFetchError(s"transient on $id")
          "cat-" + id
        }
      }
      graft.operators.Ingest
        .fetchCatalog(ids, "doc_id", clientFor, maxRetries = 3, backoffMs = 0)
        .orderBy(col("doc_id"))
    }),

    // A3 schema sampler (reference mongodb.py:29-41: sample N docs → per
    // key → set of observed type names): documents become dynamic
    // MAP<STRING,STRING> records, a bounded deterministic sample (the
    // mongo `.limit(100)` analog) explodes to key/value, values classify
    // into type names by shape, and the per-key type inventory aggregates
    // with collect_set. array_join(array_sort(...)) renders the set
    // portably (F7).
    "q56_schema_sample" -> ((s, dir) => {
      val sample = t(s, dir, "documents")
        .filter(col("doc_id") < 100) // deterministic 100-doc sample
        .select(map(
          lit("doc_id"), col("doc_id").cast("string"),
          lit("lang"), col("lang"),
          lit("n_chars"), col("n_chars").cast("string"),
          lit("ratio"), round(col("n_chars") / 100.0, 2).cast("string"),
          lit("flag"), (col("doc_id") % 2 === 0).cast("string")).as("rec"))
      sample.select(explode(col("rec")).as(Seq("key", "value")))
        .withColumn("vtype",
          when(col("value").rlike("^(true|false)$"), "boolean")
            .when(col("value").rlike("^-?[0-9]+$"), "bigint")
            .when(col("value").rlike("^-?[0-9]+\\.[0-9]+$"), "double")
            .otherwise("varchar"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n_values"),
          array_join(array_sort(collect_set(col("vtype"))), ",").as("types"))
        .orderBy(col("key"))
    }),

    // K5 co-located join on bucketed tables — bucketing is the PRE-PAID
    // shuffle: both sides written bucketed+sorted on the join key, the
    // merge-hinted SMJ then joins with NO exchange on either input
    // (BucketedJoinSpec asserts the zero-exchange plan; here the RESULT is
    // oracle-graded). At 100 TB this turns an every-query two-table shuffle
    // into none.
    "q62_bucketed_join" -> ((s, dir) => {
      val suf = Integer.toHexString(dir.hashCode)
      // a fresh session has an empty in-memory catalog but the warehouse
      // DIRECTORY survives from earlier runs — drop both the table entry
      // and any stale location or saveAsTable fails LOCATION_ALREADY_EXISTS
      def reset(table: String): Unit = {
        s.sql(s"DROP TABLE IF EXISTS $table")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), table)
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      reset(s"orders_bkt_$suf")
      reset(s"customer_bkt_$suf")
      t(s, dir, "orders").write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable(s"orders_bkt_$suf")
      t(s, dir, "customer").write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable(s"customer_bkt_$suf")
      s.table(s"orders_bkt_$suf").hint("merge")
        .join(s.table(s"customer_bkt_$suf"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("c_mktsegment"))
    }),

    // F4/P1 record→text serialization and back (to_json/from_json; the
    // reference flattens docs to "key: value" text at vdb.py:139-145)
    "q34_json_roundtrip" -> ((s, dir) => {
      val schema = StructType(Seq(
        StructField("doc_id", LongType),
        StructField("lang", StringType),
        StructField("source", StringType)))
      t(s, dir, "documents")
        .select(to_json(struct(col("doc_id"), col("lang"), col("source"))).as("j"))
        .select(from_json(col("j"), schema).as("p"))
        .select(col("p.doc_id").as("doc_id"), col("p.lang").as("lang"),
          col("p.source").as("source"))
        .orderBy(col("doc_id"))
    }),

    // Kafka-wire streaming consume graded end-to-end (sources/
    // LogStreamSource.scala): readStream over the (topic, partition,
    // offset, ts, key, value) record shape, from_json payload parse,
    // per-(topic,partition) aggregation, complete-mode memory sink under
    // Trigger.AvailableNow. Admission control is part of the grade: 20k
    // records at maxPerTrigger=4000 MUST drain in ≥5 paced micro-batches
    // (the require), with the checkpoint WAL carrying the per-partition
    // offsets between them — and the settled aggregate must still equal
    // the DuckDB replay of the payload formula, which only holds if the
    // paging neither dropped nor re-read an offset range.
    "q157_kafka_shape" -> ((s, dir) => {
      val sink = s"q157_sink_${java.util.UUID.randomUUID().toString.take(8)}"
      val payload = new StructType().add("user", StringType).add("amount", LongType)
      // state-partition pin (the q86/q95 discipline): 5+ paced micro-batches
      // x 32 state partitions is 160+ provider init/commits for an 8-group
      // aggregate; 2 partitions is the same result with 1/16 the state IO
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
      val q = s.readStream.format("graft-log")
        .option("topics", "clicks,orders")
        .option("partitionsPerTopic", "4")
        .option("rowsPerPartition", "2500")
        .option("maxPerTrigger", "4000")
        .load()
        .select(col("topic"), col("partition").cast("long").as("partition"),
          col("offset"), col("ts"), col("key"), from_json(col("value"), payload).as("v"))
        .groupBy(col("topic"), col("partition"))
        .agg(count(lit(1)).as("n_events"),
          max(col("offset")).as("max_offset"),
          sum(col("v.amount")).as("total_amount"),
          sum(length(col("key"))).as("key_bytes"),
          max(unix_timestamp(col("ts"))).as("last_ts_sec"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val paced = q.recentProgress.count(_.numInputRows > 0)
      require(paced >= 5,
        s"q157: expected ≥5 admission-controlled micro-batches, saw $paced")
      s.table(sink).orderBy(col("topic"), col("partition"))
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // dropDuplicatesWithinWatermark graded end-to-end — the production
    // streaming dedup (q89's dropDuplicates keeps state FOREVER on an
    // unbounded keyspace; the WithinWatermark variant expires state once
    // the watermark passes, which is the only shape that survives an
    // infinite stream): keys recur every 300 offsets across paced
    // micro-batches and both partitions, the 2-hour delay keeps all
    // duplicate arrivals inside the state lifetime, and the settled
    // append sink must hold EXACTLY ONE row per key (n_emitted pinned to
    // 1 — within-batch and cross-batch duplicates both collapse).
    "q179_dedup_within_watermark" -> ((s, dir) => {
      val sink = s"q179_sink_${java.util.UUID.randomUUID().toString.take(8)}"
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        val q = s.readStream.format("graft-log")
          .option("topics", "ddw")
          .option("partitionsPerTopic", "2")
          .option("rowsPerPartition", "1000")
          .option("maxPerTrigger", "800")
          .load()
          .select(concat(lit("k"), pmod(col("offset"), lit(300L))).as("dkey"),
            col("ts"))
          .withWatermark("ts", "2 hours")
          .dropDuplicatesWithinWatermark("dkey")
          .writeStream.format("memory").queryName(sink)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.table(sink).groupBy(col("dkey"))
          .agg(count(lit(1)).as("n_emitted"))
          .orderBy(col("dkey"))
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Crawl-frontier scheduling — the batch the reference's scheduler
    // implicitly plans every day (scheduler.py re-crawls everything;
    // a 100 TB frontier can't): each page scored by staleness × size
    // (deterministic integer units), a per-host politeness cap (top-5
    // per source — no host gets hammered) then a global crawl budget
    // (top-50 overall). Two windows: one partitioned by host over only
    // the frontier, one global over ≤ 5·hosts survivors — the global
    // sort never sees the corpus.
    "q174_crawl_frontier" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val frontier = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"),
          (pmod(col("doc_id") * 37, lit(30L)) * 100000L + col("n_chars")).as("score"))
      val perHost = frontier.withColumn("host_rank",
          row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("score").desc, col("doc_id").asc)))
        .filter(col("host_rank") <= 5)
      perHost.withColumn("global_rank",
          row_number().over(Window.orderBy(col("score").desc, col("doc_id").asc)))
        .filter(col("global_rank") <= 50)
        .select(col("global_rank").cast("long").as("global_rank"), col("doc_id"),
          col("source"), col("score"), col("host_rank").cast("long").as("host_rank"))
        .orderBy(col("global_rank"))
    }),

    // Corrupt-record ingest channel (the PERMISSIVE + _corrupt_record
    // quarantine every production JSONL feed needs — at 100 TB some lines
    // ARE truncated): every 13th document's JSON line is cut off
    // mid-record before landing; the schema'd read must parse the healthy
    // lines, route the broken ones to the corrupt column with every data
    // field null (no half-parsed garbage), and lose NOTHING — the graded
    // per-bucket counts and checksums only balance if quarantine count ==
    // planted count and the healthy sums exclude exactly the planted set.
    "q161_corrupt_json" -> ((s, dir) => {
      val path = tmp(dir, "jsonl_corrupt")
      t(s, dir, "documents")
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("line"))
        .select(when(col("doc_id") % 13 === 0, col("line").substr(lit(1), lit(10)))
          .otherwise(col("line")).as("value"))
        .coalesce(1).write.mode("overwrite").text(path)
      val schema = new StructType().add("doc_id", LongType).add("lang", StringType)
        .add("n_chars", LongType).add("_corrupt_record", StringType)
      s.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .groupBy(when(col("_corrupt_record").isNotNull, lit("_corrupt"))
          .otherwise(col("lang")).as("bucket"))
        .agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("n_chars")), lit(0L)).as("sum_chars"),
          coalesce(sum(col("doc_id")), lit(0L)).as("sum_ids"))
        .orderBy(col("bucket"))
    }),

    // Stream-static join — the enrichment shape of Structured Streaming
    // (each micro-batch broadcast-joins against a slowly-changing dim
    // table; no state, no watermark — the dim re-resolves per batch, which
    // is exactly how a 100 TB pipeline picks up dim updates mid-stream):
    // the Kafka-shaped log keys into `nation` and the settled complete-mode
    // aggregate must equal the DuckDB replay of formula ⋈ dim.
    "q163_stream_static_join" -> ((s, dir) => {
      val sink = s"q163_sink_${java.util.UUID.randomUUID().toString.take(8)}"
      val dim = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
      val payload = new StructType().add("user", StringType).add("amount", LongType)
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      try {
      val q = s.readStream.format("graft-log")
        .option("topics", "orders")
        .option("partitionsPerTopic", "4")
        .option("rowsPerPartition", "2000")
        .load()
        .select(col("partition"), col("offset"),
          from_json(col("value"), payload).as("v"),
          pmod(col("offset") * 7 + col("partition"), lit(25L)).as("nkey"))
        .join(broadcast(dim), col("nkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("v.amount")).as("total_amount"),
          max(col("offset")).as("max_offset"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(sink).orderBy(col("n_name"))
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    }),

    // Spark 4 transformWithState graded end-to-end (streaming/TwsOps.scala
    // — the arbitrary-state API superseding mapGroupsWithState, RocksDB-
    // backed by requirement): a per-key ValueState folds three paced
    // micro-batches into running (count, first, last) stats, so the state
    // provably crosses batch boundaries; the settled update-mode sink
    // (monotone stats ⇒ max/min per key) must equal the batch GROUP BY
    // the oracle replays from the payload formula.
    "q168_stream_tws" -> ((s, dir) => {
      import s.implicits._
      val sink = s"q168_sink_${java.util.UUID.randomUUID().toString.take(8)}"
      val savedP = s.conf.get("spark.sql.shuffle.partitions")
      val savedProv = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      s.conf.set("spark.sql.shuffle.partitions", "2")
      s.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val keyed = s.readStream.format("graft-log")
          .option("topics", "tws")
          .option("partitionsPerTopic", "2")
          .option("rowsPerPartition", "1500")
          .option("maxPerTrigger", "1000")
          .load()
          .select(col("key"), col("offset"))
          .as[graft.streaming.KeyedOffset]
        val q = graft.streaming.TwsOps.runningKeyStats(keyed)
          .writeStream.format("memory").queryName(sink)
          .outputMode("update")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val batches = q.recentProgress.count(_.numInputRows > 0)
        require(batches >= 3, s"q168: expected ≥3 paced micro-batches, saw $batches")
        s.table(sink).groupBy(col("key"))
          .agg(max(col("n")).as("n_events"),
            min(col("first_off")).as("first_off"),
            max(col("last_off")).as("last_off"))
          .orderBy(col("key"))
      } finally {
        s.conf.set("spark.sql.shuffle.partitions", savedP)
        savedProv match {
          case Some(v) => s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => s.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    }))

  /** DuckDB replay of the DSv2 synthetic generator (q44). The generator is a
    * pure function of (seed, doc_id) — a 64-bit xor-shift-multiply chain
    * picking source, word count, then words — so a recursive CTE can walk the
    * same chain: h lives as a non-negative HUGEINT (mod 2^64), `>>>` is
    * floor-division (the value is unsigned by construction), and the
    * wraparound multiply is split into 32-bit limbs because a full 64×64
    * product overflows INT128. Vocab word lengths and source names are
    * emitted from the SAME runtime arrays the Spark source reads
    * (SyntheticCorpusSource.Vocab/Sources), so the literals cannot drift.
    * The chain carries nWords once known (k=2) and stops at k = nWords + 2 —
    * no over-generation. */
  private lazy val dsv2CorpusSql: String = {
    import graft.sources.SyntheticCorpusSource.{Sources, Vocab}
    val vlen = Vocab.zipWithIndex.map { case (w, i) => s"($i,${w.length})" }.mkString(",")
    val srcs = Sources.zipWithIndex.map { case (n, i) => s"($i,'$n')" }.mkString(",")
    // 11400714819323198485 = 0x9e3779b97f4a7c15 (seed mix);
    // 0xff51afd7ed558ccd split into 32-bit limbs: hi 4283543511, lo 3981806797
    s"""WITH RECURSIVE
       |vlen(i, l) AS (VALUES $vlen),
       |srcs(i, name) AS (VALUES $srcs),
       |chain(doc_id, k, h, nw) AS (
       |  SELECT doc_id, 0,
       |    CAST((42 * CAST(11400714819323198485 AS HUGEINT) + doc_id)
       |         % 18446744073709551616 AS HUGEINT),
       |    CAST(NULL AS HUGEINT)
       |  FROM (SELECT unnest(generate_series(0, 1999)) AS doc_id)
       |  UNION ALL
       |  SELECT doc_id, k + 1, newh,
       |    CASE WHEN k + 1 = 2 THEN 20 + (newh % 9223372036854775808) % 180
       |         ELSE nw END
       |  FROM (
       |    SELECT doc_id, k, nw, xor(t2, t2 // 536870912) AS newh
       |    FROM (
       |      SELECT doc_id, k, nw,
       |        ((((t1 // 4294967296) * 3981806797
       |           + (t1 % 4294967296) * 4283543511) % 4294967296)
       |          * 4294967296 + (t1 % 4294967296) * 3981806797)
       |        % 18446744073709551616 AS t2
       |      FROM (SELECT doc_id, k, nw, xor(h, h // 8589934592) AS t1
       |            FROM chain WHERE k < 2 OR k < nw + 2)
       |    )
       |  )
       |),
       |r AS (SELECT doc_id, k, nw, h % 9223372036854775808 AS r
       |      FROM chain WHERE k >= 1),
       |meta AS (
       |  SELECT s.doc_id, srcs.name AS source, nw.nw
       |  FROM (SELECT doc_id, r % ${Sources.length} AS si FROM r WHERE k = 1) s
       |  JOIN srcs ON srcs.i = s.si
       |  JOIN (SELECT doc_id, nw FROM r WHERE k = 2) nw USING (doc_id)),
       |chars AS (
       |  SELECT doc_id, sum(vlen.l) AS wchars
       |  FROM r JOIN vlen ON vlen.i = r.r % ${Vocab.length}
       |  WHERE r.k >= 3
       |  GROUP BY doc_id)
       |SELECT meta.source, cast(count(*) as bigint) AS n_docs,
       |       cast(sum(chars.wchars + meta.nw - 1) as bigint) AS total_chars
       |FROM meta JOIN chars USING (doc_id)
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q44_dsv2_corpus" -> dsv2CorpusSql,

    // replay of LogStreamSource.record's pure payload formula from
    // generate_series — amounts, user ids, and event times are all
    // functions of (topic index, partition, offset)
    "q157_kafka_shape" ->
      s"""WITH t(topic, tix) AS (VALUES ('clicks', 0), ('orders', 1)),
         |p(part) AS (SELECT unnest(generate_series(0, 3))),
         |o(off) AS (SELECT unnest(generate_series(0, 2499))),
         |e AS (
         |  SELECT topic, part, off,
         |    (off * 2654435761 + part * 40503 + tix * 69069) % 1000 AS amount,
         |    (off * 31 + part * 7 + tix * 3) % 500 AS uid
         |  FROM t CROSS JOIN p CROSS JOIN o)
         |SELECT topic, cast(part as bigint) AS "partition",
         |  count(*) AS n_events, max(off) AS max_offset,
         |  cast(sum(amount) as bigint) AS total_amount,
         |  cast(sum(length('u' || uid)) as bigint) AS key_bytes,
         |  ${graft.sources.LogStreamSource.BaseEpochSec} + max(off) AS last_ts_sec
         |FROM e GROUP BY topic, part ORDER BY topic, "partition"""".stripMargin,

    // the pushed answers are pure metadata of the dense id space
    "q187_agg_pushdown" ->
      """SELECT cast(2000000 as bigint) AS n_docs, cast(0 as bigint) AS min_id,
        |  cast(1999999 as bigint) AS max_id""".stripMargin,

    // clicks doubled, every other partition untouched
    "q186_dynamic_overwrite" ->
      s"""SELECT event_type, count(*) AS n_events,
         |  ${dsumSql("CASE WHEN event_type = 'click' THEN value * 2 ELSE value END")}
         |    AS sum_value
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    // exactly one survivor per key: 300 keys, n_emitted pinned to 1
    "q179_dedup_within_watermark" ->
      """SELECT 'k' || k AS dkey, cast(1 as bigint) AS n_emitted
        |FROM (SELECT unnest(generate_series(0, 299)) AS k)
        |ORDER BY dkey""".stripMargin,

    // staleness × size scoring, per-host cap, global budget — two QUALIFY
    // windows replay the schedule exactly
    "q174_crawl_frontier" ->
      """WITH f AS (
        |  SELECT doc_id, source, n_chars,
        |    ((doc_id * 37) % 30) * 100000 + n_chars AS score
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, source, score,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id ASC) AS host_rank
        |  FROM f QUALIFY host_rank <= 5),
        |g AS (
        |  SELECT doc_id, source, score, host_rank,
        |    row_number() OVER (ORDER BY score DESC, doc_id ASC) AS global_rank
        |  FROM h QUALIFY global_rank <= 50)
        |SELECT cast(global_rank as bigint) AS global_rank, doc_id, source,
        |  cast(score as bigint) AS score, cast(host_rank as bigint) AS host_rank
        |FROM g ORDER BY global_rank""".stripMargin,

    // the settled per-key running stats equal the batch GROUP BY over the
    // single-topic (tix=0) key formula
    "q168_stream_tws" ->
      """WITH o AS (
        |  SELECT p.part, f.off
        |  FROM (SELECT unnest(generate_series(0, 1)) AS part) p
        |  CROSS JOIN (SELECT unnest(generate_series(0, 1499)) AS off) f),
        |e AS (SELECT 'u' || ((off * 31 + part * 7) % 500) AS k, off FROM o)
        |SELECT k AS "key", count(*) AS n_events,
        |  min(off) AS first_off, max(off) AS last_off
        |FROM e GROUP BY k ORDER BY k""".stripMargin,

    // quarantined lines contribute only their count; healthy sums replay
    // over the complement of the planted corruption set
    "q161_corrupt_json" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 13 = 0 THEN '_corrupt' ELSE lang END AS bucket
        |  FROM documents)
        |SELECT bucket, count(*) AS n_rows,
        |  cast(sum(CASE WHEN bucket = '_corrupt' THEN 0 ELSE n_chars END) as bigint)
        |    AS sum_chars,
        |  cast(sum(CASE WHEN bucket = '_corrupt' THEN 0 ELSE doc_id END) as bigint)
        |    AS sum_ids
        |FROM d GROUP BY bucket ORDER BY bucket""".stripMargin,

    // replay of formula ⋈ nation: every (partition, offset) maps to a
    // nation key; amounts come from the single-topic (tix=0) payload formula
    "q163_stream_static_join" ->
      """WITH o AS (
        |  SELECT p.part, f.off
        |  FROM (SELECT unnest(generate_series(0, 3)) AS part) p
        |  CROSS JOIN (SELECT unnest(generate_series(0, 1999)) AS off) f),
        |e AS (
        |  SELECT part, off,
        |    (off * 2654435761 + part * 40503) % 1000 AS amount,
        |    (off * 7 + part) % 25 AS nkey
        |  FROM o)
        |SELECT n_name, count(*) AS n_events,
        |  cast(sum(amount) as bigint) AS total_amount,
        |  max(off) AS max_offset
        |FROM e JOIN nation ON nkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q62_bucketed_join" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q63_text_roundtrip" ->
      s"""SELECT doc_id, ${graft.functions.TextFns.cleanTextSql("text")} AS text
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q60_catalog_fetch" ->
      """SELECT doc_id, 'cat-' || doc_id AS payload
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q56_schema_sample" ->
      """WITH sample AS (SELECT * FROM documents WHERE doc_id < 100),
        |kv AS (
        |  SELECT 'doc_id' AS key, cast(doc_id as varchar) AS value FROM sample
        |  UNION ALL SELECT 'lang', lang FROM sample
        |  UNION ALL SELECT 'n_chars', cast(n_chars as varchar) FROM sample
        |  UNION ALL SELECT 'ratio', cast(round(n_chars / 100.0, 2) as varchar) FROM sample
        |  UNION ALL SELECT 'flag', cast(doc_id % 2 = 0 as varchar) FROM sample),
        |typed AS (
        |  SELECT key, CASE WHEN regexp_matches(value, '^(true|false)$') THEN 'boolean'
        |    WHEN regexp_matches(value, '^-?[0-9]+$') THEN 'bigint'
        |    WHEN regexp_matches(value, '^-?[0-9]+\.[0-9]+$') THEN 'double'
        |    ELSE 'varchar' END AS vtype
        |  FROM kv)
        |SELECT key, count(*) AS n_values,
        |  array_to_string(list_sort(list(DISTINCT vtype)), ',') AS types
        |FROM typed GROUP BY key ORDER BY key""".stripMargin,
    "q31_csv_roundtrip" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "q32_parquet_roundtrip" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "q67_bounded_files" ->
      s"""SELECT l_returnflag, count(*) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q128_compact_files" ->
      s"""SELECT l_orderkey % 8 AS kb, count(*) AS n_rows,
         |  ${dsumSql("l_extendedprice")} AS sum_price,
         |  true AS was_fragmented, true AS compact_ok
         |FROM lineitem GROUP BY 1 ORDER BY kb""".stripMargin,

    "q149_compact_selective" ->
      s"""SELECT CAST(CASE WHEN l_orderkey % 2 = 0 THEN 0
         |            ELSE l_orderkey % 8 END AS BIGINT) AS kb,
         |  count(*) AS n_rows,
         |  ${dsumSql("l_extendedprice")} AS sum_price,
         |  (CASE WHEN l_orderkey % 2 = 0 THEN 0
         |        ELSE l_orderkey % 8 END) <= 1 AS rewritten,
         |  true AS post_ok
         |FROM lineitem GROUP BY 1, 4 ORDER BY kb""".stripMargin,
    "q34_json_roundtrip" ->
      "SELECT doc_id, lang, source FROM documents ORDER BY doc_id",
    "q52_orc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
        |WHERE s_acctbal > 0 ORDER BY s_suppkey""".stripMargin,

    "q53_jsonl_roundtrip" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
        |WHERE p_retailprice > 900 ORDER BY p_partkey""".stripMargin,

    "q41_partitioned_write" ->
      s"""SELECT date_trunc('hour', ts) AS hour, count(*) AS n_clicks,
         |  ${dsumSql("value")} AS sum_value
         |FROM events WHERE event_type = 'click'
         |GROUP BY date_trunc('hour', ts)
         |ORDER BY hour""".stripMargin,

    "q84_schema_evolution" ->
      s"""WITH m AS (
         |  SELECT 1 AS batch, p_partkey, p_name,
         |    NULL AS p_brand, cast(NULL as double) AS p_retailprice FROM part
         |  UNION ALL
         |  SELECT 2 AS batch, p_partkey, NULL AS p_name,
         |    p_brand, p_retailprice FROM part)
         |SELECT batch, count(*) AS n_rows,
         |  cast(sum(CASE WHEN p_name IS NULL THEN 1 ELSE 0 END) as bigint) AS n_name_nulls,
         |  cast(sum(CASE WHEN p_retailprice IS NULL THEN 1 ELSE 0 END) as bigint) AS n_price_nulls,
         |  ${dsumSql("coalesce(p_retailprice, 0.0)")} AS sum_price
         |FROM m GROUP BY batch ORDER BY batch""".stripMargin,

    // the box applied directly to the raw table: if the Spark side's bucket
    // enumeration dropped a cell, rows would be missing and the hash fails
    "q80_zorder_layout" ->
      s"""SELECT event_type, count(*) AS n_rows, ${dsumSql("value")} AS sum_value
         |FROM events
         |WHERE user_id BETWEEN 100 AND 299 AND value >= 100.0 AND value < 300.0
         |GROUP BY event_type ORDER BY event_type""".stripMargin)
}

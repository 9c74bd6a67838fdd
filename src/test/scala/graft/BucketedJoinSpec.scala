package graft

import org.apache.spark.sql.functions._

/**
 * Bucketing = pre-paid shuffle: both fact tables written bucketed+sorted on
 * the join key join WITHOUT any exchange on either input — at 100 TB this
 * is the difference between a join that shuffles two tables every query
 * and one that never shuffles them at all.
 */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables has no exchange on either side") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning\\(l_orderkey".r.findFirstIn(plan).isEmpty, plan.take(2500))
      assert("Exchange hashpartitioning\\(o_orderkey".r.findFirstIn(plan).isEmpty, plan.take(2500))

      // and the result is identical to the plain (shuffling) join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = j.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}

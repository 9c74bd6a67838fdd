package graft

import org.apache.spark.sql.SparkSession

/** Smoke driver for the flagship query (t1 contract): prints the ranked,
  * hydrated semantic-search hits from `SparkEntry.entry` on sf0.001. */
object Demo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = SparkEntry.entry(spark)
    result.show(20, truncate = false)
    println(s"ROWS=${result.count()}")
    spark.stop()
  }
}

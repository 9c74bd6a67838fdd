package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run one query and print each completed stage's task count and
  * runtime — pins down which stage AQE coalesced below the core count.
  * `runMain graft.QProfile qNN [qMM ...]` */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        val cpu = i.taskMetrics.executorCpuTime / 1e9
        println(f"STAGE ${i.stageId}%4d tasks=${i.numTasks}%4d wall=${ms}%6d ms cpu=${cpu}%8.2f s  ${i.name.take(60)}")
      }
    })
    spark.range(1000).selectExpr("sum(id)").collect()
    args.foreach { q =>
      println(s"=== $q")
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      println(f"TOTAL $q ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import scala.collection.mutable

object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskStats = mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) taskStats.synchronized {
          taskStats += ((te.stageId, te.taskInfo.duration, m.executorRunTime, m.executorCpuTime / 1000000, m.jvmGCTime))
        }
      }
    })
    val pages = graft.pages.SyntheticPages.pagesReplicated(spark, "/root/testdata/sf0.1", 100)
    for (rep <- 1 to 5) {
      // split: corpus generation alone vs generation + extraction — the
      // difference isolates the tokenizer/grid/boilerplate cost share
      val tg0 = System.nanoTime()
      pages.count()
      val genDt = (System.nanoTime() - tg0) / 1e9
      taskStats.synchronized(taskStats.clear())
      val t0 = System.nanoTime()
      graft.pipeline.ExtractJob.extract(spark, pages, graft.pipeline.ExtractJob.Config(buckets = 128)).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val stats = taskStats.synchronized(taskStats.toList)
      val slowest = stats.sortBy(-_._2).take(3)
      println(f"rep $rep: gen=$genDt%.2fs full=$dt%.2fs, tasks=${stats.size}, slowest(dur,run,cpu,gc)=${slowest.map { case (s, d, r, c, g) => s"[stage$s ${d}ms run=$r cpu=$c gc=$g]" }.mkString(" ")}")
    }
    spark.stop()
  }
}

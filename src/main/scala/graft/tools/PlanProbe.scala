package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** One-off runtime probe: execute a registered query and report the
  * EXECUTED work — stage count, input bytes, shuffle bytes — which is
  * what decides whether AQE stage reuse / exchange reuse actually
  * happened (the printed adaptive plan repeats reused subtrees, so tree
  * greps over-count).
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.exchange.reuse", sys.env.getOrElse("PROBE_REUSE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var stages = 0
    @volatile var inputBytes = 0L
    @volatile var shuffleWrite = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1
        inputBytes += sc.stageInfo.taskMetrics.inputMetrics.bytesRead
        shuffleWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })
    args.foreach { name =>
      stages = 0; inputBytes = 0L; shuffleWrite = 0L
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect()
      Thread.sleep(500) // let the listener bus drain
      println(s"PROBE $name stages=$stages inputMB=${inputBytes / 1e6} " +
        s"shuffleWriteMB=${shuffleWrite / 1e6} wall=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}

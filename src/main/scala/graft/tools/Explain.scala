package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of one or more
  * registered queries (all of them with no args). Usage:
  *
  *   sbt "runMain graft.tools.Explain q_interval_join dedup_ngram"
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001 — plan shape, not timing).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n========== $name ==========")
          println(fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}

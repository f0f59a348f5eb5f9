package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      // noop sink materializes every output column (count() would let
      // Catalyst prune projections and under-report the work)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
    // one untimed warmup pass: JIT + codegen + parquet footer caches, so
    // reported numbers are steady-state throughput, not first-query warmup
    SparkEntry.queries.foreach { case (n, f) => runOnce(n, f) }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      runOnce(name, fn)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's deterministic parquet corpus (TESTDATA.md).
  * All operators take a scale-factor directory so the same plan runs at
  * any SF — and, on a real cluster, against any parquet root.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  /** The events table stores TIMESTAMP(NANOS) parquet, which Spark 4 has
    * no native type for. Read nanos as long (exact), keep `ts_ns` for
    * ns-precise ordering (doubles would lose precision above 2^53), and
    * expose `ts` as a micros timestamp for formatting/windowing.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts_ns", org.apache.spark.sql.functions.col("ts"))
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(CAST(ts AS BIGINT) div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}

/** Session factory with the engine's scale-oriented defaults: AQE on
  * (runtime skew-join splitting + partition coalescing — the Spark-native
  * replacement for the reference's adaptive bound search, SURVEY §2.6 P2),
  * UTC, and shuffle partitions sized for the local harness. On a real
  * cluster `shufflePartitions` should be ~2-3x total executor cores.
  */
object GraftSession {
  def local(cores: Int = 32, shufflePartitions: Int = 32): SparkSession = {
    val s = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

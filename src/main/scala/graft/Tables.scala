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
  /** The events table's `ts` has shipped as both TIMESTAMP(NANOS)
    * (read as long via `nanosAsLong` — Spark 4 has no native ns type)
    * and plain micros TIMESTAMP_NTZ. Adapt on the actual parquet
    * schema and normalize to the engine's two-column contract:
    * `ts_ns` — exact integer nanos for ordering/session gaps (doubles
    * would lose precision above 2^53), and `ts` — a micros TIMESTAMP
    * (UTC session) for formatting/windowing.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the NTZ branch's CAST(ts AS TIMESTAMP) preserves the instant only
    // under a UTC session — pin it here (not just in the entry points)
    // so a caller with a local-time session can't silently shift ts/ts_ns
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as long
        raw
          .withColumn("ts_ns", col("ts"))
          .withColumn("ts", expr("timestamp_micros((CAST(ts AS BIGINT) - pmod(CAST(ts AS BIGINT), 1000)) DIV 1000)"))
      case _ => // micros TIMESTAMP / TIMESTAMP_NTZ (UTC session => same instant)
        raw
          .withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000L"))
    }
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

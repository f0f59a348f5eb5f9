package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink plurality for the transfer engine: the reference reads
  * and writes one system (Elasticsearch); this engine treats the format
  * as a parameter. Parquet is the primary (columnar, statistics,
  * pushdown); CSV/JSON exist for interchange — both lose pushdown and
  * type fidelity, so [[convert]] is the on-ramp INTO parquet, not a
  * steady-state path.
  */
object Sources {

  val Supported: Set[String] = Set("parquet", "csv", "json", "orc")

  /** Read any supported format. A declared schema skips inference (one
    * full pre-scan for csv/json — never acceptable at scale).
    */
  def read(
      spark: SparkSession,
      path: String,
      format: String,
      schema: Option[StructType] = None,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    require(Supported.contains(format), s"unsupported format: $format")
    val base = spark.read.format(format)
      .options(defaultOptions(format) ++ options)
    schema.fold(inferDefaults(base, format))(s => base.schema(s)).load(path)
  }

  def write(df: DataFrame, path: String, format: String,
            options: Map[String, String] = Map.empty): Unit = {
    require(Supported.contains(format), s"unsupported format: $format")
    df.write.format(format)
      .options(defaultOptions(format) ++ options)
      .mode(SaveMode.Overwrite)
      .save(path)
  }

  /** Interchange on-ramp: any source format -> parquet, preserving a
    * declared schema when given.
    */
  def convert(
      spark: SparkSession,
      srcPath: String,
      srcFormat: String,
      destPath: String,
      schema: Option[StructType] = None
  ): Long = {
    val df = read(spark, srcPath, srcFormat, schema)
    df.write.mode(SaveMode.Overwrite).parquet(destPath)
    spark.read.parquet(destPath).count()
  }

  private def defaultOptions(format: String): Map[String, String] = format match {
    case "csv" => Map("header" -> "true")
    case _     => Map.empty
  }

  private def inferDefaults(r: org.apache.spark.sql.DataFrameReader, format: String) =
    format match {
      case "csv" => r.option("inferSchema", "true")
      case _     => r
    }
}

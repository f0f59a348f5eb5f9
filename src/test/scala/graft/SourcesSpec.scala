package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Multi-format source/sink round trips through the interchange on-ramp. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv and json round-trip region through the parquet on-ramp") {
    val region = Tables.region(spark, sf)
    for (fmt <- Seq("csv", "json")) {
      val raw = Files.createTempDirectory(s"graft_src_$fmt").toString + "/raw"
      val conv = Files.createTempDirectory(s"graft_src_$fmt").toString + "/pq"
      Sources.write(region, raw, fmt)
      val n = Sources.convert(spark, raw, fmt, conv, Some(region.schema))
      assert(n == region.count(), s"$fmt round trip lost rows")
      val back = spark.read.parquet(conv)
      assert(back.schema == region.schema, s"$fmt schema drift: ${back.schema}")
      assert(back.select("r_name").as[String].collect().sorted.toSeq ==
        region.select("r_name").as[String].collect().sorted.toSeq)
    }
  }

  test("unsupported format rejected by name") {
    intercept[IllegalArgumentException](
      Sources.read(spark, "/tmp/x", "avro"))
  }
}

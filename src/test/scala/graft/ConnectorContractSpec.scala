package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.{DocConnector, FormatConnector, InMemoryConnector, ParquetConnector}

/** The connector CONTRACT, run identically against every in-tree
  * implementation — the de-risking seam for a network-backed scroll/bulk
  * connector (`transfer.js:79-151,44-77`): a drop-in only has to pass
  * this suite to be safe behind [[graft.Graft]] and
  * [[graft.engine.Transfer]], which is exactly how the in-memory mock
  * earns its place in the worker E2E.
  */
class ConnectorContractSpec extends SparkSpec {
  import spark.implicits._

  private def freshParquet(): DocConnector =
    new ParquetConnector(Files.createTempDirectory("graft_contract").toString)

  private def impls: Seq[(String, () => DocConnector)] = Seq(
    "InMemoryConnector" -> (() => new InMemoryConnector),
    "ParquetConnector" -> (() => freshParquet()),
    // text formats: same contract through the same seam — csv/json carry
    // no embedded schema, so the round-trip leans on header + inference
    // (see FormatConnector's scale note about explicit schemas)
    "FormatConnector(csv)" -> (() =>
      new FormatConnector(
        Files.createTempDirectory("graft_contract_csv").toString, "csv")),
    "FormatConnector(json)" -> (() =>
      new FormatConnector(
        Files.createTempDirectory("graft_contract_json").toString, "json"))
  )

  private def seed(n: Int): DataFrame =
    (1 to n).map(i => (i.toLong, s"doc$i")).toDF("id", "payload")

  for ((name, mk) <- impls) {

    test(s"$name: bulk returns the written count and scan reads it back exactly") {
      val c = mk()
      assert(c.bulk(seed(7), "docs") == 7L)
      val back = c.scan(spark, "docs")
      assert(back.schema.fieldNames.toSeq == Seq("id", "payload"))
      assert(back.as[(Long, String)].collect().sorted.toSeq ==
        seed(7).as[(Long, String)].collect().sorted.toSeq)
    }

    test(s"$name: bulk REPLACES table contents (idempotent under replays)") {
      val c = mk()
      c.bulk(seed(10), "docs")
      // a replayed/partial retry writes fewer rows; the table must hold
      // exactly the last write, never an append of both
      assert(c.bulk(seed(4), "docs") == 4L)
      assert(c.scan(spark, "docs").count() == 4L)
      // byte-identical replay converges
      assert(c.bulk(seed(4), "docs") == 4L)
      assert(c.scan(spark, "docs").count() == 4L)
    }

    test(s"$name: listTables globs (S3 index-metadata scan)") {
      val c = mk()
      c.bulk(seed(1), "alpha")
      c.bulk(seed(1), "alphaTwo")
      c.bulk(seed(1), "beta")
      assert(c.listTables("*").toSet == Set("alpha", "alphaTwo", "beta"))
      assert(c.listTables("alpha*").toSet == Set("alpha", "alphaTwo"))
      assert(c.listTables("beta") == Seq("beta"))
      assert(c.listTables("nope*").isEmpty)
    }

    test(s"$name: scanning an absent table fails loudly, never returns empty") {
      val c = mk()
      intercept[Exception](c.scan(spark, "absent").collect())
    }

    test(s"$name: slice-qualified names address independent per-subtask outputs") {
      val c = mk()
      c.bulk(seed(3), "t/slice1")
      c.bulk(seed(5), "t/slice2")
      assert(c.scan(spark, "t/slice1").count() == 3L)
      assert(c.scan(spark, "t/slice2").count() == 5L)
    }
  }
}

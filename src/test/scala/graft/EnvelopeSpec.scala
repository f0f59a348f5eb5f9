package graft

import org.apache.spark.sql.functions._

import graft.model.DocEnvelope
import graft.functions.text
import graft.operators.Multimodal

/** Doc-envelope round trip, multimodal resize, and langId on real
  * crafted sentences.
  */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("DataFrame -> Doc envelope -> DataFrame round trip") {
    val region = Tables.region(spark, sf)
    val docs = DocEnvelope.fromDataFrame(region, "region", "doc", "r_regionkey")
    val collected = docs.collect()
    assert(collected.length == region.count())
    assert(collected.forall(d => d.index == "region" && d.docType == "doc"))
    assert(collected.map(_.id).sorted.toSeq ==
      region.select(col("r_regionkey").cast("string")).as[String].collect().sorted.toSeq)

    val back = DocEnvelope.toDataFrame(docs, Seq("r_regionkey", "r_name"))
    assert(back.columns.toSeq == Seq("_index", "_type", "_id", "r_regionkey", "r_name"))
    val names = back.select(col("r_name")).as[String].collect().sorted.toSeq
    assert(names == region.select(col("r_name")).as[String].collect().sorted.toSeq)
  }

  test("envelope: null columns become absent source keys") {
    val df = Seq((1L, Some("x")), (2L, None)).toDF("id", "v")
    val docs = DocEnvelope.fromDataFrame(df, "t", "d", "id").collect()
    assert(docs.find(_.id == "1").get.source.contains("v"))
    assert(!docs.find(_.id == "2").get.source.contains("v"))
  }

  test("multimodal resize: dims replaced, features rescaled deterministically") {
    val feats = Multimodal.extractFeatures(Multimodal.assets(spark, sf), Multimodal.FakeDecoder)
    val resized = Multimodal.resize(feats, 32, 32).collect()
    assert(resized.forall(f => f.width == 32 && f.height == 32))
    val again = Multimodal.resize(
      Multimodal.extractFeatures(Multimodal.assets(spark, sf), Multimodal.FakeDecoder), 32, 32
    ).collect()
    assert(resized.map(_.features.toSeq).sortBy(_.hashCode).toSeq ==
      again.map(_.features.toSeq).sortBy(_.hashCode).toSeq)
  }

  test("langId on crafted sentences hits each branch") {
    val df = Seq(
      (1L, "the cat and the dog sat in the garden for it was warm"),
      (2L, "le chat est dans la maison et les oiseaux sont dans le jardin"),
      (3L, "der hund ist nicht mit der katze und das ist ein problem"),
      (4L, "los gatos y los perros son animales y es un placer por ver"),
      (5L, "一二三四五"),
      (6L, "zzz qqq xxx")
    ).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), text.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "fr", 3L -> "de", 4L -> "es", 5L -> "zh", 6L -> "unknown"))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.engine.Layout

/** Z-order clustering: bit-interleave correctness, and the actual
  * data-skipping claim — a z-clustered layout answers predicates on
  * EVERY clustered column from a small fraction of files, where a
  * single-column sort serves only its own column.
  */
class LayoutSpec extends SparkSpec {

  test("interleaveBits produces Morton codes") {
    import spark.implicits._
    // (x, y) -> z: bit i of x at 2i, bit i of y at 2i+1
    val cases = Seq((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (1L, 1L, 3L), (2L, 0L, 4L), (3L, 3L, 15L), (5L, 3L, 27L))
    val df = cases.toDF("x", "y", "expected")
    val got = df.select(
      Layout.interleaveBits(Seq(col("x"), col("y")), bits = 3).as("z"),
      col("expected")
    ).as[(Long, Long)].collect()
    got.foreach { case (z, exp) => assert(z == exp) }
  }

  test("normalize clamps and maps bounds to the rank range") {
    import spark.implicits._
    val df = Seq(-10.0, 0.0, 50.0, 100.0, 110.0).toDF("v")
    val got = df.select(Layout.normalize(col("v"), 0.0, 100.0, 8).as("r"))
      .as[Long].collect()
    assert(got.head == 0L, "below-lo clamps to 0")
    assert(got(1) == 0L)
    assert(got(3) == 255L, "hi maps to max rank")
    assert(got.last == 255L, "above-hi clamps to max rank")
    assert(got(2) == 127L, "midpoint lands mid-range")
  }

  test("z-clustered layout skips files on both dimensions; linear sort only on its own") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey", "l_quantity")
    val files = 16

    Layout.writeClustered(li, s"$tmp/z", Seq("l_partkey", "l_suppkey"), files)
    // comparison layout: globally sorted on l_partkey only
    li.repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    val bounds = li.agg(
      min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    val (pLo, pHi) = (bounds.getLong(0), bounds.getLong(1))
    val (sLo, sHi) = (bounds.getLong(2), bounds.getLong(3))
    // narrow box: bottom ~10% of each dimension
    val pCut = pLo + math.max(1L, (pHi - pLo) / 10)
    val sCut = sLo + math.max(1L, (sHi - sLo) / 10)

    def filesTouched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()

    val boxPred = col("l_partkey") <= pCut && col("l_suppkey") <= sCut
    val suppPred = col("l_suppkey") <= sCut

    val zBox = filesTouched(s"$tmp/z", boxPred)
    val zSupp = filesTouched(s"$tmp/z", suppPred)
    val linSupp = filesTouched(s"$tmp/linear", suppPred)

    assert(zBox <= files / 2, s"z-layout box query touched $zBox of $files files")
    assert(zSupp < files, s"z-layout serves the non-leading dimension ($zSupp/$files)")
    assert(linSupp == files,
      s"linear-on-partkey layout cannot skip on suppkey (touched $linSupp/$files)")
    assert(zSupp < linSupp, "z beats single-column sort on the other dimension")

    // layout changes bytes on disk, never rows: full content round-trips
    val total = li.count()
    assert(spark.read.parquet(s"$tmp/z").count() == total)
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an N× scale point from an existing testdata directory —
  * the input for empirical linearity checkpoints (SCALING.md): every
  * 100 TB claim argued from plan shape at sf0.1 gets one measured 10×
  * point to confirm (or falsify) the curve.
  *
  * Replication is NOT naive copying, and the first version of this
  * generator taught the reason the hard way: the synthetic corpus has a
  * 31-word vocabulary, so its 3-shingle space (~31³) is already nearly
  * SATURATED at sf0.1 (avg shingle df 9.6) — replicas that re-draw
  * from the same vocabulary made posting lists ~10× denser and
  * candidate pairs grow ~quadratically, a generator artifact no real
  * 10× corpus shows (real corpora grow lexical diversity with size;
  * zipfian df tails stay bounded relative to the corpus). So:
  *   - documents: replica r > 0 deterministically permutes each text's
  *     tokens (sort by xxhash64(token, position, r)) AND prefixes every
  *     token with the replica tag — replicas draw from DISJOINT
  *     vocabularies, so per-replica shingle-df structure matches the
  *     original and similarity work scales ~linearly with the factor.
  *   - ids INTERLEAVE (`id·factor + r`) instead of block-shifting: the
  *     incremental queries cut at max(id)/2, and a block layout would
  *     put whole replicas on each side (zero cross-split shingle
  *     overlap — a degenerate probe); interleaving splits every
  *     replica in half, preserving each one's cross-split structure.
  *   - embeddings: replica r rotates every vector's components by r
  *     positions — within-replica geometry (distances, clusters) is
  *     preserved exactly, cross-replica cosines decorrelate.
  *   - lineitem: row replicas with l_orderkey/l_partkey shifted so
  *     distinct counts scale with the factor.
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <outDir> <factor>
  */
object ScaleGen {

  private val IdStride = 100000000L

  private def replicas(base: DataFrame, factor: Int)(f: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(r => f(base, r)).reduce(_ unionByName _)

  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame =
    replicas(docs, factor) { (d, r) =>
      // degenerate-population fidelity: NULL text stays NULL and
      // token-free text (empty / whitespace-only) passes through
      // untouched — the sf0.1 edge-case rows must survive into every
      // replica or the scale point under-exercises exactly the
      // degenerate paths; tokenization matches the engine's \s+ rule
      // (a bare single-space split would mint empty tokens)
      val toks = filter(split(trim(col("text")), "\\s+"), t => length(t) > 0)
      val scrambled = concat_ws(" ",
        transform(
          array_sort(
            zip_with(
              toks,
              sequence(lit(0), size(toks) - 1),
              (t, i) => struct(xxhash64(t, i, lit(r)).as("h"),
                concat(lit(s"r${r}_"), t).as("t")))),
          x => x("t")))
      val text =
        if (r == 0) col("text")
        else when(col("text").isNull, lit(null).cast("string"))
          .when(size(toks) === 0, col("text"))
          .otherwise(scrambled)
      d.select(
        (col("doc_id") * factor + lit(r.toLong)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }

  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame =
    replicas(emb, factor) { (e, r) =>
      val dim = size(col("embedding"))
      val rot =
        if (r == 0) col("embedding")
        else transform(sequence(lit(0), dim - 1),
          i => element_at(col("embedding"), (pmod(i + lit(r), dim) + 1).cast("int")))
      e.select(
        (col("vec_id") * factor + lit(r.toLong)).as("vec_id"),
        rot.cast("array<float>").as("embedding"),
        col("label"))
    }

  def scaleLineitem(li: DataFrame, factor: Int): DataFrame =
    replicas(li, factor) { (l, r) =>
      l.withColumn("l_orderkey", col("l_orderkey") + lit(r * IdStride))
        .withColumn("l_partkey", col("l_partkey") + lit(r * IdStride))
    }

  /** Events scale as 10× TRAFFIC over the same time range: user ids
    * interleave (per-user event counts — the session/interval partition
    * bound — stay at the original shape), timestamps unchanged (window
    * counts grow 10× per bucket, the realistic densification).
    */
  def scaleEvents(ev: DataFrame, factor: Int): DataFrame =
    replicas(ev, factor) { (e, r) =>
      e.withColumn("event_id", col("event_id") * factor + lit(r.toLong))
        .withColumn("user_id", col("user_id") * factor + lit(r.toLong))
    }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def write(df: DataFrame, name: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scalegen] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }
    write(scaleDocuments(spark.read.parquet(s"$srcDir/documents.parquet"), factor), "documents")
    write(scaleEmbeddings(spark.read.parquet(s"$srcDir/embeddings.parquet"), factor), "embeddings")
    write(scaleLineitem(spark.read.parquet(s"$srcDir/lineitem.parquet"), factor), "lineitem")
    write(scaleEvents(spark.read.parquet(s"$srcDir/events.parquet"), factor), "events")
    spark.stop()
  }
}

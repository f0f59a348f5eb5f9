package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._

/** Bridge between the typed-table world and the schema-agnostic [[Doc]]
  * envelope (`SURVEY.md` §1.1/§1.2): any DataFrame becomes a stream of
  * `{_index, _type, _id, _source}` documents whose `_source` is a flat
  * string map — the shape the reference's mutators see — and back.
  */
object DocEnvelope {

  implicit private val docEncoder: Encoder[Doc] = Encoders.product[Doc]

  /** Wrap each row as a Doc. `_id` comes from `idCol` (stringified);
    * `_source` stringifies every column (null -> absent key, matching
    * JSON-document semantics where missing and null collapse).
    */
  def fromDataFrame(df: DataFrame, index: String, docType: String, idCol: String): Dataset[Doc] = {
    val names = df.columns
    df.map { row: Row =>
      val src = names.iterator.zipWithIndex.flatMap { case (n, i) =>
        if (row.isNullAt(i)) None else Some(n -> row.get(i).toString)
      }.toMap
      Doc(index, docType, src.getOrElse(idCol, ""), src)
    }
  }

  /** Unwrap a Doc stream back to columns (all strings — caller casts to
    * a declared schema when one exists, e.g. via `select(col(c).cast(t))`).
    */
  def toDataFrame(ds: Dataset[Doc], columns: Seq[String]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    val cols = columns // stable capture for the closure
    ds.map(d => (d.index, d.docType, d.id, cols.map(c => d.source.getOrElse(c, null))))
      .toDF("_index", "_type", "_id", "_vals")
      .select(
        col("_index") +: col("_type") +: col("_id") +:
          cols.zipWithIndex.map { case (c, i) => col("_vals").getItem(i).as(c) }: _*
      )
  }
}

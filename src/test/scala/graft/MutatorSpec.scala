package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.model.{Doc, ObjectId}
import graft.transform._

/** Mutator fold semantics (`transfer.js:271-284`) — the part SURVEY §7
  * flags as "easy to get subtly wrong": ordered, short-circuit on drop,
  * per-mutator arg override.
  */
class MutatorSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def doc(id: String, fields: (String, String)*) =
    Doc("idx", "t", id, fields.toMap)

  private def setField(k: String, v: String) = DocMutator(
    ObjectId("tst", "set" + k),
    (_, _) => true,
    (d, _) => Some(d.copy(source = d.source + (k -> v)))
  )

  test("fold applies mutators in order") {
    val out = MutatorPipeline.applyDocs(
      Seq(doc("1")),
      Seq(setField("a", "first"), setField("a", "second"))
    )
    assert(out.head.source("a") == "second")
  }

  test("drop short-circuits the rest of the pipeline") {
    var laterRan = false
    val dropper = DocMutator(ObjectId("tst", "drop"), (_, _) => true, (_, _) => None)
    val later = DocMutator(
      ObjectId("tst", "later"),
      (_, _) => true,
      (d, _) => { laterRan = true; Some(d) }
    )
    val out = MutatorPipeline.applyDocs(Seq(doc("1")), Seq(dropper, later))
    assert(out.isEmpty && !laterRan)
  }

  test("predicate false leaves doc unchanged") {
    val m = DocMutator(
      ObjectId("tst", "never"),
      (_, _) => false,
      (d, _) => Some(d.copy(source = d.source + ("x" -> "mutated")))
    )
    val out = MutatorPipeline.applyDocs(Seq(doc("1", "x" -> "orig")), Seq(m))
    assert(out.head.source("x") == "orig")
  }

  test("per-mutator args override task args (filters.js:96-99)") {
    var seen: Map[String, String] = Map.empty
    val m = DocMutator(
      ObjectId("tst", "argcheck"),
      (_, args) => { seen = args; true },
      (d, _) => Some(d),
      arguments = Map("k" -> "action")
    )
    MutatorPipeline.applyDocs(Seq(doc("1")), Seq(m), taskArgs = Map("k" -> "task"))
    assert(seen("k") == "action")
    val m2 = m.copy(arguments = Map.empty)
    MutatorPipeline.applyDocs(Seq(doc("1")), Seq(m2), taskArgs = Map("k" -> "task"))
    assert(seen("k") == "task")
  }

  test("property: pipeline output size <= input size; drops are exactly the dropped ids") {
    val ids = Gen.listOfN(30, Gen.choose(0, 99)).map(_.distinct)
    check(Prop.forAll(ids, Gen.choose(0, 99)) { (docIds, cutoff) =>
      val docs = docIds.map(i => doc(i.toString, "n" -> i.toString))
      val dropBig = DocMutator(
        ObjectId("tst", "dropBig"),
        (d, _) => d.source("n").toInt >= cutoff,
        (_, _) => None
      )
      val out = MutatorPipeline.applyDocs(docs, Seq(dropBig))
      out.map(_.source("n").toInt).forall(_ < cutoff) &&
      out.size == docIds.count(_ < cutoff)
    })
  }

  test("columnar fold matches row semantics: assign-then-drop ordering") {
    import spark.implicits._
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("id", "v")
    // mutator 1 doubles v where id < 3; mutator 2 drops v > 25 (post-mutation state!)
    val out = MutatorPipeline.applyColumnar(
      df,
      Seq(
        AssignMutator(ObjectId("tst", "dbl"), col("id") < 3, Seq("v" -> (col("v") * 2))),
        DropMutator(ObjectId("tst", "drop"), col("v") > 25)
      )
    ).orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1)))
    // id=1: v=20 kept; id=2: v=40 dropped (mutated value!); id=3: v=30 dropped
    assert(out.toSeq == Seq((1, 20.0)))
  }

  test("columnar assign sees pre-mutation predicate state") {
    import spark.implicits._
    val df = Seq((1, 5.0)).toDF("id", "v")
    // predicate on v, assignment overwrites v: predicate must use old v
    val out = MutatorPipeline.applyColumnar(
      df,
      Seq(AssignMutator(ObjectId("tst", "mm"), col("v") < 10, Seq("v" -> lit(100.0))))
    ).collect()
    assert(out.head.getDouble(1) == 100.0)
  }

  test("property: columnar fold == Doc fold on random pipelines") {
    import spark.implicits._
    // domain: rows with two int fields; ops: conditional add / drop
    sealed trait Op
    case class AddOp(threshold: Int, delta: Int) extends Op    // if a < t then b += d
    case class DropOp(threshold: Int) extends Op               // drop if b > t
    val genOp: Gen[Op] = Gen.oneOf(
      for { t <- Gen.choose(0, 100); d <- Gen.choose(-10, 10) } yield AddOp(t, d),
      Gen.choose(0, 150).map(DropOp(_))
    )
    val genCase = for {
      rows <- Gen.listOfN(25, Gen.zip(Gen.choose(0, 100), Gen.choose(0, 100)))
      ops  <- Gen.listOfN(4, genOp)
    } yield (rows.zipWithIndex, ops)

    check(Prop.forAll(genCase) { case (rows, ops) =>
      // row surface
      val docs = rows.map { case ((a, b), i) =>
        Doc("idx", "t", i.toString, Map("a" -> a.toString, "b" -> b.toString))
      }
      val docMutators = ops.zipWithIndex.map {
        case (AddOp(t, d), i) => DocMutator(
          ObjectId("tst", s"op$i"),
          (doc, _) => doc.source("a").toInt < t,
          (doc, _) => Some(doc.copy(source =
            doc.source + ("b" -> (doc.source("b").toInt + d).toString)))
        )
        case (DropOp(t), i) => DocMutator(
          ObjectId("tst", s"op$i"),
          (doc, _) => doc.source("b").toInt > t,
          (_, _) => None
        )
      }
      val wantRows = MutatorPipeline.applyDocs(docs, docMutators)
        .map(d => (d.id.toInt, d.source("a").toInt, d.source("b").toInt)).sorted

      // columnar surface
      val df = spark.createDataFrame(rows.map { case ((a, b), i) => (i, a, b) })
        .toDF("id", "a", "b")
      val colMutators: Seq[ColumnMutator] = ops.zipWithIndex.map {
        case (AddOp(t, d), i) =>
          AssignMutator(ObjectId("tst", s"op$i"), col("a") < t, Seq("b" -> (col("b") + d)))
        case (DropOp(t), i) =>
          DropMutator(ObjectId("tst", s"op$i"), col("b") > t)
      }
      val gotRows = MutatorPipeline.applyColumnar(df, colMutators)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toList.sorted

      gotRows == wantRows
    })
  }

  test("metadata filters OR-combine; empty filter list keeps all (subtasks.js:164)") {
    val ics = Seq(
      graft.model.IndexConfig("a1"), graft.model.IndexConfig("b1"),
      graft.model.IndexConfig("c1")
    )
    assert(MetadataFilters.applyIndexFilters(ics, Seq.empty) == ics)
    val kept = MetadataFilters.applyIndexFilters(
      ics,
      Seq(_.name.startsWith("a"), _.name.startsWith("b"))
    )
    assert(kept.map(_.name) == Seq("a1", "b1"))
  }

  test("stored filters plug into both F1 and F2 paths; kinds never cross-match") {
    val tf = StoredFilter(ObjectId("ns", "logsOnly"), StoredFilter.Type, "logs.*")
    assert(MetadataFilters.applyTypeFilters(
      Seq("logs2024", "metrics", "logsX"), Seq(tf.typePred)) == Seq("logs2024", "logsX"))
    val idxf = StoredFilter(ObjectId("ns", "aOnly"), StoredFilter.Index, "a.*")
    assert(MetadataFilters.applyIndexFilters(
      Seq(graft.model.IndexConfig("a1"), graft.model.IndexConfig("b1")),
      Seq(idxf.indexPred)).map(_.name) == Seq("a1"))
    // a type-kind filter never matches as an index pred, and vice versa
    assert(MetadataFilters.applyIndexFilters(
      Seq(graft.model.IndexConfig("logs2024")), Seq(tf.indexPred)).isEmpty)
    assert(MetadataFilters.applyTypeFilters(Seq("a1"), Seq(idxf.typePred)).isEmpty)
    // patterns are anchored: a substring hit is not a match
    assert(MetadataFilters.applyTypeFilters(Seq("xlogs2024"), Seq(tf.typePred)).isEmpty)
    intercept[IllegalArgumentException](StoredFilter(ObjectId("ns", "bad"), "nope", "x"))
  }

  test("registry: namespaced CRUD + existence check (tasks.js:79-80)") {
    val reg = new TransformRegistry[String]
    reg.add(ObjectId("ns", "m1"), "v1")
    reg.add(ObjectId("ns", "m2"), "v2")
    reg.add(ObjectId("other", "m1"), "v3")
    assert(reg.list("ns") == Seq("ns/m1", "ns/m2"))
    assert(reg.require(ObjectId("ns", "m1")) == "v1")
    intercept[NoSuchElementException](reg.require(ObjectId("ns", "nope")))
    reg.removeNamespace("ns")
    assert(reg.list("ns").isEmpty && reg.get(ObjectId("other", "m1")).contains("v3"))
  }

  test("ObjectId validation regex (objectId.js:33-58)") {
    assert(model.ObjectId.valid("abc123"))
    assert(!model.ObjectId.valid("1abc"))   // must start with letter
    assert(!model.ObjectId.valid("a" * 42)) // max 41 chars total
    assert(!model.ObjectId.valid("a-b"))    // alphanumeric only
    intercept[IllegalArgumentException](model.ObjectId("bad ns", "ok"))
  }

  test("uploaded expressions may not call JVM reflection (reflect/java_method)") {
    val oid = model.ObjectId("ns", "evil")
    // arbitrary static method invocation from an uploaded string — the
    // remote-execution gadget the deny-list exists for
    val e1 = intercept[IllegalArgumentException](ExprMutators.withColumn(
      oid, "x", "reflect('java.lang.System', 'getenv', 'PATH')"))
    assert(e1.getMessage.contains("forbidden"))
    intercept[IllegalArgumentException](ExprMutators.drop(
      oid, "java_method('java.lang.Runtime', 'getRuntime') IS NOT NULL"))
    // nested inside an innocent wrapper still caught (tree walk, not prefix match)
    intercept[IllegalArgumentException](ExprMutators.assign(
      oid, "true", "c" -> "upper(reflect('a', 'b'))"))
    // and case variations
    intercept[IllegalArgumentException](ExprMutators.drop(oid, "REFLECT('a', 'b') = 'x'"))
    // ordinary expressions are untouched
    assert(ExprMutators.drop(oid, "price < 10").id == oid)
  }

  test("stored filters reject an invalid regex at construction, not first use") {
    val e = intercept[IllegalArgumentException](
      StoredFilter(ObjectId("ns", "broken"), StoredFilter.Index, "("))
    assert(e.getMessage.contains("invalid filter pattern"))
  }

  test("uploaded expressions may not smuggle calls inside subqueries") {
    val oid = model.ObjectId("ns", "sneaky")
    // a subquery's inner plan is not an expression CHILD, so a plain
    // function-walk never sees the reflect below — subqueries are
    // rejected wholesale (they have no meaning in a per-row mutator)
    val e = intercept[IllegalArgumentException](ExprMutators.drop(
      oid, "(SELECT reflect('java.lang.System', 'getenv', 'PATH')) = 'x'"))
    assert(e.getMessage.contains("subquer"))
    intercept[IllegalArgumentException](ExprMutators.withColumn(
      oid, "x", "EXISTS (SELECT 1)"))
    intercept[IllegalArgumentException](ExprMutators.assign(
      oid, "price IN (SELECT 1)", "c" -> "1"))
  }
}

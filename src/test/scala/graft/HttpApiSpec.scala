package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper

import graft.api.HttpApi
import graft.sources.InMemoryConnector

/** Supertest-style coverage of the HTTP control surface — the analog of
  * the reference's Express route tests, driven over a real socket.
  */
class HttpApiSpec extends SparkSpec {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private def send(
      method: String, url: String, body: String = "", headers: Map[String, String] = Map.empty
  ): HttpResponse[String] = {
    val b = HttpRequest.newBuilder(URI.create(url))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b.header(k, v) }
    client.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  /** Poll `GET /tasks/{id}/_run` until the run leaves `running`. */
  private def pollRun(base: String, id: String, deadlineSec: Int = 60) = {
    val deadline = System.nanoTime() + deadlineSec * 1000000000L
    var node = mapper.readTree(send("GET", s"$base/tasks/$id/_run").body())
    while (node.get("state").asText() == "running" && System.nanoTime() < deadline) {
      Thread.sleep(100)
      node = mapper.readTree(send("GET", s"$base/tasks/$id/_run").body())
    }
    node
  }

  test("task lifecycle over HTTP: mutators, add, run, status, errors, delete") {
    val src = new InMemoryConnector
    src.bulk((1 to 10).map(i => (i.toLong, i * 2.0)).toDF("id", "price"), "items")
    val sink = new InMemoryConnector
    val g = new Graft(spark, _ => (src, sink))
    val api = new HttpApi(g).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      // register a SQL-expr mutator (the compiler.js analog)
      assert(send("POST", s"$base/mutators/job1/dropCheap",
        """{"type": "drop", "predicate": "price < 10"}""").statusCode() == 200)
      val ids = mapper.readTree(send("GET", s"$base/mutators/job1").body())
      assert(ids.get("ids").get(0).asText() == "job1/dropCheap")

      // add references the mutator; unknown refs are a client error
      assert(send("POST", s"$base/tasks/job1",
        """{"sourceDir": "mem://s", "destDir": "mem://d", "tables": ["items"],
          |"mutators": ["job1/nope"]}""".stripMargin).statusCode() == 404)
      val add = send("POST", s"$base/tasks/job1",
        """{"sourceDir": "mem://s", "destDir": "mem://d", "tables": ["items"],
          |"mutators": ["job1/dropCheap"]}""".stripMargin)
      assert(add.statusCode() == 200)
      assert(mapper.readTree(add.body()).get("backlog").asInt() == 1)

      // status before run
      val st0 = mapper.readTree(send("GET", s"$base/tasks/job1").body())
      assert(st0.get("status").get("backlog").asInt() == 1)

      // drain (async: 202 + poll); rows with price < 10 (ids 1..4) drop
      assert(send("GET", s"$base/tasks/job1/_run").statusCode() == 404) // no run yet
      assert(send("POST", s"$base/tasks/job1/_run").statusCode() == 202)
      val run = pollRun(base, "job1")
      assert(run.get("state").asText() == "done")
      assert(run.get("completed").asInt() == 1)
      assert(run.get("rowsWritten").asLong() == 6L)

      val st1 = mapper.readTree(send("GET", s"$base/tasks/job1").body())
      assert(st1.get("status").get("percentComplete").asDouble() == 100.0)
      val prog = st1.get("progress")
      assert(prog.properties().size() == 1)
      assert(prog.properties().iterator().next().getValue.get("transferred").asLong() == 6L)

      // task inventory + error log shapes
      val all = mapper.readTree(send("GET", s"$base/tasks").body())
      assert(all.has("job1"))
      assert(mapper.readTree(send("GET", s"$base/tasks/job1/errors").body()).size() == 0)
      assert(send("GET", s"$base/tasks/nosuch").statusCode() == 404)

      // delete removes the task, its namespaced mutators, AND its run record
      assert(send("DELETE", s"$base/tasks/job1").statusCode() == 204)
      assert(mapper.readTree(send("GET", s"$base/mutators/job1").body()).get("ids").size() == 0)
      assert(send("GET", s"$base/tasks/job1/_run").statusCode() == 404)
      assert(send("GET", s"$base/nope").statusCode() == 404)
    } finally api.close()
  }

  test("_start/_stop flip the manager flag over HTTP") {
    val g = new Graft(spark)
    val api = new HttpApi(g).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      assert(mapper.readTree(send("GET", s"$base/status").body())
        .get("manager").asText() == "running")
      assert(send("POST", s"$base/_stop").statusCode() == 200)
      assert(!g.isRunning)
      assert(mapper.readTree(send("GET", s"$base/status").body())
        .get("manager").asText() == "stopped")
      assert(send("POST", s"$base/_start").statusCode() == 200)
      assert(g.isRunning)
    } finally api.close()
  }

  test("filters CRUD over HTTP; a stored filter prunes the task plan") {
    val src = new InMemoryConnector
    src.bulk((1 to 4).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "first")
    src.bulk((1 to 4).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "second")
    val g = new Graft(spark, _ => (src, new InMemoryConnector))
    val api = new HttpApi(g).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      // create + read-back + list (filters.js:39-126 CRUD contract)
      assert(send("POST", s"$base/filters/jobF/onlyFirst",
        """{"type": "index", "pattern": "first"}""").statusCode() == 200)
      val one = mapper.readTree(send("GET", s"$base/filters/jobF/onlyFirst").body())
      assert(one.get("type").asText() == "index")
      assert(one.get("pattern").asText() == "first")
      val ids = mapper.readTree(send("GET", s"$base/filters/jobF").body())
      assert(ids.get("ids").get(0).asText() == "jobF/onlyFirst")
      // a bad kind is a client error, not a server fault
      assert(send("POST", s"$base/filters/jobF/bad",
        """{"type": "nope", "pattern": "x"}""").statusCode() == 400)

      // unknown filter refs fail the add-time pre-check (tasks.js:79-80)
      assert(send("POST", s"$base/tasks/jobF",
        """{"sourceDir": "mem://s", "destDir": "mem://d",
          |"tables": ["first", "second"], "filters": ["jobF/nope"]}""".stripMargin)
        .statusCode() == 404)
      // the STORED filter prunes 'second' out of the plan: backlog is 1
      val add = send("POST", s"$base/tasks/jobF",
        """{"sourceDir": "mem://s", "destDir": "mem://d",
          |"tables": ["first", "second"], "filters": ["jobF/onlyFirst"]}""".stripMargin)
      assert(add.statusCode() == 200)
      assert(mapper.readTree(add.body()).get("backlog").asInt() == 1)

      // delete one; task removal drops the rest of the namespace
      assert(send("DELETE", s"$base/filters/jobF/bad").statusCode() == 204)
      assert(send("DELETE", s"$base/tasks/jobF").statusCode() == 204)
      assert(mapper.readTree(send("GET", s"$base/filters/jobF").body()).get("ids").size() == 0)
      assert(send("GET", s"$base/filters/jobF/onlyFirst").statusCode() == 404)
    } finally api.close()
  }

  test("GET /mutators/{ns}/{id} reads back a registered mutator") {
    val g = new Graft(spark)
    val api = new HttpApi(g).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      assert(send("POST", s"$base/mutators/jobM/dropCheap",
        """{"type": "drop", "predicate": "price < 10"}""").statusCode() == 200)
      val got = mapper.readTree(send("GET", s"$base/mutators/jobM/dropCheap").body())
      assert(got.get("id").asText() == "jobM/dropCheap")
      assert(got.get("type").asText() == "drop")
      assert(got.get("predicate").asText().contains("price"))
      assert(send("GET", s"$base/mutators/jobM/nope").statusCode() == 404)
    } finally api.close()
  }

  test("over-HTTP /_stop interrupts an over-HTTP /_run; backlog survives for resume") {
    import org.apache.spark.sql.{DataFrame, Row, SparkSession}
    import graft.sources.DocConnector
    val src = new InMemoryConnector
    src.bulk((0 until 10).map(n => (n.toLong, s"data$n")).toDF("id", "something"), "first")
    // a sink whose bulk job parks its tasks: the run can only finish fast
    // through the job-group cancellation path, so a quick completion proves
    // the stop was both DELIVERED (thread pool) and EFFECTIVE (interrupt)
    val slowSink = new DocConnector {
      override def scan(spark: SparkSession, table: String): DataFrame =
        throw new UnsupportedOperationException("sink only")
      override def bulk(df: DataFrame, table: String): Long = {
        df.foreachPartition { (_: Iterator[Row]) => Thread.sleep(60000) }
        df.count()
      }
      override def listTables(pattern: String): Seq[String] = Seq.empty
    }
    val g = new Graft(spark, _ => (src, slowSink))
    val api = new HttpApi(g).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      assert(send("POST", s"$base/tasks/jobS",
        """{"sourceDir": "mem://s", "destDir": "mem://d", "tables": ["first"]}""").statusCode() == 200)
      val t0 = System.nanoTime()
      assert(send("POST", s"$base/tasks/jobS/_run").statusCode() == 202)
      Thread.sleep(2000) // let the bulk job start
      // a second run while one is in flight is a conflict, not a double-drain
      assert(send("POST", s"$base/tasks/jobS/_run").statusCode() == 409)
      // the stop MUST be deliverable while the run occupies its thread
      assert(send("POST", s"$base/_stop").statusCode() == 200)
      val run = pollRun(base, "jobS", deadlineSec = 30)
      val elapsedSec = (System.nanoTime() - t0) / 1e9
      assert(run.get("state").asText() == "done")
      assert(run.get("completed").asInt() == 0, "cancelled subtask must not report success")
      assert(elapsedSec < 30, s"stop did not interrupt the in-flight run (took ${elapsedSec}s)")
      // interruption recorded; backlog intact for a later /_start + /_run
      assert(mapper.readTree(send("GET", s"$base/tasks/jobS/errors").body()).size() > 0)
      val st = mapper.readTree(send("GET", s"$base/tasks/jobS").body())
      assert(st.get("status").get("backlog").asInt() == 1)
      assert(send("POST", s"$base/_start").statusCode() == 200)
    } finally api.close()
  }

  test("lifecycle guards: stopped-manager 409, delete/re-add conflict mid-run, 400s") {
    import org.apache.spark.sql.{DataFrame, Row, SparkSession}
    import graft.sources.DocConnector
    val src = new InMemoryConnector
    src.bulk((0 until 5).map(n => (n.toLong, s"d$n")).toDF("id", "v"), "t1")
    val slowSink = new DocConnector {
      override def scan(spark: SparkSession, table: String): DataFrame =
        throw new UnsupportedOperationException("sink only")
      override def bulk(df: DataFrame, table: String): Long = {
        df.foreachPartition { (_: Iterator[Row]) => Thread.sleep(30000) }
        df.count()
      }
      override def listTables(pattern: String): Seq[String] = Seq.empty
    }
    val g = new Graft(spark, _ => (src, slowSink))
    val api = new HttpApi(g).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    val addBody = """{"sourceDir": "mem://s", "destDir": "mem://d", "tables": ["t1"]}"""
    try {
      // malformed JSON is the client's error, not a 500 server fault
      assert(send("POST", s"$base/tasks/jobG", "{bad json").statusCode() == 400)
      // a broken regex must be rejected AT THE STORE, not later at task add
      assert(send("POST", s"$base/filters/ns/bad",
        """{"type": "index", "pattern": "[unclosed"}""").statusCode() == 400)
      assert(send("POST", s"$base/tasks/jobG", addBody).statusCode() == 200)
      // a run submitted while stopped must refuse — not report a false done
      assert(send("POST", s"$base/_stop").statusCode() == 200)
      assert(send("POST", s"$base/tasks/jobG/_run").statusCode() == 409)
      assert(send("POST", s"$base/_start").statusCode() == 200)
      // with a drain in flight, delete and re-add are conflicts: both
      // would orphan the running state (double-drain / lost completions)
      assert(send("POST", s"$base/tasks/jobG/_run").statusCode() == 202)
      Thread.sleep(1500)
      assert(send("DELETE", s"$base/tasks/jobG").statusCode() == 409)
      assert(send("POST", s"$base/tasks/jobG", addBody).statusCode() == 409)
      // cleanup: interrupt the parked run, then the delete goes through
      assert(send("POST", s"$base/_stop").statusCode() == 200)
      pollRun(base, "jobG", deadlineSec = 30)
      assert(send("DELETE", s"$base/tasks/jobG").statusCode() == 204)
      assert(send("POST", s"$base/_start").statusCode() == 200)
    } finally api.close()
  }

  test("end-to-end over HTTP on real parquet: add with size buckets, async run, output lands") {
    // the production path: HTTP -> Graft -> Planner (size buckets) ->
    // Transfer -> ParquetConnector (observe-counted writes), no mocks
    val destRoot = java.nio.file.Files.createTempDirectory("graft_http_pq").toString
    val g = new Graft(spark) // default parquet connectors from the task spec
    val api = new HttpApi(g).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      val add = send("POST", s"$base/tasks/jobP",
        s"""{"sourceDir": "$sf", "destDir": "$destRoot", "tables": ["region", "nation"],
           |"sizeCols": {"nation": "n_nationkey"}}""".stripMargin)
      assert(add.statusCode() == 200)
      // nation splits into 3 size buckets + region unbucketed = 4 subtasks
      assert(mapper.readTree(add.body()).get("backlog").asInt() == 4)
      assert(send("POST", s"$base/tasks/jobP/_run").statusCode() == 202)
      val run = pollRun(base, "jobP")
      assert(run.get("state").asText() == "done")
      assert(run.get("completed").asInt() == 4)
      val want = Tables.region(spark, sf).count() + Tables.nation(spark, sf).count()
      assert(run.get("rowsWritten").asLong() == want)
      // slices land under <destRoot>/<table>/<subtaskDir>; union equals source
      val slices = new java.io.File(s"$destRoot/nation").listFiles().filter(_.isDirectory)
      assert(slices.length == 3, s"expected 3 nation slices, got ${slices.mkString(",")}")
      assert(slices.map(d => spark.read.parquet(d.toString).count()).sum ==
        Tables.nation(spark, sf).count())
      assert(mapper.readTree(send("GET", s"$base/tasks/jobP").body())
        .get("status").get("percentComplete").asDouble() == 100.0)
    } finally api.close()
  }

  test("api key gate: absent key is 400, wrong key is 401, right key passes") {
    val g = new Graft(spark)
    val api = new HttpApi(g, apiKey = Some("sekrit")).start()
    val base = s"http://127.0.0.1:${api.boundPort}"
    try {
      assert(send("GET", s"$base/status").statusCode() == 400)
      assert(send("GET", s"$base/status", headers = Map("api_key" -> "wrong")).statusCode() == 401)
      assert(send("GET", s"$base/status", headers = Map("api_key" -> "sekrit")).statusCode() == 200)
    } finally api.close()
  }
}

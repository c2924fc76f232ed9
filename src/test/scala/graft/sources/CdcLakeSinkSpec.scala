package graft.sources

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.lake.LakeTable

/** Streaming semantics (SURVEY.md §2.8/§5.5): MemoryStream micro-batches
  * driven through the registered `cdc-lake` shortname.
  */
class CdcLakeSinkSpec extends SparkSpec {
  import spark.implicits._

  private val personSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType))).json

  private def esc(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def env(ts: Long, op: String, rows: String*): String =
    s"""{"databaseName":"db","tableName":"person","schema":${esc(personSchema)},""" +
      s""""timestamp":$ts,"type":"$op","rows":[${rows.mkString(",")}]}"""

  test("two micro-batches through writeStream.format(cdc-lake) merge with LWW") {
    implicit val sqlCtx = spark.sqlContext
    val root = tempDir("sink-").toString
    val input = MemoryStream[String]
    val q = input.toDF().writeStream
      .format("cdc-lake")
      .option("checkpointLocation", s"$root/_ckpt")
      .option("option.lake.path", s"$root/{db}/{table}")
      .option("db.person.recordkey.field", "id")
      .option("db.person.buckets", "4")
      .start()
    try {
      // batch 0: inserts
      input.addData(
        env(1L, "upsert", """{"id":1,"name":"ann"}""", """{"id":2,"name":"bob"}"""))
      q.processAllAvailable()
      // batch 1: update + delete
      input.addData(
        env(2L, "upsert", """{"id":1,"name":"ann2"}"""),
        env(3L, "delete", """{"id":2,"name":"bob"}"""))
      q.processAllAvailable()
    } finally q.stop()

    val got = new LakeTable(spark, s"$root/db/person", 4).snapshot
      .select("id", "name").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "ann2")))
  }

  test("restart from checkpoint resumes past committed offsets") {
    implicit val sqlCtx = spark.sqlContext
    val root = tempDir("sink-").toString
    def start(input: MemoryStream[String]) = input.toDF().writeStream
      .format("cdc-lake")
      .option("checkpointLocation", s"$root/_ckpt")
      .option("option.lake.path", s"$root/{db}/{table}")
      .option("db.person.recordkey.field", "id")
      .option("db.person.buckets", "4")
      .start()

    val batch0 = env(1L, "upsert", """{"id":1,"name":"v1"}""")
    val in1 = MemoryStream[String]
    val q1 = start(in1)
    try {
      in1.addData(batch0)
      q1.processAllAvailable()
    } finally q1.stop()

    val lake = new LakeTable(spark, s"$root/db/person", 4)
    val versionsAfterFirst = lake.latestVersion

    // Restart against the same checkpoint. The new source re-offers the old
    // data (as a restarted source would); restored offsets must skip it and
    // only the genuinely new batch may change table state.
    val in2 = MemoryStream[String]
    in2.addData(batch0)
    val q2 = start(in2)
    try {
      in2.addData(env(5L, "upsert", """{"id":1,"name":"v2"}"""))
      q2.processAllAvailable()
    } finally q2.stop()

    val got = lake.snapshot.select("name").as[String].collect()
    assert(got.toSeq == Seq("v2"))
    assert(versionsAfterFirst.exists(v => lake.latestVersion.exists(_ > v)))
  }

  test("batch write via df.write.format(cdc-lake) and read via spark.read.format(cdc-lake)") {
    val root = tempDir("sink-").toString
    Seq(
      env(1L, "upsert", """{"id":1,"name":"ann"}""", """{"id":2,"name":"bob"}"""),
      env(2L, "delete", """{"id":2,"name":"bob"}"""))
      .toDF("value")
      .write.format("cdc-lake")
      .option("option.lake.path", s"$root/{db}/{table}")
      .option("db.person.recordkey.field", "id")
      .option("db.person.buckets", "4")
      .mode("append")
      .save()
    val got = spark.read.format("cdc-lake")
      .option("buckets", "4")
      .load(s"$root/db/person")
      .select("id", "name").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, "ann")))
  }

  test("two session-conf-checkpointed streams on one table both make progress") {
    // Neither stream passes a checkpointLocation OPTION: the checkpoint is
    // resolved from the session conf + queryName, which the sink can't see
    // in its options map. The sink must still derive distinct commit
    // namespaces (from the active query's resolved checkpoint root) or
    // stream B's batch 0 is silently skipped as a replay of stream A's.
    implicit val sqlCtx = spark.sqlContext
    val root = tempDir("sink-").toString
    spark.conf.set("spark.sql.streaming.checkpointLocation", s"$root/_session_ckpt")
    try {
      def start(input: MemoryStream[String], name: String) = input.toDF().writeStream
        .format("cdc-lake")
        .queryName(name)
        .option("option.lake.path", s"$root/{db}/{table}")
        .option("db.person.recordkey.field", "id")
        .option("db.person.buckets", "4")
        .start()

      val inA = MemoryStream[String]; val inB = MemoryStream[String]
      val qA = start(inA, "streamA"); val qB = start(inB, "streamB")
      try {
        inA.addData(env(1L, "upsert", """{"id":1,"name":"from-a"}"""))
        qA.processAllAvailable()
        // B's batch 0 lands AFTER A's batch 0 committed — without a
        // namespace its commit id would collide and be dropped.
        inB.addData(env(2L, "upsert", """{"id":2,"name":"from-b"}"""))
        qB.processAllAvailable()
      } finally { qA.stop(); qB.stop() }

      val got = new LakeTable(spark, s"$root/db/person", 4).snapshot
        .select("id", "name").as[(Long, String)].collect().sortBy(_._1)
      assert(got.toSeq == Seq((1L, "from-a"), (2L, "from-b")))

      // Restart A against its session-conf checkpoint: the re-offered batch
      // must be skipped (same resolved checkpoint root -> same namespace ->
      // replay idempotency still holds across restarts).
      val inA2 = MemoryStream[String]
      inA2.addData(env(1L, "upsert", """{"id":1,"name":"REPLAY"}"""))
      val qA2 = start(inA2, "streamA")
      try {
        inA2.addData(env(5L, "upsert", """{"id":1,"name":"a-v2"}"""))
        qA2.processAllAvailable()
      } finally qA2.stop()
      val after = new LakeTable(spark, s"$root/db/person", 4).snapshot
        .select("id", "name").as[(Long, String)].collect().sortBy(_._1)
      assert(after.toSeq == Seq((1L, "a-v2"), (2L, "from-b")))
    } finally spark.conf.unset("spark.sql.streaming.checkpointLocation")
  }

  test("batch read self-detects a partitioned table layout") {
    val root = tempDir("sink-").toString
    val plt = new graft.lake.PartitionedLakeTable(spark, root, "day", numBuckets = 2)
    plt.upsert(Seq(
      ("a", 1L, "2024-01-01", "va"), ("c", 1L, "2024-01-02", "vc"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "day", "payload"))
    val got = spark.read.format("cdc-lake").option("buckets", "2").load(root)
      .select("_key", "day", "payload").as[(String, String, String)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("a", "2024-01-01", "va"), ("c", "2024-01-02", "vc")))
  }

  test("versionAsOf pins an explicit committed version; wrong shapes and unknown versions are loud") {
    val root = tempDir("sink-").toString
    val lake = new LakeTable(spark, s"$root/t", numBuckets = 4)
    lake.upsert(Seq(("k1", 1L, "v1")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload"))
    lake.upsert(Seq(("k1", 2L, "v2")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload"))
    def readAt(v: String): Seq[String] = spark.read.format("cdc-lake")
      .option("buckets", "4").option("versionAsOf", v).load(s"$root/t")
      .select("payload").as[String].collect().toSeq
    assert(readAt("1") == Seq("v1"))
    assert(readAt("2") == Seq("v2"))
    // latest (no option) still reads v2
    assert(spark.read.format("cdc-lake").option("buckets", "4").load(s"$root/t")
      .select("payload").as[String].collect().toSeq == Seq("v2"))
    intercept[Exception](readAt("9"))            // unknown version
    intercept[Exception](readAt("""{"a":1}"""))  // vector on a plain table

    val proot = tempDir("sink-").toString
    val plt = new graft.lake.PartitionedLakeTable(spark, proot, "day", numBuckets = 2)
    plt.upsert(Seq(("a", 1L, "d1", "pv1"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "day", "payload"))
    plt.upsert(Seq(("a", 2L, "d1", "pv2"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "day", "payload"))
    def readPAt(v: String): Seq[String] = spark.read.format("cdc-lake")
      .option("buckets", "2").option("versionAsOf", v).load(proot)
      .select("payload").as[String].collect().toSeq
    assert(readPAt("""{"d1":1}""") == Seq("pv1"))
    assert(readPAt("""{"d1":2}""") == Seq("pv2"))
    intercept[Exception](readPAt("1"))           // scalar on a partitioned table
  }

  test("queryType=read_optimized reads base-only MOR state; loud with time travel") {
    val root = tempDir("sink-").toString
    val lake = new LakeTable(spark, s"$root/t", numBuckets = 4,
      tableType = LakeTable.MorType, compactAfter = 10)
    lake.bulkInsert(Seq(("k1", 1L, "v1")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload"))
    lake.upsert(Seq(("k1", 2L, "v2")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload"))
    def read(qt: String) = spark.read.format("cdc-lake")
      .option("buckets", "4").option("queryType", qt).load(s"$root/t")
      .select("payload").as[String].collect().toSeq
    assert(read("snapshot") == Seq("v2"))
    assert(read("read_optimized") == Seq("v1"), "delta skipped, base state")
    // the Hudi option name is a synonym; key probes stay consistent with ro
    assert(spark.read.format("cdc-lake").option("buckets", "4")
      .option("hoodie.datasource.query.type", "read_optimized").load(s"$root/t")
      .filter(org.apache.spark.sql.functions.col(LakeTable.KeyCol) === "k1")
      .select("payload").as[String].collect().toSeq == Seq("v1"))
    intercept[Exception](read("nonsense"))
    intercept[Exception] {
      spark.read.format("cdc-lake").option("buckets", "4")
        .option("queryType", "read_optimized").option("versionAsOf", "1")
        .load(s"$root/t").collect()
    }
  }

  test("timestampAsOf resolves instants to pinned versions (Hudi as.of.instant shape)") {
    val root = tempDir("sink-").toString
    val lake = new LakeTable(spark, s"$root/t", numBuckets = 4)
    lake.upsert(Seq(("k1", 1L, "v1")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload"))
    Thread.sleep(5)
    val mid = System.currentTimeMillis()
    Thread.sleep(5)
    lake.upsert(Seq(("k1", 2L, "v2")).toDF(LakeTable.KeyCol, LakeTable.TsCol, "payload"))
    def readTs(t: String): Seq[String] = spark.read.format("cdc-lake")
      .option("buckets", "4").option("timestampAsOf", t).load(s"$root/t")
      .select("payload").as[String].collect().toSeq
    assert(readTs(mid.toString) == Seq("v1"))
    assert(readTs(System.currentTimeMillis().toString) == Seq("v2"))
    // an instant before the first commit is a legitimate point in time:
    // the table had no state then (pinned-empty relation, empty schema —
    // same convention as reading a never-committed table)
    assert(spark.read.format("cdc-lake").option("buckets", "4")
      .option("timestampAsOf", "1").load(s"$root/t").count() == 0)
    // the formatted-UTC shape parses (far future resolves to latest)
    assert(readTs("2099-01-01 00:00:00") == Seq("v2"))
    intercept[Exception](readTs("not-a-time")) // loud on wrong shape
    intercept[Exception] { // mutually exclusive with versionAsOf
      spark.read.format("cdc-lake").option("buckets", "4")
        .option("timestampAsOf", mid.toString).option("versionAsOf", "1")
        .load(s"$root/t").collect()
    }

    // partitioned: per-partition resolution; a partition born after the
    // instant is simply absent from that point-in-time read
    val proot = tempDir("sink-").toString
    val plt = new graft.lake.PartitionedLakeTable(spark, proot, "day", numBuckets = 2)
    plt.upsert(Seq(("a", 1L, "d1", "pv1"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "day", "payload"))
    Thread.sleep(5)
    val pmid = System.currentTimeMillis()
    Thread.sleep(5)
    plt.upsert(Seq(("a", 2L, "d1", "pv2"), ("b", 1L, "d2", "qv1"))
      .toDF(LakeTable.KeyCol, LakeTable.TsCol, "day", "payload"))
    def readPTs(t: Long): Seq[String] = spark.read.format("cdc-lake")
      .option("buckets", "2").option("timestampAsOf", t.toString).load(proot)
      .select("payload").as[String].collect().toSeq.sorted
    assert(readPTs(pmid) == Seq("pv1"))
    assert(readPTs(System.currentTimeMillis()) == Seq("pv2", "qv1"))
  }

  test("Sink.addBatch with a replayed batchId is a no-op (provider-level)") {
    val root = tempDir("sink-").toString
    val params = Map(
      "option.lake.path" -> s"$root/{db}/{table}",
      "db.person.recordkey.field" -> "id",
      "db.person.buckets" -> "4")
    val sink = new CdcLakeSinkProvider().createSink(
      spark.sqlContext, params, Nil, org.apache.spark.sql.streaming.OutputMode.Append())
    sink.addBatch(0L, Seq(env(1L, "upsert", """{"id":1,"name":"v1"}""")).toDF("value"))
    sink.addBatch(0L, Seq(env(9L, "upsert", """{"id":1,"name":"REPLAY"}""")).toDF("value"))
    val got = new LakeTable(spark, s"$root/db/person", 4).snapshot
      .select("name").as[String].collect()
    assert(got.toSeq == Seq("v1"))
  }

  test("source SPI: default file-tail provider resolves and drives the sink end-to-end") {
    val root = tempDir("sink-").toString
    val srcDir = java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/in"))
    java.nio.file.Files.write(
      srcDir.resolve("batch0.json"),
      (env(1L, "upsert", """{"id":1,"name":"spi"}""") + "\n").getBytes("UTF-8"))
    val stream = graft.cdc.CdcSource.resolve(
      spark, Map(graft.cdc.FileTailSourceProvider.PathKey -> srcDir.toString))
    val q = stream.writeStream
      .format("cdc-lake")
      .option("checkpointLocation", s"$root/_ckpt")
      .option("option.lake.path", s"$root/{db}/{table}")
      .option("db.person.recordkey.field", "id")
      .option("db.person.buckets", "4")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = new LakeTable(spark, s"$root/db/person", 4).snapshot
      .select("name").as[String].collect()
    assert(got.toSeq == Seq("spi"))
  }

  test("source SPI: a custom (non-file) provider class plugs in via option.source.provider") {
    implicit val sqlCtx = spark.sqlContext
    val root = tempDir("sink-").toString
    val input = MemoryStream[String]
    MemoryEnvelopeProvider.stream = input
    val stream = graft.cdc.CdcSource.resolve(
      spark, Map(graft.cdc.CdcSource.ProviderKey -> classOf[MemoryEnvelopeProvider].getName))
    val q = stream.writeStream
      .format("cdc-lake")
      .option("checkpointLocation", s"$root/_ckpt")
      .option("option.lake.path", s"$root/{db}/{table}")
      .option("db.person.recordkey.field", "id")
      .option("db.person.buckets", "4")
      .start()
    try {
      input.addData(env(1L, "upsert", """{"id":7,"name":"mem"}"""))
      q.processAllAvailable()
    } finally q.stop()
    val got = new LakeTable(spark, s"$root/db/person", 4).snapshot
      .select("id", "name").as[(Long, String)].collect()
    assert(got.toSeq == Seq((7L, "mem")))
  }

  test("source SPI: a push-style TCP socket provider streams envelopes into the sink") {
    // The push-style transport shape a real binlog client connection has:
    // a server pushes envelope lines over TCP; the provider wraps Spark's
    // socket source (one string column named `value` — the contract).
    val root = tempDir("sink-").toString
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getByName("127.0.0.1"))
    val payload = env(1L, "upsert", """{"id":9,"name":"sock"}""") + "\n"
    val done = new java.util.concurrent.CountDownLatch(1)
    val pusher = new Thread(() => {
      try {
        val s = server.accept()
        val out = new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8")
        out.write(payload)
        out.flush()
        done.await(60, java.util.concurrent.TimeUnit.SECONDS) // keep the connection open
        s.close()
      } catch { case _: Throwable => () }
    })
    pusher.setDaemon(true)
    pusher.start()
    val stream = graft.cdc.CdcSource.resolve(
      spark, Map(
        graft.cdc.CdcSource.ProviderKey -> classOf[SocketEnvelopeProvider].getName,
        SocketEnvelopeProvider.PortKey -> server.getLocalPort.toString))
    val q = stream.writeStream
      .format("cdc-lake")
      .option("checkpointLocation", s"$root/_ckpt")
      .option("option.lake.path", s"$root/{db}/{table}")
      .option("db.person.recordkey.field", "id")
      .option("db.person.buckets", "4")
      .start()
    try {
      // The socket source buffers lines as its receiver thread gets them:
      // poll until the pushed envelope lands in the table (bounded).
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var landed = Seq.empty[(Long, String)]
      while (landed.isEmpty && System.nanoTime() < deadline) {
        q.processAllAvailable()
        val t = new LakeTable(spark, s"$root/db/person", 4)
        if (t.latestVersion.isDefined)
          landed = t.snapshot.select("id", "name").as[(Long, String)].collect().toSeq
        if (landed.isEmpty) Thread.sleep(200)
      }
      assert(landed == Seq((9L, "sock")),
        s"socket-pushed envelope must reach the lake table, got $landed")
    } finally {
      q.stop()
      done.countDown()
      server.close()
    }
  }

  test("source SPI: a provider violating the one-string-column contract fails loudly at resolve") {
    val e = intercept[IllegalArgumentException] {
      graft.cdc.CdcSource.resolve(
        spark, Map(graft.cdc.CdcSource.ProviderKey -> classOf[BadShapeProvider].getName))
    }
    assert(e.getMessage.contains("exactly one string column"))
  }
}

/** Non-file [[graft.cdc.CdcSourceProvider]] fixture: proves the SPI seam
  * carries an arbitrary implementation (here MemoryStream-backed — the
  * stand-in for a real binlog client) without any engine change.
  */
class MemoryEnvelopeProvider extends graft.cdc.CdcSourceProvider {
  override def envelopeStream(
      spark: org.apache.spark.sql.SparkSession,
      options: Map[String, String]): org.apache.spark.sql.DataFrame =
    MemoryEnvelopeProvider.stream.toDF()
}

object MemoryEnvelopeProvider {
  @volatile var stream: MemoryStream[String] = _
}

/** Push-style [[graft.cdc.CdcSourceProvider]] fixture over Spark's TCP
  * socket source — the transport shape of a real binlog client
  * connection (server pushes change events down an open socket). The
  * socket source's single `value` string column IS the envelope
  * contract, so the provider is pure wiring: host/port read from the
  * same options map every provider gets.
  */
class SocketEnvelopeProvider extends graft.cdc.CdcSourceProvider {
  override def envelopeStream(
      spark: org.apache.spark.sql.SparkSession,
      options: Map[String, String]): org.apache.spark.sql.DataFrame =
    spark.readStream.format("socket")
      .option("host", options.getOrElse(SocketEnvelopeProvider.HostKey, "127.0.0.1"))
      .option("port", options.getOrElse(SocketEnvelopeProvider.PortKey,
        throw new IllegalArgumentException(
          s"${SocketEnvelopeProvider.PortKey} is required for ${getClass.getName}")))
      .load()
}

object SocketEnvelopeProvider {
  val HostKey = "option.source.host"
  val PortKey = "option.source.port"
}

/** Contract-violation fixture: two columns instead of the envelope's one. */
class BadShapeProvider extends graft.cdc.CdcSourceProvider {
  override def envelopeStream(
      spark: org.apache.spark.sql.SparkSession,
      options: Map[String, String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.createDataset(Seq(("a", "b"))).toDF("value", "extra")
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.sql.Timestamp

class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  // single shared session for the whole test JVM (carries GraftExtensions)
  private lazy val spark: SparkSession = TestSpark.spark
  // the session is shared across suites (getOrCreate) — do NOT stop it here:
  // a stopped context makes the next suite build a fresh one whose broadcast
  // ids restart, which is exactly the stale-cache hazard TreeCache guards
  override def afterAll(): Unit = ()

  private def ts(minute: Int) = new Timestamp(3600L * 1000 * 24 + minute * 60000L)

  test("watermarked windowed stats over a memory stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "etype", "value")
    val out = graft.streaming.GeoStreaming.windowedStats(
      df, "ts", "etype", "value", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("winstats")
      .outputMode("complete").start()
    in.addData((ts(1), "a", 2.0), (ts(3), "a", 5.0), (ts(12), "a", 7.0), (ts(2), "b", 1.0))
    q.processAllAvailable()
    val rows = spark.table("winstats")
      .select(col("etype"), col("n"), col("vmin"), col("vmax")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    q.stop()
    assert(rows === Set(("a", 2L, 2.0, 5.0), ("a", 1L, 7.0, 7.0), ("b", 1L, 1.0, 1.0)))
  }

  test("windowed spatial union aggregates geometry in a stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double, Double)]
    val df = in.toDF().toDF("ts", "key", "x", "y")
      .withColumn("geometry", graft.functions.st_rectangle(
        col("x"), col("y"), col("x") + 2.0, col("y") + 2.0))
    val out = graft.streaming.GeoStreaming.windowedUnion(
      df, "ts", "key", "geometry", "10 minutes", "5 minutes")
      .select(col("key"), col("n"), graft.functions.st_area(col("geometry")).as("area"))
    val q = out.writeStream.format("memory").queryName("winunion")
      .outputMode("complete").start()
    // two disjoint boxes in the same window → union area 8
    in.addData((ts(1), "k", 0.0, 0.0), (ts(2), "k", 10.0, 0.0))
    q.processAllAvailable()
    val rows = spark.table("winunion").select("n", "area").as[(Long, Double)].collect().toSet
    q.stop()
    assert(rows === Set((2L, 8.0)))
  }

  test("streaming dedup within watermark") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val df = in.toDF().toDF("ts", "text")
    val out = graft.streaming.GeoStreaming.dedupStream(
      df, "ts", graft.pipeline.TextAnalysis.fingerprint(col("text")))
    val q = out.writeStream.format("memory").queryName("dedupst")
      .outputMode("append").start()
    in.addData((ts(1), "hello world"), (ts(2), "HELLO   world"), (ts(3), "other doc"))
    q.processAllAvailable()
    val n = spark.table("dedupst").count()
    q.stop()
    assert(n === 2, "normalized duplicates within the watermark must collapse")
  }

  test("stream sjoin against a static zone table") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // static zones: 5 disjoint rects
    val zones = (1 to 5).toDF("zone")
      .select(col("zone"), graft.functions.st_rectangle(col("zone") * 100.0,
        lit(0.0), col("zone") * 100.0 + 50.0, lit(50.0)).as("geometry"))
    val in = MemoryStream[(Long, Double, Double)]
    val pts = in.toDF().toDF("id", "x", "y")
      .withColumn("geometry", graft.functions.st_point(col("x"), col("y")))
    val joined = graft.streaming.GeoStreaming.sjoinStream(pts, zones, "within")
    val q = joined.select("id", "zone").writeStream.format("memory")
      .queryName("zonejoin").outputMode("append").start()
    in.addData((1L, 120.0, 10.0), (2L, 320.0, 10.0), (3L, 999.0, 10.0))
    q.processAllAvailable()
    val rows = spark.table("zonejoin").as[(Long, Int)].collect().toSet
    q.stop()
    assert(rows === Set((1L, 1), (2L, 3)), s"got $rows") // id 3 is in no zone
  }

  test("stream nearest join matches the batch broadcast tier, ties inclusive") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // static points on a sparse lattice; one probe equidistant from two
    val static = Seq((10L, 0.0, 0.0), (11L, 10.0, 0.0), (12L, 20.0, 0.0),
        (13L, 5.0, 4.0), (14L, 5.0, -4.0))
      .toDF("sid", "x", "y")
      .select(col("sid"), graft.functions.st_point(col("x"), col("y")).as("geometry"))
    val in = MemoryStream[(Long, Double, Double)]
    val pts = in.toDF().toDF("id", "x", "y")
      .withColumn("geometry", graft.functions.st_point(col("x"), col("y")))
      .drop("x", "y")
    val joined = graft.streaming.GeoStreaming.sjoinNearestStream(
      pts, static, k = 1, distanceCol = Some("d"))
    val q = joined.select("id", "sid", "d").writeStream.format("memory")
      .queryName("nnstream").outputMode("append").start()
    // (5, 0): ties at distance exactly 4.0 to BOTH sid 13 at (5,4) and
    // sid 14 at (5,-4) — k=1 keeps both (rank() <= 1); (1, 0) is
    // strictly nearest sid 10 at (0,0), d=1
    in.addData((1L, 1.0, 0.0), (2L, 5.0, 0.0))
    q.processAllAvailable()
    val rows = spark.table("nnstream").as[(Long, Long, Double)].collect().toSet
    q.stop()
    val batch = graft.join.SpatialJoin.sjoinNearest(
        Seq((1L, 1.0, 0.0), (2L, 5.0, 0.0)).toDF("id", "x", "y")
          .withColumn("geometry", graft.functions.st_point(col("x"), col("y")))
          .drop("x", "y"),
        static, k = 1, distanceCol = Some("d"))
      .select($"id", $"sid", $"d").as[(Long, Long, Double)].collect().toSet
    assert(rows === batch, s"stream $rows != batch $batch")
    assert(rows.count(_._1 == 2L) === 2, "equidistant tie not kept by k=1")
    // how=left keeps an out-of-range probe with null static columns
    val in2 = MemoryStream[(Long, Double, Double)]
    val pts2 = in2.toDF().toDF("id", "x", "y")
      .withColumn("geometry", graft.functions.st_point(col("x"), col("y")))
      .drop("x", "y")
    val left = graft.streaming.GeoStreaming.sjoinNearestStream(
      pts2, static, k = 1, maxDistance = 2.0, how = "left",
      distanceCol = Some("d"))
    val q2 = left.select("id", "sid", "d").writeStream.format("memory")
      .queryName("nnstreamL").outputMode("append").start()
    in2.addData((1L, 1.0, 0.0), (9L, 500.0, 500.0))
    q2.processAllAvailable()
    val rowsL = spark.table("nnstreamL")
      .as[(Long, Option[Long], Option[Double])].collect().toSet
    q2.stop()
    assert(rowsL === Set((1L, Some(10L), Some(1.0)), (9L, None, None)),
      s"got $rowsL")
  }

  test("sjoinNearestStoreStream: unbounded per-batch store joins ≡ the batch door") {
    import spark.implicits._
    val rnd = new java.util.Random(0x517EA7)
    val probeRows = EWKBFixtures.heterogeneous(rnd, 60)
    val buildRows = EWKBFixtures.heterogeneous(rnd, 60)
    val table = "graft_stream_unb_store"
    graft.join.SpatialJoin.dropBucketedTable(spark, table)
    val tmp = java.nio.file.Files.createTempDirectory("graft_snss").toString
    try {
      graft.join.SpatialJoin.writeSpatialBucketed(
        buildRows.toDF("bid", "geometry"), table, cellSize = 4.0, buckets = 4)
      graft.join.SpatialJoin.stampCellSummary(spark, table)
      val probe = probeRows.toDF("pid", "geometry")
      // batch reference: the store's unbounded door (no maxDistance at
      // all), itself pinned against brute force
      val expected = graft.join.SpatialJoin.sjoinNearestBucketed(spark,
          probe, table, cellSize = 4.0, k = 2,
          maxDistance = Double.PositiveInfinity)
        .select($"pid", $"bid").as[(Long, Long)].collect().toSeq.sorted
      assert(expected.toSet ===
        EWKBFixtures.brute(probeRows, buildRows, 2, exclusive = false))
      // several micro-batches (maxFilesPerTrigger=1) so the per-batch
      // contract — each batch joins the store independently — is real
      probe.repartition(4).write.mode("overwrite").parquet(tmp + "/in")
      val streamIn = spark.readStream.schema(probe.schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp + "/in")
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var batches = 0
      val q = graft.streaming.GeoStreaming.sjoinNearestStoreStream(
          streamIn, table, cellSize = 4.0, k = 2) { (joined, _) =>
          val rows = joined.select(col("pid"), col("bid"))
            .as[(Long, Long)].collect()
          got.synchronized { got ++= rows; batches += 1 }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmp + "/ck")
        .start()
      val drained = try q.awaitTermination(600000)
        finally { if (q.isActive) q.stop() }
      assert(drained, "stream drain timed out")
      assert(batches > 1, "fixture sanity: want multiple micro-batches")
      assert(got.sorted === expected, "stream ≡ batch broke")
    } finally {
      graft.join.SpatialJoin.dropBucketedTable(spark, table)
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  test("decontamStoreStream: per-batch store decontamination ≡ the batch door") {
    import spark.implicits._
    val table = "graft_stream_dc_store"
    graft.join.SpatialJoin.dropBucketedTable(spark, table)
    val tmp = java.nio.file.Files.createTempDirectory("graft_dcs").toString
    try {
      // train docs: half share an 8-gram with the eval suite, half don't
      def gram8(tag: String) =
        s"alpha bravo charlie delta echo foxtrot golf $tag"
      val train = (0 until 40).map { i =>
        val text =
          if (i % 2 == 0) s"clean document $i " + gram8(s"unique$i") + s" tail $i"
          else s"leaky document $i " + gram8("SHARED") + s" tail $i"
        (i.toLong, text)
      }.toDF("doc_id", "text")
      val bench = Seq("the eval prompt contains " + gram8("SHARED") + " verbatim")
        .toDF("text")
      graft.pipeline.Dedup.writeDecontamStore(bench, table, n = 8)
      val expected = graft.pipeline.Dedup.decontaminateAgainstStore(spark,
          train, "doc_id", "text", table)
        .select($"doc_id").as[Long].collect().toSeq.sorted
      assert(expected === (0 until 40 by 2).map(_.toLong),
        "batch-door sanity: exactly the even (clean) docs survive")
      // several micro-batches so the per-batch contract is real
      train.repartition(4).write.mode("overwrite").parquet(tmp + "/in")
      val streamIn = spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", "1").parquet(tmp + "/in")
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      var batches = 0
      val q = graft.streaming.DedupStreaming.decontamStoreStream(
          streamIn, table) { (clean, _) =>
          val ids = clean.select($"doc_id").as[Long].collect()
          got.synchronized { got ++= ids; batches += 1 }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmp + "/ck")
        .start()
      val drained = try q.awaitTermination(600000)
        finally { if (q.isActive) q.stop() }
      assert(drained, "stream drain timed out")
      assert(batches > 1, "fixture sanity: want multiple micro-batches")
      assert(got.sorted === expected, "stream ≡ batch broke")
    } finally {
      graft.join.SpatialJoin.dropBucketedTable(spark, table)
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  test("minhashIngestStream: the streaming ingest loop ≡ the sequential batch loop") {
    import spark.implicits._
    val table = "graft_stream_ingest_store"
    graft.pipeline.Dedup.dropMinhashStore(spark, table)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    try {
      // mostly tag-specific content: cross-tag jaccard stays far below
      // the 0.8 threshold, identical text is exactly 1.0
      def doc(tag: String) =
        s"unique $tag narrative " + Seq.fill(8)(tag + "ish").mkString(" ")
      val corpus = Seq((1L, doc("alpha")), (2L, doc("beta")))
        .toDF("doc_id", "text")
      graft.pipeline.Dedup.writeMinhashStore(corpus, table)
      // three one-file micro-batches, in doc_id order (file source sorts
      // by path): b1 has a corpus dup + novel gamma; b2 has a CROSS-BATCH
      // dup of gamma (only catchable because b1's novel was appended) +
      // novel delta + an intra-batch dup of delta; b3 re-dups delta
      val b1 = Seq((10L, doc("alpha")), (11L, doc("gamma")))
      val b2 = Seq((20L, doc("gamma")), (21L, doc("delta")), (22L, doc("delta")))
      val b3 = Seq((30L, doc("delta")), (31L, doc("epsilon")))
      Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
        b.toDF("doc_id", "text").repartition(1)
          .write.mode("overwrite").parquet(tmp + s"/in/batch=$i")
      }
      // deterministic micro-batch ORDER: the file source sorts by file
      // timestamp and the three writes land within one clock tick
      val mtBase = new java.io.File(tmp + "/in/batch=0").lastModified()
      (0 to 2).foreach { i =>
        new java.io.File(tmp + s"/in/batch=$i").listFiles()
          .foreach(_.setLastModified(mtBase - (20 - i) * 60000L))
      }
      val streamIn = spark.readStream
        .schema(b1.toDF("doc_id", "text").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp + "/in/batch=*")
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = graft.streaming.DedupStreaming.minhashIngestStream(
          streamIn, table, threshold = 0.8) { (novel, batchId) =>
          val ids = novel.select($"doc_id").as[Long].collect()
          got.synchronized { got ++= ids.map(batchId -> _) }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", tmp + "/ck")
        .start()
      val drained = try q.awaitTermination(600000)
        finally { if (q.isActive) q.stop() }
      assert(drained, "ingest stream drain timed out")
      // survivors: gamma's FIRST arrival (11), delta's min-id in its own
      // batch (21), epsilon (31); every later dup — cross-batch included —
      // is filtered because the accepted rows were appended
      assert(got.map(_._2).sorted === Seq(11L, 21L, 31L),
        s"streaming ingest loop diverged: $got")
      assert(got.map(_._1).distinct.size > 1,
        "fixture sanity: want multiple micro-batches")
      // the store now holds corpus + survivors: a re-probe of every
      // accepted tag is a dup, a fresh tag is novel
      val probe = Seq((40L, doc("gamma")), (41L, doc("epsilon")),
        (42L, doc("zeta"))).toDF("doc_id", "text")
      val novelNow = graft.pipeline.Dedup.minhashNovelAgainstStore(spark,
          probe, table, threshold = 0.8)
        .select($"doc_id").as[Long].collect().toSeq
      assert(novelNow === Seq(42L), s"post-stream store state wrong: $novelNow")
    } finally {
      graft.pipeline.Dedup.dropMinhashStore(spark, table)
      try org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  test("sjoinStream guard failure points at the bucketed scale path") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val zones = (1 to 50).toDF("zone")
      .select(col("zone"), graft.functions.st_rectangle(col("zone") * 100.0,
        lit(0.0), col("zone") * 100.0 + 50.0, lit(50.0)).as("geometry"))
    val in = MemoryStream[(Long, Double, Double)]
    val pts = in.toDF().toDF("id", "x", "y")
      .withColumn("geometry", graft.functions.st_point(col("x"), col("y")))
    // row guard
    val eRows = intercept[IllegalArgumentException] {
      graft.streaming.GeoStreaming.sjoinStream(pts, zones, "within",
        maxBuildRows = 10)
    }
    assert(eRows.getMessage.contains("writeSpatialBucketed") &&
      eRows.getMessage.contains("sjoinBucketed"),
      s"row-guard message must name the scale path: ${eRows.getMessage}")
    // byte guard
    val eBytes = intercept[IllegalArgumentException] {
      graft.streaming.GeoStreaming.sjoinStream(pts, zones, "within",
        maxBuildBytes = 64)
    }
    assert(eBytes.getMessage.contains("writeSpatialBucketed") &&
      eBytes.getMessage.contains("sjoinBucketed"),
      s"byte-guard message must name the scale path: ${eBytes.getMessage}")
  }

  test("sjoinStream matches batch sjoin for ASYMMETRIC predicates (direction parity)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // points first, zones second — 'within' must mean point.within(zone)
    // exactly as in the batch API with the same argument order
    val zones = (1 to 5).toDF("zone")
      .select(col("zone"), graft.functions.st_rectangle(col("zone") * 100.0,
        lit(0.0), col("zone") * 100.0 + 50.0, lit(50.0)).as("geometry"))
    val ptsBatch = Seq((1L, 120.0, 10.0), (2L, 320.0, 10.0), (3L, 999.0, 10.0))
      .toDF("id", "x", "y")
      .withColumn("geometry", graft.functions.st_point(col("x"), col("y")))
    val batch = graft.join.SpatialJoin.sjoin(ptsBatch, zones, "within")
      .select(col("id"), col("zone")).as[(Long, Int)].collect().toSet
    val in = MemoryStream[(Long, Double, Double)]
    val pts = in.toDF().toDF("id", "x", "y")
      .withColumn("geometry", graft.functions.st_point(col("x"), col("y")))
    val joined = graft.streaming.GeoStreaming.sjoinStream(pts, zones, "within")
    val q = joined.select("id", "zone").writeStream.format("memory")
      .queryName("zoneparity").outputMode("append").start()
    in.addData((1L, 120.0, 10.0), (2L, 320.0, 10.0), (3L, 999.0, 10.0))
    q.processAllAvailable()
    val streamed = spark.table("zoneparity").as[(Long, Int)].collect().toSet
    q.stop()
    assert(streamed === batch, s"stream $streamed vs batch $batch")
    assert(batch === Set((1L, 1), (2L, 3)))
  }

  test("sjoinStream evaluates the static plan exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // VERDICT r4 #2: the old count() + collect() pair executed the static
    // plan twice. Count rows flowing out of the static source with an
    // accumulator: a single limit-guarded collect touches each row once.
    val evals = spark.sparkContext.longAccumulator("staticRowEvals")
    val zones = (1 to 5).toDF("zone")
      .mapPartitions { it => it.map { r => evals.add(1); r } }(
        org.apache.spark.sql.Encoders.row(
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("zone",
              org.apache.spark.sql.types.IntegerType, false)))))
      .select(col("zone"), graft.functions.st_rectangle(col("zone") * 100.0,
        lit(0.0), col("zone") * 100.0 + 50.0, lit(50.0)).as("geometry"))
    val in = MemoryStream[(Long, Double, Double)]
    val pts = in.toDF().toDF("id", "x", "y")
      .withColumn("geometry", graft.functions.st_point(col("x"), col("y")))
    val joined = graft.streaming.GeoStreaming.sjoinStream(pts, zones, "within")
    assert(evals.value === 5L,
      s"static side of 5 rows evaluated ${evals.value} row-passes — expected one pass")
    val q = joined.select("id", "zone").writeStream.format("memory")
      .queryName("zonejoin1x").outputMode("append").start()
    in.addData((1L, 120.0, 10.0))
    q.processAllAvailable()
    val rows = spark.table("zonejoin1x").as[(Long, Int)].collect().toSet
    q.stop()
    assert(rows === Set((1L, 1)), s"got $rows")
    assert(evals.value === 5L, "micro-batches must not re-evaluate the static plan")
  }

  test("streaming MinHash near-dup matches the batch tier on a drained stream") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // fixture: two exact-dup pairs, one near pair, unrelated docs —
    // delivered across THREE micro-batches so cross-batch pairing is
    // exercised (each pair's members arrive in different batches)
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "an entirely different document about spark streaming state",
      3L -> "THE quick   brown fox jumps over the lazy dog again and again", // norm-dup of 1
      4L -> "yet another unrelated piece of text with its own words",
      5L -> "an entirely different document about spark streaming state", // dup of 2
      6L -> "the quick brown fox jumps over the lazy dog again and AGAIN!") // near 1/3
    val batch = graft.pipeline.Dedup.nearDupMinhash(
      docs.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b", "jaccard_est", "jaccard")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(batch.map(p => (p._1, p._2)).contains((1L, 3L)), s"fixture sanity: $batch")
    assert(batch.map(p => (p._1, p._2)).contains((2L, 5L)))

    val in = MemoryStream[(Long, String)]
    val hits = graft.streaming.DedupStreaming.nearDupMinhashStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6)
    val q = hits.writeStream.format("memory").queryName("neardupst")
      .outputMode("append").start()
    docs.grouped(2).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    val streamedRows = spark.table("neardupst")
      .as[(Long, Long, Double, Double)].collect().toSeq
    q.stop()
    // canonical-band rule: exactly once per pair, not once per colliding
    // band — the raw rows must already be duplicate-free
    assert(streamedRows.distinct.size == streamedRows.size,
      s"duplicate pair emissions: $streamedRows")
    val streamed = streamedRows.toSet
    assert(streamed === batch,
      s"stream=$streamed\nbatch=$batch")
  }

  test("near-dup stream state obeys the event-time TTL") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val fox = "the quick brown fox jumps over the lazy dog again and again"
    val in = MemoryStream[(Long, String, Timestamp)]
    // 10-minute TTL: docs 1,2 pair inside the window; a far-future doc 9
    // advances the watermark past their expiry; docs 3,4 (same text!) must
    // pair only with each other — members 1,2 evicted, bucket state reborn
    val hits = graft.streaming.DedupStreaming.nearDupMinhashStream(
      in.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", threshold = 0.6,
      eventTimeCol = "ts", watermarkDelay = "0 seconds", ttlMs = 10 * 60000L)
    val q = hits.writeStream.format("memory").queryName("ttlst")
      .outputMode("append").start()
    in.addData((1L, fox, ts(0)), (2L, fox, ts(1)))
    q.processAllAvailable() // wm -> minute 1; pair (1,2) emitted
    in.addData((9L, "totally unrelated filler advancing the watermark", ts(60)))
    q.processAllAvailable() // wm -> minute 60; fox bucket expired (ts(1)+10m)
    in.addData((3L, fox, ts(61)), (4L, fox, ts(62)))
    q.processAllAvailable()
    val pairs = spark.table("ttlst")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    q.stop()
    assert(pairs === Set((1L, 2L), (3L, 4L)),
      s"TTL eviction broken (stale members still pairing): $pairs")

    // batch equivalence within the window: the same docs restricted to one
    // TTL window give the same pairs as the batch tier
    val windowDocs = Seq(1L -> fox, 2L -> fox)
    val batch = graft.pipeline.Dedup.nearDupMinhash(
      windowDocs.toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(batch === Set((1L, 2L)) && pairs.intersect(batch) === batch)
  }

  test("saturated bucket keeps verifying: canonical-band pairs still emitted exactly once") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val fox = "the quick brown fox jumps over the lazy dog again and again"
    val in = MemoryStream[(Long, String)]
    // cap 2: the bucket saturates once docs 1,2 are admitted. Identical
    // text means every band collides, so the pair's canonical band is the
    // first band — whose bucket is saturated when doc 3 arrives. The
    // liveness fix: a saturated bucket stops ADMITTING but keeps
    // VERIFYING arrivals against its stored members, so (1,3) and (2,3)
    // are still emitted — exactly once, by the canonical group only.
    val hits = graft.streaming.DedupStreaming.nearDupMinhashStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6,
      maxBucketSize = 2)
    val q = hits.writeStream.format("memory").queryName("satst")
      .outputMode("append").start()
    in.addData(Seq(1L -> fox, 2L -> fox)); q.processAllAvailable()
    in.addData(Seq(3L -> fox)); q.processAllAvailable() // arrives saturated
    in.addData(Seq(3L -> fox)); q.processAllAvailable() // at-least-once replay
    in.addData(Seq(4L -> fox)); q.processAllAvailable() // last ghost slot
    in.addData(Seq(5L -> fox)); q.processAllAvailable() // ghost budget spent
    val rows = spark.table("satst").select("id_a", "id_b")
      .as[(Long, Long)].collect().toSeq
    q.stop()
    assert(rows.distinct.size == rows.size,
      s"duplicate emissions (replay or cross-band): $rows")
    // (1,2) pre-saturation; (1,3),(2,3),(1,4),(2,4) via saturated-verify
    // against the stored members; (3,4) via the r15 ghost-with-data
    // rescue (3 was refused but its record verifies 4); nothing for 5
    // (ghost budget cap spent, bucket fully closed)
    assert(rows.toSet === Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L),
      (3L, 4L)),
      s"saturation-liveness semantics drifted: $rows")
  }

  test("saturated-canonical rescue: a refused older member still pairs, exactly once") {
    // r15 (VERDICT r14 #3): the r14 residual was a pair whose OLDER
    // member was never admitted to its canonical band's bucket (full on
    // arrival) — live sibling bands held both docs but had to keep
    // suppressing. Ghosts now carry full member data, so the canonical
    // group itself verifies and emits. Construction at numHashes=4,
    // bands=2, cap=2: fillers x1, x2 fill the canonical band-0 bucket;
    // a (refused there, admitted at its live band-1 bucket) becomes a
    // ghost WITH data; b == a then arrives — the pair (a,b)'s canonical
    // band is 0, and only the saturated band-0 group may emit it.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val aText = "the quick brown fox jumps over the lazy dog again and again"
    // search for filler docs that share a's band-0 slice (same bucket)
    // but differ on band 1 and are NOT near-dups of a: appending words
    // keeps a's shingles a subset, so each minhash either survives or
    // drops — scan candidates for the right pattern
    val sigOf: String => Seq[Long] = { t =>
      Seq(t).toDF("text")
        .select(graft.pipeline.Dedup.minhashSigNative(
          graft.pipeline.TextAnalysis.normalized(col("text")), 5, 4).as("s"))
        .as[Seq[Long]].collect()(0)
    }
    val shOf: String => Set[Long] = { t =>
      Seq(t).toDF("text")
        .select(graft.pipeline.Dedup.shingleHashesNorm(
          graft.pipeline.TextAnalysis.normalized(col("text")), 5).as("s"))
        .as[Seq[Long]].collect()(0).toSet
    }
    val aSig = sigOf(aText)
    val aSh = shOf(aText)
    def jacA(x: Set[Long]) = x.intersect(aSh).size.toDouble / x.union(aSh).size
    // distinct per-candidate tails so the two chosen fillers are not
    // near-dups of each other either
    val fillers = (0 until 400).iterator.map { i =>
      aText + s" plus tail ${i * 7919} carrying ${i * 104729} distinct trailing tokens"
    }.filter { t =>
      val sg = sigOf(t)
      sg(0) == aSig(0) && sg(1) == aSig(1) && // band 0: same bucket as a
        (sg(2) != aSig(2) || sg(3) != aSig(3)) && // band 1: a stays live
        jacA(shOf(t)) < 0.9 // filler-a must not itself verify as a pair
    }.take(2).toList
    assert(fillers.size === 2, "fixture search found too few filler docs")
    val List(x1, x2) = fillers
    assert({
      val s1 = shOf(x1); val s2 = shOf(x2)
      s1.intersect(s2).size.toDouble / s1.union(s2).size < 0.9
    }, "fillers are near-dups of each other — tails not distinct enough")
    val in = MemoryStream[(Long, String)]
    val hits = graft.streaming.DedupStreaming.nearDupMinhashStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.9,
      numHashes = 4, bands = 2, maxBucketSize = 2)
    val q = hits.writeStream.format("memory").queryName("rescuest")
      .outputMode("append").start()
    in.addData(Seq(20L -> x1, 21L -> x2)); q.processAllAvailable() // fill band-0 bucket
    in.addData(Seq(11L -> aText)); q.processAllAvailable() // refused there -> ghost
    in.addData(Seq(12L -> aText)); q.processAllAvailable() // pair (11,12), canonical 0
    val rows = spark.table("rescuest").select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    q.stop()
    assert(rows.map(r => (r._1, r._2)).toSet === Set((11L, 12L)),
      s"saturated-canonical rescue missed or over-emitted: $rows")
    assert(rows.size === 1, s"pair must be emitted exactly once: $rows")
    assert(rows.head._3 === 1.0)
  }

  test("2xcap residual quantified: suppressed pairs are exactly those past both budgets") {
    // VERDICT r15 #6: measure the narrowed residual instead of only
    // documenting it. Drive n = 3x cap identical docs through one bucket
    // epoch at cap c: the first c arrivals are admitted members, the
    // next c become data-carrying ghosts, arrivals past 2c are dropped.
    // Every pair among the first 2c arrivals is emitted (member-member,
    // member-ghost, ghost-ghost via the r15 rescue); a pair is suppressed
    // iff either member arrived past 2c (the bucket is closed). So the stream
    // emits C(2c,2) of the batch's C(n,2) pairs — at c=8, n=24 that is
    // 120/276 (56.5% suppressed IN THIS pathological bucket), and at the
    // default cap a bucket epoch must see >200,000 same-bucket arrivals
    // before a single pair is lost. PERF.md r16 records the law.
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val fox = "the quick brown fox jumps over the lazy dog again and again"
    val cap = 8; val n = 24
    val in = MemoryStream[(Long, String)]
    val hits = graft.streaming.DedupStreaming.nearDupMinhashStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = 0.6,
      maxBucketSize = cap)
    val q = hits.writeStream.format("memory").queryName("capresid")
      .outputMode("append").start()
    // one arrival per micro-batch: deterministic admission order 1..n
    (1 to n).foreach { i => in.addData(Seq(i.toLong -> fox)); q.processAllAvailable() }
    val rows = spark.table("capresid").select("id_a", "id_b")
      .as[(Long, Long)].collect().toSeq
    q.stop()
    assert(rows.distinct.size == rows.size, s"duplicate emissions: $rows")
    val expected = (for {
      a <- 1 to 2 * cap; b <- (a + 1) to 2 * cap
    } yield (math.min(a, b).toLong, math.max(a, b).toLong)).toSet
    val got = rows.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(got === expected,
      s"residual law drifted: expected all C(2c,2)=${expected.size} pairs " +
        s"among the first ${2 * cap} arrivals, got ${got.size}")
    // the quantified residual: 276 batch pairs, 120 emitted, 156 suppressed
    val batchPairs = n * (n - 1) / 2
    assert(batchPairs === 276 && expected.size === 120)
  }

  test("streaming SimHash and embedding near-dup match their batch tiers") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "an entirely different document about spark streaming state",
      3L -> "THE quick   brown fox jumps over the lazy dog again and again",
      4L -> "yet another unrelated piece of text with its own words")
    val simBatch = graft.pipeline.Dedup.nearDupSimhash(
      docs.toDF("doc_id", "text"), "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(simBatch.nonEmpty, "fixture sanity: simhash should pair 1 and 3")
    val in = MemoryStream[(Long, String)]
    val hits = graft.streaming.DedupStreaming.nearDupSimhashStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", maxHamming = 3)
    val q = hits.writeStream.format("memory").queryName("simst")
      .outputMode("append").start()
    docs.grouped(2).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    val simRows = spark.table("simst").as[(Long, Long, Int)].collect().toSeq
    q.stop()
    // hamming-0 pairs agree on all 4 chunks — the canonical-chunk rule must
    // still emit exactly one row
    assert(simRows.distinct.size == simRows.size, s"duplicate emissions: $simRows")
    val simStream = simRows.toSet
    assert(simStream === simBatch, s"stream=$simStream batch=$simBatch")

    // WIDENED radius (r18): the stream door now derives the coarse
    // chunk layout like the batch door — before, maxHamming >= 4
    // silently missed pairs (hardcoded 4 chunks, no guard). Pin
    // stream ≡ batch at radius 6 on a fixture with a pair whose
    // hamming NEEDS the widened pigeonhole.
    val wideDocs = (0 until 24).map { i =>
      val base = s"shared preamble sentence about topic ${i % 5} with " +
        s"stable wording across variants while suffix ${i / 5} differs"
      (i.toLong, if (i < 5) base else base + s" extra trailing clause $i")
    }
    val wideBatch = graft.pipeline.Dedup.nearDupSimhash(
      wideDocs.toDF("doc_id", "text"), "doc_id", "text", maxHamming = 6)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    assert(wideBatch.exists(_._3 > 3),
      "fixture sanity: some pair must need the widened radius")
    val win = MemoryStream[(Long, String)]
    val whits = graft.streaming.DedupStreaming.nearDupSimhashStream(
      win.toDF().toDF("doc_id", "text"), "doc_id", "text", maxHamming = 6)
    val wq = whits.writeStream.format("memory").queryName("simstw")
      .outputMode("append").start()
    wideDocs.grouped(7).foreach { chunk => win.addData(chunk); wq.processAllAvailable() }
    val wideRows = spark.table("simstw").as[(Long, Long, Int)].collect().toSeq
    wq.stop()
    assert(wideRows.distinct.size == wideRows.size,
      s"duplicate emissions at widened radius: $wideRows")
    assert(wideRows.toSet === wideBatch,
      s"widened stream=${wideRows.toSet} batch=$wideBatch")

    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.1f, 0.0f)),
      (2L, Seq(0.99f, 0.05f, 0.1f, 0.0f)), // near 1
      (3L, Seq(0.0f, 1.0f, 0.0f, 0.2f)),
      (4L, Seq(0.0f, 0.0f, 0.0f, 1.0f)))
    val embBatch = graft.pipeline.Dedup.nearDupEmbedding(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", threshold = 0.99)
      .select("id_a", "id_b", "cosine").as[(Long, Long, Double)].collect().toSet
    assert(embBatch.map(p => (p._1, p._2)) === Set((1L, 2L)))
    val vin = MemoryStream[(Long, Seq[Float])]
    val ehits = graft.streaming.DedupStreaming.nearDupEmbeddingStream(
      vin.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", threshold = 0.99)
    val eq = ehits.writeStream.format("memory").queryName("embst")
      .outputMode("append").start()
    vecs.grouped(2).foreach { chunk => vin.addData(chunk); eq.processAllAvailable() }
    val embRows = spark.table("embst").as[(Long, Long, Double)].collect().toSeq
    eq.stop()
    // near-identical vectors collide in every table — canonical-table rule
    assert(embRows.distinct.size == embRows.size, s"duplicate emissions: $embRows")
    val embStream = embRows.toSet
    assert(embStream.map(p => (p._1, p._2)) === embBatch.map(p => (p._1, p._2)))
    // cosine values agree to fp noise (same summation order as DotProduct)
    embStream.foreach { case (a, b, c) =>
      val bc = embBatch.find(p => p._1 == a && p._2 == b).get._3
      assert(math.abs(c - bc) < 1e-12, s"cosine drift: $c vs $bc")
    }
  }

  test("streaming n-gram near-dup matches its batch tier, near pairs included") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    // docs 1/3: identical after normalization (jaccard 1.0); docs 1/5: a
    // one-word tail edit (high-but-sub-1.0 n-gram jaccard) — exercises
    // the estimate + exact-verify path, not just exact dups; 2/4 noise
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again today",
      2L -> "an entirely different document about spark streaming state",
      3L -> "THE quick   brown fox jumps over the lazy dog again and again today",
      4L -> "yet another unrelated piece of text with its own words",
      5L -> "the quick brown fox jumps over the lazy dog again and again tomorrow")
    val th = 0.55
    val batch = graft.pipeline.Dedup.nearDupNgram(
      docs.toDF("doc_id", "text"), "doc_id", "text", threshold = th)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(batch.map(p => (p._1, p._2)).contains((1L, 3L)),
      "fixture sanity: the normalized-identical pair must verify at 1.0")
    assert(batch.exists(p => p._3 < 1.0),
      s"fixture sanity: want a sub-1.0 verified pair, got $batch")
    val in = MemoryStream[(Long, String)]
    val hits = graft.streaming.DedupStreaming.nearDupNgramStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = th)
    val q = hits.writeStream.format("memory").queryName("ngramst")
      .outputMode("append").start()
    docs.grouped(2).foreach { chunk => in.addData(chunk); q.processAllAvailable() }
    val rows = spark.table("ngramst").select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    q.stop()
    assert(rows.distinct.size == rows.size, s"duplicate emissions: $rows")
    assert(rows.toSet === batch, s"stream=${rows.toSet} batch=$batch")
    // null text must not kill the long-running query nor pair with anything
    val in2 = MemoryStream[(Long, String)]
    val hits2 = graft.streaming.DedupStreaming.nearDupNgramStream(
      in2.toDF().toDF("doc_id", "text"), "doc_id", "text", threshold = th)
    val q2 = hits2.writeStream.format("memory").queryName("ngramst2")
      .outputMode("append").start()
    in2.addData(Seq(10L -> null.asInstanceOf[String],
      11L -> null.asInstanceOf[String], 12L -> docs.head._2))
    q2.processAllAvailable()
    val rows2 = spark.table("ngramst2").as[(Long, Long, Double, Double)].collect()
    q2.stop()
    assert(rows2.isEmpty, s"null-text rows paired: ${rows2.toSeq}")
  }

  test("sessionization with flatMapGroupsWithState") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.GeoStreaming._
    val in = MemoryStream[SessionEvent]
    // user 1: two events 10s apart (one session), then a 5-minute jump
    in.addData(SessionEvent(1, 0), SessionEvent(1, 10000), SessionEvent(1, 300000))
    val q = sessionize(in.toDS(), gapMillis = 60000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "sessionize query did not finish")
    val closed = spark.table("sessions")
      .as[ClosedSession].collect().toSet
    assert(closed === Set(ClosedSession(1, 0, 10000, 2)),
      s"the 5-minute gap closes the first session: $closed")
  }
}

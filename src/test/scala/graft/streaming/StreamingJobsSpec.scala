package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class StreamingJobsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int) = new Timestamp(3600L * 1000 * 24 + minute * 60000L)

  test("streaming window agg matches the batch aggregation on the same data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = StreamingJobs.windowAgg(events).writeStream
      .format("memory").queryName("winagg").outputMode("complete").start()
    try {
      input.addData(
        (ts(0), "click", 1.0), (ts(10), "click", 2.0),
        (ts(61), "click", 4.0), (ts(5), "view", 8.0))
      q.processAllAvailable()
      val got = spark.table("winagg")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == Set(
        (ts(0), "click", 2L, 3.0),
        (ts(60), "click", 1L, 4.0),
        (ts(0), "view", 1L, 8.0)))
    } finally q.stop()
  }

  test("streaming hopping window shares the batch 4-windows-per-event math") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamingJobs.hoppingAgg(events).writeStream
      .format("memory").queryName("hopagg").outputMode("complete").start()
    try {
      // both events inside [00:00, 00:15): the same four hopping
      // windows (starts 23:15..00:00) accumulate both
      input.addData((ts(0), "click", 1.0), (ts(10), "click", 2.0))
      q.processAllAvailable()
      val got = spark.table("hopagg")
        .collect()
        .map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3))).toSet
      assert(got == Set(
        (ts(-45), 2L, 3.0), (ts(-30), 2L, 3.0),
        (ts(-15), 2L, 3.0), (ts(0), 2L, 3.0)))
    } finally q.stop()
  }

  test("streaming exact dedup emits only the first doc per content hash") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingJobs.dedupExact(docs).writeStream
      .format("memory").queryName("dedup").outputMode("append").start()
    try {
      input.addData((1L, ts(0), "alpha"))
      q.processAllAvailable()
      input.addData((2L, ts(1), "alpha"), (3L, ts(2), "beta"))
      q.processAllAvailable()
      val ids = spark.table("dedup").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L)) // second "alpha" suppressed
    } finally q.stop()
  }

  test("minhash signature extraction runs unchanged under readStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
    val input = MemoryStream[(Long, String)]
    val q = graft.operators.Dedup
      .minhashSignaturesOf(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sigs").outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("sigs")
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val batch = graft.operators.Dedup
        .minhashSignaturesOf(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(streamed == batch && streamed.size == 2)
    } finally q.stop()
  }

  test("streaming paragraph filter drops indexed segments, keeps the rest") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // index = the segments of an "existing corpus" doc (w0..w9 | w10..w12);
    // the incoming doc repeats the first window verbatim, then diverges
    val corpusDoc = (0 until 13).map(i => s"w$i").mkString(" ")
    val index = graft.operators.Dedup.segmentsJvm(corpusDoc)
      .map(graft.operators.Dedup.md5Hex).toSet
    val freshTail = (0 until 10).map(i => s"x$i").mkString(" ")
    val delta = Seq(
      (100L, (0 until 10).map(i => s"w$i").mkString(" ") + " " + freshTail),
      (101L, freshTail))
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.paragraphFilter(input.toDS(), index)
      .writeStream.format("memory").queryName("parafilter")
      .outputMode("append").start()
    try {
      input.addData(delta: _*)
      q.processAllAvailable()
      val rows = spark.table("parafilter").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      // doc 100: first 10-word window is indexed -> dropped; tail kept
      assert(rows(100L) == ((2L, 1L, freshTail)))
      // doc 101: nothing indexed -> intact
      assert(rows(101L) == ((1L, 0L, freshTail)))
      // arithmetic identical to the batch JVM twin
      delta.foreach { case (id, text) =>
        val (n, d, c) = graft.operators.Dedup.paragraphFilterJvm(text, index)
        assert(rows(id) == ((n, d, c)))
      }
    } finally q.stop()
  }

  test("streaming CDC filter drops indexed chunks despite early insertions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // index = the CDC chunks of an "existing corpus" doc; the delta
    // doc INSERTS words at the front — fixed-window segmentation
    // would shift every later window, but CDC boundaries re-derive
    // from local content, so the shared tail still collides
    val corpusDoc = (0 until 120).map(i => s"word$i").mkString(" ")
    val index = graft.operators.Dedup.cdcChunksJvm(corpusDoc)
      .map(graft.operators.Dedup.md5Hex).toSet
    val delta = Seq(
      (100L, "inserted preamble here " + corpusDoc),
      (101L, (0 until 20).map(i => s"fresh$i").mkString(" ")))
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.cdcFilter(input.toDS(), index)
      .writeStream.format("memory").queryName("cdcfilter")
      .outputMode("append").start()
    try {
      input.addData(delta: _*)
      q.processAllAvailable()
      val rows = spark.table("cdcfilter").collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getString(3))).toMap
      // doc 100: the re-synchronized tail chunks are indexed -> dropped
      assert(rows(100L)._2 > 0,
        s"expected indexed tail chunks to drop, got ${rows(100L)}")
      // doc 101: nothing indexed -> intact
      assert(rows(101L)._2 == 0L)
      assert(rows(101L)._3 == (0 until 20).map(i => s"fresh$i").mkString(" "))
      // arithmetic identical to the batch JVM twin
      delta.foreach { case (id, text) =>
        val (n, d, c) = graft.operators.Dedup.cdcFilterJvm(text, index)
        assert(rows(id) == ((n, d, c)))
      }
    } finally q.stop()
  }

  test("per-epoch source-matrix maintenance folds to the batch matrix") {
    import spark.implicits._
    // sourceMatrixDelta is a foreachBatch body: each epoch's resolved
    // (doc_id, source, cluster) assignments emit UPDATED per-(cluster,
    // pair) contribution rows for the touched clusters; the sink
    // replaces by cluster. Corpus: cluster 1 spans A/B from the
    // start, cluster 2 is internal to A until epoch 1's B doc,
    // cluster 3 becomes spanning only with epoch 2's C docs.
    val standing = Seq(
      (1L, "A", 1L), (2L, "B", 1L), (3L, "A", 2L), (4L, "A", 2L),
      (5L, "B", 3L))
    val epoch1 = Seq((6L, "A", 1L), (7L, "B", 2L))
    val epoch2 = Seq((8L, "C", 3L), (9L, "C", 3L))
    def csOf(rows: Seq[(Long, String, Long)]) =
      rows.toDF("doc_id", "source", "cluster")
        .groupBy(col("cluster"), col("source"))
        .agg(count(lit(1)).cast("long").as("n"))
    val csSchema = csOf(standing).schema
    def csDF(rows: Seq[org.apache.spark.sql.Row]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), csSchema)
    // bootstrap: the standing corpus is epoch 0 over an empty artifact
    val boot = StreamingJobs.sourceMatrixDelta(
      standing.toDF("doc_id", "source", "cluster"), csDF(Seq.empty))
    val contribSchema = boot.schema
    var contribRows = boot.collect().toSeq
    var csRows = csOf(standing).collect().toSeq
    def contribDF(rows: Seq[org.apache.spark.sql.Row]) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), contribSchema)
    for (epoch <- Seq(epoch1, epoch2)) {
      val emitted = StreamingJobs.sourceMatrixDelta(
        epoch.toDF("doc_id", "source", "cluster"), csDF(csRows))
        .collect().toSeq
      val touched = epoch.map(_._3).toSet
      // fold contract: replace-by-cluster on the contribution rows
      contribRows = contribRows.filterNot(r =>
        touched(r.getLong(r.fieldIndex("cluster")))) ++ emitted
      // CS-artifact maintenance: add the epoch's counts
      csRows = csDF(csRows).unionByName(csOf(epoch))
        .groupBy(col("cluster"), col("source"))
        .agg(sum(col("n")).as("n")).collect().toSeq
    }
    // the folded matrix equals the batch operator's aggregate over
    // the FULL corpus (one shared code path: sourceMatrixFromCS)
    val folded = contribDF(contribRows)
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_shared_clusters"),
        sum(col("n_a") + col("n_b")).as("n_docs_involved"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val full = graft.operators.Dedup.sourceMatrixFromCS(
      csOf(standing ++ epoch1 ++ epoch2))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(folded == full, s"folded=$folded full=$full")
    // and the late-spanning cluster 3 is present in both
    assert(full.contains(("B", "C")))
  }

  test("per-epoch guard probe telemetry counts hot/cold/novel exactly") {
    import spark.implicits._
    // index = 180 copies of one boilerplate doc (every band bucket
    // 180-hot at the default cap 64) + 20 distinct docs; the epoch's
    // delta = 2 more copies (all-hot probes) + 1 fresh doc (novel)
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the miller grinds wheat by the river mill every single day"
    val idxDocs = (0 until 180).map(i => (i.toLong, base)) ++
      (600 until 620).map(i => (i.toLong,
        s"totally unrelated document number $i about topic $i with unique " +
          s"content token$i alpha$i beta$i gamma$i delta$i epsilon$i zeta$i"))
    val dir = java.nio.file.Files.createTempDirectory("graft_probetel").toString
    idxDocs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val indexBands = graft.operators.Dedup.minhashSignatures(spark, dir)
      .select(col("doc_id"), posexplode(col("bands"))
        .as(Seq("band", "band_hash")))
    def bandsOf(id: Long, text: String) =
      graft.operators.Dedup.minhashBandsJvm(text, 128, 32).get._2
        .zipWithIndex.map { case (h, b) => (id, b, h) }
    val freshText = (0 until 30).map(i => s"zz$i yy$i").mkString(" ")
    val deltaBands = (bandsOf(900L, base) ++ bandsOf(901L, base) ++
      bandsOf(902L, freshText))
      .toSeq.toDF("doc_id", "band", "band_hash")
    val r = StreamingJobs.guardProbeStats(deltaBands, indexBands)
      .collect().head
    assert(r.getLong(r.fieldIndex("n_probes")) == 96L) // 3 docs x 32 bands
    // both copies probe all 32 hot cluster buckets
    assert(r.getLong(r.fieldIndex("n_hot_probes")) == 64L)
    assert(r.getLong(r.fieldIndex("n_hot_buckets_touched")) == 32L)
    // the fresh doc's probes may graze a distinct doc's (cold) bucket
    // but hot + cold + novel must partition the probe count
    val cold = r.getLong(r.fieldIndex("n_cold_probes"))
    val novel = r.getLong(r.fieldIndex("n_novel_probes"))
    assert(64L + cold + novel == 96L)
    assert(novel >= 30L, s"expected mostly-novel fresh-doc probes, got $novel")
  }

  test("streaming contamination matches the batch screen, stateless append") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // benchmark = hashes {10, 20, 30}; doc 1 hits 2/4, doc 2 hits 0/2,
    // doc 3 is too short to shingle (n_sh = 0)
    val bench = Seq(10L, 20L, 30L).toDF("h")
    val input = MemoryStream[(Long, Seq[Long], Int)]
    val docs = input.toDF().toDF("doc_id", "shh", "n_sh")
    val q = StreamingJobs.contamination(docs, bench, tau = 0.5)
      .writeStream.format("memory").queryName("contam")
      .outputMode("append").start()
    try {
      input.addData((1L, Seq(10L, 20L, 40L, 50L), 4), (2L, Seq(40L, 50L), 2))
      q.processAllAvailable()
      input.addData((3L, Seq.empty[Long], 0))
      q.processAllAvailable()
      val rows = spark.table("contam")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
      assert(rows(1L) == ((4L, 2L, 0.5, 1L)))
      assert(rows(2L) == ((2L, 0L, 0.0, 0L)))
      assert(rows(3L) == ((0L, 0L, 0.0, 0L)))
    } finally q.stop()
  }

  test("native session_window sessionizes under a watermark (merge + emission)") {
    // the EXACT batch aggregation (Events.sessionWindowAgg) running
    // incrementally: sessions merge in state (including the
    // exact-30-min-gap event, per the EventsSpec boundary pin) and
    // emit once the watermark passes their close
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingJobs.Event]
    val q = StreamingJobs.sessionizeNative(input.toDS()).writeStream
      .format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      input.addData(
        // user 1: minute 0 and 10 → one session; 50 → a second
        StreamingJobs.Event(1, ts(0), 1L, 1.0),
        StreamingJobs.Event(2, ts(10), 1L, 2.0),
        StreamingJobs.Event(3, ts(50), 1L, 4.0),
        // user 2: exactly 30 min apart — touching windows MERGE
        StreamingJobs.Event(4, ts(0), 2L, 8.0),
        StreamingJobs.Event(5, ts(30), 2L, 16.0))
      q.processAllAvailable()
      // push the watermark (1 h delay) past every session's close
      input.addData(StreamingJobs.Event(99, ts(600), 3L, 0.0))
      q.processAllAvailable()
      input.addData(StreamingJobs.Event(100, ts(1200), 3L, 0.0))
      q.processAllAvailable()

      val got = spark.table("native_sessions")
        .filter(col("user_id").isin(1L, 2L))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got == Set(
        (1L, ts(0), ts(10), 2L, 3.0),
        (1L, ts(50), ts(50), 1L, 4.0),
        (2L, ts(0), ts(30), 2L, 24.0)))
    } finally q.stop()
  }

  test("stateful sessionize emits gap-separated sessions like the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingJobs.Event]
    val q = StreamingJobs.sessionize(input.toDS()).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: events at minute 0, 10 (one session), then 50 (> 30 min gap)
      input.addData(
        StreamingJobs.Event(1, ts(0), 1L, 1.0),
        StreamingJobs.Event(2, ts(10), 1L, 2.0),
        StreamingJobs.Event(3, ts(50), 1L, 4.0),
        StreamingJobs.Event(4, ts(0), 2L, 8.0))
      // advance the watermark far enough to time out open sessions
      input.addData(StreamingJobs.Event(99, ts(600), 3L, 0.0))
      q.processAllAvailable()
      input.addData(StreamingJobs.Event(100, ts(1200), 3L, 0.0))
      q.processAllAvailable()

      val got = spark.table("sessions")
        .filter(col("user_id").isin(1L, 2L))
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got == Set(
        (1L, ts(0), ts(10), 2L, 3.0),
        (1L, ts(50), ts(50), 1L, 4.0),
        (2L, ts(0), ts(0), 1L, 8.0)))
    } finally q.stop()
  }

  test("streaming incremental dedup matches deltas against a static index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val indexDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different content about distributed dataflow engines"))
    // static index artifact: band table + signature table
    val bandRows = indexDocs.flatMap { case (id, t) =>
      graft.operators.Dedup.minhashBandsJvm(t).toSeq.flatMap { case (sig, bhs) =>
        bhs.zipWithIndex.map { case (h, b) => (id, b, h) } }
    }
    val sigRows = indexDocs.flatMap { case (id, t) =>
      graft.operators.Dedup.minhashBandsJvm(t).map { case (sig, _) => (id, sig) } }
    val indexBands = bandRows.toDF("index_id", "band", "band_hash")
    val indexSigs = sigRows.toDF("index_id", "sig")

    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.incrementalCandidates(input.toDS(), indexBands, indexSigs)
      .writeStream.format("memory").queryName("inc_cands")
      .outputMode("append").start()
    try {
      input.addData(
        // near-copy of index doc 1 → must surface as a candidate
        (100L, "the quick brown fox jumps over the lazy dog again and again"),
        // novel text → no candidate
        (101L, "entirely unrelated musings on lunar agriculture and tides"))
      q.processAllAvailable()
      val got = spark.table("inc_cands").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      assert(got.nonEmpty && got.forall(_._1 == 100L))
      assert(got.forall(_._2 == 1L))
      assert(got.forall(_._3 >= 0.6))
    } finally q.stop()
  }

  test("streaming incremental dedup collapses hot index buckets to the representative") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 80 identical index copies of one boilerplate page: every band
    // bucket is hot (80 > HotBucketCap = 64), so a matching delta doc
    // must surface once per band against the MIN index id only —
    // 32 rows, not 80 × 32 (r17, the ingestion star discipline)
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val indexDocs = (1L to 80L).map(i => (i, base))
    val bandRows = indexDocs.flatMap { case (id, t) =>
      graft.operators.Dedup.minhashBandsJvm(t).toSeq.flatMap { case (_, bhs) =>
        bhs.zipWithIndex.map { case (h, b) => (id, b, h) } }
    }
    val sigRows = indexDocs.flatMap { case (id, t) =>
      graft.operators.Dedup.minhashBandsJvm(t).map { case (sig, _) => (id, sig) } }
    val indexBands = bandRows.toDF("index_id", "band", "band_hash")
    val indexSigs = sigRows.toDF("index_id", "sig")

    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.incrementalCandidates(input.toDS(), indexBands, indexSigs)
      .writeStream.format("memory").queryName("inc_hot")
      .outputMode("append").start()
    try {
      input.addData((500L, base))
      q.processAllAvailable()
      val got = spark.table("inc_hot").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == 32)
      assert(got.forall(_ == (500L, 1L)))
    } finally q.stop()
  }

  test("CEP negation classifies purchases like the batch windows, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingJobs.TypedEvent
    val input = MemoryStream[TypedEvent]
    val q = StreamingJobs.cepNegation(input.toDS()).writeStream
      .format("memory").queryName("cepneg").outputMode("append").start()
    try {
      input.addData(
        // user 1: view then purchase 30 min later, no click → direct
        TypedEvent(10, ts(0), 1L, "view", 0.0),
        TypedEvent(11, ts(30), 1L, "purchase", 5.0),
        // click after the view → the next purchase is NOT direct
        TypedEvent(12, ts(40), 1L, "click", 0.0),
        TypedEvent(13, ts(50), 1L, "purchase", 6.0),
        // user 2: purchase with no view at all → not direct
        TypedEvent(20, ts(10), 2L, "purchase", 1.0),
        // user 2: view, but the purchase lands 2 h later → too late
        TypedEvent(21, ts(20), 2L, "view", 0.0),
        TypedEvent(22, ts(20 + 120), 2L, "purchase", 2.0))
      q.processAllAvailable()
      // cross-batch: user 3's view arrives in batch 1 …
      input.addData(TypedEvent(30, ts(100), 3L, "view", 0.0))
      q.processAllAvailable()
      // … and the qualifying purchase in batch 2, 10 min later
      input.addData(TypedEvent(31, ts(110), 3L, "purchase", 9.0))
      q.processAllAvailable()
      val got = spark.table("cepneg").collect()
        .map(r => (r.getLong(0), r.getInt(2))).toSet
      assert(got == Set(
        (11L, 1), (13L, 0), (20L, 0), (22L, 0), (31L, 1)))
    } finally q.stop()
  }

  test("name canonicalizer links within distance 1, smallest name wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val index = graft.operators.Search.symspellIndex(
      Seq("cold gear", "old gear", "red bolt"))
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.canonicalizeNames(input.toDS(), index).writeStream
      .format("memory").queryName("canon").outputMode("append").start()
    try {
      input.addData(
        (1L, "old gear"),   // exact -> itself
        (2L, "gold gear"),  // dist 1 of BOTH cold/old gear -> 'cold gear' (smallest)
        (3L, "red bolts"),  // dist 1 of red bolt
        (4L, "blue anvil")) // nothing within 1 -> unlinked passthrough
      q.processAllAvailable()
      val got = spark.table("canon").collect()
        .map(r => r.getLong(0) -> (r.getString(2), r.getBoolean(3))).toMap
      assert(got(1L) == (("old gear", true)))
      assert(got(2L) == (("cold gear", true)))
      assert(got(3L) == (("red bolt", true)))
      assert(got(4L) == (("blue anvil", false)))
    } finally q.stop()
  }

  test("markov scorer: in-session transitions score, session cuts re-anchor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingJobs.TypedEvent
    val model = Map(
      ("view", "click") -> 0.5, ("click", "purchase") -> 0.25)
    val input = MemoryStream[TypedEvent]
    val q = StreamingJobs.markovScore(input.toDS(), model).writeStream
      .format("memory").queryName("markov").outputMode("append").start()
    try {
      input.addData(
        TypedEvent(10, ts(0), 1L, "view", 0.0),
        TypedEvent(11, ts(5), 1L, "click", 0.0),     // view>click p=0.5
        TypedEvent(12, ts(10), 1L, "purchase", 1.0), // click>purchase 0.25
        TypedEvent(13, ts(15), 1L, "view", 0.0),     // purchase>view UNSEEN 0.0
        // 2h gap: session cut — no transition emitted for this event
        TypedEvent(14, ts(15 + 120), 1L, "click", 0.0))
      q.processAllAvailable()
      // cross-batch: within 30 min of event 14, the chain continues
      input.addData(TypedEvent(15, ts(15 + 130), 1L, "purchase", 2.0))
      q.processAllAvailable()
      val got = spark.table("markov").collect()
        .map(r => r.getLong(0) -> (r.getString(2), r.getString(3),
          r.getDouble(4))).toMap
      assert(got == Map(
        11L -> (("view", "click", 0.5)),
        12L -> (("click", "purchase", 0.25)),
        13L -> (("purchase", "view", 0.0)),
        15L -> (("click", "purchase", 0.25))))
      assert(!got.contains(14L)) // the cut event itself scores nothing
    } finally q.stop()
  }

  test("as-of attribution enriches purchases with the last view, O(1) state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingJobs.TypedEvent
    val input = MemoryStream[TypedEvent]
    val q = StreamingJobs.asofAttribution(input.toDS()).writeStream
      .format("memory").queryName("attrib").outputMode("append").start()
    try {
      input.addData(
        // user 1: purchase before any view → no attribution
        TypedEvent(10, ts(0), 1L, "purchase", 5.0),
        // views at minute 1 and 2; tie at minute 2 → larger id wins
        TypedEvent(11, ts(1), 1L, "view", 1.0),
        TypedEvent(12, ts(2), 1L, "view", 2.0),
        TypedEvent(13, ts(2), 1L, "view", 3.0),
        TypedEvent(14, ts(5), 1L, "purchase", 7.0),
        // clicks must not disturb the view state
        TypedEvent(15, ts(6), 1L, "click", 0.0))
      q.processAllAvailable()
      // state carries across batches: a later purchase still sees the
      // minute-2 view
      input.addData(TypedEvent(16, ts(9), 1L, "purchase", 9.0))
      q.processAllAvailable()

      val got = spark.table("attrib").collect().map(r =>
        (r.getLong(0), r.getAs[Any]("view_id"),
          r.getAs[Any]("gap_us"))).toSet
      assert(got == Set(
        (10L, null, null),
        (14L, 13L, 3L * 60000000L),  // 3 minutes in micros
        (16L, 13L, 7L * 60000000L)))
    } finally q.stop()
  }

  test("gopher router gates a stream exactly like the batch projection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a doc passing every Gopher rule (>= 50 words, sane word length,
    // no symbols, alphabetic, stopword-bearing) and two failing ones
    val good = (("the quick brown fox jumps over the lazy dog and " * 6)
      + "that is all for today with luck").trim
    val docs = Seq(
      (1L, good),
      (2L, "short text"),                       // < 50 words
      (3L, ("#### " * 60).trim))               // symbol ratio + no stopwords
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.gopherRoute(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gopher_routed")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val kept = spark.table("gopher_routed").collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L))
      // identical verdicts to the batch projection over the same frame
      val batch = graft.operators.TextAnalysis
        .gopherProjection(docs.toDF("doc_id", "text"))
        .filter(col("keep") === 1).collect().map(_.getLong(0)).toSet
      assert(batch == kept)
    } finally q.stop()
  }

  test("streaming DSIR scorer matches the batch importance weights byte-for-byte") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // train the artifact on the shared sf corpus, score a SUBSET of
    // the same docs through the stream: weights must equal the batch
    // operator's rows exactly (shared hashing + identical arithmetic)
    val lr = graft.operators.Pipeline
      .importanceLogRatios(spark, graft.TestSpark.sf).localCheckpoint()
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf)
      .filter(col("doc_id") < 40 && length(trim(col("text"))) > 0)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val batch = graft.operators.Pipeline
      .importanceSample(spark, graft.TestSpark.sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*) && col("n_tok") > 0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_tok"), r.getAs[Double]("weight"))))
      .toMap
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.dsirScore(input.toDF().toDF("doc_id", "text"), lr)
      .writeStream.format("memory").queryName("dsir_scores")
      .outputMode("update").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("dsir_scores")
        .collect().map(r => r.getLong(0) ->
          ((r.getAs[Long]("n_tok"), r.getAs[Double]("weight")))).toMap
      assert(got == batch)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming LM scorer matches the batch arithmetic byte-for-byte") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ate the cat food"),
      (3L, "dog and cat and mat"))
    val docsDf = corpus.toDF("doc_id", "text")
    // train the model artifact from the corpus (same shape the batch
    // operator derives internally)
    val counts = docsDf
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val nTotal = counts.agg(sum(col("cnt"))).collect().head.getLong(0)
    // expected: the same lmScore plan over the static frame
    val expected = StreamingJobs.lmScore(docsDf, counts, nTotal)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.lmScore(
        input.toDF().toDF("doc_id", "text"), counts, nTotal)
      .writeStream.format("memory").queryName("lm_scores")
      .outputMode("update").start()
    try {
      input.addData(corpus: _*)
      q.processAllAvailable()
      val got = spark.table("lm_scores")
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == expected)
      // sanity: repeated common tokens score higher (less negative)
      assert(got(1L)._2 > -3.0 && got.values.forall(_._2 < 0.0))
    } finally q.stop()
  }

  test("streaming bigram scorer matches the batch arithmetic; OOV smooths, not drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog ate the cat food"),
      (3L, "dog and cat and mat"))
    val docsDf = corpus.toDF("doc_id", "text")
    val tok = docsDf
      .select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "w1")))
      .filter(length(col("w1")) > 0)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val bi = tok.withColumn("w2", lead(col("w1"), 1).over(byDoc))
      .filter(col("w2").isNotNull)
    val biCounts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val uniCounts = tok.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val v = uniCounts.count()
    // expected: the same scoring plan over the static frame
    val expected = StreamingJobs.bigramScore(docsDf, biCounts, uniCounts, v)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.bigramScore(
        input.toDF().toDF("doc_id", "text"), biCounts, uniCounts, v)
      .writeStream.format("memory").queryName("bigram_scores")
      .outputMode("update").start()
    try {
      // one in-model doc and one with bigrams the model never saw
      input.addData(corpus.head, (9L, "cat mat zebra"))
      q.processAllAvailable()
      val got = spark.table("bigram_scores")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got(1L) == expected(1L))
      // OOV doc still scores (2 bigrams), strictly below the in-model doc
      assert(got(9L)._1 == 2L && got(9L)._2 < got(1L)._2)
    } finally q.stop()
  }

  test("quality router gates and splits a stream exactly like the batch operators") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and beyond"),
      (2L, "short"), // < 5 words → gated out
      (3L, "pack my box with five dozen liquor jugs right now today"))
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.qualityRoute(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("routed").outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val routed = spark.table("routed")
        .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("split"))).toMap
      assert(routed.keySet == Set(1L, 3L)) // doc 2 gated
      // split assignment identical to the batch trainSplit hash
      import graft.OracleHash.{MulA, MulB, P}
      def splitOf(id: Long): String = {
        val b = ((MulA * (id % P) + MulB) % P) % 100
        if (b < 90) "train" else if (b < 95) "val" else "test"
      }
      assert(routed.forall { case (id, s) => s == splitOf(id) })
    } finally q.stop()
  }

  test("streamed HLL registers equal the batch operator's registers and finalize to its estimate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = (1 to 400).map(i => s"a$i").mkString(" ")
    val textB = (200 to 600).map(i => s"a$i").mkString(" ")
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamingJobs.hllRegisters(input.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    try {
      input.addData((ts(0), textA), (ts(10), textB))
      q.processAllAvailable()
      val streamed = spark.table("hllregs")
        .select("bucket", "m_j")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // batch twin over the same two documents: same registers...
      val batch = graft.operators.Sketches
        .hllDistinctOn(Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"))
        .collect().head
      // ...so merging the streamed registers (one window here) and
      // finalizing reproduces the batch estimate bit-for-bit
      val full = spark.range(128).toDF("bucket")
        .join(streamed.toSeq.toDF("bucket", "m_j"), Seq("bucket"), "left_outer")
        .select(coalesce(col("m_j"), lit(0)).as("m_j"))
      val est = graft.operators.Sketches.hllEstimate(full, 128)
        .collect().head.getDouble(0)
      assert(est == batch.getAs[Double]("est_distinct"))
      // the registers really are the bounded state: at most m rows
      assert(streamed.size <= 128)
    } finally q.stop()
  }

  test("streamed CMS cells match the batch cell construction and merge by addition") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val textA = ("hot " * 10) + (1 to 50).map(i => s"n$i").mkString(" ")
    val input = MemoryStream[(Timestamp, String)]
    val q = StreamingJobs.cmsRegisters(input.toDF().toDF("ts", "text"))
      .writeStream.format("memory").queryName("cmscells")
      .outputMode("complete").start()
    try {
      input.addData((ts(0), textA), (ts(5), textA))
      q.processAllAvailable()
      val streamed = spark.table("cmscells")
        .collect().map(r => (r.getInt(r.fieldIndex("i")),
          r.getLong(r.fieldIndex("cell"))) -> r.getLong(r.fieldIndex("ccnt")))
        .toMap
      // batch twin of the same two docs: identical cells, and counts
      // merge by addition (two identical docs → every cell 2× one doc)
      import graft.operators.Sketches
      val one = Seq((1L, textA)).toDF("doc_id", "text")
        .select(col("text")).as[String]
        .flatMap(Sketches.tokenPolysJvm).toDF("token", "h")
        .select(explode(Sketches.permStructs(4)).as("pp"), col("h"))
        .select(col("pp.i").as("i"),
          ((col("pp.pa") * col("h") + col("pp.pb"))
            % graft.OracleHash.P % 1024).as("cell"))
        .groupBy("i", "cell").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(streamed.keySet == one.keySet)
      assert(streamed.forall { case (k, v) => v == 2 * one(k) })
      assert(streamed.size <= 4 * 1024)
    } finally q.stop()
  }

  test("classifier gate scores a stream identically to the batch broadcast join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // real corpus text so the bucket/weight arithmetic is exercised
    // across genuine token diversity
    val docs = graft.Tables.documents(spark, graft.TestSpark.sf)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq.take(100)
    val input = MemoryStream[(Long, String)]
    val q = StreamingJobs.classifierRoute(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("clf_routed")
      .outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val streamed = spark.table("clf_routed").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // batch path: broadcast-join spelling over the same 100 docs —
      // scores and the kept set must agree exactly
      val ids = docs.map(_._1).toSet
      val batch = graft.operators.TextAnalysis
        .qualityModel(spark, graft.TestSpark.sf)
        .filter(col("doc_id").isin(ids.toSeq: _*))
        .collect()
      val batchKept = batch.filter(_.getAs[Int]("keep") == 1)
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batchKept)
      assert(streamed.nonEmpty && streamed.size < docs.size) // gate splits
    } finally q.stop()
  }

  test("streaming ANN serving equals the batch IVF retrieval") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the batch queries (vec_id < 5) arrive as a stream against the
    // materialized static index + quantizer — results must be
    // bit-identical to the batch annIvf retrieval
    val qs = graft.Tables.embeddings(spark, graft.TestSpark.sf)
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val index = graft.operators.Similarity
      .ivfIndex(spark, graft.TestSpark.sf).localCheckpoint()
    val quant = graft.operators.Similarity
      .ivfQuantizer(spark, graft.TestSpark.sf).localCheckpoint()
    val input = MemoryStream[(Long, Seq[Double])]
    val q = StreamingJobs.annServe(input.toDF().toDF("q_id", "qv"), index, quant)
      .writeStream.format("memory").queryName("annserve")
      .outputMode("update").start()
    try {
      input.addData(qs.toSeq: _*)
      q.processAllAvailable()
      val got = spark.table("annserve")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      val want = graft.operators.Similarity.annIvf(spark, graft.TestSpark.sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("streaming LPA votes: registers merge across batches, argmax matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // static assignment artifact: {1,2} in community 1, {3,4} in 3
    val assign = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("id", "label")
    val input = MemoryStream[(Long, Long)]
    val q = StreamingJobs
      .lpaVotes(input.toDF().toDF("src", "dst"), assign)
      .writeStream.format("memory").queryName("lpavotes")
      .outputMode("update").start()
    def latest(): Map[(Long, Long), Long] =
      // update mode appends one row per changed key per batch; votes
      // only grow, so max identifies the newest register per key
      spark.table("lpavotes").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    try {
      input.addData((1L, 2L), (2L, 3L))
      q.processAllAvailable()
      val a = latest()
      // vertex 2 hears community 1 (from 1) and community 3 (from 3)
      assert(a((2L, 1L)) == 1L && a((2L, 3L)) == 1L)
      assert(a((1L, 1L)) == 1L && a((3L, 1L)) == 1L)
      // batch 2 repeats an edge: the register ADDS, not replaces
      input.addData((1L, 2L), (2L, 4L))
      q.processAllAvailable()
      val b = latest()
      assert(b((2L, 1L)) == 2L, "repeated edge must add a vote")
      assert(b((2L, 3L)) == 2L, "edge to 4 adds a second community-3 vote")
      // streamed registers == batch registers over the union of edges
      val batch = StreamingJobs.lpaVotes(
        Seq((1L, 2L), (2L, 3L), (1L, 2L), (2L, 4L)).toDF("src", "dst"), assign)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(b == batch)
      // the consumer's argmax flags instability: vertex 2's assigned
      // community (1) ties its neighborhood vote (2 vs 2) — ties keep
      // the smaller label, so 2 stays stable; flipping an edge breaks it
      val argmax = b.toSeq.groupBy(_._1._1).map { case (id, vs) =>
        id -> vs.map { case ((_, l), n) => (l, n) }.minBy(t => (-t._2, t._1))._1
      }
      assert(argmax(2L) == 1L)
      assert(argmax(3L) == 1L && argmax(4L) == 1L,
        "3 and 4 only hear vertex 2's community-1 voice")
    } finally q.stop()
  }

  test("community maintenance loop: votes -> disagreement flags -> batch LPA revisit converges") {
    // the full streaming/batch maintenance split, end-to-end over an
    // EVOLVING edge stream: (1) batch LPA settles an assignment on
    // the initial graph; (2) lpaVotes keeps per-(vertex, community)
    // registers hot across >= 3 micro-batches (bootstrap + deltas);
    // (3) the register argmax flags exactly the vertices the next
    // periodic batch run must revisit; (4) the revisit over the full
    // edge log converges — re-seeding the votes with the NEW
    // assignment clears every flag
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // two triangles: {1,2,3} and {4,5,6}
    val e0 = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val assign0 = graft.graph.Algorithms
      .labelPropagation(e0.toDF("src", "dst"), 5)
    val a0 = assign0.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (labA, labB) = (a0(1L), a0(4L))
    assert(a0(2L) == labA && a0(3L) == labA &&
      a0(5L) == labB && a0(6L) == labB && labA != labB,
      s"initial LPA must settle the two triangles: $a0")
    val input = MemoryStream[(Long, Long)]
    val q = StreamingJobs
      .lpaVotes(input.toDF().toDF("src", "dst"), assign0)
      .writeStream.format("memory").queryName("lpaloop")
      .outputMode("update").start()
    // registers: update mode emits one row per changed key per batch;
    // votes only grow, so max is the newest value per key
    def registers(): Map[(Long, Long), Long] =
      spark.table("lpaloop").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
    // the consumer's disagreement detector: a vertex whose register
    // argmax (ties to the smaller label) is not its assigned label —
    // including vertices the assignment has never seen
    def flagged(asg: Map[Long, Long]): Set[Long] =
      registers().toSeq.groupBy(_._1._1).flatMap { case (id, vs) =>
        val argmax = vs.map { case ((_, l), n) => (l, n) }
          .minBy(t => (-t._2, t._1))._1
        if (asg.get(id).contains(argmax)) None else Some(id)
      }.toSet
    try {
      // micro-batch 1: the initial edge log bootstraps the registers —
      // a settled assignment has zero disagreements
      input.addData(e0: _*); q.processAllAvailable()
      assert(flagged(a0).isEmpty,
        s"settled assignment must not flag anything: ${flagged(a0)}")
      // micro-batch 2: a NEW vertex attaches to the A triangle — it
      // has no assignment, so it alone is flagged for the next revisit
      input.addData((3L, 7L)); q.processAllAvailable()
      assert(flagged(a0) == Set(7L))
      // micro-batch 3: vertex 6 gains three A-side edges — its
      // neighborhood vote (3×A vs 2×B) now contradicts its assignment
      input.addData((6L, 1L), (6L, 2L), (6L, 3L)); q.processAllAvailable()
      assert(flagged(a0) == Set(6L, 7L),
        s"votes must flag 6 (outvoted) and 7 (unseen): ${flagged(a0)}")
      // periodic batch revisit over the FULL edge log
      val eAll = e0 ++ Seq((3L, 7L), (6L, 1L), (6L, 2L), (6L, 3L))
      val a1 = graft.graph.Algorithms
        .labelPropagation(eAll.toDF("src", "dst"), 5)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the flagged vertices settle into the A community; B's core
      // keeps its label
      assert(a1(6L) == a1(1L) && a1(7L) == a1(1L),
        s"revisit must move 6 and 7 into the A community: $a1")
      assert(a1(4L) == a1(5L), s"revisit must keep B's core together: $a1")
      // loop closure: votes over the full log against the REVISITED
      // assignment flag nothing — computed with the same batch-mode
      // lpaVotes the stream runs (registers are stream/batch identical,
      // pinned by the spec above)
      val closed = StreamingJobs.lpaVotes(
        eAll.toDF("src", "dst"),
        a1.toSeq.toDF("id", "label"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .groupBy(_._1._1).flatMap { case (id, vs) =>
          val argmax = vs.map { case ((_, l), n) => (l, n) }
            .minBy(t => (-t._2, t._1))._1
          if (a1.get(id).contains(argmax)) None else Some(id)
        }.toSet
      assert(closed.isEmpty,
        s"revisited assignment must clear every flag: $closed")
    } finally q.stop()
  }

  test("streaming SCC trim: verdicts flip monotonically as edges close cycles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val q = StreamingJobs
      .sccTrimDegrees(input.toDF().toDF("src", "dst"))
      .writeStream.format("memory").queryName("scctrim")
      .outputMode("update").start()
    def latest(): Map[Long, (Long, Long, Boolean)] =
      // update mode appends one row per changed key per batch; the
      // degree counts only grow, so max degree sums identify the
      // newest verdict per id
      spark.table("scctrim").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
        .groupBy(_._1)
        .map { case (id, vs) =>
          id -> vs.map(_._2).maxBy(v => v._1 + v._2) }
    try {
      // batch 1: a path 1 -> 2 -> 3 (no cycle anywhere: all trim)
      input.addData((1L, 2L), (2L, 3L))
      q.processAllAvailable()
      val afterPath = latest()
      assert(afterPath(1L) == ((1L, 0L, true)))  // source: no in
      assert(afterPath(2L) == ((1L, 1L, false))) // interior: both sides
      assert(afterPath(3L) == ((0L, 1L, true)))  // sink: no out
      // batch 2: close the cycle 3 -> 1 — both endpoints lose trim
      input.addData((3L, 1L))
      q.processAllAvailable()
      val afterCycle = latest()
      assert(afterCycle(1L) == ((1L, 1L, false)))
      assert(afterCycle(3L) == ((1L, 1L, false)))
      assert(afterCycle(2L) == ((1L, 1L, false)))
      // the batch trim agrees: on the closed triangle nothing peels
      val batchTrim = StreamingJobs.sccTrimDegrees(
        Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
      assert(batchTrim == Map(1L -> false, 2L -> false, 3L -> false))
    } finally q.stop()
  }
}

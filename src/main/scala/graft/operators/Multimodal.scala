package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline (SURVEY §2.3 #30): treat media payloads
  * as opaque `binary` columns plus a typed metadata struct, with the
  * decode step stubbed deterministically (no image/audio libs in this
  * environment — see [[decodeStubBatch]], the clearly-marked stub
  * boundary).
  *
  * The Spark-side plumbing is the real deliverable: binary column
  * ingestion, metadata extraction as codegen'd expressions, and a
  * partition-batched decode path with the exact shape a Python
  * `mapInPandas` / JNI decoder would slot into at 100 TB (iterator of
  * batches in, iterator of decoded rows out; no per-row library
  * setup; payload bytes never shuffled).
  */
object Multimodal {

  /** Row shape entering the decode stage. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Decoded output: deterministic fake of what an image decoder would
    * emit. STUB — replace body with a real decoder (e.g. pix decode
    * via JNI or `mapInPandas` with PIL) in a full deployment; the
    * signature and batching are what production code keeps.
    */
  def decodeStubBatch(rows: Iterator[MediaRow]): Iterator[(Long, Int, Int, String)] =
    rows.map { r =>
      val n = r.payload.length
      (r.doc_id, fakeWidth(n), fakeHeight(n), sniffFormat(n))
    }

  // Deterministic fakes: metadata as pure functions of payload size so
  // the DuckDB oracle can compute the identical values.
  def fakeWidth(nBytes: Int): Int  = 256 + (nBytes % 64) * 16
  def fakeHeight(nBytes: Int): Int = 256 + ((nBytes / 64) % 64) * 16
  def sniffFormat(nBytes: Int): String = (nBytes % 3) match {
    case 0 => "png"
    case 1 => "jpeg"
    case _ => "wav"
  }

  /** Ingest documents' text as a binary payload column (a stand-in for
    * real media bytes), extract typed metadata. Fully columnar /
    * codegen'd — this is the query-able metadata view a catalog would
    * expose over a 100 TB media lake without touching payloads.
    */
  def meta(spark: SparkSession, sfDir: String): DataFrame = {
    val payload = encode(col("text"), "utf-8")
    val nBytes = octet_length(payload).cast("long")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        nBytes.as("n_bytes"),
        (lit(256) + (nBytes % 64) * 16).cast("long").as("width"),
        (lit(256) + ((nBytes.cast("long") / lit(64)).cast("long") % 64) * 16)
          .cast("long").as("height"),
        when(nBytes % 3 === 0, "png")
          .when(nBytes % 3 === 1, "jpeg")
          .otherwise("wav").as("format"))
      .orderBy(col("doc_id"))
  }

  /** Preprocessing plan for the decoded media: aspect-preserving
    * resize into a `box`×`box` target and uniform frame sampling
    * (stride chosen so at most `maxSamples` frames survive). All
    * integer arithmetic over the metadata — this stage stays exactly
    * as-is when the stub decoder is swapped for a real one, because
    * resize/sample planning only ever needs the metadata, never the
    * pixels. The fake frame count derives from payload size
    * (1 KiB ≈ one frame) like the other stub quantities.
    */
  def prep(spark: SparkSession, sfDir: String, box: Int = 224,
      maxSamples: Int = 8): DataFrame =
    meta(spark, sfDir)
      .withColumn("target_w",
        greatest(lit(1L), expr(s"width * $box div greatest(width, height)")))
      .withColumn("target_h",
        greatest(lit(1L), expr(s"height * $box div greatest(width, height)")))
      .withColumn("n_frames", expr("n_bytes div 1024 + 1"))
      .withColumn("stride", greatest(lit(1L), expr(s"n_frames div $maxSamples")))
      .withColumn("n_samples", expr("(n_frames - 1) div stride + 1"))
      .select(col("doc_id"), col("target_w"), col("target_h"),
        col("n_frames"), col("stride"), col("n_samples"))
      .orderBy(col("doc_id"))

  /** The partition-batched decode path (mapPartitions over the typed
    * Dataset). Produces the same rows as [[meta]] — MultimodalSpec
    * asserts the equivalence, which is what validates the stub
    * boundary wiring.
    */
  def decoded(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[MediaRow]
      .mapPartitions(decodeStubBatch)
      .toDF("doc_id", "width", "height", "format")
      .orderBy(col("doc_id"))
  }

  /** Frame-sample MANIFEST over [[prep]]'s plan: one row per sampled
    * frame (doc, ordinal, frame number, resize target) — the work
    * list a frame-level extraction stage fans out over, materialized
    * without touching any payload. At 100 TB this manifest is what
    * gets repartitioned to decode executors; it is metadata-sized
    * (≤ maxSamples rows/doc) while the media bytes stay at rest
    * until the decoder reads exactly the frames listed.
    */
  def frameIndex(spark: SparkSession, sfDir: String): DataFrame =
    prep(spark, sfDir)
      .select(col("doc_id"), col("target_w"), col("target_h"),
        posexplode(sequence(lit(0L), col("n_frames") - 1, col("stride")))
          .as(Seq("sample_idx", "frame_no")))
      .select(col("doc_id"), col("sample_idx").cast("long").as("sample_idx"),
        col("frame_no"), col("target_w"), col("target_h"))
      .orderBy(col("doc_id"), col("sample_idx"))

  /** Declared-query wrapper over [[decoded]]: identical rows, with
    * the stub decoder's Int metadata widened to int64 so the
    * driver-facing schema matches [[meta]]'s. This drives the
    * production decoder slot — the partition-batched `mapPartitions`
    * boundary a real PIL/JNI decoder replaces — through the oracle
    * gate, not just the unit spec.
    */
  def decodedMeta(spark: SparkSession, sfDir: String): DataFrame =
    decoded(spark, sfDir)
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"), col("format"))
      .orderBy(col("doc_id"))

  /** Perceptual-hash (aHash) near-dup grouping over the media
    * payload: sample the first 62 payload bytes (the int64 sign bit and bit 62 stay clear, keeping the fold overflow-free on both engines), threshold each
    * against the mean byte value of the same bounded 64-byte window,
    * pack the bits into a 64-bit fingerprint, and group payloads
    * sharing a fingerprint — the average-hash family image dedup
    * uses, robust to tail edits an exact content hash is not. On real
    * media the same pipeline runs over decoded downsampled pixels
    * (the [[decodeStubBatch]] boundary); byte-level aHash here keeps
    * the oracle exact.
    *
    * 100 TB notes: the per-row cost is O(64) regardless of document
    * length — both the mean and the bit fold run over a fixed
    * 64-char prefix, never the whole payload (a real aHash likewise
    * sees only the fixed 8×8 downsample, not the full image). Payload
    * bytes never shuffle — only the 8-byte fingerprint rides the
    * exchange; the duplicate-group aggregate is the [[Dedup.exact]]
    * shape with map-side partials.
    */
  def phashDup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) => (id, phashJvm(t)) }
      .toDF("doc_id", "phash")
      .groupBy(col("phash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .filter(col("n_docs") > 1)
      .orderBy(col("phash"))
  }

  /** FRAME-level cross-media dedup: detect media pairs sharing
    * perceptually-identical frames (the re-upload / clip-reuse shape
    * video dedup needs — a whole-file hash misses a video that embeds
    * another's frames). Each payload decomposes into fixed 64-byte
    * frame windows, every frame gets the [[phashJvm]] fingerprint,
    * and an inverted-index join on the fingerprint pairs media that
    * share ≥ `minShared` distinct frames. On real media the same
    * pipeline runs per decoded frame at the [[decodeStubBatch]]
    * boundary — the byte-window framing keeps the oracle exact.
    *
    * 100 TB notes: the exchange carries (doc_id, 8-byte fingerprint)
    * rows only — frames' bytes never shuffle; fingerprints seen in
    * more than `dfCap` media are dropped before pairing (a constant
    * frame — black/silence — is a quadratic bucket and can never
    * distinguish a pair), so candidate volume stays linear in the
    * index size, the same cap discipline as the shingle joins.
    */
  def frameDedup(spark: SparkSession, sfDir: String, minShared: Int = 2,
      dfCap: Int = 20): DataFrame = {
    import spark.implicits._
    val frames = Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, t) =>
        val nf = (t.length + 63) / 64
        (0 until nf).iterator.map { f =>
          (id, phashJvm(t.substring(f * 64, math.min((f + 1) * 64, t.length))))
        }
      }.toDF("doc_id", "fhash").distinct()
    val kept = frames.groupBy(col("fhash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= dfCap)
      .select(col("fhash"))
    val pruned = frames.join(kept, Seq("fhash"))
    pruned.as("a").join(pruned.as("b"),
        col("a.fhash") === col("b.fhash") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** The 62-bit aHash of [[phashDup]] as a tight JVM fold — same
    * arithmetic the DuckDB oracle spells over `ord(ch)` of the first
    * 64 chars (mean = floor of the window's code sum over its length;
    * bit i set iff code_i > mean): nested SQL higher-order functions
    * are interpreted per element (~1 ms/doc profiled), a JVM loop is
    * ~µs/doc — the [[Dedup.shingleHashesJvm]] precedent. ASCII-range
    * corpus assumed (chars = codepoints), like every other
    * OracleHash-family function.
    */
  def phashJvm(text: String): Long = {
    val n = math.min(text.length, 64)
    var sum = 0L
    var i = 0
    while (i < n) { sum += text.charAt(i).toLong; i += 1 }
    val mean = sum / math.max(n, 1) // non-negative: floor = truncate
    var bits = 0L
    val nb = math.min(n, 62)
    i = 0
    while (i < nb) {
      if (text.charAt(i).toLong > mean) bits |= 1L << i
      i += 1
    }
    bits
  }
}

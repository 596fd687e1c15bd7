package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated TPC-H-ish parquet test data
  * (see TESTDATA.md). All operators read through here so projection
  * and predicate pushdown reach the parquet scan unimpeded.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // memoized per (session, path): `spark.read.parquet` does file
  // listing + footer schema inference on EVERY call, which at ~1-10
  // tables per operator and ~100 operators per bench run is pure
  // re-derivation of an immutable result. The cached value is only
  // the lazy DataFrame (a logical plan) — nothing is persisted, so
  // query isolation and pushdown are untouched.
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  // strong session keys would pin every session for the JVM's
  // lifetime in a session-per-task app; a crude size cap bounds that
  // (the few-session CLI/bench shape never reaches it)
  private val CacheCap = 256
  private def capped[K, V](m: java.util.concurrent.ConcurrentHashMap[K, V]): Unit =
    if (m.size > CacheCap) m.clear()

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    capped(cache)
    cache.computeIfAbsent((spark, s"$sfDir/$name.parquet"),
      k => k._1.read.parquet(k._2))
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.parquet stores TIMESTAMP(NANOS) which Spark 4 refuses to
    * read natively; read nanos as long and convert to a microsecond
    * timestamp with integer division (a double division would lose
    * precision: epoch-ns ≈ 1.7e18 > 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame =
    // memoized on the CALLER's session: the body spins up a derived
    // session per call, which would otherwise defeat `apply`'s cache
    // (a fresh key every time) and leak one cache entry per call
    cache.computeIfAbsent((s, s"$d/events.parquet#nanos"), _ => {
      // The flag must be live at execution time (the scan's schema
      // converter reads it per file), so a save/restore around the read
      // would break lazy plans. Instead the read happens in a derived
      // session (shared SparkContext, isolated SQLConf): the caller's
      // session conf is never mutated.
      val iso = s.newSession()
      iso.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the generator has shipped `ts` as TIMESTAMP(NANOS) and as
      // TIMESTAMP(MICROS, isAdjustedToUTC=false); the latter would
      // infer as TIMESTAMP_NTZ, which unix_micros()/instant pushdown
      // reject. Disable NTZ inference so both spellings surface as a
      // session-tz (UTC) instant — numerically identical to the
      // DuckDB oracle's naive reading of the same stored micros.
      iso.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // a derived session has its OWN ExperimentalMethods — without
      // this, plans rooted at the events scan (everything the events
      // graph runs) would silently skip graft's optimizer rules, e.g.
      // the instant-comparison pushdown rewrite
      graft.plans.GraftOptimizations.install(iso)
      // read directly — a nested computeIfAbsent on the same map
      // (this closure runs inside one) is forbidden by
      // ConcurrentHashMap and can throw "Recursive update"
      val raw = iso.read.parquet(s"$d/events.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else raw
    })
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

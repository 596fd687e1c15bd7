package graft

/** Registry of session-lifetime ARTIFACT RDD ids — materialized
  * frames an operator family deliberately shares across queries (the
  * production "cluster once, consume many" pattern, e.g.
  * [[graft.operators.Dedup.clusterArtifact]]).
  *
  * Why it exists: artifacts are `localCheckpoint(true)`-materialized,
  * which truncates lineage — an unpersist makes the frame
  * unrecomputable. Bench's per-query hygiene (unpersist every
  * persistent RDD between timed queries) must therefore SKIP pinned
  * ids; everything else about the isolation discipline stays.
  */
object Artifacts {
  private val pinned = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()

  def isPinned(rddId: Int): Boolean = pinned.contains(rddId)

  /** Runs `materialize`, pinning every persistent RDD it registers
    * (diff of the context's persistent-RDD ids around the call). Under
    * a concurrent warmup another query's checkpoint can land in the
    * window and get pinned too — a bounded over-approximation (a few
    * warmup-sized RDDs stay resident) that errs on the side of never
    * killing an artifact.
    */
  def pinning[T](spark: org.apache.spark.sql.SparkSession)(materialize: => T): T = {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = materialize
    (sc.getPersistentRDDs.keySet -- before).foreach(pinned.add(_))
    out
  }
}

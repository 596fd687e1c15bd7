package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the artifact-cache contract: memoization, pinning, and —
  * critically — that overflow eviction is least-recently-used, single
  * entry, never the key being requested, and actually releases the
  * victim's checkpoint blocks (the former wholesale release-and-clear
  * could unpersist an entry a concurrent caller still held).
  */
class ArtifactsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def checkpointed(n: Int) = {
    import spark.implicits._
    (0 until n).toDF("x").localCheckpoint(true)
  }

  test("getOrCompute memoizes per key and pins the checkpoint") {
    val cache = new Artifacts.Cache[String, org.apache.spark.sql.DataFrame]()
    var builds = 0
    def build() = { builds += 1; checkpointed(10) }
    val a1 = cache.getOrCompute("a", spark)(build())
    val a2 = cache.getOrCompute("a", spark)(build())
    assert(builds == 1 && (a1 eq a2))
    // the materialized blocks are pinned: Bench's hygiene sweep skips them
    val pinnedNow = spark.sparkContext.getPersistentRDDs.keySet
      .filter(Artifacts.isPinned)
    assert(pinnedNow.nonEmpty)
    assert(a1.count() == 10)
  }

  test("overflow evicts the least-recently-used entry only, never the requested key") {
    val cache = new Artifacts.Cache[String, org.apache.spark.sql.DataFrame](maxEntries = 2)
    val k1 = cache.getOrCompute("k1", spark)(checkpointed(1))
    val k2 = cache.getOrCompute("k2", spark)(checkpointed(2))
    // inserting k3 overflows: k1 (eldest) is the single victim
    cache.getOrCompute("k3", spark)(checkpointed(3))
    val k2again = cache.getOrCompute("k2", spark)(fail("k2 must still be cached"))
    assert(k2again eq k2)
    // k1 was released: its blocks are gone and a re-request rebuilds
    var rebuilt = false
    val k1new = cache.getOrCompute("k1", spark) { rebuilt = true; checkpointed(1) }
    assert(rebuilt, "evicted entry must recompute, not return a dead frame")
    // access order counts: touch k2 so the k4 insert evicts k1, not k2
    cache.getOrCompute("k2", spark)(fail("k2 must still be cached"))
    cache.getOrCompute("k4", spark)(checkpointed(4))
    val k2third = cache.getOrCompute("k2", spark)(fail("k2 is the most recently used"))
    assert((k2third eq k2) && k2.count() == 2,
      "the survivor must still be materialized and readable")
    var k1rebuilt = false
    cache.getOrCompute("k1", spark) { k1rebuilt = true; checkpointed(1) }
    assert(k1rebuilt, "k1 was the LRU victim of the k4 insert")
    assert(k1new != null)
  }

  test("nested materialization windows attribute ids to the INNER window only") {
    // materializeLock is reentrant on one thread, so a materialize
    // closure that triggers another cache's first build opens a nested
    // window. The outer window's diff must EXCLUDE the inner build's
    // ids — otherwise evicting the outer entry would release checkpoint
    // blocks still owned by the inner cache's live entry.
    val inner = new Artifacts.Cache[String, org.apache.spark.sql.DataFrame]()
    var innerIds = Set.empty[Int]
    val (_, outerIds) = Artifacts.pinningTracked(spark) {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      inner.getOrCompute("shared", spark)(checkpointed(7))
      innerIds = (spark.sparkContext.getPersistentRDDs.keySet -- before).toSet
      checkpointed(8) // the outer window's own artifact
    }
    assert(innerIds.nonEmpty, "the inner build must have checkpointed")
    assert(outerIds.nonEmpty, "the outer window must claim its own build")
    assert((outerIds & innerIds).isEmpty,
      "outer window must not claim the nested build's ids")
    // releasing the outer entry leaves the inner artifact alive
    Artifacts.release(spark, outerIds)
    assert(innerIds.forall(Artifacts.isPinned),
      "inner cache's blocks must stay pinned after the outer release")
    val again = inner.getOrCompute("shared", spark)(
      fail("inner entry must still be cached"))
    assert(again.count() == 7, "inner artifact must still be readable")
  }

  test("release unpins and unpersists; evicted victims leave no pinned ids behind") {
    val cache = new Artifacts.Cache[String, org.apache.spark.sql.DataFrame](maxEntries = 1)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    cache.getOrCompute("x", spark)(checkpointed(5))
    val xIds = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(xIds.nonEmpty && xIds.forall(Artifacts.isPinned))
    cache.getOrCompute("y", spark)(checkpointed(6)) // evicts x
    assert(xIds.forall(id => !Artifacts.isPinned(id)),
      "the victim's ids must be unpinned on eviction")
  }
}

package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsOf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  test("KMV is exact below k and mergeable above it") {
    // 30 distinct tokens < k=256 → the sketch degenerates to exact
    val small = docsOf(Seq((1L, (1 to 30).map(i => s"tok$i").mkString(" "))))
    val r = Sketches.kmvDistinctOn(small).collect().head
    assert(r.getAs[Long]("true_distinct") == 30L)
    assert(r.getAs[Double]("est_distinct") == 30.0)
    assert(r.getAs[Double]("rel_err") == 0.0)

    // mergeability: k smallest over A ∪ B == k smallest over
    // (k-min of A) ∪ (k-min of B) — the property that lets each
    // partition/executor ship only k values
    val corpus = (1 to 4000).map(i => s"w$i")
    val (ha, hb) = corpus.map(t =>
      (graft.OracleHash.MulA * graft.OracleHash.poly(t, 0L) +
        graft.OracleHash.MulB) % graft.OracleHash.P)
      .splitAt(2000)
    val k = 256
    val direct = (ha ++ hb).distinct.sorted.take(k)
    val merged = (ha.distinct.sorted.take(k) ++ hb.distinct.sorted.take(k))
      .distinct.sorted.take(k)
    assert(direct == merged)
  }

  test("KMV estimate lands within 15% on a 4000-token vocabulary") {
    val doc = (1 to 4000).map(i => s"w$i").mkString(" ")
    val r = Sketches.kmvDistinctOn(docsOf(Seq((1L, doc)))).collect().head
    assert(r.getAs[Long]("true_distinct") == 4000L)
    assert(math.abs(r.getAs[Double]("rel_err")) < 0.15,
      s"rel_err ${r.getAs[Double]("rel_err")}")
  }

  test("HLL registers merge by bucket-wise max and estimate is sane") {
    val corpus = (1 to 5000).map(i => s"w$i")
    val (a, b) = corpus.splitAt(2500)
    val full = Sketches.hllDistinctOn(docsOf(Seq((1L, corpus.mkString(" ")))))
      .collect().head
    // merged halves: same registers as the full corpus because max is
    // associative/commutative over the union of the same hash set —
    // run the operator over a two-doc frame (each doc one half) and
    // over the one-doc frame; identical estimates
    val halves = Sketches.hllDistinctOn(
      docsOf(Seq((1L, a.mkString(" ")), (2L, b.mkString(" "))))).collect().head
    assert(full.getAs[Double]("est_distinct") ==
      halves.getAs[Double]("est_distinct"))
    assert(math.abs(full.getAs[Double]("rel_err")) < 0.25,
      s"rel_err ${full.getAs[Double]("rel_err")}")
  }

  test("CMS estimate is an upper bound that equals truth for dominant tokens") {
    // one dominant token + background noise: the min-over-depth
    // estimate can only overcount (collisions add), never undercount
    val noise = (1 to 500).map(i => s"n$i").mkString(" ")
    val doc = ("hot " * 300) + noise
    val rows = Sketches.cmsTopkOn(docsOf(Seq((1L, doc))), topk = 5).collect()
    assert(rows.head.getAs[String]("token") == "hot")
    rows.foreach { r =>
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("true_cnt"),
        s"CMS undercounted ${r.getAs[String]("token")}")
    }
    assert(rows.head.getAs[Long]("true_cnt") == 300L)
  }

  test("sketch queries run on testdata and report exact true counts") {
    val kmv = Sketches.kmvDistinct(spark, TestSpark.sf).collect().head
    val hll = Sketches.hllDistinct(spark, TestSpark.sf).collect().head
    assert(kmv.getAs[Long]("true_distinct") ==
      hll.getAs[Long]("true_distinct"))
    assert(kmv.getAs[Long]("n_kept") > 0)
    val cms = Sketches.cmsTopk(spark, TestSpark.sf).collect()
    assert(cms.nonEmpty && cms.length <= 20)
  }

  test("KMV overlap: estimates bounded by the sketch identities, truths sane") {
    val r = Sketches.kmvOverlap(spark, TestSpark.sf).collect().head
    val (nKept, nBoth) = (r.getAs[Long]("n_kept"), r.getAs[Long]("n_both"))
    assert(nKept > 0 && nBoth >= 0 && nBoth <= nKept)
    val j = r.getAs[Double]("est_jaccard")
    assert(j >= 0.0 && j <= 1.0)
    // intersection estimate = j * union estimate by construction
    assert(math.abs(r.getAs[Double]("est_intersection") -
      math.round(j * r.getAs[Double]("est_union") * 1e6) / 1e6) < 1e-9)
    // exact truths: intersection <= union; an underfull sketch is exact
    val (tu, ti) = (r.getAs[Long]("true_union"),
      r.getAs[Long]("true_intersection"))
    assert(ti <= tu && tu > 0)
    if (nKept < r.getAs[Long]("k")) {
      assert(r.getAs[Double]("est_union") == tu.toDouble)
      assert(nBoth == ti)
    }
  }
}

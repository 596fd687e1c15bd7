package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HistogramNtile must be BIT-EQUAL to SQL ntile for every bucket
  * count — the whole point is swapping the plan, not the answer.
  * Buckets = 2 forces nearly every tile cut to straddle (maximal
  * window path); buckets = 256 makes most buckets wholesale.
  */
class HistogramNtileSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private lazy val sf = graft.TestSpark.sf

  private def checkAgainstNtile(tiles: Int, buckets: Int): Unit = {
    val per = graft.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("frequency"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("monetary"))
    val expected = per.withColumn("t",
      ntile(tiles).over(
        Window.orderBy(col("monetary").desc, col("user_id"))).cast("long"))
    val actual = HistogramNtile.withNtile(per, Nil, -col("monetary"),
      Seq(col("monetary").desc, col("user_id")), tiles, "t", buckets)
    val diff = expected.select(col("user_id"), col("t"))
      .except(actual.select(col("user_id"), col("t")))
    assert(diff.isEmpty, s"tiles=$tiles buckets=$buckets: ${diff.count()} rows differ")
    assert(actual.count() == expected.count())
  }

  test("matches SQL ntile exactly across tile and bucket counts") {
    for (tiles <- Seq(2, 3, 7); buckets <- Seq(2, 256))
      checkAgainstNtile(tiles, buckets)
  }

  test("grouped: matches per-language ntile including tiny groups") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), length(col("text")).as("len"))
    val expected = docs.withColumn("t",
      ntile(3).over(Window.partitionBy(col("lang"))
        .orderBy(col("len"), col("doc_id"))).cast("long"))
    val actual = HistogramNtile.withNtile(docs, Seq("lang"), col("len"),
      Seq(col("len"), col("doc_id")), 3, "t", buckets = 8)
    assert(expected.select(col("doc_id"), col("t"))
      .except(actual.select(col("doc_id"), col("t"))).isEmpty)
  }

  test("adaptive spelling picks by size and stays bit-equal") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), length(col("text")).as("len"))
    val n = docs.count()
    val small = HistogramNtile.withNtileAdaptive(docs, n, Seq("lang"),
      col("len"), Seq(col("len"), col("doc_id")), 3, "t")
    val big = HistogramNtile.withNtileAdaptive(docs, n, Seq("lang"),
      col("len"), Seq(col("len"), col("doc_id")), 3, "t", threshold = 1)
    // below-threshold → plain window (no histogram aggregate in plan);
    // above → histogram plan; both bit-equal
    assert(small.queryExecution.optimizedPlan.toString.contains("ntile"))
    assert(!big.queryExecution.optimizedPlan.toString.contains("ntile"))
    assert(small.select(col("doc_id"), col("t"))
      .except(big.select(col("doc_id"), col("t"))).isEmpty)
  }

  test("NaN sort keys rank last, bit-equal to the SQL window") {
    val s = spark
    import s.implicits._
    // NaN rows must survive (the former plan dropped them: NaN bucket
    // arithmetic nulled __hb and the histogram join lost the rows) and
    // take the tiles SQL ntile assigns when ORDER BY ranks NaN last
    val df = Seq((1L, 2.0), (2L, Double.NaN), (3L, 1.0), (4L, Double.NaN),
      (5L, 9.0), (6L, 4.0)).toDF("id", "v")
    val expected = df.withColumn("t",
      ntile(3).over(Window.orderBy(col("v"), col("id"))).cast("long"))
    for (buckets <- Seq(2, 8)) {
      val actual = HistogramNtile.withNtile(df, Nil, col("v"),
        Seq(col("v"), col("id")), 3, "t", buckets)
      assert(actual.count() == 6, s"buckets=$buckets: NaN rows were dropped")
      assert(expected.select(col("id"), col("t"))
        .except(actual.select(col("id"), col("t"))).isEmpty,
        s"buckets=$buckets: NaN placement diverges from SQL ntile")
    }
    // all-NaN group: width is null but every row routes to the last
    // bucket and the group still tiles completely
    val allNan = Seq((1L, Double.NaN), (2L, Double.NaN), (3L, Double.NaN))
      .toDF("id", "v")
    val t = HistogramNtile.withNtile(allNan, Nil, col("v"),
      Seq(col("v"), col("id")), 2, "t", buckets = 4)
      .orderBy(col("id")).select(col("t")).collect().map(_.getLong(0))
    assert(t.toSeq == Seq(1L, 1L, 2L))
  }

  test("degenerate group: all-equal keys collapse into one bucket") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 5.0)).toDF("id", "v")
    val actual = HistogramNtile.withNtile(df, Nil, col("v"),
      Seq(col("v"), col("id")), 3, "t", buckets = 4)
      .orderBy(col("id")).select(col("t")).collect().map(_.getLong(0))
    assert(actual.toSeq == Seq(1L, 1L, 2L, 3L))
  }
}

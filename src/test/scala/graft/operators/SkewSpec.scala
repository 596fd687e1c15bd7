package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted aggregation equals the direct aggregation on skewed keys") {
    import spark.implicits._
    // one pathological key holding ~90% of the rows
    val rows = (1 to 900).map(i => ("hot", i.toLong, i.toDouble)) ++
      (1 to 100).map(i => (s"k${i % 7}", 1000L + i, i.toDouble))
    val df = rows.toDF("k", "row_id", "v")
    val direct = df.groupBy($"k")
      .agg(sum($"v").as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(df, $"k", $"v", $"row_id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
    // the salt genuinely splits the hot key into multiple partials
    val partials = df.select($"k", pmod(hash($"row_id"), lit(16)).as("s"))
      .filter($"k" === "hot").select("s").distinct().count()
    assert(partials > 1)
  }

  test("salted join equals the plain join and spreads the hot key") {
    import spark.implicits._
    // hot user 7 owns 90% of the fact rows
    val fact = ((1 to 900).map(i => (i.toLong, 7L)) ++
      (901 to 1000).map(i => (i.toLong, (i % 13).toLong)))
      .toDF("row_id", "user_id")
    val dim = fact.select($"user_id").distinct()
      .withColumn("tag", concat(lit("u"), $"user_id"))
    val plain = fact.join(dim, Seq("user_id"))
      .select($"row_id", $"tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(fact, dim, "user_id", $"row_id")
      .select($"row_id", $"tag")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain) // semantics untouched, each row matched once
    assert(salted.size == 1000)
    // the hot key's fact rows land in several salt buckets
    val spread = fact.filter($"user_id" === 7L)
      .select(pmod(hash($"row_id"), lit(8)).as("s"))
      .distinct().count()
    assert(spread > 1)
  }
}

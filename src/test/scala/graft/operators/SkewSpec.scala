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
}

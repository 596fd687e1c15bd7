package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PartitionedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("daily layout prunes partitions at planning and round-trips rows exactly") {
    val events = graft.Tables.events(spark, TestSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft_daily")
      .toFile.getAbsolutePath + "/events"
    PartitionedSink.writeDaily(events, dir)
    try {
      val back = PartitionedSink.readDaily(spark, dir)
      // lossless round trip of the event payload
      assert(back.count() == events.count())
      assert(back.select(sum(col("value").cast("decimal(18,4)")))
        .first().getDecimal(0) ==
        events.select(sum(col("value").cast("decimal(18,4)")))
          .first().getDecimal(0))
      // one directory per day actually exists on disk
      val days = new java.io.File(dir).listFiles()
        .count(_.getName.startsWith("ds="))
      val distinctDays = events.select(date_format(col("ts"), "yyyy-MM-dd"))
        .distinct().count()
      assert(days.toLong == distinctDays)
      // a day-bounded read eliminates every other partition at
      // PLANNING — PartitionFilters carries the ds predicate and the
      // scan's selected partition count is 1
      // partition-column type inference reads ds back as a DATE
      val day = back.select(col("ds")).orderBy(col("ds")).first()
        .getAs[java.sql.Date](0).toString
      val pruned = back.filter(col("ds") === day)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"),
        s"no partition filters in:\n$plan")
      assert(
        "PartitionFilters: \\[[^\\]]*ds".r.findFirstIn(plan).isDefined,
        s"ds not a partition filter in:\n$plan")
      // and the pruned read returns exactly that day's rows
      val expected = events
        .filter(date_format(col("ts"), "yyyy-MM-dd") === day).count()
      assert(pruned.count() == expected && expected > 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir).getParentFile)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkTestBase {

  test("bucketed interval join == theta join, equi-join plan, exact-once") {
    import spark.implicits._
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "value")
    val bands = spark.read.parquet(s"$sfDir/nation.parquet").select(
      col("n_nationkey").as("band_id"),
      (col("n_nationkey") * 4).cast("double").as("lo"),
      (col("n_nationkey") * 4 + 7).cast("double").as("hi"))
    val fast = IntervalJoin.pointInInterval(events, "value", bands,
      "lo", "hi", bucketWidth = 5.0)
    val fastRows = fast.select("event_id", "band_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val slow = events.join(bands,
        col("value") >= col("lo") && col("value") < col("hi"))
      .select("event_id", "band_id").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // exact-once: multiset equality, not just set equality (no dup pairs)
    assert(fastRows.length == slow.length && fastRows.toSet == slow.toSet)
    assert(fastRows.length == fastRows.toSet.size)
    // the plan is a hash-joinable equi-join, not a nested loop
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
           !plan.contains("CartesianProduct"), plan.take(1500))
    // boundary semantics: hi exclusive, lo inclusive (band edges at
    // exact bucket boundaries too: width 5, interval [20, 27))
    val probe = Seq((1L, 20.0), (2L, 26.999), (3L, 27.0)).toDF("event_id", "value")
    val band = Seq((9L, 20.0, 27.0)).toDF("band_id", "lo", "hi")
    val got = IntervalJoin.pointInInterval(probe, "value", band,
      "lo", "hi", 5.0).select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L))
  }

  test("property: random overlapping intervals == theta join, several widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    (0 until 8).foreach { round =>
      val nI = 30 + rnd.nextInt(40)
      val intervals = (0 until nI).map { i =>
        val lo = rnd.nextDouble() * 200 - 100
        (i.toLong, lo, lo + rnd.nextDouble() * 25) // spans 0..25 wide
      }.toDF("band_id", "lo", "hi")
      val points = (0 until 400).map(j =>
        (j.toLong, rnd.nextDouble() * 240 - 120)).toDF("pid", "v")
      val width = Seq(0.5, 3.0, 10.0, 40.0)(round % 4)
      val fast = IntervalJoin.pointInInterval(points, "v", intervals,
          "lo", "hi", width)
        .select("pid", "band_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val slow = points.join(intervals,
          col("v") >= col("lo") && col("v") < col("hi"))
        .select("pid", "band_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(fast.length == slow.length && fast.toSet == slow.toSet,
        s"round $round width $width")
      assert(fast.length == fast.toSet.size) // exact-once, every width
    }
  }
}

package graft

import java.sql.Timestamp

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkTestBase {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("latest prior snapshot, inclusive ties, null when none") {
    import spark.implicits._
    val right = Seq(
      (1L, ts(100), 10L), (1L, ts(200), 20L), (1L, ts(300), 30L),
      (2L, ts(150), 15L)).toDF("k", "ts", "v")
    val left = Seq(
      (1L, ts(50), "a"),   // before any snapshot -> null
      (1L, ts(200), "b"),  // exactly at a snapshot -> INCLUSIVE match 20
      (1L, ts(250), "c"),  // between -> 20
      (1L, ts(999), "d"),  // after all -> 30
      (2L, ts(149), "e"),  // before user-2's snapshot -> null
      (3L, ts(500), "f"))  // key with no snapshots at all -> null
      .toDF("k", "ts", "tag")
    val out = AsofJoin.latestPrior(left, right, "k", "ts", Seq("v"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out === Map("a" -> None, "b" -> Some(20L), "c" -> Some(20L),
      "d" -> Some(30L), "e" -> None, "f" -> None))
    // partitioning invariance
    val out2 = AsofJoin.latestPrior(left.repartition(7), right.repartition(5),
        "k", "ts", Seq("v"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out2 === out)
  }

  test("tolerance: stale matches become null payloads, fresh ones survive") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val right = Seq(
      (1L, ts(100), 10L), (1L, ts(200), 20L)).toDF("k", "ts", "v")
    val left = Seq(
      (1L, ts(210), "fresh"),    // 10s after snap 20 -> match
      (1L, ts(200), "exact"),    // inclusive at snap 20 -> match
      (1L, ts(260), "edge"),     // exactly 60s after -> >= boundary keeps it
      (1L, ts(261), "stale"),    // 61s after -> null
      (1L, ts(150), "old_snap"), // latest prior is snap 10 at 50s -> match
      (1L, ts(50), "none"))      // no prior at all -> null
      .toDF("k", "ts", "tag")
    val out = AsofJoin.latestPrior(left, right, "k", "ts", Seq("v"),
        tolerance = Some(expr("INTERVAL 60 SECOND")))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out === Map("fresh" -> Some(20L), "exact" -> Some(20L),
      "edge" -> Some(20L), "stale" -> None, "old_snap" -> Some(10L),
      "none" -> None))
  }
}

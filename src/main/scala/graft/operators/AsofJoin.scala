package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of (latest-prior) join: for every left row, the single right row with
 * the same key and the greatest right ts <= left ts (INCLUSIVE — a
 * snapshot stamped exactly at the probe time matches). Time-series
 * enrichment, SCD lookups, quote-for-trade.
 *
 * Spark-native shape (composition, no custom physical operator needed):
 * union both sides with a source marker, ONE shuffle on the key, and an
 * ordered carry-forward window — `last(payload, ignoreNulls)` over rows up
 * to the current one. No range-bucket explosion and no per-row binary
 * search; cost is a sort within each key partition, and keys parallelize.
 * Ties are deterministic: right rows order before left rows at equal ts
 * (inclusive semantics), left peers carry null payloads so their relative
 * order cannot change the carried value.
 *
 * Requires unique (key, ts) pairs on the right (pre-dedupe if violated —
 * "the latest of two simultaneous snapshots" is not well-defined).
 */
object AsofJoin {

  /** `tolerance`: optional maximum staleness — a match is kept only when
    * the matched right ts >= left ts - tolerance (an INTERVAL column for
    * timestamp keys, a numeric for numeric ts). Stale matches surface as
    * null payloads (the left row is kept, like a miss), which is what the
    * production semantics of quote-for-trade / snapshot-enrichment want:
    * "no recent-enough snapshot" ≠ "the ancient one". Implemented by
    * carrying the matched ts alongside the payload in the same window —
    * no second join, no extra shuffle. */
  def latestPrior(left: DataFrame, right: DataFrame, keyCol: String,
                  tsCol: String, payloadCols: Seq[String],
                  tolerance: Option[Column] = None): DataFrame = {
    val clash = left.columns.toSet.intersect(payloadCols.toSet)
    require(clash.isEmpty,
      s"payload columns collide with left columns: ${clash.mkString(", ")} — alias the right side first")
    // payload travels WITH its own ts so the tolerance check can see when
    // the carried match was stamped
    val payload = struct(col(tsCol).as("__mts") +: payloadCols.map(col): _*)
    val pType = right.select(payload.as("__p")).schema("__p").dataType
    val lStruct = struct(left.columns.map(col): _*)
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType

    val r = right.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      payload.as("__p"), lit(null).cast(lType).as("__l"), lit(0).as("__src"))
    val l = left.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(null).cast(pType).as("__p"), lStruct.as("__l"), lit(1).as("__src"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried0 = last(col("__p"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case None => carried0
      case Some(tol) => // null when stale (when() without otherwise)
        when(carried0.getField("__mts") >= col("__ts") - tol, carried0)
    }
    val carried = r.unionByName(l)
      .withColumn("__match", matched)
      .where(col("__src") === 1)

    val leftOut: Seq[Column] = left.columns.map(c => col(s"__l.$c").as(c)).toSeq
    val payloadOut: Seq[Column] = payloadCols.map(c => col(s"__match.$c").as(c))
    carried.select(leftOut ++ payloadOut: _*)
  }
}

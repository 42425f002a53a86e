package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Generic 1-D interval join (point-in-interval, intervals may overlap):
 * probe rows with a value v match interval rows with lo <= v < hi.
 *
 * Scale shape — the 1-D sibling of the spatial cover join (SpatialJoin):
 * a raw theta join degenerates to nested loops, so each interval is
 * decomposed into the fixed-width buckets it overlaps (explode), probes
 * compute their single bucket, and the match becomes a hash-joinable
 * EQUI-join on bucket + exact refine. A probe's value lies in exactly one
 * bucket and an interval appears at most once per bucket, so each
 * (probe, interval) pair meets exactly once — no dedup pass needed.
 * Pick `bucketWidth` near the median interval length: cost is
 * O(intervals x avg_span/width) replication on the (small) interval side
 * and exactly one bucket key per probe row.
 */
object IntervalJoin {

  def pointInInterval(points: DataFrame, vCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val iv = intervals
      .withColumn("__b", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // an interval whose exclusive hi lands exactly on a bucket edge
        // gets one harmlessly empty extra bucket — the refine predicate
        // (v < hi) discards it, and uniqueness per bucket is preserved
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pts = points
      .withColumn("__b", floor(col(vCol) / bucketWidth).cast("long"))
    pts.join(iv, Seq("__b"))
      .where(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      .drop("__b")
  }
}

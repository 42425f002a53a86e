package org.apache.spark.rdd

/** Package-injection shim (same public technique as sql.graftbridge
  * .ColumnBridge): RDD.isLocallyCheckpointed is private[rdd], and
  * graft.plans.SessionCaches needs it to distinguish checkpoint-product
  * RDDs (safe for memo eviction to unpersist) from caller-persisted
  * inputs (not ours to touch). */
object GraftRddBridge {
  def isLocallyCheckpointed(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}

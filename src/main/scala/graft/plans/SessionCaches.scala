package graft.plans

import org.apache.spark.sql.SparkSession

/**
 * Session cache hygiene for long-lived JVMs (the round-2 finding: after a
 * 64-query bench loop, accumulated localCheckpoint blocks pinned by the
 * fixture/operator memos degraded the flagship measurement ~6x vs a fresh
 * JVM). One call drops every engine memo AND sweeps every persistent RDD —
 * including checkpoint blocks whose owning DataFrames are no longer
 * reachable (localCheckpoint pins blocks until GC + ContextCleaner get to
 * them, which inside one measurement window is "never").
 *
 * Used by graft.Bench between the query loop and the flagship measurement;
 * call it in any long-lived session between unrelated workloads.
 */
object SessionCaches {

  /** Eagerly unpersist the PERSISTED ancestor of a derived frame.
    *
    * `Dataset.localCheckpoint` returns a frame whose `queryExecution.toRdd`
    * is a fresh MapPartitionsRDD OVER the checkpointed RDD — calling
    * `unpersist` on `toRdd` itself is a no-op (the round-3 ADVICE finding:
    * memo evictions "eagerly unpersisting" that way still leaked blocks
    * until the full sweep). This walks the narrow-dependency chain down to
    * the first RDD actually registered at a storage level and unpersists
    * that one — but ONLY if that RDD is a checkpoint product
    * (isLocallyCheckpointed/isCheckpointed): a memoized frame derived from
    * a CALLER-persisted input must never have that input silently
    * unpersisted by memo eviction (round-4 advice — latent foot-gun; every
    * engine memo today is a checkpoint root, and the ownership rule is now
    * enforced here rather than assumed at each memo site). Swallows
    * failures from already-stopped sessions. */
  def unpersistCheckpointed(df: org.apache.spark.sql.Dataset[_]): Unit = {
    import org.apache.spark.storage.StorageLevel
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit =
      if (r.getStorageLevel != StorageLevel.NONE) {
        if (org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(r) ||
            r.isCheckpointed) {
          r.unpersist(blocking = false); ()
        } // else: caller-persisted input — not this helper's to evict
      } else r.dependencies.foreach(d => walk(d.rdd))
    try walk(df.queryExecution.toRdd)
    catch { case _: Throwable => () } // session may already be stopped
  }

  def clear(spark: SparkSession): Unit = {
    graft.queries.TextFixtures.clearMemo()
    graft.queries.GeoQueries.clearIndexMemo()
    graft.operators.SpatialJoin.clearCoverCache()
    spark.sharedState.cacheManager.clearCache()
    // the sweep: every persisted/locally-checkpointed RDD still registered
    // with the context, regardless of who created it
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }
}

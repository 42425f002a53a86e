package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Shared text-dedup fixtures for the query registries: the dup-injected
  * corpus, its DuckDB CTE text, and a session-scoped memo of the
  * materialized banded MinHash keys — four queries (pairs, overflow,
  * ngram verification, clusters) consume the same signatures, and a
  * production pipeline computes them once, so the registry does too. */
private[graft] object TextFixtures {

  /** documents + injected duplicates, engine side. */
  def dupDocs(s: SparkSession, d: String): DataFrame = {
    val docs = s.read.parquet(s"$d/documents.parquet").select("doc_id", "text")
    docs.unionByName(docs.where(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  /** Same corpus, oracle side. */
  val dupDocsSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS doc_id, text FROM documents
      |WHERE doc_id % 10 = 0""".stripMargin

  /** DuckDB mirror of Dedup.shingles / Dedup.minhash (w=3). */
  def minhashSqlExpr(seed: Int): String =
    s"""list_aggregate(list_transform(
       |  CASE WHEN len(string_split(text, ' ')) < 3
       |       THEN [array_to_string(string_split(text, ' '), ' ')]
       |       ELSE [array_to_string(string_split(text, ' ')[j+1:j+3], ' ')
       |             for j in range(0, len(string_split(text, ' ')) - 2)] END,
       |  s -> md5('$seed|' || s)), 'min')""".stripMargin

  /** sigs+banded CTE bodies over a `docs(doc_id, text)` CTE (w=3,
    * numHashes=4, rowsPerBand=2 — the registry's parameters). */
  val bandedSqlCtes: String =
    s"""sigs AS (SELECT doc_id,
       |  ${minhashSqlExpr(0)} AS mh0, ${minhashSqlExpr(1)} AS mh1,
       |  ${minhashSqlExpr(2)} AS mh2, ${minhashSqlExpr(3)} AS mh3
       |  FROM (SELECT doc_id, text FROM docs) _),
       |banded AS (
       |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS bucket FROM sigs
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, md5(mh2 || '|' || mh3) AS bucket FROM sigs)""".stripMargin

  /** Memo entry cap: each entry PINS a localCheckpointed frame's blocks for
    * the session lifetime — a long-lived session cycling many (session,
    * dir) keys must not accumulate them (the round-2 degraded-bench-JVM
    * contributor). Whole-cache eviction on overflow; evicted RDD blocks are
    * unpersisted eagerly, not left to GC. */
  private[graft] final val BandedCacheMax = 4

  private val bandedCache =
    new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Materialized banded keys of dupDocs(d), computed once per (session,
    * dir): the checkpointed frame is already session-bound, so the memo
    * key is too. */
  def bandedCached(s: SparkSession, d: String): DataFrame = {
    if (bandedCache.size() >= BandedCacheMax && !bandedCache.containsKey((s, d)))
      clearMemo()
    bandedCache.computeIfAbsent((s, d), _ =>
      Dedup.minhashBanded(dupDocs(s, d), "doc_id", "text",
        w = 3, numHashes = 4, rowsPerBand = 2))
  }

  private val rollingCache =
    new ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** Materialized exploded rolling-hash sketch of dupDocs(d) (w=16, k=8),
    * computed once per (session, dir): pairs and overflow side output
    * share one sketch computation, the production composition. */
  def rollingCached(s: SparkSession, d: String): DataFrame = {
    if (rollingCache.size() >= BandedCacheMax && !rollingCache.containsKey((s, d)))
      clearMemo()
    rollingCache.computeIfAbsent((s, d), _ =>
      graft.operators.TextAnalysis.rollingHashes(dupDocs(s, d), "doc_id", "text",
        w = 16, k = 8))
  }

  /** Drop all memoized frames and unpersist their checkpoint blocks (bench
    * hygiene; see plans.SessionCaches). The unpersist walks down to the
    * PERSISTED ancestor RDD — the memoized frame's own toRdd is a derived
    * MapPartitionsRDD over it, on which unpersist would be a no-op. */
  private[graft] def clearMemo(): Unit = {
    bandedCache.values.forEach(graft.plans.SessionCaches.unpersistCheckpointed(_))
    bandedCache.clear()
    rollingCache.values.forEach(graft.plans.SessionCaches.unpersistCheckpointed(_))
    rollingCache.clear()
  }

  private[graft] def memoSize: Int = bandedCache.size() + rollingCache.size()
}

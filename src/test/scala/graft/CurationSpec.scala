package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkTestBase {

  test("packShards two-phase cumsum == naive single-window semantics") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).as("n_tok"))
    val fast = Curation.packShards(docs, "doc_id", "n_tok", "lang", budget = 500L)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    // naive: one window per lang (the semantics spec, not the scale path)
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    val slow = docs
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      .select(col("doc_id"),
        floor((col("cum") - col("n_tok")) / lit(500.0)).cast("int").as("shard"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(fast.nonEmpty && fast === slow)
    // shards actually advance (budget is binding at this sf)
    assert(fast.values.toSet.size > 1)
    // independence from input partitioning
    val fast2 = Curation.packShards(docs.repartition(13), "doc_id", "n_tok",
      "lang", budget = 500L)
      .collect().map(r => (r.getLong(0), r.getInt(3))).toMap
    assert(fast2 === fast)
  }

  test("packShards edges: huge budget -> one shard; single-doc langs fine") {
    import spark.implicits._
    val docs = Seq((1L, "aa", 10L), (2L, "aa", 20L), (3L, "zz", 5L))
      .toDF("doc_id", "lang", "n_tok")
    val big = Curation.packShards(docs, "doc_id", "n_tok", "lang",
      budget = 1000000L).collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(big === Map(1L -> 0, 2L -> 0, 3L -> 0))
    // budget 15: lang aa doc1 starts at 0 -> shard 0, doc2 starts at 10 -> 0;
    // with budget 10 doc2 starts at offset 10 -> shard 1
    val tight = Curation.packShards(docs, "doc_id", "n_tok", "lang",
      budget = 10L).collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(tight === Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("packShards plan: offsets broadcast, no cartesian, partial aggregation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), "\\s+")).as("n_tok"))
    val plan = Curation.packShards(docs, "doc_id", "n_tok", "lang", 500L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("partial_sum") || plan.contains("partial"), plan.take(1500))
  }

  test("sampleByHash is deterministic, stable, and roughly proportional") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    val n = docs.count()
    val kept = Curation.sampleByHash(docs, "doc_id", perMille = 300)
    val ids = kept.collect().map(_.getLong(0)).toSet
    // same rows every time, at any parallelism
    val ids2 = Curation.sampleByHash(docs.repartition(9), "doc_id", 300)
      .collect().map(_.getLong(0)).toSet
    assert(ids === ids2 && ids.nonEmpty)
    // a rate subsample nests inside a larger rate (bucket monotonicity)
    val ids10 = Curation.sampleByHash(docs, "doc_id", 100)
      .collect().map(_.getLong(0)).toSet
    assert(ids10.subsetOf(ids))
    // rough proportionality (md5 uniformity; generous tolerance)
    assert(math.abs(ids.size.toDouble / n - 0.3) < 0.1)
  }
}

package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Curation

class CurationSpec extends SparkTestBase {

  test("profileApprox: KMV estimate slot matches KmvSketch.estimate bitwise") {
    import graft.functions.KmvSketch
    import graft.operators.Profile
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    val k = 16
    val cols = Seq("event_id", "user_id", "event_type")
    val got = Profile.profileApprox(df, cols, k).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    cols.foreach { c =>
      // reference sketch: the k smallest distinct md5s, computed naively
      val sketch = df.where(col(c).isNotNull)
        .select(md5(col(c).cast("string")).as("h")).distinct()
        .orderBy("h").limit(k).collect().map(_.getString(0)).toSeq
      assert(got(c) == KmvSketch.estimate(sketch, k), c) // bit-identical
    }
    // shape parity with the exact profiler (n, n_null, min/max unchanged)
    val exact = Profile.profile(df, cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(4), r.getString(5))).toMap
    Profile.profileApprox(df, cols, k).collect().foreach { r =>
      val (n, nNull, mn, mx) = exact(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == nNull &&
        r.getString(4) == mn && r.getString(5) == mx)
    }
  }

  test("sampleStratified: per-stratum rates, monotone nesting, audit columns") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang")
    val got = Curation.sampleStratified(docs, "doc_id", "lang",
      Seq("it" -> 500, "en" -> 100), defaultPerMille = 50).collect()
    assert(got.nonEmpty)
    // every kept row satisfies bucket < its stratum's rate
    got.foreach { r =>
      val (lang, bucket, rate) = (r.getString(1), r.getLong(2), r.getInt(3))
      val expected = lang match {
        case "it" => 500; case "en" => 100; case _ => 50
      }
      assert(rate == expected && bucket < rate, r.toString)
    }
    // nesting: raising every rate only ADDS rows (same md5 bucket)
    val low = got.map(_.getLong(0)).toSet
    val high = Curation.sampleStratified(docs, "doc_id", "lang",
      Seq("it" -> 800, "en" -> 400), defaultPerMille = 200)
      .collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
    // consistency with the unstratified sampler at the same rate
    val flat = Curation.sampleByHash(docs, "doc_id", 50)
      .collect().map(_.getLong(0)).toSet
    val allAt50 = Curation.sampleStratified(docs, "doc_id", "lang",
      Seq(), defaultPerMille = 50).collect().map(_.getLong(0)).toSet
    assert(allAt50 == flat)
  }

  test("profileQuantiles: exact percentile matches a sort-based recomputation") {
    import graft.operators.Profile
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    val got = Profile.profileQuantiles(df, Seq("user_id"), Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val vals = df.where(col("user_id").isNotNull)
      .select(col("user_id").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    Seq(0.25, 0.5, 0.75).foreach { p =>
      val rank = p * (vals.length - 1)
      val lo = vals(rank.toInt)
      val hi = vals(math.ceil(rank).toInt)
      val expected = lo + (hi - lo) * (rank - rank.toInt)
      assert(got(p) == expected, s"p=$p")
    }
  }

  test("profileQuantilesApprox: rank error bounded by n/accuracy against sorted data") {
    import graft.operators.Profile
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    val ps = Seq(0.25, 0.5, 0.75)
    val vals = df.where(col("user_id").isNotNull)
      .select(col("user_id").cast("double"))
      .collect().map(_.getDouble(0)).sorted
    val n = vals.length
    Seq(100, 10000).foreach { accuracy =>
      val got = Profile.profileQuantilesApprox(df, Seq("user_id"), ps, accuracy)
        .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
      assert(got.keySet == ps.toSet)
      ps.foreach { p =>
        val q = got(p)
        // approx_percentile returns an actual data value...
        assert(vals.contains(q), s"acc=$accuracy p=$p q=$q not a data value")
        // ...whose rank is within n/accuracy of the target rank (the
        // documented Greenwald-Khanna bound; +1 for boundary ties)
        val lo = vals.indexWhere(_ == q)      // first index holding q
        val hi = vals.lastIndexWhere(_ == q)  // last index holding q
        val target = p * (n - 1)
        val err = if (target < lo) lo - target
                  else if (target > hi) target - hi else 0.0
        assert(err <= n.toDouble / accuracy + 1,
          s"acc=$accuracy p=$p rank err $err > ${n.toDouble / accuracy + 1}")
      }
    }
    // the exact variant stays the oracle-checked slot; at high accuracy the
    // approx median must land inside the exact p25..p75 envelope (sanity
    // cross-link between the two variants)
    val exact = Profile.profileQuantiles(df, Seq("user_id"), ps)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val approxMed = Profile.profileQuantilesApprox(df, Seq("user_id"),
      Seq(0.5), 10000).collect()(0).getDouble(2)
    assert(approxMed >= exact(0.25) && approxMed <= exact(0.75))
  }

  test("packShards shard ids are integer-exact and match floor semantics") {
    import spark.implicits._
    // offsets straddling several budget boundaries, incl. a doc exactly ON
    // a boundary (starts shard n, not n-1: assignment is by START offset)
    val docs = Seq((1L, "x", 700L), (2L, "x", 300L), (3L, "x", 500L),
      (4L, "x", 1L), (5L, "x", 1499L), (6L, "x", 1L))
      .toDF("doc_id", "lang", "n_tok")
    val got = Curation.packShards(docs, "doc_id", "n_tok", "lang", budget = 1000L)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    // starts: 0, 700, 1000, 1500, 1501, 3000
    assert(got == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1, 5L -> 1, 6L -> 3))
  }

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

  test("capPerKey: exact per-key cap, hash-uniform, parallelism-independent") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 10 < 5, lit("mega")).otherwise(col("source"))
          .as("key"),
        col("text"))
    val counts = docs.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = 30
    val capped = Curation.capPerKey(docs, "key", "doc_id", cap)
    val got = capped.groupBy("key").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every key: min(count, cap) survivors — capped keys exactly cap,
    // small keys untouched
    assert(counts.exists(_._2 > cap) && counts.exists(_._2 <= cap))
    counts.foreach { case (k, n) =>
      assert(got(k) == math.min(n, cap.toLong), s"key $k") }
    // all original columns survive, no helper columns leak
    assert(capped.columns.toSeq == docs.columns.toSeq)
    // the wide relation joins the tiny threshold table BROADCAST — the
    // whole point of the threshold construction is no wide shuffle
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"))
    // identical survivor SET at a different parallelism (determinism)
    val ids = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.capPerKey(docs.repartition(13), "key", "doc_id", cap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
    // cap above every count: identity
    assert(Curation.capPerKey(docs, "key", "doc_id", 1000000).count() ==
      docs.count())
    intercept[IllegalArgumentException](
      Curation.capPerKey(docs, "key", "doc_id", 0))
  }
}

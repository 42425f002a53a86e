package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkTestBase {

  private def docs(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bucket cap bounds an adversarial all-identical corpus") {
    // 200 byte-identical docs: every band bucket degenerates to size 200 ->
    // uncapped pair count would be 19,900; the cap must emit ZERO pairs and
    // route the buckets to the overflow side output instead
    val adversarial = docs((0L until 200L).map(i => (i, "same boilerplate text everywhere")))
    val pairs = Dedup.minhashCandidatePairs(adversarial, "doc_id", "text",
      w = 3, numHashes = 4, rowsPerBand = 2, maxBucket = 50)
    assert(pairs.count() === 0L)
    val overflow = Dedup.minhashOverflowBuckets(adversarial, "doc_id", "text",
      w = 3, numHashes = 4, rowsPerBand = 2, maxBucket = 50)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(overflow.toSet === Set((0, 200L), (1, 200L)))
  }

  test("cap leaves small buckets untouched (pairs == uncapped pairs)") {
    val mixed = docs(Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words here now"),
      (4L, "totally different words here now"),
      (5L, "a third unrelated document text")))
    val capped = Dedup.minhashCandidatePairs(mixed, "doc_id", "text",
      w = 3, numHashes = 4, rowsPerBand = 2, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L), (3L, 4L)))
  }

  test("embedding near-dup query plans a bucket equi-join, never cross") {
    // pins the O(N^2) fix: candidate generation must key on the LSH bucket
    val q = SparkEntry.queries("q_dup_embedding")(spark, sfDir)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
           !plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("bucket"), plan.take(2000))
    // and the filter discriminates: strict non-trivial subset of pairs
    val kept = q.count()
    assert(kept > 0, "threshold filtered everything")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(kept < emb * (emb - 1) / 4, s"filter passed $kept of ~${emb * (emb - 1) / 2} pairs")
  }

  test("null and empty texts neither crash nor explode the dedup operators") {
    import spark.implicits._
    val weird = Seq[(Long, String)]((1L, null), (2L, null), (3L, ""),
      (4L, ""), (5L, "real content here words"), (6L, "real content here words"))
      .toDF("doc_id", "text")
    // exact dedup: the two empty strings form one group; nulls hash to
    // null and are grouped too (documented: route/clean nulls upstream)
    val ex = Dedup.exact(weird).collect()
      .map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(ex(Some(java.security.MessageDigest.getInstance("MD5")
      .digest("".getBytes).map("%02x".format(_)).mkString)) == 2L)
    assert(ex(Some(java.security.MessageDigest.getInstance("MD5")
      .digest("real content here words".getBytes).map("%02x".format(_)).mkString)) == 2L)
    // LSH pairs: bounded output, no crash; the cap guards the degenerate
    // all-empty bucket as usual
    val pairs = Dedup.minhashCandidatePairs(weird.where($"text".isNotNull),
      "doc_id", "text", w = 3, numHashes = 4, rowsPerBand = 2)
    assert(pairs.count() <= 6)
    // rolling sketch: empty text yields the defined [0] sketch
    val sk = graft.operators.TextAnalysis.rollingSketch(
      weird.where($"text" === ""), "doc_id", "text").collect()
    assert(sk.forall(_.getSeq[Long](1) == Seq(0L)))
  }

  test("clusters: min-label propagation finds exact connected components") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (star on 22)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (22L, 20L), (22L, 21L)).toDF("id_a", "id_b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // partitioning invariance (determinism contract)
    val got2 = Dedup.clusters(pairs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === got)
  }

  test("clusters: adversarial 300-node chain converges in O(log n) rounds") {
    import spark.implicits._
    // a path graph is the worst case for plain min-label propagation
    // (rounds = diameter); the pointer-jump step must compress it to
    // O(log n) rounds — 300 nodes would need 300 plain rounds, far past
    // maxIters=20, while ceil(log2(300)) + change fits comfortably
    val n = 300
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      .toDF("id_a", "id_b")
    val got = Dedup.clusters(chain, maxIters = 20).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == n)
    assert(got.forall(_._2 == 0L), "every chain node labels to the min id")
  }

  test("clusters of an empty pair set is empty (no NPE on the null sum)") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.clusters(empty).count() === 0L)
  }

  test("incremental pairs: NEW x REF only — never ref x ref or new x new") {
    def banded(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBanded(d, "doc_id", "text", w = 2, numHashes = 4, rowsPerBand = 2)
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    // reference corpus contains an INTERNAL duplicate (1, 2): it must
    // never surface — incremental dedup re-checks nothing inside the
    // kept corpus
    val ref = docs(Seq(
      (1L, shared), (2L, shared),
      (3L, "completely different reference content nothing alike at all")))
    // new crawl: one dup of the reference, one internal new-new dup pair
    // (20, 21) that is also NOT this operator's business, one novel doc
    val nw = docs(Seq(
      (20L, shared), (21L, shared),
      (22L, "genuinely novel text that matches nothing in the corpus here")))
    val pairs = Dedup.incrementalPairsFromBanded(banded(nw), banded(ref), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((20L, 1L), (20L, 2L), (21L, 1L), (21L, 2L)))
    // keepNovel drops exactly the matched new docs
    val novel = Dedup.keepNovel(nw, "doc_id",
        Dedup.incrementalPairsFromBanded(banded(nw), banded(ref), "doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(22L))
    // the cap applies per side: a degenerate REFERENCE bucket emits nothing
    val refPileup = docs((100L to 120L).map(i => (i, shared)))
    val capped = Dedup.incrementalPairsFromBanded(
      banded(nw), banded(refPileup), "doc_id", maxBucket = 5)
    assert(capped.count() == 0)
    assert(Dedup.overflowFromBanded(banded(refPileup), maxBucket = 5).count() > 0)
  }

  test("incremental pairs == full self-join pairs restricted to NEW x REF") {
    // algebraic identity (no caps binding): running the classic self-join
    // over ref ∪ new and keeping only cross pairs must equal the
    // incremental operator — i.e. incrementality loses nothing, it only
    // skips the ref x ref / new x new work
    def banded(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBanded(d, "doc_id", "text", w = 2, numHashes = 4, rowsPerBand = 2)
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine ten"
    val ref = docs(Seq((1L, a), (2L, b), (3L, "ref only text unlike anything")))
    val nw = docs(Seq((10L, a), (11L, b), (12L, "crawl only text unlike anything else")))
    val inc = Dedup.incrementalPairsFromBanded(banded(nw), banded(ref), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full pairs over the union; new ids all > ref ids, so a cross pair
    // (id_a < id_b) is exactly (ref_id = id_a, new_id = id_b)
    val full = Dedup.candidatePairsFromBanded(
        banded(ref.unionByName(nw)), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (x, y) => x < 10 && y >= 10 }
      .map { case (rid, nid) => (nid, rid) }.toSet
    assert(inc == full && inc == Set((10L, 1L), (11L, 2L)))
  }

  test("explode+agg signatures == reference HOF form (incl. null/empty/short)") {
    // the round-5 scale rewrite (HOF lambdas run interpreted; see
    // minhashSignatures scaladoc) must be bit-identical on every edge:
    // normal, shorter-than-w, single-word, empty, null
    val d = docs(Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "two words"),
      (3L, "one"),
      (4L, ""),
      (5L, null)))
    val viaAgg = Dedup.minhashSignatures(d, "doc_id", "text", w = 3, numHashes = 4)
    val sig = (0 until 4).map(i =>
      Dedup.minhash(Dedup.shingles(org.apache.spark.sql.functions.col("text"), 3), i)
        .as(s"mh$i"))
    val viaHof = d.select(
      org.apache.spark.sql.functions.col("doc_id") +: sig: _*)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), (1 to 4).map(i =>
        if (r.isNullAt(i)) null else r.getString(i)))).toSet
    assert(rows(viaAgg) == rows(viaHof))
    assert(rows(viaAgg).size == 5) // null/empty docs still present
  }

  test("persisted banded keys: crawl cycle off the parquet table == in-memory chain") {
    // the production K27 loop: band the kept corpus ONCE, write the keys,
    // then each cycle reads the table and bands only the NEW side
    def banded(d: org.apache.spark.sql.DataFrame) =
      Dedup.minhashBanded(d, "doc_id", "text", w = 2, numHashes = 4, rowsPerBand = 2)
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val ref = docs(Seq(
      (1L, shared), (3L, "completely different reference content nothing alike")))
    val nw = docs(Seq(
      (20L, shared), (22L, "genuinely novel text matching nothing at all here")))
    val path = java.nio.file.Files.createTempDirectory("graftbanded").toString + "/ref_keys"
    Dedup.writeBandedKeys(banded(ref), path)
    val persisted = Dedup.readBandedKeys(spark, path)
    // exact same rows back (schema shape restored: id, band INT, bucket)
    assert(persisted.columns.toSeq == Seq("doc_id", "band", "bucket"))
    assert(persisted.schema("band").dataType ==
      org.apache.spark.sql.types.IntegerType)
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(rows(persisted) == rows(banded(ref)))
    // the cycle itself: pairs and keepNovel off the persisted table equal
    // the in-memory chain
    def pairSet(refB: org.apache.spark.sql.DataFrame) =
      Dedup.incrementalPairsFromBanded(banded(nw), refB, "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(persisted) == pairSet(banded(ref)))
    val novel = Dedup.keepNovel(nw, "doc_id",
        Dedup.incrementalPairsFromBanded(banded(nw), persisted, "doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(novel == Set(22L))
  }

  test("ngramJaccardVerify scores exactly the candidate pairs it is given") {
    val d = docs(Seq(
      (1L, "abcdef"),
      (2L, "abcdef"),
      (3L, "abcxyz")))
    import spark.implicits._
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccardVerify(cands, d, "doc_id", "text", n = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getInt(3)))).toMap
    // grams(abcdef) = {abc,bcd,cde,def}; grams(abcxyz) = {abc,bcx,cxy,xyz}
    assert(out === Map((1L, 2L) -> ((4, 4)), (1L, 3L) -> ((1, 7))))
    // strictly a verifier: pair (2,3) was not a candidate, so it is absent
    assert(!out.contains((2L, 3L)))
  }
}

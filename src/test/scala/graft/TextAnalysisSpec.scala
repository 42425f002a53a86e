package graft

import org.apache.spark.sql.functions._

import graft.core.RollingHash
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkTestBase {

  test("removeBoilerplate: df-pruning, order preserved, edges, invariance") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // 'chrome' is in 3 docs (> maxDocFreq=2) -> dropped; everything else
    // survives IN ORDER; doc 4 is all-boilerplate -> empty string
    val docs = Seq(
      (1L, "alpha chrome beta chrome gamma"),
      (2L, "chrome delta"),
      (3L, "epsilon chrome"),
      (4L, "chrome chrome")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.removeBoilerplate(df, "doc_id", "text", " ", 2L)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run(docs)
    assert(got == Map(1L -> "alpha beta gamma", 2L -> "delta",
      3L -> "epsilon", 4L -> ""))
    // duplicate units inside ONE doc count once toward df ('chrome' twice
    // in doc 1 and 4 is still df=3, not 5)
    assert(run(docs.repartition(7)) == got) // partitioning invariance
  }

  test("redactPii: emails, IPs and phones replaced; order prevents eating") {
    import spark.implicits._
    val cases = Seq(
      ("a", "write bob.smith+x@mail.example.co today",
            "write [EMAIL] today"),
      ("b", "server at 192.168.0.1 responded", "server at [IP] responded"),
      ("c", "call +1 (415) 555-0100 now", "call [PHONE] now"),
      ("d", "ip 10.0.0.7 then dial 415 555 0100 ok",
            "ip [IP] then dial [PHONE] ok"), // IP first, or phone eats it
      ("e", "no pii here at all", "no pii here at all"),
      ("f", "x@y.io and 8.8.8.8 and 00 1234567 99",
            "[EMAIL] and [IP] and [PHONE]"))
    val got = cases.toDF("k", "raw", "want")
      .select(col("k"), col("want"),
        TextAnalysis.redactPii(col("raw")).as("got"))
      .collect()
    got.foreach(r =>
      assert(r.getString(2) == r.getString(1), s"case ${r.getString(0)}"))
  }

  test("dedupUnits: global first occurrence wins, empties kept, invariant") {
    import spark.implicits._
    // 'shared' appears in docs 1 (pos 1), 2 (pos 0) and twice in doc 3;
    // the global first is (1, 1)? No — (1,1) vs (2,0): doc_id orders
    // first, so doc 1 pos 1 wins. Unique units all survive; the empty
    // unit from doc 4's double space is structural and kept everywhere.
    val docs = Seq(
      (1L, "alpha shared beta"),
      (2L, "shared gamma"),
      (3L, "shared delta shared"),
      (4L, "epsilon  zeta"),
      (5L, "shared")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.dedupUnits(df, "doc_id", "text", " ")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = run(docs)
    assert(got == Map(
      1L -> "alpha shared beta", // holds the first occurrence
      2L -> "gamma",
      3L -> "delta",
      5L -> "",                  // lost its only unit, row survives
      4L -> "epsilon  zeta"))    // empty unit preserved (double space)
    assert(run(docs.repartition(7)) == got)
  }

  test("rolling hash: windows are consistent with direct recomputation") {
    val s = "the quick brown fox jumps over the lazy dog repeatedly"
    val w = 8
    val hs = RollingHash.hashWindows(s, w)
    assert(hs.length == s.length - w + 1)
    // rolling result equals hashing each window from scratch
    (0 until hs.length).foreach { i =>
      val direct = RollingHash.hashWindows(s.substring(i, i + w), w)(0)
      assert(hs(i) == direct, s"window $i")
    }
    // identical windows at different offsets hash equal
    val rep = "abcdefgh--12345--abcdefgh"
    val hs2 = RollingHash.hashWindows(rep, 8)
    assert(hs2(0) == hs2(17))
    assert(hs2.toSet.size == hs2.length - 1)
  }

  test("rolling sketch is shift-robust: prefixed copy shares sketch hashes") {
    val base = "some long enough document body with many stable substrings inside it"
    val shifted = "PREFIX >>> " + base
    val a = RollingHash.minSketch(base, 16, 8).toSet
    val b = RollingHash.minSketch(shifted, 16, 8).toSet
    assert(a.intersect(b).size >= 6, s"only ${a.intersect(b).size} shared")
    // while an unrelated document shares none
    val c = RollingHash.minSketch("completely different content goes here, nothing alike at all", 16, 8).toSet
    assert(a.intersect(c).isEmpty)
  }

  test("rollingNearDupPairs flags shifted duplicates in a corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (2L, "XX alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (3L, "unrelated text that shares nothing with the others whatsoever!!"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda YY"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.rollingNearDupPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)) &&
      pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("rolling pairs cap degenerate buckets: n identical docs emit 0 pairs + overflow") {
    import spark.implicits._
    // adversarial corpus: the same boilerplate in 10 documents — every
    // sketch hash is shared by all 10, so an uncapped self-join would emit
    // 45 pairs per hash (O(n^2), the 100-TB killer). With maxBucket = 3
    // every bucket overflows: NO pairs, all hashes routed to the side output.
    val boiler = "identical legal footer text repeated across the whole site verbatim"
    val docs = (1L to 10L).map(i => (i, boiler)).toDF("doc_id", "text")
    val hashes = TextAnalysis.rollingHashes(docs, "doc_id", "text")
    val pairs = TextAnalysis.rollingPairsFromHashes(hashes, "doc_id",
      minShared = 1, maxBucket = 3)
    assert(pairs.count() == 0)
    val overflow = TextAnalysis.rollingOverflowFromHashes(hashes, maxBucket = 3)
      .collect()
    assert(overflow.nonEmpty && overflow.forall(_.getLong(1) == 10L))
    // a genuine (sub-cap) duplicate pair still surfaces alongside the pileup
    val mixed = docs.unionByName(Seq(
      (100L, "totally distinct content alpha beta gamma delta epsilon zeta eta"),
      (101L, "XX totally distinct content alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text"))
    val mp = TextAnalysis.rollingNearDupPairs(mixed, "doc_id", "text",
        minShared = 2, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mp == Set((100L, 101L)))
  }

  test("language-ID discriminates genuine multilingual text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog is in the house"),
      (2L, "der hund und die katze sind nicht in das haus gegangen und das ist gut"),
      (3L, "le chat et la souris sont dans les jardins et la maison est belle"),
      (4L, "el perro y la casa que es una maravilla y los gatos es bueno"),
      (5L, "il gatto che non dorme di notte per la strada e non torna"))
      .toDF("doc_id", "text")
    val pred = TextAnalysis.languageId(docs, "text")
      .select("doc_id", "lang_pred").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "it"))
  }
}

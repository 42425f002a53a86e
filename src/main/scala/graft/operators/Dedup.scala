package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Large-scale training-data deduplication operators over a `documents`-like
 * relation (doc_id, text, lang, ...). All flavors are pure DataFrame
 * plans: hash-groupBy for exact dup, MinHash+LSH banding for near-dup
 * candidates, SimHash bit-vector fingerprints, and n-gram Jaccard
 * verification on candidate pairs.
 *
 * Hash determinism: signatures are built on md5 (identical lowercase-hex
 * semantics in Spark and the DuckDB oracle), never on JVM hashCode.
 */
object Dedup {

  /** Exact dedup: groups of byte-identical text. Returns one row per
    * duplicated hash with the representative (min doc_id) and group size. */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("rep_id"), count("*").as("n"))
      .where(col("n") > 1)

  /** Word w-shingles as an array column (consecutive w-word windows). */
  def shingles(textCol: Column, w: Int): Column = {
    val words = split(textCol, " ")
    when(size(words) < w, array(concat_ws(" ", words)))
      .otherwise(transform(
        sequence(lit(0), size(words) - w),
        j => concat_ws(" ", slice(words, j + lit(1), lit(w)))))
  }

  /** One MinHash value: min over shingles of md5(seed || '|' || shingle). */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$seed|"), s))))

  /** MinHash signatures: doc_id + numHashes signature columns mh0..mhN. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        w: Int, numHashes: Int): DataFrame = {
    val sh = docs.select(col(idCol), shingles(col(textCol), w).as("sh"))
    val sig = (0 until numHashes).map(i => minhash(col("sh"), i).as(s"mh$i"))
    sh.select(col(idCol) +: sig: _*)
  }

  /** LSH candidate pairs: band the signature (bands of `rowsPerBand`
    * hashes), bucket-join within bands, emit distinct pairs a < b.
    * This is the scale path: cost is bucket-local, never all-pairs. */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            w: Int, numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0)
    val sigs = minhashSignatures(docs, idCol, textCol, w, numHashes)
    val nBands = numHashes / rowsPerBand
    val banded = sigs.select(col(idCol), explode(array((0 until nBands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until rowsPerBand).map(r =>
          col(s"mh${b * rowsPerBand + r}")): _*)).as("bucket"))
    }: _*)).as("bb")).select(col(idCol), col("bb.band"), col("bb.bucket"))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.band") === col("r.band") &&
             col("l.bucket") === col("r.bucket") &&
             col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("id_a"), col(s"r.$idCol").as("id_b"))
      .distinct()
  }

  /** SimHash fingerprint over words: bit b set iff sum over words of
    * (+1 if bit b of md5(word) else -1) > 0. `bits` <= 32 (hex nibbles of
    * the md5 prefix). Returns (idCol, simhash BIGINT). */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 32)
    val words = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("w"))
      .withColumn("h", md5(col("w")))
    // nibble value of hex char c: position in '0123456789abcdef' (1-based)
    def nib(i: Int): Column =
      (instr(lit("0123456789abcdef"), substring(col("h"), i + 1, 1)) - 1).cast("long")
    val bitCols = (0 until bits).map { b =>
      val v = shiftright(nib(b / 4), 3 - (b % 4)) % 2
      sum(when(v === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val sums = words.groupBy(col(idCol)).agg(bitCols.head, bitCols.tail: _*)
    val fingerprint = (0 until bits).map { b =>
      when(col(s"s$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)
    sums.select(col(idCol), fingerprint.as("simhash"))
  }

  /** Character n-gram sets + pairwise Jaccard counts over candidate pairs
    * blocked on (lang, n_chars) equality. Returns (id_a, id_b, inter, uni)
    * as exact integers (the ratio is inter/uni — left to the caller to
    * avoid float comparisons on the oracle path). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol), col("lang"), col("n_chars"), col(textCol))
    val pairs = base.as("a").join(base.as("b"),
        col("a.lang") === col("b.lang") &&
        col("a.n_chars") === col("b.n_chars") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        col(s"a.$textCol").as("text_a"), col(s"b.$textCol").as("text_b"))
    def gramSet(c: Column): Column = array_distinct(
      transform(sequence(lit(0), greatest(length(c) - n, lit(0))),
        i => c.substr(lit(1) + i, lit(n))))
    pairs
      .withColumn("ga", gramSet($"text_a"))
      .withColumn("gb", gramSet($"text_b"))
      .select($"id_a", $"id_b",
        size(array_intersect($"ga", $"gb")).as("inter"),
        size(array_union($"ga", $"gb")).as("uni"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-data curation operators: deterministic content-hash sampling
 * and token-budget shard packing — the two ops that turn a deduplicated
 * corpus into actual training shards.
 *
 * Both follow the repo's exact-match discipline: integer arithmetic only,
 * reproducible in the DuckDB oracle, identical results at any parallelism.
 */
object Curation {

  /** Deterministic per-row sample bucket in [0, 1000): the first 8 hex
    * nibbles of md5(id) as an integer, mod 1000. Pure built-ins (codegen),
    * and trivially reproducible in SQL — unlike xxhash64, whose seed/impl
    * is Spark-private. Stable across runs/partitions by construction. */
  def hashBucket(id: Column): Column = {
    val hex = md5(id.cast("string"))
    (0 until 8).map { i =>
      (instr(lit("0123456789abcdef"), substring(hex, i + 1, 1)) - 1).cast("long") *
        lit(1L << (4 * (7 - i)))
    }.reduce(_ + _) % 1000
  }

  /** Keep rows whose hash bucket < perMille (deterministic ~perMille/1000
    * sample; stratify by calling per stratum with different rates). */
  def sampleByHash(docs: DataFrame, idCol: String, perMille: Int): DataFrame =
    docs.withColumn("bucket", hashBucket(col(idCol)))
      .where(col("bucket") < perMille)

  /** Stratified deterministic sampling: per-stratum keep rates (perMille)
    * with a default for unlisted strata. Same md5 bucket as [[sampleByHash]],
    * so samples at different rates NEST (a doc kept at 100 perMille is kept
    * at every higher rate) and the assignment is SQL-reproducible. The rate
    * table is a literal CASE chain — tiny, no join, pure map-side filter;
    * at 100 TB a thousand-language rate map is still a single codegen'd
    * expression per row. Output keeps (bucket, rate) for auditability. */
  def sampleStratified(docs: DataFrame, idCol: String, stratumCol: String,
                       rates: Seq[(String, Int)],
                       defaultPerMille: Int): DataFrame = {
    val rateCol = rates.foldRight(lit(defaultPerMille): Column) {
      case ((k, v), acc) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.withColumn("bucket", hashBucket(col(idCol)))
      .withColumn("rate", rateCol)
      .where(col("bucket") < col("rate"))
  }

  /** Pack documents into token-budget shards: within each `langCol` group,
    * documents ordered by `idCol` are laid out back-to-back and a document
    * lands in shard floor(start_offset / budget) (assignment by start
    * offset, so every document has exactly one shard and shard boundaries
    * never split a document's tokens across budget accounting).
    *
    * Scale shape — a naive `sum over (partition by lang order by id)`
    * window is ONE task per language (a language can be terabytes). This
    * is the exact two-phase cumsum instead:
    *   1. range-partition by (lang, id); per-partition token totals are a
    *      tiny relation (partitions x langs rows);
    *   2. prefix offsets over that tiny relation (cheap window), broadcast
    *      back, local cumsum within each (lang, partition) slice + offset.
    * Parallelism = #partitions per language instead of 1, and the result
    * is independent of where the range boundaries fall. */
  def packShards(docs: DataFrame, idCol: String, tokCol: String,
                 langCol: String, budget: Long): DataFrame = {
    require(budget > 0)
    val parted = docs
      .select(col(idCol), col(langCol), col(tokCol).cast("long").as("__tok"))
      .repartitionByRange(col(langCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true) // pin slice assignment for the two phases
    val partTotals = parted.groupBy(col(langCol), col("__pid"))
      .agg(sum(col("__tok")).as("__ptot"))
    val wOff = Window.partitionBy(col(langCol)).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partTotals
      .withColumn("__off", coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
      .drop("__ptot")
    val wLoc = Window.partitionBy(col(langCol), col("__pid")).orderBy(col(idCol))
    // shard id by INTEGER division (DIV) on longs: exact at any cumulative
    // token count (a double floor-divide loses exactness past 2^53 — a
    // cliff this pipeline never needs to carry); offsets are non-negative
    // so DIV == floor division. The oracle mirrors with DuckDB `//`.
    parted.join(broadcast(offsets), Seq(langCol, "__pid"))
      .withColumn("__cum", sum(col("__tok")).over(wLoc) + col("__off"))
      .select(col(idCol), col(langCol), col("__tok").as("n_tokens"),
        expr(s"CAST((__cum - __tok) DIV ${budget}L AS INT)").as("shard"))
  }

  /** Cap over-represented keys (the C4/Dolma-style per-domain cap): keep
    * at most `cap` rows per `keyCol` value, chosen deterministically by
    * the md5 hash order (md5(id), id) — reproducible in SQL, identical at
    * any parallelism, and a uniform "random" subset of each key.
    *
    * Scale shape — the WIDE relation is never shuffled: winner selection
    * runs on a narrow (key, id, hash) projection (a columnar scan reads
    * just those columns, not the 100-TB payload); per-key counts find the
    * oversize keys; a window ranks ONLY the oversize subset of the narrow
    * relation and keeps each key's cap-th row as its threshold — ONE row
    * per capped key, a genuinely small relation. The wide rows then
    * left-join that broadcast threshold table on key and filter map-side:
    * keep when the key is uncapped or (hash, id) <= threshold
    * lexicographically (strict total order, so exactly `cap` survive).
    * A per-key-cap via one global window would sort the full corpus AND
    * serialize each mega key into one task; the anti-join alternative
    * shuffles the wide rows by id. Both are avoided. If the capped-key
    * dimension ever outgrows broadcast (~10M+ keys over cap), drop the
    * broadcast hint: a sort-merge threshold join costs one wide shuffle
    * but stays exact. */
  def capPerKey(docs: DataFrame, keyCol: String, idCol: String,
                cap: Int): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val h = md5(col(idCol).cast("string"))
    val narrow = docs.select(col(keyCol).as("__ck"), col(idCol).as("__cid"))
      .withColumn("__h", md5(col("__cid").cast("string")))
    val oversize = narrow.groupBy(col("__ck")).count()
      .where(col("count") > cap).select(col("__ck").as("__ok"))
    val w = Window.partitionBy(col("__ck")).orderBy(col("__h"), col("__cid"))
    // null-safe here too (round-6): an oversize NULL-key group must reach
    // the threshold table, or its rows escape the final filter
    val thresholds = narrow.join(oversize, col("__ck") <=> col("__ok"))
      .drop("__ok")
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === cap)
      .select(col("__ck"), col("__h").as("__th"), col("__cid").as("__tid"))
    // null-safe equality (round-6, r5 advice): a null-key group larger
    // than the cap was counted by the oversize/window stages but escaped
    // the cap entirely because === never matches null — <=> closes it
    docs.join(broadcast(thresholds), col(keyCol) <=> col("__ck"), "left")
      .where(col("__th").isNull ||
        h < col("__th") ||
        (h === col("__th") && col(idCol) <= col("__tid")))
      .drop("__ck", "__th", "__tid")
  }
}

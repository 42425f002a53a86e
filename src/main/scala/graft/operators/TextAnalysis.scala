package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline over a
 * `documents`-like relation: language-ID (marker-word heuristic), quality
 * scoring, token counting, and document fingerprinting. All counts are
 * exact integers (float ratios are derived, never oracle-compared).
 */
object TextAnalysis {

  /** Marker words per language for the n-gram/stopword language heuristic.
    * Deterministic and tiny by design; precision comes from the argmax
    * over ALL lists, ties broken by language code. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "la", "los", "que", "es", "una"),
    "it" -> Seq("il", "la", "che", "di", "non", "per"))

  /** Count of words from `list` present in the space-split text. */
  def markerHits(textCol: Column, list: Seq[String]): Column =
    markerHitsOnWords(split(textCol, " "), list)

  /** Same, over an already-split word array (so one split serves many
    * language counters). */
  def markerHitsOnWords(wordsCol: Column, list: Seq[String]): Column =
    size(filter(wordsCol, w => list.map(m => w === m).reduce(_ || _)))

  /** (doc rows) + lang_pred + per-language hit counts. Argmax across
    * languages, ties -> lexicographically smallest language code.
    * The text is split ONCE and the word array reused by all five hit
    * counters (round-4 advice: per-language re-splits were 5x the string
    * work for identical results). */
  def languageId(docs: DataFrame, textCol: String): DataFrame = {
    val langs = markers.keys.toSeq.sorted
    val withWords = docs.withColumn("__words", split(col(textCol), " "))
    val withHits = langs.foldLeft(withWords) { (df, l) =>
      df.withColumn(s"hits_$l", markerHitsOnWords(col("__words"), markers(l)))
    }.drop("__words")
    // argmax with deterministic tiebreak: sort (hits desc, lang asc)
    val best = array_sort(array(langs.map(l =>
      struct((lit(1000000) - col(s"hits_$l")).as("neg"), lit(l).as("lang"))): _*))
    withHits.withColumn("lang_pred", element_at(best, 1).getField("lang"))
  }

  /** Exact-integer quality metrics per document. */
  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      length(t).as("n_chars_m"),
      size(split(t, " ")).as("n_words"),
      (length(t) - length(regexp_replace(t, "[0-9]", ""))).as("n_digits"),
      (length(t) - length(regexp_replace(t, "[A-Z]", ""))).as("n_upper"),
      (length(t) - length(regexp_replace(t, "[.,;:!?]", ""))).as("n_punct"),
      size(array_distinct(split(t, " "))).as("n_distinct_words"))
  }

  /** Token counts: whitespace tokens and regex word tokens ([a-z0-9]+ over
    * the lowercased text — a BPE-ish pre-tokenizer's word splitter). */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), "\\s+")).as("n_ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)), lit("[a-z0-9]+"), lit(0)))
        .as("n_word_tokens"))

  /** Normalized-content fingerprint: md5 of (lowercase, non-alnum runs ->
    * single space, trimmed) text — catches formatting-only duplicates that
    * exact dedup misses. */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      md5(trim(regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " ")))
        .as("fingerprint"))

  /** Shift-robust rolling-hash sketch (graft.core.RollingHash winnowing):
    * per document, the k smallest w-char Rabin-Karp window hashes plus the
    * single min fingerprint. Sketch overlap >= threshold flags near-dups
    * even when content is shifted/prefixed (MinHash-over-words misses
    * character-level edits). Codegen Expressions, not UDFs — same codegen
    * discipline as the rest of the surface. */
  def rollingSketch(docs: DataFrame, idCol: String, textCol: String,
                    w: Int = 16, k: Int = 8): DataFrame =
    docs.select(col(idCol),
      graft.functions.RollingFunctions.rollingMinSketch(col(textCol), w, k).as("sketch"),
      graft.functions.RollingFunctions.rollingMinFingerprint(col(textCol), w).as("min_fp"))

  /** Boilerplate removal by document frequency (the C4-style curation
    * step): split each document on `delim` (a LITERAL, not regex), drop
    * every unit that appears in more than `maxDocFreq` distinct documents
    * (site chrome / legal footers / navigation when delim is a newline or
    * sentence break; df-pruned vocabulary when delim is a space), and
    * reassemble the survivors IN ORIGINAL ORDER with the same delimiter.
    * Documents whose every unit is boilerplate come back as ''.
    *
    * Scale shape: one hash agg for the df counts (partial+final; the unit
    * string is the shuffle key), the hot-unit set is vocabulary-sized —
    * broadcast anti join — and reassembly is one shuffle on doc id with
    * order restored by array_sort over (pos, unit), so the result is
    * independent of partitioning. */
  def removeBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                        delim: String, maxDocFreq: Long): DataFrame = {
    val units = docs.select(col(idCol),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(delim), -1)).as(Seq("pos", "unit")))
    val hot = units.groupBy(col("unit"))
      .agg(countDistinct(col(idCol)).as("df"))
      .where(col("df") > maxDocFreq)
      .select("unit")
    val kept = units.join(broadcast(hot), Seq("unit"), "left_anti")
    val reassembled = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("unit")))),
          x => x.getField("unit")), delim).as("clean_text"))
    docs.select(col(idCol)).join(reassembled, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** PII redaction (the Dolma-style scrub pass): emails, IPv4 addresses
    * and phone-shaped digit runs replaced by typed tokens, in that order
    * (IP before phone, or the phone pattern would eat dotted quads).
    * Pure per-row regexp_replace chain — codegen'd built-ins, no UDF, no
    * shuffle; the patterns stay inside the RE2 AND java.util.regex common
    * subset (char classes, bounded repeats, ASCII \b) so the DuckDB
    * oracle runs the SAME patterns under a DIFFERENT regex engine and
    * must produce identical output. */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "[IP]")
    regexp_replace(ip,
      "\\+?[0-9][0-9 ()-]{7,}[0-9]", "[PHONE]")
  }

  /** Cross-document exact unit dedup (Dolma's dedupe-paragraphs shape):
    * of every REPEATED unit (paragraph / line / sentence — any literal
    * delimiter), only the globally FIRST occurrence survives, defined as
    * the lexicographic minimum (doc_id, pos) — deterministic at any
    * parallelism. Unique units pass through; empty units are structure
    * (blank lines) and always survive. Documents losing every unit stay
    * in the output with empty text, same as [[removeBoilerplate]].
    *
    * Scale shape: the exploded unit relation shuffles keyed on md5(unit)
    * (a fixed-width key — the unit text itself can be kilobytes), the
    * first-occurrence table carries ONLY repeated units (n > 1), and
    * reassembly is the one per-doc wide shuffle shared with the
    * boilerplate op. The repeated-unit dimension is corpus-sized in the
    * worst case, so its join is left to AQE rather than broadcast. */
  def dedupUnits(docs: DataFrame, idCol: String, textCol: String,
                 delim: String): DataFrame = {
    // round-6 (r5 advice): coalesce null text to '' so null-text documents
    // keep their one empty unit and stay in the output (posexplode of a
    // null split array emits zero rows, which silently dropped the doc —
    // diverging from the oracle's LEFT JOIN back to documents)
    val units = docs.select(col(idCol),
        posexplode(split(coalesce(col(textCol), lit("")),
          java.util.regex.Pattern.quote(delim), -1)).as(Seq("pos", "unit")))
    val firsts = units.where(col("unit") =!= "")
      .groupBy(md5(col("unit")).as("h"))
      .agg(min(struct(col(idCol).as("fid"), col("pos").as("fpos")))
        .as("first"), count("*").as("n"))
      .where(col("n") > 1)
      .select("h", "first")
    val marked = units.join(firsts, md5(col("unit")) === col("h"), "left")
      .withColumn("keep", col("first").isNull ||
        (col(idCol) === col("first.fid") && col("pos") === col("first.fpos")))
    marked.groupBy(col(idCol))
      .agg(array_join(
        transform(
          filter(array_sort(collect_list(
            struct(col("pos"), col("unit"), col("keep")))),
            x => x.getField("keep")),
          x => x.getField("unit")), delim).as("clean_text"))
  }

  /** Per-language top-k terms by DOCUMENT frequency (the corpus-statistics
    * op behind stopword lists and TF-IDF vocabularies). Distinct words per
    * doc first (array_distinct before explode: a word counts once per doc),
    * then (lang, word) count — partial+final hash agg, shuffle keyed on the
    * word — then a per-lang top-k window over the already-aggregated (tiny)
    * relation. Deterministic ties: (df desc, word asc). */
  def topTerms(docs: DataFrame, langCol: String, textCol: String,
               k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(langCol))
      .orderBy(col("df").desc, col("word"))
    docs.select(col(langCol),
        explode(array_distinct(split(col(textCol), " "))).as("word"))
      .groupBy(col(langCol), col("word"))
      .agg(count("*").as("df"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Exploded (id, h) sketch rows, MATERIALIZED once (localCheckpoint) —
    * the shared input of pair generation and the overflow side output,
    * exactly Dedup.minhashBanded's role for the MinHash family. */
  def rollingHashes(docs: DataFrame, idCol: String, textCol: String,
                    w: Int = 16, k: Int = 8): DataFrame =
    rollingSketch(docs, idCol, textCol, w, k)
      .select(col(idCol), explode(col("sketch")).as("h"))
      .localCheckpoint(true)

  /** Candidate near-dup pairs by shared sketch hashes (explode + self-join
    * on the hash — bucket-local, the scale path). The exploded sketch is
    * materialized once so the hash scan isn't recomputed on both join sides.
    *
    * `maxBucket` caps the per-hash bucket before the self-join: one window
    * hash shared by n documents (site chrome, repeated boilerplate —
    * exactly what a CC-scale corpus contains) would otherwise emit n²
    * candidate rows before the groupBy. Oversize buckets emit NO pairs and
    * are routed through [[rollingOverflowHashes]] instead — the same
    * cap-plus-side-output contract as Dedup.candidatePairsFromBanded. */
  def rollingNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          w: Int = 16, k: Int = 8, minShared: Int = 2,
                          maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    rollingPairsFromHashes(rollingHashes(docs, idCol, textCol, w, k),
      idCol, minShared, maxBucket)

  /** Pair generation from an already-materialized [[rollingHashes]]
    * relation — the entry point when pairs + overflow share one sketch
    * computation. */
  def rollingPairsFromHashes(hashes: DataFrame, idCol: String,
                             minShared: Int = 2,
                             maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    // oversize buckets dropped via the shared broadcast-anti shape (see
    // Dedup.dropOversize for the A/B vs the window form)
    val capped = Dedup.dropOversize(hashes, Seq("h"), maxBucket)
    capped.as("a").join(capped.as("b"),
        col("a.h") === col("b.h") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count("*").as("shared"))
      .where(col("shared") >= minShared)
  }

  /** Side output for the cap: (h, n) rows whose hash bucket exceeded
    * `maxBucket` and was excluded from pair generation — routed, never
    * silently dropped. */
  def rollingOverflowHashes(docs: DataFrame, idCol: String, textCol: String,
                            w: Int = 16, k: Int = 8,
                            maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    rollingOverflowFromHashes(rollingHashes(docs, idCol, textCol, w, k), maxBucket)

  /** Overflow side output from an already-materialized hashes relation. */
  def rollingOverflowFromHashes(hashes: DataFrame,
                                maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    hashes.groupBy(col("h")).agg(count("*").as("n"))
      .where(col("n") > maxBucket)
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity, TextAnalysis}

/**
 * Training-data pipeline operators as driver-checkable queries:
 * deduplication (exact / MinHash+LSH / SimHash / n-gram Jaccard),
 * similarity search over embeddings (brute-force + LSH-bucketed, exact
 * quantized scoring), and text analysis (language-ID, quality, tokens,
 * fingerprints). documents has no exact duplicates at small sf, so dedup
 * queries add deterministic copies (doc_id % 10 == 0 shifted by 1e6).
 */
object TextQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // dup-injected corpus + minhash oracle fragments shared across the
  // dedup query family (and with CurationQueries): queries/TextFixtures
  import TextFixtures.{dupDocs, dupDocsSql, minhashSqlExpr}

  private val qvSql =
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT))"

  private def lshPlaneSql(dim: Int, j: Int): String =
    (0 until dim).map(i => if ((i * 31 + j * 17) % 7 < 3) "1" else "-1")
      .mkString("[", ",", "]")

  private def lshBucketSql(dim: Int, planes: Int): String =
    (0 until planes).map { j =>
      s"""CASE WHEN CAST(list_sum(list_transform(
         |  list_zip(${qvSql}, ${lshPlaneSql(dim, j)}), p -> p[1]*p[2]))
         |  AS BIGINT) > 0 THEN ${1L << j} ELSE 0 END""".stripMargin
    }.mkString("(", " + ", ")")

  private def simhashBitsSql(bits: Int): (String, String) = {
    val sums = (0 until bits).map { b =>
      val pos = b / 4 + 1
      val sh = 3 - b % 4
      s"sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, $pos, 1)) - 1) >> $sh) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
    }.mkString(", ")
    val fp = (0 until bits).map(b =>
      s"CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    (sums, fp)
  }

  // DuckDB mirror of graft.core.RollingHash: per-window Rabin-Karp hash
  // mod 2^61-1 via HUGEINT arithmetic with precomputed power-of-257
  // literals (sum of w terms < 2^81 fits HUGEINT; one mod at the end).
  private def rollingPowList(w: Int): String = {
    val m = (BigInt(1) << 61) - 1
    (0 until w).map(p => s"CAST(${BigInt(257).modPow(BigInt(w - 1 - p), m)} AS HUGEINT)")
      .mkString("[", ",", "]")
  }
  /** Window-hash CTEs over a `docs(doc_id, text)` relation (text length
    * always >= w on these fixtures): wins -> one row per w-char window,
    * hh -> (doc_id, h BIGINT). Single-line fragments (stripMargin safety). */
  private def rollingHashCtes(w: Int): String =
    s"wins AS (SELECT doc_id, unnest([substr(text, i+1, $w) for i in range(0, len(text)-$w+1)]) AS win FROM docs), " +
    s"hh AS (SELECT doc_id, CAST(mod(list_sum(list_transform(range(0,$w), " +
    s"p -> CAST(unicode(substr(win, CAST(p AS INT)+1, 1)) AS HUGEINT) * (${rollingPowList(w)})[CAST(p AS INT)+1])), " +
    s"CAST(2305843009213693951 AS HUGEINT)) AS BIGINT) AS h FROM wins)"

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql("q_text_rolling_sketch",
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |${rollingHashCtes(16)},
         |dh AS (SELECT DISTINCT doc_id, h FROM hh),
         |ranked AS (SELECT doc_id, h,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM dh)
         |SELECT doc_id, CAST(rn - 1 AS INT) AS pos, h
         |FROM ranked WHERE rn <= 8""".stripMargin) { (s, d) =>
      TextAnalysis.rollingSketch(t(s, d, "documents"), "doc_id", "text",
          w = 16, k = 8)
        .select(col("doc_id"), posexplode(col("sketch")))
        .select(col("doc_id"), col("pos"), col("col").as("h"))
    },

    QueryDef.sql("q_text_rolling_fp",
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |${rollingHashCtes(16)}
         |SELECT doc_id, min(h) AS min_fp FROM hh GROUP BY doc_id""".stripMargin) { (s, d) =>
      TextAnalysis.rollingSketch(t(s, d, "documents"), "doc_id", "text",
          w = 16, k = 8)
        .select(col("doc_id"), col("min_fp"))
    },

    QueryDef.sql("q_dup_rolling_pairs",
      s"""WITH docs AS ($dupDocsSql),
         |${rollingHashCtes(16)},
         |dh AS (SELECT DISTINCT doc_id, h FROM hh),
         |ranked AS (SELECT doc_id, h,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM dh),
         |sk AS (SELECT doc_id, h FROM ranked WHERE rn <= 8),
         |capped AS (SELECT doc_id, h FROM (
         |  SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS bn FROM sk)
         |  WHERE bn <= ${graft.operators.Dedup.DefaultMaxBucket})
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  CAST(count(*) AS BIGINT) AS shared
         |FROM capped a JOIN capped b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin) { (s, d) =>
      // bucket-capped like the MinHash arm (K3): a window hash shared by n
      // docs emits no pairs past the cap, routed to the overflow query below
      TextAnalysis.rollingPairsFromHashes(TextFixtures.rollingCached(s, d),
        "doc_id", minShared = 2)
    },

    QueryDef.sql("q_dup_rolling_overflow",
      s"""WITH docs AS ($dupDocsSql),
         |${rollingHashCtes(16)},
         |dh AS (SELECT DISTINCT doc_id, h FROM hh),
         |ranked AS (SELECT doc_id, h,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn FROM dh),
         |sk AS (SELECT doc_id, h FROM ranked WHERE rn <= 8)
         |SELECT h, CAST(count(*) AS BIGINT) AS n
         |FROM sk GROUP BY h HAVING count(*) > 2""".stripMargin) { (s, d) =>
      // the degenerate-bucket side output (cap 2 so small sf visibly
      // exercises the overflow path; production default is DefaultMaxBucket)
      TextAnalysis.rollingOverflowFromHashes(TextFixtures.rollingCached(s, d),
        maxBucket = 2)
    },

    QueryDef.sql("q_dup_exact",
      s"""WITH docs AS ($dupDocsSql)
         |SELECT md5(text) AS text_md5, CAST(min(doc_id) AS BIGINT) AS rep_id,
         |  CAST(count(*) AS BIGINT) AS n
         |FROM docs GROUP BY 1 HAVING count(*) > 1""".stripMargin) { (s, d) =>
      Dedup.exact(dupDocs(s, d))
    },

    QueryDef.sql("q_dup_minhash_sig",
      s"""SELECT doc_id,
         |  ${minhashSqlExpr(0)} AS mh0, ${minhashSqlExpr(1)} AS mh1,
         |  ${minhashSqlExpr(2)} AS mh2, ${minhashSqlExpr(3)} AS mh3
         |FROM documents""".stripMargin) { (s, d) =>
      Dedup.minhashSignatures(t(s, d, "documents"), "doc_id", "text",
        w = 3, numHashes = 4)
    },

    QueryDef.sql("q_dup_minhash_pairs",
      s"""WITH docs AS ($dupDocsSql),
         |sigs AS (SELECT doc_id,
         |  ${minhashSqlExpr(0)} AS mh0, ${minhashSqlExpr(1)} AS mh1,
         |  ${minhashSqlExpr(2)} AS mh2, ${minhashSqlExpr(3)} AS mh3
         |  FROM (SELECT doc_id, text FROM docs) _),
         |banded AS (
         |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS bucket FROM sigs
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, md5(mh2 || '|' || mh3) AS bucket FROM sigs),
         |capped AS (SELECT * FROM (
         |  SELECT doc_id, band, bucket,
         |    count(*) OVER (PARTITION BY band, bucket) AS bn FROM banded)
         |  WHERE bn <= ${Dedup.DefaultMaxBucket})
         |SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |FROM capped l JOIN capped r
         |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id""".stripMargin) { (s, d) =>
      Dedup.candidatePairsFromBanded(TextFixtures.bandedCached(s, d), "doc_id")
    },

    QueryDef.sql("q_dup_minhash_overflow",
      s"""WITH docs AS ($dupDocsSql),
         |sigs AS (SELECT doc_id,
         |  ${minhashSqlExpr(0)} AS mh0, ${minhashSqlExpr(1)} AS mh1,
         |  ${minhashSqlExpr(2)} AS mh2, ${minhashSqlExpr(3)} AS mh3
         |  FROM (SELECT doc_id, text FROM docs) _),
         |banded AS (
         |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS bucket FROM sigs
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, md5(mh2 || '|' || mh3) AS bucket FROM sigs)
         |SELECT CAST(band AS INT) AS band, bucket, CAST(count(*) AS BIGINT) AS n
         |FROM banded GROUP BY 1, 2 HAVING count(*) > 2""".stripMargin) { (s, d) =>
      // the degenerate-bucket side output (cap 2 here so small sf visibly
      // exercises the overflow path; production default is DefaultMaxBucket)
      Dedup.overflowFromBanded(TextFixtures.bandedCached(s, d), maxBucket = 2)
    },

    QueryDef.sql("q_dup_incremental",
      s"""WITH docs AS ($dupDocsSql),
         |${TextFixtures.bandedSqlCtes},
         |nb AS (SELECT * FROM banded WHERE NOT (doc_id < 1000000 AND doc_id % 2 = 0)),
         |rb AS (SELECT * FROM banded WHERE doc_id < 1000000 AND doc_id % 2 = 0),
         |nc AS (SELECT doc_id, band, bucket FROM (
         |  SELECT doc_id, band, bucket,
         |    count(*) OVER (PARTITION BY band, bucket) AS bn FROM nb)
         |  WHERE bn <= ${Dedup.DefaultMaxBucket}),
         |rc AS (SELECT doc_id, band, bucket FROM (
         |  SELECT doc_id, band, bucket,
         |    count(*) OVER (PARTITION BY band, bucket) AS bn FROM rb)
         |  WHERE bn <= ${Dedup.DefaultMaxBucket})
         |SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id
         |FROM nc n JOIN rc r
         |  ON n.band = r.band AND n.bucket = r.bucket""".stripMargin) { (s, d) =>
      // the crawl-cycle shape: even base docs are the kept REFERENCE
      // corpus, everything else (odd docs + injected copies) is the NEW
      // crawl — candidates are NEW x REF only, never ref x ref
      val banded = TextFixtures.bandedCached(s, d)
      val isRef = col("doc_id") < 1000000 && col("doc_id") % 2 === 0
      Dedup.incrementalPairsFromBanded(
        banded.where(!isRef), banded.where(isRef), "doc_id")
    },

    QueryDef.sql("q_dup_keep_novel",
      s"""WITH docs AS ($dupDocsSql),
         |${TextFixtures.bandedSqlCtes},
         |nb AS (SELECT * FROM banded WHERE NOT (doc_id < 1000000 AND doc_id % 2 = 0)),
         |rb AS (SELECT * FROM banded WHERE doc_id < 1000000 AND doc_id % 2 = 0),
         |nc AS (SELECT doc_id, band, bucket FROM (
         |  SELECT doc_id, band, bucket,
         |    count(*) OVER (PARTITION BY band, bucket) AS bn FROM nb)
         |  WHERE bn <= ${Dedup.DefaultMaxBucket}),
         |rc AS (SELECT doc_id, band, bucket FROM (
         |  SELECT doc_id, band, bucket,
         |    count(*) OVER (PARTITION BY band, bucket) AS bn FROM rb)
         |  WHERE bn <= ${Dedup.DefaultMaxBucket}),
         |pairs AS (SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id
         |  FROM nc n JOIN rc r ON n.band = r.band AND n.bucket = r.bucket)
         |SELECT doc_id FROM docs
         |WHERE NOT (doc_id < 1000000 AND doc_id % 2 = 0)
         |  AND doc_id NOT IN (SELECT new_id FROM pairs)""".stripMargin) { (s, d) =>
      val banded = TextFixtures.bandedCached(s, d)
      val isRef = col("doc_id") < 1000000 && col("doc_id") % 2 === 0
      val pairs = Dedup.incrementalPairsFromBanded(
        banded.where(!isRef), banded.where(isRef), "doc_id")
      Dedup.keepNovel(dupDocs(s, d).where(!isRef), "doc_id", pairs)
        .select("doc_id")
    },

    QueryDef.sql("q_dup_simhash", {
      val (sums, fp) = simhashBitsSql(16)
      s"""WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |hh AS (SELECT doc_id, md5(w) AS h FROM words),
         |sums AS (SELECT doc_id, $sums FROM hh GROUP BY doc_id)
         |SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM sums""".stripMargin
    }) { (s, d) =>
      Dedup.simhash(t(s, d, "documents"), "doc_id", "text", bits = 16)
    },

    QueryDef.sql("q_dup_ngram_jaccard",
      s"""WITH docs AS ($dupDocsSql),
         |sigs AS (SELECT doc_id,
         |  ${minhashSqlExpr(0)} AS mh0, ${minhashSqlExpr(1)} AS mh1,
         |  ${minhashSqlExpr(2)} AS mh2, ${minhashSqlExpr(3)} AS mh3
         |  FROM (SELECT doc_id, text FROM docs) _),
         |banded AS (
         |  SELECT doc_id, 0 AS band, md5(mh0 || '|' || mh1) AS bucket FROM sigs
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, md5(mh2 || '|' || mh3) AS bucket FROM sigs),
         |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |  FROM banded l JOIN banded r
         |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
         |g AS (SELECT doc_id,
         |  list_distinct([substr(text, i+1, 3) for i in range(0, greatest(len(text)-3, 0) + 1)]) AS gs
         |  FROM docs)
         |SELECT p.id_a, p.id_b,
         |  CAST(len(list_intersect(a.gs, b.gs)) AS INT) AS inter,
         |  CAST(len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)) AS INT) AS uni
         |FROM pairs p JOIN g a ON p.id_a = a.doc_id JOIN g b ON p.id_b = b.doc_id""".stripMargin) { (s, d) =>
      // verifier shape: candidates come from the sub-quadratic LSH blocker,
      // NEVER from (lang, n_chars) self-blocking (quadratic on popular blocks)
      val cands = Dedup.candidatePairsFromBanded(
        TextFixtures.bandedCached(s, d), "doc_id")
      Dedup.ngramJaccardVerify(cands, dupDocs(s, d), "doc_id", "text", n = 3)
    },

    QueryDef.sql("q_dup_embedding",
      s"""WITH q AS (SELECT vec_id, $qvSql AS qv,
         |  CAST(${lshBucketSql(64, 8)} AS BIGINT) AS bucket FROM embeddings)
         |SELECT * FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CAST(list_sum(list_transform(list_zip(a.qv, b.qv), p -> p[1]*p[2]))
         |      AS BIGINT) AS score
         |  FROM q a JOIN q b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE score > 200000""".stripMargin) { (s, d) =>
      // embedding-cosine near-dup, the 100 TB shape: candidate pairs are
      // BUCKET-LOCAL (LSH hyperplane buckets — the self-join key), exact
      // quantized rescoring inside buckets only, and a threshold that
      // actually discriminates (~top 10% of same-bucket pairs at sf0.1,
      // vs the old all-pairs plan whose filter passed 100% of pairs).
      // localCheckpoint: quantize+bucket computed once, not inlined into
      // both sides of the self-join (codegen size + work duplication).
      val q = t(s, d, "embeddings").select(col("vec_id"),
        Similarity.quantized(col("embedding")).as("qv"),
        Similarity.lshBucket(col("embedding"), dim = 64, planes = 8).as("bucket"))
        .localCheckpoint(true)
      q.as("a").join(q.as("b"), col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          Similarity.qdot(col("a.qv"), col("b.qv")).as("score"))
        .where(col("score") > 200000)
    },

    QueryDef.sql("q_sim_topk",
      s"""WITH q AS (SELECT vec_id AS qid, $qvSql AS qv FROM embeddings
         |           WHERE vec_id % 97 = 0),
         |c AS (SELECT vec_id AS nid, $qvSql AS nv FROM embeddings),
         |scored AS (
         |  SELECT qid, nid,
         |    CAST(list_sum(list_transform(list_zip(qv, nv), p -> p[1]*p[2]))
         |      AS BIGINT) AS score
         |  FROM q JOIN c ON qid != nid),
         |ranked AS (SELECT qid, nid, score,
         |  row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rank
         |  FROM scored)
         |SELECT qid, rank, nid, score FROM ranked WHERE rank <= 5""".stripMargin) { (s, d) =>
      val emb = t(s, d, "embeddings")
      Similarity.bruteForceTopK(emb.where(col("vec_id") % 97 === 0), emb,
        "vec_id", "embedding", k = 5)
    },

    QueryDef.sql("q_sim_lsh_bucket",
      s"""SELECT vec_id, CAST(${lshBucketSql(64, 8)} AS BIGINT) AS bucket
         |FROM embeddings""".stripMargin) { (s, d) =>
      t(s, d, "embeddings").select(col("vec_id"),
        Similarity.lshBucket(col("embedding"), dim = 64, planes = 8).as("bucket"))
    },

    QueryDef.sql("q_sim_ivf_topk",
      s"""WITH cents AS (SELECT vec_id AS cent_id, $qvSql AS cv
         |  FROM embeddings WHERE vec_id % 25 = 0),
         |corp AS (SELECT vec_id AS nid, $qvSql AS nv FROM embeddings),
         |corpassign AS (SELECT nid, nv, cent_id FROM (
         |  SELECT corp.nid, corp.nv, cents.cent_id, row_number() OVER (
         |    PARTITION BY nid ORDER BY
         |    CAST(list_sum(list_transform(list_zip(nv, cv), x -> x[1]*x[2])) AS BIGINT) DESC,
         |    cent_id) AS crank
         |  FROM corp CROSS JOIN cents) WHERE crank = 1),
         |q AS (SELECT vec_id AS qid, $qvSql AS qv FROM embeddings
         |  WHERE vec_id % 97 = 0),
         |qprobe AS (SELECT qid, qv, cent_id FROM (
         |  SELECT q.qid, q.qv, cents.cent_id, row_number() OVER (
         |    PARTITION BY qid ORDER BY
         |    CAST(list_sum(list_transform(list_zip(qv, cv), x -> x[1]*x[2])) AS BIGINT) DESC,
         |    cent_id) AS crank
         |  FROM q CROSS JOIN cents) WHERE crank <= 6),
         |scored AS (SELECT p.qid, c.nid,
         |  CAST(list_sum(list_transform(list_zip(p.qv, c.nv), x -> x[1]*x[2])) AS BIGINT) AS score
         |  FROM qprobe p JOIN corpassign c ON p.cent_id = c.cent_id AND p.qid != c.nid),
         |ranked AS (SELECT qid, nid, score, row_number() OVER (
         |  PARTITION BY qid ORDER BY score DESC, nid) AS rank FROM scored)
         |SELECT qid, rank, nid, score FROM ranked WHERE rank <= 5""".stripMargin) { (s, d) =>
      // IVF-flat ANN (coarse quantizer + probed inverted lists). The
      // operator is deterministic end-to-end (fixed centroids, quantized
      // integer scores, id tie-breaks), so the full DuckDB oracle applies —
      // approximation only means recall != brute force, not nondeterminism.
      val emb = t(s, d, "embeddings")
      Similarity.ivfTopK(emb.where(col("vec_id") % 97 === 0), emb,
        "vec_id", "embedding", k = 5, centroidEvery = 25, nprobe = 6)
    },

    QueryDef.sql("q_sim_lsh_topk", {
      val probeList = ("qbucket" +: (0 until 8).map(j =>
        s"xor(qbucket, ${1L << j})")).mkString("[", ", ", "]")
      s"""WITH c AS (SELECT vec_id AS nid, $qvSql AS nv,
         |  CAST(${lshBucketSql(64, 8)} AS BIGINT) AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS qid, $qvSql AS qv,
         |  CAST(${lshBucketSql(64, 8)} AS BIGINT) AS qbucket FROM embeddings
         |  WHERE vec_id % 97 = 0),
         |probes AS (SELECT qid, qv, unnest($probeList) AS bucket FROM q),
         |scored AS (SELECT DISTINCT p.qid, c.nid,
         |  CAST(list_sum(list_transform(list_zip(p.qv, c.nv), x -> x[1]*x[2])) AS BIGINT) AS score
         |  FROM probes p JOIN c ON p.bucket = c.bucket AND p.qid != c.nid),
         |ranked AS (SELECT qid, nid, score, row_number() OVER (
         |  PARTITION BY qid ORDER BY score DESC, nid) AS rank FROM scored)
         |SELECT qid, rank, nid, score FROM ranked WHERE rank <= 5""".stripMargin
    }) { (s, d) =>
      // Multiprobe LSH ANN: bucket-local candidates (Hamming<=1 probes) +
      // exact quantized rescoring. Deterministic end-to-end, hence fully
      // oracle-checked; recall vs brute force is asserted in KnnSpec.
      val emb = t(s, d, "embeddings")
      Similarity.lshTopK(emb.where(col("vec_id") % 97 === 0), emb,
        "vec_id", "embedding", k = 5, dim = 64, planes = 8)
    },

    QueryDef.sql("q_text_langid", {
      val perLang = TextAnalysis.markers.toSeq.sortBy(_._1).map { case (l, ws) =>
        val lst = ws.mkString("['", "','", "']")
        s"""SELECT doc_id, '$l' AS cand,
           |  len(list_filter(string_split(text, ' '),
           |      w -> list_contains($lst, w))) AS n_hits
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH hits AS (
         |$perLang),
         |ranked AS (SELECT doc_id, cand, n_hits,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY n_hits DESC, cand) AS rn
         |  FROM hits)
         |SELECT doc_id, cand AS lang_pred, CAST(n_hits AS INT) AS hits
         |FROM ranked WHERE rn = 1""".stripMargin
    }) { (s, d) =>
      val langs = TextAnalysis.markers.keys.toSeq.sorted
      val scored = TextAnalysis.languageId(t(s, d, "documents"), "text")
      scored.select(col("doc_id"), col("lang_pred"),
        greatest(langs.map(l => col(s"hits_$l")): _*).as("hits"))
    },

    QueryDef.sql("q_text_quality",
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_m,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS INT) AS n_digits,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS INT) AS n_upper,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_words
        |FROM documents""".stripMargin) { (s, d) =>
      TextAnalysis.quality(t(s, d, "documents"), "doc_id", "text")
    },

    QueryDef.sql("q_text_tokens",
      """SELECT doc_id,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_word_tokens
        |FROM documents""".stripMargin) { (s, d) =>
      TextAnalysis.tokens(t(s, d, "documents"), "doc_id", "text")
    },

    QueryDef.sql("q_text_topterms",
      """WITH words AS (SELECT lang,
        |  unnest(list_distinct(string_split(text, ' '))) AS word
        |  FROM documents),
        |df AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS df
        |  FROM words GROUP BY 1, 2),
        |ranked AS (SELECT lang, word, df,
        |  row_number() OVER (PARTITION BY lang ORDER BY df DESC, word) AS rank
        |  FROM df)
        |SELECT lang, word, df, rank FROM ranked WHERE rank <= 10""".stripMargin) { (s, d) =>
      TextAnalysis.topTerms(t(s, d, "documents"), "lang", "text", k = 10)
        .select(col("lang"), col("word"), col("df"), col("rank"))
    },

    QueryDef.sql("q_text_boilerplate",
      """WITH parts AS (SELECT doc_id, string_split(text, ' ') AS p FROM documents),
        |l AS (SELECT doc_id, u.pos AS pos, u.unit AS unit
        |  FROM (SELECT doc_id,
        |          unnest([{'pos': i, 'unit': p[i+1]} for i in range(0, len(p))]) AS u
        |        FROM parts) _),
        |hot AS (SELECT unit FROM l GROUP BY unit
        |  HAVING count(DISTINCT doc_id) > 400),
        |kept AS (SELECT * FROM l WHERE unit NOT IN (SELECT unit FROM hot))
        |SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN (
        |  SELECT doc_id, array_to_string(list(unit ORDER BY pos), ' ') AS clean_text
        |  FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin) { (s, d) =>
      // C4-style boilerplate removal: units present in > maxDocFreq
      // distinct docs are dropped, survivors rejoin in original order
      // (space-delimited here — the fixture has no sentence breaks; the
      // operator takes any literal delimiter)
      TextAnalysis.removeBoilerplate(t(s, d, "documents"),
        "doc_id", "text", delim = " ", maxDocFreq = 400L)
    },

    QueryDef.sql("q_text_redact",
      // construction-based PII oracle (the B2/B3 pattern): the engine
      // builds a text with emails/IPs/phones derived from known columns
      // and redacts with java.util.regex; DuckDB builds the same string
      // and runs the SAME patterns under RE2 — two regex engines must
      // agree byte-for-byte (patterns stay in the common subset)
      """WITH pii AS (SELECT doc_id,
        |  substr(text, 1, 40) || ' mail user' || CAST(doc_id AS VARCHAR) ||
        |  '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org or host 10.0.' ||
        |  CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ||
        |  ' tel +1 415 ' || CAST(doc_id % 900 + 100 AS VARCHAR) || ' ' ||
        |  CAST(doc_id % 9000 + 1000 AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
        |    '\+?[0-9][0-9 ()-]{7,}[0-9]', '[PHONE]', 'g') AS clean
        |FROM pii""".stripMargin) { (s, d) =>
      val pii = concat(
        substring(col("text"), 1, 40), lit(" mail user"),
        col("doc_id").cast("string"), lit("@ex"),
        (col("doc_id") % 7).cast("string"), lit(".org or host 10.0."),
        (col("doc_id") % 256).cast("string"), lit("."),
        (col("doc_id") % 100).cast("string"), lit(" tel +1 415 "),
        (col("doc_id") % 900 + 100).cast("string"), lit(" "),
        (col("doc_id") % 9000 + 1000).cast("string"))
      t(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.redactPii(pii).as("clean"))
    },

    QueryDef.sql("q_text_dedup_paras",
      // Dolma-style cross-document unit dedup: the globally first
      // occurrence (min doc_id, pos) of each repeated unit survives; the
      // oracle uses a different algorithm (global window rk=1) than the
      // engine's repeated-units-only first table — same rows is the proof
      """WITH parts AS (SELECT doc_id, string_split(text, ' ') AS p FROM documents),
        |l AS (SELECT doc_id, u.pos AS pos, u.unit AS unit
        |  FROM (SELECT doc_id,
        |          unnest([{'pos': i, 'unit': p[i+1]} for i in range(0, len(p))]) AS u
        |        FROM parts) _),
        |r AS (SELECT doc_id, pos, unit,
        |        row_number() OVER (PARTITION BY unit ORDER BY doc_id, pos) AS rk
        |      FROM l WHERE unit <> ''),
        |kept AS (SELECT doc_id, pos, unit FROM r WHERE rk = 1
        |         UNION ALL SELECT doc_id, pos, unit FROM l WHERE unit = '')
        |SELECT d.doc_id, coalesce(k.clean_text, '') AS clean_text
        |FROM documents d LEFT JOIN (
        |  SELECT doc_id, array_to_string(list(unit ORDER BY pos), ' ') AS clean_text
        |  FROM kept GROUP BY doc_id) k USING (doc_id)""".stripMargin) { (s, d) =>
      TextAnalysis.dedupUnits(t(s, d, "documents"), "doc_id", "text",
        delim = " ")
    },

    QueryDef.sql("q_text_fingerprint",
      """SELECT doc_id,
        |  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
        |FROM documents""".stripMargin) { (s, d) =>
      TextAnalysis.fingerprint(t(s, d, "documents"), "doc_id", "text")
    })
}

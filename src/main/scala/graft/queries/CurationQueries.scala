package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Curation + cluster-assignment driver queries (exact DuckDB oracles). */
object CurationQueries {

  // DuckDB mirror of Curation.hashBucket (first 8 md5 nibbles mod 1000)
  private def hashBucketSql(idExpr: String): String =
    (0 until 8).map { i =>
      s"(strpos('0123456789abcdef', substr(md5(CAST($idExpr AS VARCHAR)), ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}"
    }.mkString("((", " + ", ") % 1000)")

  // dup-injected corpus + minhash oracle fragments: queries/TextFixtures
  import TextFixtures.{bandedSqlCtes, dupDocsSql, minhashSqlExpr}

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql("q_cur_sample", {
      s"""SELECT doc_id, lang, ${hashBucketSql("doc_id")} AS bucket
         |FROM documents
         |WHERE ${hashBucketSql("doc_id")} < 200""".stripMargin
    }) { (s, d) =>
      Curation.sampleByHash(
        s.read.parquet(s"$d/documents.parquet").select("doc_id", "lang"),
        "doc_id", perMille = 200)
    },

    QueryDef.sql("q_cur_domain_cap",
      // per-domain cap (C4/Dolma-style): a derived skewed key makes one
      // mega domain plus the per-source tail, so the capped and uncapped
      // branches both carry rows at every sf. The oracle is a DIFFERENT
      // algorithm (one global window + QUALIFY) than the engine's
      // threshold construction — same rows is the proof.
      """SELECT doc_id, key, n_chars FROM (
        |  SELECT doc_id, n_chars,
        |    CASE WHEN doc_id % 10 < 5 THEN 'mega' ELSE source END AS key,
        |    row_number() OVER (
        |      PARTITION BY (CASE WHEN doc_id % 10 < 5 THEN 'mega' ELSE source END)
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 30""".stripMargin) { (s, d) =>
      val docs = s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"),
          when(col("doc_id") % 10 < 5, lit("mega")).otherwise(col("source"))
            .as("key"),
          col("n_chars"))
      Curation.capPerKey(docs, "key", "doc_id", cap = 30)
        .select("doc_id", "key", "n_chars")
    },

    QueryDef.sql("q_cur_shards",
      """WITH t AS (SELECT doc_id, lang,
        |  CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (SELECT doc_id, lang, n,
        |  sum(n) OVER (PARTITION BY lang ORDER BY doc_id) AS cum FROM t)
        |SELECT doc_id, lang, n AS n_tokens,
        |  CAST((cum - n) // 2000 AS INT) AS shard
        |FROM c""".stripMargin) { (s, d) =>
      // two-phase distributed cumsum == the one-window SQL semantics
      val docs = s.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), "\\s+")).as("n_tok"))
      Curation.packShards(docs, "doc_id", "n_tok", "lang", budget = 2000L)
    },

    QueryDef.sql("q_cur_sample_strat", {
      val b = hashBucketSql("doc_id")
      val rate = "CASE WHEN lang = 'it' THEN 500 WHEN lang = 'en' THEN 100 ELSE 50 END"
      s"""SELECT doc_id, lang, $b AS bucket, $rate AS rate
         |FROM documents
         |WHERE $b < $rate""".stripMargin
    }) { (s, d) =>
      // per-stratum rates over the same md5 bucket as q_cur_sample, so the
      // strata nest monotonically (rate-100 sample ⊂ rate-500 sample)
      Curation.sampleStratified(
        s.read.parquet(s"$d/documents.parquet").select("doc_id", "lang"),
        "doc_id", "lang", Seq("it" -> 500, "en" -> 100), defaultPerMille = 50)
    },

    QueryDef.sql("q_prof_events",
      """SELECT * FROM (
        |  SELECT 'event_id' AS column, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
        |    CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |    CAST(min(event_id) AS VARCHAR) AS min_str,
        |    CAST(max(event_id) AS VARCHAR) AS max_str
        |  FROM events
        |  UNION ALL
        |  SELECT 'user_id', count(*), count(*) - count(user_id),
        |    count(DISTINCT user_id),
        |    CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
        |  FROM events
        |  UNION ALL
        |  SELECT 'event_type', count(*), count(*) - count(event_type),
        |    count(DISTINCT event_type),
        |    min(event_type), max(event_type)
        |  FROM events)""".stripMargin) { (s, d) =>
      // one-pass profiler (single agg + stack unpivot) vs per-column
      // aggregate UNIONs in the oracle
      graft.operators.Profile.profile(
        s.read.parquet(s"$d/events.parquet"),
        Seq("event_id", "user_id", "event_type"))
    },

    QueryDef.sql("q_prof_events_approx", {
      // DuckDB mirror of Profile.profileApprox (k=16): per column, the KMV
      // sketch is the 16 smallest distinct md5s; the estimate parses the
      // 16th minimum's first 15 hex digits (60 bits, exact BIGINT) and
      // divides in the same order as Profile.kmvEstimate, so the DOUBLE is
      // bit-identical
      val k = 16
      def nibbleSum(hExpr: String): String =
        (0 until 15).map { i =>
          s"(strpos('0123456789abcdef', substr($hExpr, ${i + 1}, 1)) - 1) * ${1L << (4 * (14 - i))}"
        }.mkString("(", " + ", ")")
      def ctes(c: String): String =
        s"""h_$c AS (SELECT DISTINCT md5(CAST($c AS VARCHAR)) AS h FROM events WHERE $c IS NOT NULL),
           |r_$c AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM h_$c),
           |est_$c AS (SELECT CASE WHEN (SELECT count(*) FROM r_$c) < $k THEN CAST((SELECT count(*) FROM r_$c) AS DOUBLE) ELSE CAST(${k - 1} AS DOUBLE) / (CAST((SELECT ${nibbleSum("h")} FROM r_$c WHERE rn = $k) AS DOUBLE) / CAST(${1L << 60} AS DOUBLE)) END AS est)""".stripMargin
      def row(c: String, castMinMax: Boolean): String = {
        val mn = if (castMinMax) s"CAST(min($c) AS VARCHAR)" else s"min($c)"
        val mx = if (castMinMax) s"CAST(max($c) AS VARCHAR)" else s"max($c)"
        s"""SELECT '$c' AS column, CAST(count(*) AS BIGINT) AS n, CAST(count(*) - count($c) AS BIGINT) AS n_null, (SELECT est FROM est_$c) AS n_distinct_est, $mn AS min_str, $mx AS max_str FROM events"""
      }
      s"""WITH ${ctes("event_id")},
         |${ctes("user_id")},
         |${ctes("event_type")}
         |${row("event_id", castMinMax = true)}
         |UNION ALL ${row("user_id", castMinMax = true)}
         |UNION ALL ${row("event_type", castMinMax = false)}""".stripMargin
    }) { (s, d) =>
      // the 100-TB profiler variant: KMV sketch in the n_distinct slot —
      // no Expand multiplication, deterministic estimate, full oracle
      graft.operators.Profile.profileApprox(
        s.read.parquet(s"$d/events.parquet"),
        Seq("event_id", "user_id", "event_type"), k = 16)
    },

    QueryDef.sql("q_prof_quantiles", {
      // Spark exact percentile and DuckDB quantile_cont share the
      // rank = p*(n-1) linear-interpolation definition -> bit-identical.
      // ::DOUBLE[] on the p list: a bare DuckDB list literal is DECIMAL,
      // which would hash-mismatch Spark's DOUBLE p column
      def qcol(c: String): String =
        s"""SELECT '$c' AS column, p, q FROM (SELECT unnest([0.25, 0.5, 0.75]::DOUBLE[]) AS p, unnest(quantile_cont($c, [0.25, 0.5, 0.75])) AS q FROM events)"""
      s"""${qcol("event_id")}
         |UNION ALL ${qcol("user_id")}""".stripMargin
    }) { (s, d) =>
      graft.operators.Profile.profileQuantiles(
        s.read.parquet(s"$d/events.parquet"), Seq("event_id", "user_id"))
    },

    QueryDef.sql("q_agg_kmv",
      """WITH h AS (SELECT DISTINCT lang, md5(text) AS h FROM documents),
        |r AS (SELECT lang, h,
        |  row_number() OVER (PARTITION BY lang ORDER BY h) AS rn FROM h)
        |SELECT lang, CAST(rn - 1 AS INT) AS pos, h
        |FROM r WHERE rn <= 8""".stripMargin) { (s, d) =>
      // typed KMV Aggregator: the sketch state (k smallest distinct md5s)
      // is exact and partitioning-independent, so it oracle-checks fully
      val u = udaf(new graft.functions.KmvSketch(8))
      s.read.parquet(s"$d/documents.parquet")
        .groupBy(col("lang"))
        .agg(u(md5(col("text"))).as("sketch"))
        .select(col("lang"), posexplode(col("sketch")))
        .select(col("lang"), col("pos"), col("col").as("h"))
    },

    QueryDef.sql("q_dup_clusters",
      s"""WITH RECURSIVE docs AS ($dupDocsSql),
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
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
         |SELECT src AS doc_id, least(src, min(dst)) AS rep
         |FROM reach GROUP BY src""".stripMargin) { (s, d) =>
      // connected components over LSH candidate pairs: min-label propagation
      // vs the oracle's recursive transitive closure
      val pairs = Dedup.candidatePairsFromBanded(
        TextFixtures.bandedCached(s, d), "doc_id")
      Dedup.clusters(pairs)
    },

    QueryDef.sql("q_dup_keep_one",
      s"""WITH RECURSIVE docs AS ($dupDocsSql),
         |$bandedSqlCtes,
         |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |  FROM banded l JOIN banded r
         |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |clusters AS (SELECT src AS doc_id, least(src, min(dst)) AS rep
         |  FROM reach GROUP BY src)
         |SELECT d.doc_id FROM docs d
         |WHERE NOT EXISTS (SELECT 1 FROM clusters c
         |  WHERE c.doc_id = d.doc_id AND c.doc_id != c.rep)""".stripMargin) { (s, d) =>
      // the pipeline's end product: drop every non-representative cluster
      // member, keep representatives + unclustered docs
      val docs = TextFixtures.dupDocs(s, d)
      val clusters = Dedup.clusters(Dedup.candidatePairsFromBanded(
        TextFixtures.bandedCached(s, d), "doc_id"))
      Dedup.keepOnePerCluster(docs, "doc_id", clusters).select("doc_id")
    },

    QueryDef.sql("q_dup_pipeline",
      s"""WITH RECURSIVE docs AS ($dupDocsSql),
         |$bandedSqlCtes,
         |pairs AS (SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
         |  FROM banded l JOIN banded r
         |  ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
         |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |clusters AS (SELECT src AS doc_id, least(src, min(dst)) AS rep
         |  FROM reach GROUP BY src),
         |survivors AS (SELECT d.doc_id, d.text FROM docs d
         |  WHERE NOT EXISTS (SELECT 1 FROM clusters c
         |    WHERE c.doc_id = d.doc_id AND c.doc_id != c.rep)),
         |t AS (SELECT doc_id, CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n
         |  FROM survivors),
         |c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id) AS cum FROM t)
         |SELECT doc_id, n AS n_tokens, CAST((cum - n) // 4000 AS INT) AS shard
         |FROM c""".stripMargin) { (s, d) =>
      // the FULL training-data pipeline, composed end-to-end in one plan:
      // dup-injected corpus -> MinHash/LSH candidate pairs -> connected-
      // component clusters -> keep one doc per cluster -> pack survivors
      // into token-budget shards. Every stage is the registry operator;
      // the oracle recomputes the whole chain in SQL (recursive closure +
      // window cumsum), so the composition is verified, not just the parts
      val docs = TextFixtures.dupDocs(s, d)
      val clusters = Dedup.clusters(Dedup.candidatePairsFromBanded(
        TextFixtures.bandedCached(s, d), "doc_id"))
      val survivors = Dedup.keepOnePerCluster(docs, "doc_id", clusters)
        .select(col("doc_id"), lit("all").as("lang"),
          size(split(col("text"), "\\s+")).as("n_tok"))
      Curation.packShards(survivors, "doc_id", "n_tok", "lang", budget = 4000L)
        .select("doc_id", "n_tokens", "shard")
    })
}

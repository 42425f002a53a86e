package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/**
 * Multimodal plumbing as driver-checkable queries. Assets adapt from the
 * `documents` table (payload = UTF-8 text bytes — see
 * Multimodal.assetsFromDocs), so the decode probe, byte-histogram features,
 * and frame sampling are all reproducible in DuckDB from the same parquet:
 * the mapPartitions batch path itself gets a rows+schema+hash oracle, not
 * just a spec. The codec stays stubbed (sandbox has no image/audio libs);
 * what's verified is the real Spark-side plumbing around it.
 *
 * ASCII-ONLY ORACLE ASSUMPTION (all four queries): the engine operates on
 * UTF-8 BYTES of the payload while the DuckDB oracles index CHARACTERS
 * (unicode(ch), substr, len(text)) — the two agree iff every text byte is
 * single-byte ASCII. The documents fixture satisfies this (every lang's
 * text is ASCII, including lang='zh' rows) and MultimodalSpec asserts it
 * against the driver testdata, so a future fixture change fails loudly in
 * the suite instead of silently desyncing the oracle.
 */
object MultimodalQueries {

  private def assets(s: SparkSession, d: String) =
    Multimodal.assetsFromDocs(s.read.parquet(s"$d/documents.parquet"))

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql("q_mm_decode",
      """SELECT doc_id AS asset_id,
        |  CASE WHEN doc_id % 3 = 2 THEN 'video/x-text' ELSE 'text/plain' END AS mime,
        |  substr(text, 1, 4) = 'RIFF' AS ok,
        |  CASE WHEN substr(text, 1, 4) = 'RIFF' THEN 'riff' ELSE 'unknown' END AS codec,
        |  CAST(len(text) AS BIGINT) AS n_bytes
        |FROM documents""".stripMargin) { (s, d) =>
      // magic-number sniff through the mapPartitions decode slot; ASCII
      // text can only ever match the RIFF magic (jpeg/mkv magics are
      // non-ASCII bytes), which the oracle mirrors exactly
      Multimodal.decode(assets(s, d))
        .select(col("assetId").as("asset_id"), col("mime"), col("ok"),
          col("codec"), col("nBytes").as("n_bytes"))
    },

    QueryDef.sql("q_mm_features",
      """WITH chars AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |bins AS (SELECT doc_id, unicode(ch) // 4 AS bin, count(*) AS c
        |  FROM chars GROUP BY 1, 2),
        |grid AS (SELECT doc_id, CAST(r.range AS INT) AS bin
        |  FROM documents CROSS JOIN range(0, 64) r)
        |SELECT g.doc_id AS asset_id, g.bin, CAST(coalesce(b.c, 0) AS BIGINT) AS n
        |FROM grid g LEFT JOIN bins b ON g.doc_id = b.doc_id AND g.bin = b.bin""".stripMargin) { (s, d) =>
      Multimodal.featureCounts(assets(s, d))
        .select(col("assetId").as("asset_id"), posexplode(col("counts")))
        .select(col("asset_id"), col("pos").as("bin"), col("col").as("n"))
    },

    QueryDef.sql("q_mm_resize",
      """SELECT doc_id AS asset_id, 64 AS new_len,
        |  array_to_string([substr(text, CAST((i * len(text)) // 64 AS INT) + 1, 1)
        |                   for i in range(0, 64)], '') AS resized_text
        |FROM documents""".stripMargin) { (s, d) =>
      // nearest-neighbor byte resample (integer source indexing), the
      // resize slot of the decode/feature/resize/frame-sample quartet
      Multimodal.resize(assets(s, d), newLen = 64)
        .select(col("assetId").as("asset_id"), col("newLen").as("new_len"),
          col("payload").cast("string").as("resized_text"))
    },

    QueryDef.sql("q_mm_frames",
      """WITH vids AS (SELECT doc_id, text, 10 * len(text) AS dur
        |  FROM documents WHERE doc_id % 3 = 2),
        |nf AS (SELECT doc_id, text, dur, least(1 + dur // 1000, 64) AS n
        |  FROM vids),
        |fr AS (SELECT doc_id, text, dur, unnest(range(0, n)) AS i FROM nf)
        |SELECT doc_id AS asset_id, CAST(i AS INT) AS frame_idx,
        |  CAST(i * 1000 AS BIGINT) AS ts_ms,
        |  substr(text,
        |    CAST(floor((CAST(i * 1000 AS DOUBLE) / dur) * (len(text) - 16)) AS INT) + 1,
        |    16) AS frame_text
        |FROM fr""".stripMargin) { (s, d) =>
      // 1 -> N frame generator over the timed assets; frame payloads are
      // deterministic 16-byte slices, surfaced as text for the oracle
      Multimodal.sampleFrames(assets(s, d), everyMs = 1000L)
        .select(col("assetId").as("asset_id"), col("frameIdx").as("frame_idx"),
          col("tsMs").as("ts_ms"), col("payload").cast("string").as("frame_text"))
    })
}

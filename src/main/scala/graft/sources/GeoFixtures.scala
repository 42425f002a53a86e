package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic geo fixtures DERIVED from the driver's read-only testdata
 * (TESTDATA.md: no external data, inputs must be the provided tables).
 * Points come from `orders`, features from `lineitem`, via fixed integer
 * arithmetic that both Spark and the DuckDB oracle evaluate identically
 * (validated bit-for-bit this session — CellsSpec spot vectors).
 *
 * Each builder has a companion `*Sql` CTE string used verbatim inside
 * oracle SQL; keep the two in lock-step when editing.
 */
object GeoFixtures {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Geocoded "pages": one point per order. k, lat, lon, lang, wiki_raw. */
  def points(spark: SparkSession, sfDir: String): DataFrame = {
    val o = table(spark, sfDir, "orders")
    o.select(
      col("o_orderkey").as("k"),
      (lit(-60) + (col("o_orderkey") * 7919 % 12000) / 100.0).as("lat"),
      (lit(-180) + (col("o_orderkey") * 104729 % 36000) / 100.0).as("lon"),
      element_at(array(lit("it"), lit("en"), lit("de"), lit("fr"), lit("es")),
        (col("o_orderkey") % 5 + 1).cast("int")).as("lang"),
      when(col("o_orderkey") % 13 === 0,
          concat(lit("http://en.wikipedia.org/wiki/Page_"), col("o_orderkey") % 301))
        .when(col("o_orderkey") % 17 === 0,
          concat(lit("Page_"), col("o_orderkey") % 301))
        .otherwise(concat(
          element_at(array(lit("it"), lit("en"), lit("de"), lit("fr"), lit("es")),
            (col("o_orderkey") % 5 + 1).cast("int")),
          lit(":page_"), col("o_orderkey") % 301)).as("wiki_raw"))
  }

  /** CTE body matching points(): SELECT ... FROM orders. */
  val pointsSql: String =
    """SELECT o_orderkey AS k,
      |  -60 + (o_orderkey*7919 % 12000)/100.0 AS lat,
      |  -180 + (o_orderkey*104729 % 36000)/100.0 AS lon,
      |  ['it','en','de','fr','es'][CAST(o_orderkey % 5 AS INT) + 1] AS lang,
      |  CASE WHEN o_orderkey % 13 = 0
      |         THEN 'http://en.wikipedia.org/wiki/Page_' || (o_orderkey % 301)
      |       WHEN o_orderkey % 17 = 0 THEN 'Page_' || (o_orderkey % 301)
      |       ELSE ['it','en','de','fr','es'][CAST(o_orderkey % 5 AS INT) + 1] ||
      |            ':page_' || (o_orderkey % 301) END AS wiki_raw
      |FROM orders""".stripMargin.replace("\n", " ")
      // single-line: these fragments are interpolated into outer templates
      // that call .stripMargin — a line starting with '|' would be mangled

  // the feature columns as expressions over lineitem — one definition
  // shared by the wide fixture and its narrow projections below
  private def featFid = (col("l_orderkey") * 10 + col("l_linenumber")).as("fid")
  private def featLat =
    (lit(-60) + ((col("l_orderkey") * 31 + col("l_linenumber") * 7) * 7919 % 12000) / 100.0).as("lat")
  private def featLon =
    (lit(-180) + ((col("l_orderkey") * 37 + col("l_linenumber") * 11) * 104729 % 36000) / 100.0).as("lon")
  private def featType =
    element_at(array(lit("node"), lit("way"), lit("relation")),
      (col("l_linenumber") % 3 + 1).cast("int")).as("feature_type")
  private def featTagKey = concat(
    element_at(array(lit("it"), lit("en"), lit("de"), lit("fr"), lit("es")),
      ((col("l_orderkey") * 10 + col("l_linenumber")) % 5 + 1).cast("int")),
    lit(":Page "), (col("l_orderkey") * 10 + col("l_linenumber")) % 301).as("tag_key")

  /** OSM-like features derived from lineitem. All output columns are pure
    * functions of (l_orderkey, l_linenumber), and the testdata repeats such
    * pairs, so DISTINCT makes fid a key (mirrored in featuresSql). */
  def features(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .select(featFid, featLat, featLon, featType, featTagKey)
      .distinct()

  /** Narrow projections of [[features]] for consumers that join on a
    * column subset (round-6, guide §2.3 "shuffle fewer bytes"): every
    * feature column is a pure function of (l_orderkey, l_linenumber), so
    * DISTINCT over a narrow projection equals projecting the wide
    * DISTINCT — identical result relation — while the distinct's shuffle
    * carries only the consumed columns instead of every feature column
    * (the wide distinct is corpus-sized: fid is a key, so it never
    * collapses rows; the tag-key dimension is vocabulary-sized). The
    * oracles keep the wide-DISTINCT formulation — same rows is the proof. */
  def featureTagKeys(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem").select(featTagKey).distinct()

  /** (fid, tag_key) — the suggestion dimension; one row per fid (tag_key
    * is a function of fid). */
  def featureTagDim(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem").select(featFid, featTagKey).distinct()

  /** (fid, lat, lon) — the kNN index side; one row per fid. */
  def featureGeo(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem").select(featFid, featLat, featLon).distinct()

  /** CTE body matching features(): SELECT ... FROM lineitem. */
  val featuresSql: String =
    """SELECT DISTINCT l_orderkey*10 + l_linenumber AS fid,
      |  -60 + ((l_orderkey*31 + l_linenumber*7)*7919 % 12000)/100.0 AS lat,
      |  -180 + ((l_orderkey*37 + l_linenumber*11)*104729 % 36000)/100.0 AS lon,
      |  ['node','way','relation'][CAST(l_linenumber % 3 AS INT) + 1] AS feature_type,
      |  ['it','en','de','fr','es'][CAST((l_orderkey*10 + l_linenumber) % 5 AS INT) + 1] ||
      |    ':Page ' || ((l_orderkey*10 + l_linenumber) % 301) AS tag_key
      |FROM lineitem""".stripMargin.replace("\n", " ")

  /** DuckDB SQL expression for cell_encode(latE, lonE, r) — the exact
    * Morton arithmetic of graft.core.Cells, generated per resolution. */
  def cellEncodeSql(latExpr: String, lonExpr: String, r: Int): String = {
    val n = 1L << r
    val x = s"least(greatest(CAST(floor((($lonExpr)+180.0)/360.0*$n.0) AS BIGINT),0),${n - 1})"
    val y = s"least(greatest(CAST(floor((($latExpr)+90.0)/180.0*$n.0) AS BIGINT),0),${n - 1})"
    val terms = (0 until r).flatMap { k =>
      Seq(s"(((__x >> $k) & 1) << ${2 * k})", s"(((__y >> $k) & 1) << ${2 * k + 1})")
    }.mkString(" + ")
    // inline via a scalar subquery-free trick: repeat x/y expressions
    val inlined = terms.replace("__x", s"($x)").replace("__y", s"($y)")
    s"((CAST($r AS BIGINT) << 56) + ($inlined))"
  }

  /** DuckDB SQL for parent(cell, rp) given the cell's resolution r. */
  def cellParentSql(cellExpr: String, r: Int, rp: Int): String =
    s"((CAST($rp AS BIGINT) << 56) + ((($cellExpr) & ${(1L << 56) - 1}) >> ${2 * (r - rp)}))"

  /** DuckDB SQL for tile x/y of a cell at its own resolution r
    * (Morton deinterleave, generated). */
  def tileXSql(cellExpr: String, r: Int): String =
    (0 until r).map(k => s"(((($cellExpr) >> ${2 * k}) & 1) << $k)").mkString(" + ")
  def tileYSql(cellExpr: String, r: Int): String =
    (0 until r).map(k => s"(((($cellExpr) >> ${2 * k + 1}) & 1) << $k)").mkString(" + ")

  /** Brute-force point-in-polygon region assignment CTEs for the oracle:
    * expects a CTE `pts(k, lat, lon, ...)` in scope; yields `pip_matches
    * (k, region_id)` — DISTINCT region per point, even-odd rule, identical
    * crossing expression to graft.core.Geo.contains. */
  def pipMatchesSql: String =
    s"""edges(region_id, part, x1, y1, x2, y2) AS (VALUES
       |    ${graft.core.Polygons.edgesSqlValues}),
       |pip_hits AS (
       |  SELECT p.k, e.region_id, e.part
       |  FROM pts p JOIN edges e
       |    ON ((e.y1 > p.lat) != (e.y2 > p.lat))
       |   AND p.lon < (e.x2 - e.x1) * (p.lat - e.y1) / (e.y2 - e.y1) + e.x1
       |  GROUP BY p.k, e.region_id, e.part
       |  HAVING count(*) % 2 = 1),
       |pip_matches AS (SELECT DISTINCT k, region_id FROM pip_hits)""".stripMargin
}

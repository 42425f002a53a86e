package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GeoFunctions, TextFunctions}
import graft.operators.{SpatialJoin, TileAgg}

/**
 * The flagship end-to-end pipeline (SURVEY.md §3.1 E1 / §7 M1): pages ->
 * extract + geocode -> cell encode -> candidate cover join -> exact PIP
 * refine -> per-region matches + tile aggregation.
 *
 * Column-pruning discipline: `html` (BINARY, the huge column) is consumed
 * exactly once at geocode/extract time; everything downstream carries only
 * url/lat/lon/cell columns, so Parquet scans of derived stages never read
 * html (verified by plan assertions in PipelineSpec).
 */
object Pipeline {

  /** Geocoded points from a pages table (input_hint shape). */
  def geocode(pages: DataFrame): DataFrame =
    pages.select(col("url"),
        TextFunctions.geoLat(col("html")).as("lat"),
        TextFunctions.geoLon(col("html")).as("lon"))
      .where(col("lat").isNotNull && col("lon").isNotNull)

  /** (url, lat, lon, region_id) exact region matches. */
  def matches(spark: SparkSession, pages: DataFrame,
              mode: SpatialJoin.Mode = SpatialJoin.Broadcast): DataFrame =
    SpatialJoin.assign(geocode(pages), "url", SpatialJoin.coverDF(spark), mode)

  /** Per-(tile, region) counts at zoom z — the coverage-map output. */
  def tileStats(spark: SparkSession, pages: DataFrame, z: Int = 8,
                mode: SpatialJoin.Mode = SpatialJoin.Broadcast): DataFrame =
    TileAgg.perRegion(matches(spark, pages, mode), z)

  /** Text-extraction check: recompute text from html and compare to the
    * stored text column (byte-identical invariant, BASELINE.json). Returns
    * offending rows (must be empty). */
  def textInvariantViolations(pages: DataFrame): DataFrame =
    pages.select(col("url"), col("text"),
        TextFunctions.extractText(col("html")).as("text2"))
      .where(col("text") =!= col("text2"))
}

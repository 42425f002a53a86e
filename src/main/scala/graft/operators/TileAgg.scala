package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/**
 * Raster<->vector tile aggregation (SURVEY.md §2.C8): bin points to the
 * tile grid at zoom z (tile == cell at resolution z, SURVEY.md §1.6) and
 * aggregate coverage per (tile, region) and per tile.
 *
 * Everything is built-in hash aggregation — partial (map-side) + final agg
 * come free from Catalyst; the only custom code is the cell arithmetic,
 * which is a codegen'd Expression.
 */
object TileAgg {

  /** Per-(tile, region) match counts from the spatial-join output
    * (expects cell-encodable lat/lon plus region_id). */
  def perRegion(assigned: DataFrame, z: Int): DataFrame = {
    import assigned.sparkSession.implicits._
    val tiled = assigned.withColumn("tile",
      GeoFunctions.cellEncode($"lat", $"lon", lit(z)))
    tiled.groupBy(
        GeoFunctions.cellTileX($"tile").as("tile_x"),
        GeoFunctions.cellTileY($"tile").as("tile_y"),
        $"region_id")
      .agg(count("*").as("n"))
      .withColumn("tile_z", lit(z))
  }

  /** Tile PYRAMID: per-(tile, region) counts at every zoom zMin..zMax —
    * the multi-level coverage-map artifact (zoomable raster output).
    *
    * Scale shape: the raw relation is aggregated ONCE (at zMax — the only
    * shuffle over the big input); every coarser level rolls up the
    * PREVIOUS level's aggregates, a relation of at most 4^z tiles, so the
    * extra levels cost a handful of aggregations over tiny data — never a
    * second pass over the corpus. Counts are additive and every tile has
    * exactly one parent, so the rollup is exact; the oracle recomputes
    * each level independently from the raw matches (different algorithm,
    * same rows — q_geo_tile_pyramid). The base level is checkpointed so
    * the final union does not re-aggregate the corpus once per level. */
  def pyramid(assigned: DataFrame, zMax: Int, zMin: Int = 0): DataFrame = {
    require(0 <= zMin && zMin <= zMax)
    import assigned.sparkSession.implicits._
    val base = assigned
      .withColumn("tile", GeoFunctions.cellEncode($"lat", $"lon", lit(zMax)))
      .groupBy($"tile", $"region_id").agg(count("*").as("n"))
      .withColumn("tile_z", lit(zMax))
      .localCheckpoint(true)
    var levels = List[DataFrame](base)
    var prev = base
    var z = zMax - 1
    while (z >= zMin) {
      prev = prev
        .groupBy(GeoFunctions.cellParent($"tile", lit(z)).as("tile"),
          $"region_id")
        .agg(sum($"n").as("n"))
        .withColumn("tile_z", lit(z))
      levels ::= prev
      z -= 1
    }
    levels.reduce(_ unionByName _)
      .select($"tile_z",
        GeoFunctions.cellTileX($"tile").as("tile_x"),
        GeoFunctions.cellTileY($"tile").as("tile_y"),
        $"region_id", $"n")
  }

  /** GeoJSON Feature per tile row — the leaflet-consumable coverage-map
    * sink (the reference publishes per-region coverage maps; SURVEY.md
    * §2.G2). Input needs (tile_z, tile_x, tile_y); every other column
    * becomes a GeoJSON property (via to_json). Geometry is the tile's
    * bounding quad, coordinates formatted %.6f (deterministic Java
    * formatting — this is a SINK, spec-tested, not an oracle query).
    * Pure per-row built-ins + the codegen cell expressions: streams
    * through whole-stage codegen at any scale. */
  def geoJsonFeatures(stats: DataFrame): DataFrame = {
    import stats.sparkSession.implicits._
    val propCols = stats.columns.filterNot(
      Set("tile_z", "tile_x", "tile_y").contains)
    val cell = GeoFunctions.cellFromXY($"tile_z".cast("int"),
      $"tile_x".cast("long"), $"tile_y".cast("long"))
    val b = GeoFunctions.cellBounds(cell)
    val (latMin, latMax, lonMin, lonMax) =
      (element_at(b, 1), element_at(b, 2), element_at(b, 3), element_at(b, 4))
    def pt(lon: org.apache.spark.sql.Column, lat: org.apache.spark.sql.Column) =
      format_string("[%.6f,%.6f]", lon, lat)
    val ring = concat_ws(",",
      pt(lonMin, latMin), pt(lonMax, latMin), pt(lonMax, latMax),
      pt(lonMin, latMax), pt(lonMin, latMin))
    val props =
      if (propCols.isEmpty) lit("{}")
      else to_json(struct(propCols.map(col): _*))
    stats.select($"tile_z", $"tile_x", $"tile_y",
      concat(
        lit("""{"type":"Feature","geometry":{"type":"Polygon","coordinates":[["""),
        ring,
        lit("""]]},"properties":"""), props, lit("}")).as("feature"))
  }

  /** Per-tile coverage: total points vs points matched to any region.
    * `points` must carry lat/lon + keyCol; `assigned` is assign() output. */
  def coverage(points: DataFrame, assigned: DataFrame, keyCol: String,
               z: Int): DataFrame = {
    import points.sparkSession.implicits._
    val totals = points
      .withColumn("tile", GeoFunctions.cellEncode($"lat", $"lon", lit(z)))
      .groupBy($"tile").agg(count("*").as("pages"))
    val matchedKeys = assigned.select(col(keyCol), $"lat", $"lon").distinct()
    val matched = matchedKeys
      .withColumn("tile", GeoFunctions.cellEncode($"lat", $"lon", lit(z)))
      .groupBy($"tile").agg(count("*").as("matched"))
    totals.join(matched, Seq("tile"), "left")
      .select(
        GeoFunctions.cellTileX($"tile").as("tile_x"),
        GeoFunctions.cellTileY($"tile").as("tile_y"),
        $"pages",
        coalesce($"matched", lit(0L)).as("matched"))
      .withColumn("tile_z", lit(z))
  }
}

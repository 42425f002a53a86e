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

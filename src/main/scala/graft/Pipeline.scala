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

  /** (url, lat, lon, region_id) exact region matches. `cover` defaults to
    * the committed fixture polygons; pass one built by
    * SpatialJoin.coverDF / coverDFDistributed for real boundary inputs. */
  def matches(spark: SparkSession, pages: DataFrame,
              mode: SpatialJoin.Mode = SpatialJoin.Auto(),
              cover: Option[SpatialJoin.CoverSides] = None): DataFrame =
    SpatialJoin.assign(geocode(pages), "url",
      cover.getOrElse(SpatialJoin.coverDF(spark)), mode)

  /** Per-(tile, region) counts at zoom z — the coverage-map output. */
  def tileStats(spark: SparkSession, pages: DataFrame, z: Int = 8,
                mode: SpatialJoin.Mode = SpatialJoin.Auto(),
                cover: Option[SpatialJoin.CoverSides] = None): DataFrame =
    TileAgg.perRegion(matches(spark, pages, mode, cover), z)

  /** The full coverage-map job (the reference's published page per area
    * [PK]: progress counts + page stats): per tile at zoom z — geocoded
    * pages, pages matched to any region, and token totals of the EXTRACTED
    * text (extraction is the mandated per-row invariant, so the e2e
    * throughput metric includes it). One action, one output. */
  def coverageStats(spark: SparkSession, pages: DataFrame, z: Int = 8,
                    joinMode: SpatialJoin.Mode = SpatialJoin.Auto(),
                    cover: Option[SpatialJoin.CoverSides] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val pts = pages.select(col("url"),
        TextFunctions.geoLat(col("html")).as("lat"),
        TextFunctions.geoLon(col("html")).as("lon"),
        TextFunctions.tokenCountWs(TextFunctions.extractText(col("html")))
          .as("tokens"))
      .where(col("lat").isNotNull && col("lon").isNotNull)
    // Two consumers (per-tile totals and the spatial-join branch) share
    // the scan subtree by RECOMPUTATION, deliberately. Measured on the 8M
    // bench corpus: recompute = 5.0 s; eager localCheckpoint of the
    // narrow frame = 9.1 s (the serial materialization job costs more
    // than the second scan it saves — the independent branch stages
    // overlap on the same cores and the OS page cache absorbs the second
    // html read); a lazy persist looks 5x faster but only because
    // repeated invocations silently serve the PREVIOUS run's cache (plan-
    // equality cache hit), which also pins blocks for the session.
    val tiled = pts.withColumn("tile",
      GeoFunctions.cellEncode(col("lat"), col("lon"), lit(z)))
    val totals = tiled.groupBy(col("tile"))
      .agg(count("*").as("pages"), sum(col("tokens")).as("tok_sum"))
    val matchedPerTile = SpatialJoin
      .assign(tiled.select("url", "lat", "lon", "tile"), "url",
        cover.getOrElse(SpatialJoin.coverDF(spark)), joinMode, dedup = false)
      .select("url", "tile").distinct() // absorbs multi-part/region dups
      .groupBy(col("tile")).agg(count("*").as("matched"))
    totals.join(matchedPerTile, Seq("tile"), "left")
      .select(
        GeoFunctions.cellTileX(col("tile")).as("tile_x"),
        GeoFunctions.cellTileY(col("tile")).as("tile_y"),
        col("pages"), col("tok_sum"),
        coalesce(col("matched"), lit(0L)).as("matched"))
  }

  /** Resumable flagship run (SURVEY.md §3.1 E3): geocode -> prune prefixes
    * already recorded complete in the lineage table -> spatial join ->
    * partitioned write + lineage append. A killed run re-invoked with the
    * same runId recomputes ONLY the uncompleted cell prefixes. Returns the
    * number of input points actually processed this invocation. */
  def runResumable(spark: SparkSession, pages: DataFrame, outPath: String,
                   lineagePath: String, runId: String,
                   mode: SpatialJoin.Mode = SpatialJoin.Auto(),
                   cover: Option[operators.SpatialJoin.CoverSides] = None): Long = {
    import graft.plans.{Lineage, Metrics}
    Metrics.withMetrics(spark, runId,
        s"$lineagePath-metrics/$runId-${System.nanoTime()}.json") {
      val pts = Lineage.withPrefix(geocode(pages))
      val completed =
        if (new java.io.File(lineagePath).exists())
          Lineage.completedPrefixes(spark, lineagePath, runId)
        else spark.emptyDataFrame.withColumn("cell_prefix", lit(0L)).limit(0)
      val pruned = Lineage.pruneCompleted(pts, completed).localCheckpoint(true)
      val nProcessed = pruned.count()
      if (nProcessed > 0) {
        val matched = operators.SpatialJoin
          .assign(pruned, "url",
            cover.getOrElse(operators.SpatialJoin.coverDF(spark)), mode)
        Lineage.writeWithLineage(matched, pruned.select("cell_prefix"),
          outPath, lineagePath, runId, hashCols = Seq("url", "region_id"))
      }
      nProcessed
    }
  }

  /** Text-extraction check: recompute text from html and compare to the
    * stored text column (byte-identical invariant, BASELINE.json). Returns
    * offending rows (must be empty). */
  def textInvariantViolations(pages: DataFrame): DataFrame =
    pages.select(col("url"), col("text"),
        TextFunctions.extractText(col("html")).as("text2"))
      .where(col("text") =!= col("text2"))
}

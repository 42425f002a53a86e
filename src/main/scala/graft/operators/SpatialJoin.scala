package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Cells, Geo, Polygons}
import graft.functions.GeoFunctions

/**
 * The flagship operator (SURVEY.md §2.C3-C6): candidate-then-refine spatial
 * join of a point relation against boundary polygons.
 *
 * Plan shape (Spark-first, BASELINE.json north_star):
 *   points --cell_encode(r=rMax)--> probe keys: parent cell at each
 *   resolution rMin..rMax (explode) -- equi-join on cell id --> candidates
 *   (the polygon side is its compact cell cover, cells carry their own
 *   resolution in the id, so ONE equi-join covers all resolutions)
 *   -- bbox prefilter + exact ray-cast PIP refine --> matches.
 *
 * Candidate join is a plain hash-joinable equi-join: broadcast when the
 *  cover is small; explicit shuffle (sort-merge on cell) with optional key
 * salting for skewed mega-cells otherwise. Results are identical across
 * modes and parallelism — that's tested, not assumed.
 */
object SpatialJoin {

  sealed trait Mode
  case object Broadcast extends Mode
  case object Shuffle extends Mode
  /** Shuffle with salted keys: points add pmod(xxhash64(key), s), the cover
    * side is replicated s times (SURVEY.md §2.C6 skewed mega-cells). */
  final case class ShuffleSalted(s: Int) extends Mode

  final val RMin = 7
  final val RMax = 12

  /** The polygon side: compact covers, exploded to one row per cover cell,
    * carrying rings + bbox for the refine step. Computed driver-side (the
    * polygon set is the small dimension; at production scale this becomes a
    * one-off distributed enrichment job over the polygon table). */
  def coverDF(spark: SparkSession, parts: Seq[Polygons.PolyPart] = Polygons.all,
              rMin: Int = RMin, rMax: Int = RMax): DataFrame = {
    val rows = parts.flatMap { p =>
      val cover = Geo.cover(p.rings, rMin, rMax)
      cover.map(cell => (cell, p.regionId, p.part,
        p.rings.map(_.toSeq).toSeq, p.latMin, p.latMax, p.lonMin, p.lonMax))
    }
    import spark.implicits._
    rows.toDF("cell", "region_id", "part", "rings",
      "lat_min", "lat_max", "lon_min", "lon_max")
  }

  /** Assign containing regions to points. Input must carry `lat`,`lon` and
    * a unique key column `keyCol`; output = input columns + region_id
    * (inner; points in no region drop out), exactly one row per
    * (point, region). */
  def assign(points: DataFrame, keyCol: String, cover: DataFrame,
             mode: Mode = Broadcast,
             rMin: Int = RMin, rMax: Int = RMax): DataFrame = {
    import points.sparkSession.implicits._
    val withCell = points.withColumn("cell_rmax",
      GeoFunctions.cellEncode($"lat", $"lon", lit(rMax)))
    val probes = withCell.withColumn("cell",
      explode(array((rMin to rMax).map(r =>
        GeoFunctions.cellParent($"cell_rmax", lit(r))): _*)))

    val candidates = mode match {
      case Broadcast =>
        probes.join(broadcast(cover), "cell")
      case Shuffle =>
        // explicit hash partitioning on the cell key; merge hint pins
        // sort-merge so AQE skew-split can kick in on hot cells
        probes.join(cover.hint("merge"), "cell")
      case ShuffleSalted(s) =>
        val salted = probes.withColumn("salt",
          pmod(xxhash64(col(keyCol)), lit(s)).cast("int"))
        val coverRep = cover.withColumn("salt",
          explode(sequence(lit(0), lit(s - 1))))
        salted.join(coverRep.hint("merge"), Seq("cell", "salt"))
          .drop("salt")
    }

    val refined = candidates
      .where($"lat" >= $"lat_min" && $"lat" <= $"lat_max" &&
             $"lon" >= $"lon_min" && $"lon" <= $"lon_max")
      .where(GeoFunctions.pip($"lat", $"lon", $"rings"))

    // a region can match via several parts; compact cover cells are
    // disjoint so per part there is at most one candidate row
    refined
      .drop("cell", "cell_rmax", "part", "rings",
        "lat_min", "lat_max", "lon_min", "lon_max")
      .dropDuplicates(keyCol, "region_id")
  }
}

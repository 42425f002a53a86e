package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Geo, Polygons}
import graft.operators.SpatialJoin

/**
 * Boundary-polygon ingestion from GeoJSON-ish JSON lines (SURVEY.md §2.A3):
 * one object per line with `region_id`, `part`, `name`, and `rings` as
 * [[lon,lat,lon,lat,...]] (ring 0 shell, rest holes — the engine's native
 * layout, a flattened GeoJSON Polygon coordinates array).
 *
 * Read with an explicit schema (spark.read.json), enriched driver-side
 * with the compact cover (the polygon table is the small dimension).
 */
object PolygonJson {

  val schema = "region_id LONG, part INT, name STRING, rings ARRAY<ARRAY<DOUBLE>>"

  def read(spark: SparkSession, path: String): Seq[Polygons.PolyPart] =
    spark.read.schema(schema).json(path).collect().toSeq.map { r =>
      Polygons.PolyPart(
        r.getAs[Long]("region_id"),
        r.getAs[Int]("part"),
        r.getAs[String]("name"),
        r.getAs[scala.collection.Seq[scala.collection.Seq[Double]]]("rings")
          .map(_.toArray).toArray)
    }

  /** The polygon RELATION (distributed; nothing collected) — the input
    * shape of SpatialJoin.coverDFDistributed. */
  def readDF(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Parts -> the join-ready cover sides (driver-side covers; the
    * small-region-set path). */
  def coverFromJson(spark: SparkSession, path: String,
                    rMin: Int = SpatialJoin.RMin,
                    rMax: Int = SpatialJoin.RMax): SpatialJoin.CoverSides =
    SpatialJoin.coverDF(spark, read(spark, path), rMin, rMax)

  /** Parts -> cover sides with covers computed ON EXECUTORS — the
    * production path for large polygon tables (SpatialJoin
    * .coverDFDistributed doc). */
  def coverFromJsonDistributed(spark: SparkSession, path: String,
                               rMin: Int = SpatialJoin.RMin,
                               rMax: Int = SpatialJoin.RMax): SpatialJoin.CoverSides =
    SpatialJoin.coverDFDistributed(readDF(spark, path), rMin, rMax)

  /** Serialize parts as JSON lines (fixture round-trip + export). */
  def toJsonLines(parts: Seq[Polygons.PolyPart]): String =
    parts.map { p =>
      val rings = p.rings.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
      s"""{"region_id":${p.regionId},"part":${p.part},"name":"${p.name}","rings":$rings}"""
    }.mkString("\n")
}

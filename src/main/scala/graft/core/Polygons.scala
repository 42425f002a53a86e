package graft.core

/**
 * The committed boundary-polygon fixture set (FIXTURES.md §B): 8 regions
 * exercising convexity, concavity, holes, the antimeridian (modeled as two
 * parts of one region — each part is a plain polygon in [-180,180] lon
 * space), the latitude clamp, sub-cell12 size, a skew-driving "mega"
 * region, and a sliver.
 *
 * All vertex coordinates carry a .001/.0005 offset and all non-axis-aligned
 * edges have slope +-0.1/1 so that no synthetic test point (2-decimal
 * lat/lon grid) ever lies exactly on an edge — the on-edge rule then never
 * differentiates engine vs oracle (Geo.contains doc).
 */
object Polygons {

  /** One simple polygon (shell + optional holes); a geographic region is
    * the union of its parts. */
  final case class PolyPart(regionId: Long, part: Int, name: String,
                            rings: Array[Array[Double]]) {
    val (latMin, latMax, lonMin, lonMax) = Geo.bbox(rings)
  }

  // rings are flat [lon, lat, lon, lat, ...], open (closing edge implicit)
  val all: Seq[PolyPart] = Seq(
    PolyPart(1L, 0, "quad", Array(Array(
      5.001, 5.001, 25.001, 5.001, 25.001, 20.001, 5.001, 20.001))),
    PolyPart(2L, 0, "lshape", Array(Array(
      -50.001, -10.001, -30.001, -10.001, -30.001, 0.001,
      -40.001, 0.001, -40.001, 10.001, -50.001, 10.001))),
    PolyPart(3L, 0, "holed", Array(
      Array(60.001, -30.001, 90.001, -30.001, 90.001, -5.001, 60.001, -5.001),
      Array(70.001, -25.001, 80.001, -25.001, 80.001, -15.001, 70.001, -15.001))),
    PolyPart(4L, 0, "dateline_e", Array(Array(
      170.001, 30.001, 179.9995, 30.001, 179.9995, 45.001, 170.001, 45.001))),
    PolyPart(4L, 1, "dateline_w", Array(Array(
      -179.9995, 30.001, -165.001, 30.001, -165.001, 45.001, -179.9995, 45.001))),
    PolyPart(5L, 0, "nearclamp", Array(Array(
      100.001, 55.001, 140.001, 55.001, 140.001, 59.501, 100.001, 59.501))),
    PolyPart(6L, 0, "tiny", Array(Array(
      33.0005, 7.0005, 33.0305, 7.0005, 33.0305, 7.0305, 33.0005, 7.0305))),
    PolyPart(7L, 0, "mega", Array(Array(
      -30.001, -30.001, 30.001, -30.001, 30.001, 30.001, -30.001, 30.001))),
    PolyPart(8L, 0, "sliver", Array(Array(
      -120.001, 40.001, -80.001, 44.001, -80.001, 44.501, -120.001, 40.501))))

  /** DuckDB VALUES list of all polygon edges, for oracle SQL:
    * (region_id, part, x1, y1, x2, y2) with x=lon, y=lat. */
  lazy val edgesSqlValues: String = {
    val rows = for {
      p <- all
      ring <- p.rings
      n = ring.length / 2
      i <- 0 until n
    } yield {
      val j = if (i == n - 1) 0 else i + 1
      s"(${p.regionId}, ${p.part}, ${ring(2 * i)}, ${ring(2 * i + 1)}, " +
        s"${ring(2 * j)}, ${ring(2 * j + 1)})"
    }
    rows.mkString(",\n    ")
  }

  /** Brute-force region assignment (test oracle): all regions containing
    * the point, via any part. */
  def regionsContaining(lat: Double, lon: Double): Seq[Long] =
    all.filter(p => Geo.contains(lat, lon, p.rings)).map(_.regionId).distinct.sorted
}

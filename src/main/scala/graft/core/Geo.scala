package graft.core

/**
 * Pure planar geometry over (lon, lat) degree space: exact ray-casting
 * point-in-polygon (even-odd rule, holes-aware), segment/rect intersection,
 * and the compact cell cover (quadtree descent over Cells).
 *
 * Polygons are `Array[Array[Double]]`: each ring a flat [lon0,lat0,lon1,
 * lat1,...] open ring (last vertex != first; the closing edge is implicit).
 * Ring 0 is the shell, further rings are holes — but the even-odd rule makes
 * shell/hole orientation irrelevant.
 *
 * Determinism contract (BASELINE.json exact-match metric): `contains` uses a
 * fixed-order crossing test — ((y1 > py) != (y2 > py)) && (px < (x2-x1) *
 * (py-y1) / (y2-y1) + x1) — that is reproduced verbatim by the DuckDB oracle
 * SQL, so Spark and oracle agree bit-for-bit. The on-edge rule is therefore
 * whatever IEEE-754 gives for that expression; fixtures keep vertices off
 * the point coordinate grid so no test point ever lies on an edge.
 */
object Geo {

  /** Even-odd ray cast over ALL rings (shell + holes combined). */
  def contains(lat: Double, lon: Double, rings: Array[Array[Double]]): Boolean = {
    var crossings = 0
    var ri = 0
    while (ri < rings.length) {
      val ring = rings(ri)
      val n = ring.length / 2
      var i = 0
      while (i < n) {
        val j = if (i == n - 1) 0 else i + 1
        val x1 = ring(2 * i); val y1 = ring(2 * i + 1)
        val x2 = ring(2 * j); val y2 = ring(2 * j + 1)
        if (((y1 > lat) != (y2 > lat)) &&
            (lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1)) {
          crossings += 1
        }
        i += 1
      }
      ri += 1
    }
    (crossings & 1) == 1
  }

  /** Squared Euclidean distance in degree space, fixed op order (the kNN
    * ordering metric; reproduced verbatim in oracle SQL). */
  @inline def d2(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double =
    (lat1 - lat2) * (lat1 - lat2) + (lon1 - lon2) * (lon1 - lon2)

  /** Great-circle distance in km (reporting only — NOT on the exact-match
    * path; the deterministic kNN metric is d2 above). */
  def haversineKm(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val r = 6371.0088
    val p1 = math.toRadians(lat1); val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1); val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2 * r * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Bounding box of a polygon: (latMin, latMax, lonMin, lonMax). */
  def bbox(rings: Array[Array[Double]]): (Double, Double, Double, Double) = {
    var latMin = Double.MaxValue; var latMax = Double.MinValue
    var lonMin = Double.MaxValue; var lonMax = Double.MinValue
    val shell = rings(0)
    var i = 0
    while (i < shell.length / 2) {
      val x = shell(2 * i); val y = shell(2 * i + 1)
      if (y < latMin) latMin = y
      if (y > latMax) latMax = y
      if (x < lonMin) lonMin = x
      if (x > lonMax) lonMax = x
      i += 1
    }
    (latMin, latMax, lonMin, lonMax)
  }

  // --- segment / rectangle intersection (for the cover descent) ---

  private def segsIntersect(ax: Double, ay: Double, bx: Double, by: Double,
                            cx: Double, cy: Double, dx: Double, dy: Double): Boolean = {
    def orient(px: Double, py: Double, qx: Double, qy: Double,
               rx: Double, ry: Double): Int = {
      val v = (qx - px) * (ry - py) - (qy - py) * (rx - px)
      if (v > 0) 1 else if (v < 0) -1 else 0
    }
    val o1 = orient(ax, ay, bx, by, cx, cy)
    val o2 = orient(ax, ay, bx, by, dx, dy)
    val o3 = orient(cx, cy, dx, dy, ax, ay)
    val o4 = orient(cx, cy, dx, dy, bx, by)
    if (o1 != o2 && o3 != o4) return true
    // collinear overlaps: treat touching as intersecting (conservative —
    // soundness of the cover only needs "never falsely disjoint")
    def onSeg(px: Double, py: Double, qx: Double, qy: Double,
              rx: Double, ry: Double): Boolean =
      math.min(px, qx) <= rx && rx <= math.max(px, qx) &&
      math.min(py, qy) <= ry && ry <= math.max(py, qy)
    (o1 == 0 && onSeg(ax, ay, bx, by, cx, cy)) ||
    (o2 == 0 && onSeg(ax, ay, bx, by, dx, dy)) ||
    (o3 == 0 && onSeg(cx, cy, dx, dy, ax, ay)) ||
    (o4 == 0 && onSeg(cx, cy, dx, dy, bx, by))
  }

  /** Does segment (ax,ay)-(bx,by) intersect rect [x0,x1]x[y0,y1]? */
  private def segIntersectsRect(ax: Double, ay: Double, bx: Double, by: Double,
                                x0: Double, y0: Double, x1: Double, y1: Double): Boolean = {
    if (ax >= x0 && ax <= x1 && ay >= y0 && ay <= y1) return true
    if (bx >= x0 && bx <= x1 && by >= y0 && by <= y1) return true
    segsIntersect(ax, ay, bx, by, x0, y0, x1, y0) ||
    segsIntersect(ax, ay, bx, by, x1, y0, x1, y1) ||
    segsIntersect(ax, ay, bx, by, x1, y1, x0, y1) ||
    segsIntersect(ax, ay, bx, by, x0, y1, x0, y0)
  }

  private def anyEdgeIntersectsRect(rings: Array[Array[Double]],
                                    x0: Double, y0: Double, x1: Double, y1: Double): Boolean = {
    var ri = 0
    while (ri < rings.length) {
      val ring = rings(ri)
      val n = ring.length / 2
      var i = 0
      while (i < n) {
        val j = if (i == n - 1) 0 else i + 1
        if (segIntersectsRect(ring(2 * i), ring(2 * i + 1),
          ring(2 * j), ring(2 * j + 1), x0, y0, x1, y1)) return true
        i += 1
      }
      ri += 1
    }
    false
  }

  /**
   * Compact cell cover of a polygon: a set of disjoint cells, resolutions
   * rMin..rMax, whose union is a superset of the polygon (SOUND — every
   * point inside the polygon lies in exactly one emitted cell) and tight:
   * cells fully inside are emitted at the coarsest resolution at which they
   * become fully interior; boundary cells are refined down to rMax.
   */
  def cover(rings: Array[Array[Double]], rMin: Int, rMax: Int): Array[Long] = {
    require(rMin <= rMax && rMax <= Cells.MaxRes)
    val (latMin, latMax, lonMin, lonMax) = bbox(rings)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]

    def visit(cell: Long): Unit = {
      val r = Cells.res(cell)
      val (cLatMin, cLatMax, cLonMin, cLonMax) = Cells.bounds(cell)
      // disjoint from bbox -> drop (sound: bbox is a superset of polygon)
      if (cLatMax < latMin || cLatMin > latMax ||
          cLonMax < lonMin || cLonMin > lonMax) return
      val boundary = anyEdgeIntersectsRect(rings, cLonMin, cLatMin, cLonMax, cLatMax)
      if (!boundary) {
        // no boundary crosses the cell: uniformly inside or outside
        val cx = (cLonMin + cLonMax) / 2.0
        val cy = (cLatMin + cLatMax) / 2.0
        if (contains(cy, cx, rings)) out += cell
        // else fully outside -> drop
      } else if (r >= rMax) {
        out += cell // boundary cell at max refinement: emit (sound)
      } else {
        // boundary crosses the cell and r < rMax: refine. Recursion
        // invariant: boundary cells are EMITTED only at rMax (branch
        // above); interior cells emit at the coarsest r at which they
        // become fully interior. Seeding starts at rMin, so r < rMin
        // never reaches this point.
        Cells.children(cell).foreach(visit)
      }
    }

    // seed at the coarsest cells overlapping the bbox (at rMin)
    val seedR = rMin
    val xLo = Cells.lonToX(lonMin, seedR); val xHi = Cells.lonToX(lonMax, seedR)
    val yLo = Cells.latToY(latMin, seedR); val yHi = Cells.latToY(latMax, seedR)
    var y = yLo
    while (y <= yHi) {
      var x = xLo
      while (x <= xHi) {
        visit(Cells.mkCell(seedR, Cells.interleave(x, y, seedR)))
        x += 1
      }
      y += 1
    }
    val arr = out.toArray
    java.util.Arrays.sort(arr)
    arr
  }
}

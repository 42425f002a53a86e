package graft.core

/**
 * From-scratch hierarchical cell index (S2-style, simplified to a single
 * equirectangular face; see SURVEY.md §1.6 for the rationale and the
 * documented divergence from true 6-face S2 — the index only needs to be
 * hierarchical, deterministic, prefix-containing and neighbor-enumerable
 * for the join/tiling semantics required by BASELINE.json).
 *
 * Cell id layout (64-bit signed long, always non-negative):
 *
 *   bits 63..61  : 0                (keeps ids positive / order-stable)
 *   bits 60..56  : resolution r     (5 bits, 0 <= r <= 28)
 *   bits 55..0   : Morton code of (x, y) at the 2^r x 2^r grid, in the
 *                  LOW 2r bits (x bits at even positions, y at odd).
 *
 * Projection: x = floor((lon+180)/360 * 2^r), y = floor((lat+90)/180 * 2^r),
 * both clamped to [0, 2^r-1]. All arithmetic is fixed-order IEEE-754 double
 * math so the encoding is bit-reproducible across JVM, DuckDB and any
 * partitioning (exact-match requirement, BASELINE.json "metric").
 *
 * Tiles: the raster tile grid at zoom z IS the cell grid at resolution z
 * (tile assignment == parent(cell, z)); tile y counts from the south edge.
 */
object Cells {
  final val MaxRes = 28
  private final val MortonMask = (1L << 56) - 1

  /** Resolution stored in the id. */
  @inline def res(cell: Long): Int = ((cell >>> 56) & 0x1f).toInt

  /** Morton payload (low 2r bits). */
  @inline def morton(cell: Long): Long = cell & MortonMask

  @inline def mkCell(r: Int, m: Long): Long = (r.toLong << 56) | m

  /** Grid x coordinate from lon at resolution r. Fixed-order double math. */
  def lonToX(lon: Double, r: Int): Long = {
    val n = 1L << r
    val raw = math.floor((lon + 180.0) / 360.0 * n).toLong
    if (raw < 0) 0L else if (raw > n - 1) n - 1 else raw
  }

  /** Grid y coordinate from lat at resolution r (south = 0). */
  def latToY(lat: Double, r: Int): Long = {
    val n = 1L << r
    val raw = math.floor((lat + 90.0) / 180.0 * n).toLong
    if (raw < 0) 0L else if (raw > n - 1) n - 1 else raw
  }

  /** Interleave: bit k of x -> bit 2k, bit k of y -> bit 2k+1. */
  def interleave(x: Long, y: Long, r: Int): Long = {
    var m = 0L
    var k = 0
    while (k < r) {
      m |= ((x >>> k) & 1L) << (2 * k)
      m |= ((y >>> k) & 1L) << (2 * k + 1)
      k += 1
    }
    m
  }

  /** Base-4 key string of a cell: one digit per level, coarsest first;
    * digit = x-bit | (y-bit << 1) at that level (south-origin y, matching
    * tile_y). The PREFIX property makes it the storage-layout / tile-
    * addressing key: quadkey(parent(c, rp)) == quadkey(c).substring(0, rp),
    * so lexicographic key ranges are exactly cell-prefix ranges. */
  def quadkey(cell: Long): String = {
    val r = res(cell)
    val m = morton(cell)
    val sb = new java.lang.StringBuilder(r)
    var j = r - 1
    while (j >= 0) {
      sb.append(('0' + ((m >>> (2 * j)) & 3L).toInt).toChar)
      j -= 1
    }
    sb.toString
  }

  /** Inverse of [[quadkey]]: resolution = key length. */
  def fromQuadkey(qk: String): Long = {
    require(qk.length <= MaxRes, s"quadkey longer than $MaxRes: $qk")
    var m = 0L
    var i = 0
    while (i < qk.length) {
      val d = qk.charAt(i) - '0'
      require(d >= 0 && d <= 3, s"invalid quadkey char in: $qk")
      m |= d.toLong << (2 * (qk.length - 1 - i))
      i += 1
    }
    mkCell(qk.length, m)
  }

  /** (x, y) of the cell in its 2^r x 2^r grid. */
  def toXY(cell: Long): (Long, Long) = {
    val r = res(cell)
    val m = morton(cell)
    var x = 0L
    var y = 0L
    var k = 0
    while (k < r) {
      x |= ((m >>> (2 * k)) & 1L) << k
      y |= ((m >>> (2 * k + 1)) & 1L) << k
      k += 1
    }
    (x, y)
  }

  /** Encode a point at resolution r. */
  def encode(lat: Double, lon: Double, r: Int): Long = {
    require(r >= 0 && r <= MaxRes, s"resolution $r out of [0, $MaxRes]")
    mkCell(r, interleave(lonToX(lon, r), latToY(lat, r), r))
  }

  /** Ancestor of `cell` at coarser resolution rp (rp <= res(cell)). */
  def parent(cell: Long, rp: Int): Long = {
    val r = res(cell)
    require(rp >= 0 && rp <= r, s"parent res $rp out of [0, $r]")
    mkCell(rp, morton(cell) >>> (2 * (r - rp)))
  }

  /** The 4 children one resolution finer. */
  def children(cell: Long): Array[Long] = {
    val r = res(cell)
    require(r < MaxRes)
    val base = morton(cell) << 2
    Array(mkCell(r + 1, base), mkCell(r + 1, base | 1L),
      mkCell(r + 1, base | 2L), mkCell(r + 1, base | 3L))
  }

  /** Inclusive Morton range of `cell`'s descendants at resolution rFine —
    * lets a coarse cell prune a fine-cell-sorted table by range. */
  def prefixRange(cell: Long, rFine: Int): (Long, Long) = {
    val r = res(cell)
    require(rFine >= r && rFine <= MaxRes)
    val shift = 2 * (rFine - r)
    val lo = morton(cell) << shift
    val hi = lo + ((1L << shift) - 1)
    (mkCell(rFine, lo), mkCell(rFine, hi))
  }

  /** True if `anc` is `cell` or an ancestor of it. */
  def contains(anc: Long, cell: Long): Boolean = {
    val ra = res(anc)
    val rc = res(cell)
    rc >= ra && parent(cell, ra) == anc
  }

  /** Cells at Chebyshev grid distance exactly k (k=0 -> the cell itself).
    * Longitude wraps; latitude rows outside the grid are skipped. Output is
    * sorted ascending for determinism. */
  def ring(cell: Long, k: Int): Array[Long] = {
    require(k >= 0)
    val r = res(cell)
    if (k == 0) return Array(cell)
    val n = 1L << r
    val (cx, cy) = toXY(cell)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var dy = -k
    while (dy <= k) {
      val y = cy + dy
      if (y >= 0 && y < n) {
        val edge = dy == -k || dy == k
        var dx = -k
        while (dx <= k) {
          if (edge || dx == -k || dx == k) {
            var x = (cx + dx) % n
            if (x < 0) x += n
            out += mkCell(r, interleave(x, y, r))
          }
          dx += 1
        }
      }
      dy += 1
    }
    val arr = out.distinct.toArray // lon wrap can alias at tiny r
    java.util.Arrays.sort(arr)
    arr
  }

  /** All cells within Chebyshev distance k (disk = rings 0..k). */
  def disk(cell: Long, k: Int): Array[Long] = {
    val arr = (0 to k).flatMap(ring(cell, _)).distinct.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  /** The 8 immediate neighbors. */
  def neighbors(cell: Long): Array[Long] = ring(cell, 1)

  /** Geographic bounds of a cell: (latMin, latMax, lonMin, lonMax). */
  def bounds(cell: Long): (Double, Double, Double, Double) = {
    val r = res(cell)
    val n = (1L << r).toDouble
    val (x, y) = toXY(cell)
    val lonMin = x / n * 360.0 - 180.0
    val lonMax = (x + 1) / n * 360.0 - 180.0
    val latMin = y / n * 180.0 - 90.0
    val latMax = (y + 1) / n * 180.0 - 90.0
    (latMin, latMax, lonMin, lonMax)
  }

  /** Cell width/height in degrees at resolution r: (dLon, dLat). */
  def cellSizeDeg(r: Int): (Double, Double) = {
    val n = (1L << r).toDouble
    (360.0 / n, 180.0 / n)
  }

  /** Tile assignment: the raster tile at zoom z containing this cell
    * (requires z <= res(cell)). Identical to parent(). */
  @inline def cellToTile(cell: Long, z: Int): Long = parent(cell, z)
}

package graft.core

/**
 * Content-defined document fingerprinting via polynomial rolling hashes
 * (Rabin-Karp): hash every w-char window of the normalized text in O(n),
 * keep the k smallest window hashes (a winnowing-style sketch). Two
 * documents sharing long runs of content share window hashes, so the
 * min-sketch overlaps — shift-robust near-dup detection where MinHash over
 * word shingles is too coarse.
 *
 * Base/modulus fixed (base 257, mod 2^61-1, Mersenne reduction) so the
 * fingerprint is deterministic everywhere.
 */
object RollingHash {
  final val Mod = (1L << 61) - 1
  final val Base = 257L

  @inline private def mulMod(a: Long, b: Long): Long = {
    // 128-bit multiply mod 2^61-1 via Math.multiplyHigh (JDK 9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold: (hi:lo) mod 2^61-1, using 2^64 = 8 mod (2^61-1)
    val loMod = (lo & Mod) + (lo >>> 61)
    val hiMod = mulSmall(hi, 8)
    reduce(loMod + hiMod)
  }
  @inline private def mulSmall(a: Long, k: Long): Long = reduce(a * k)
  @inline private def reduce(x: Long): Long = {
    var v = (x & Mod) + (x >>> 61)
    if (v >= Mod) v -= Mod
    v
  }

  /** Hash of one w-char window starting the stream. */
  def hashWindows(s: String, w: Int): Array[Long] = {
    val n = s.length
    if (n < w) {
      if (n == 0) return Array(0L)
      return Array(hashAll(s))
    }
    val out = new Array[Long](n - w + 1)
    // pow = Base^(w-1) mod Mod
    var pow = 1L
    var i = 0
    while (i < w - 1) { pow = mulMod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = reduce(mulMod(h, Base) + s.charAt(i)); i += 1 }
    out(0) = h
    i = w
    while (i < n) {
      val drop = mulMod(s.charAt(i - w).toLong, pow)
      h = reduce(h + Mod - drop)
      h = reduce(mulMod(h, Base) + s.charAt(i))
      out(i - w + 1) = h
      i += 1
    }
    out
  }

  private def hashAll(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) { h = reduce(mulMod(h, Base) + s.charAt(i)); i += 1 }
    h
  }

  /** The k smallest distinct window hashes, ascending (the sketch). */
  def minSketch(s: String, w: Int, k: Int): Array[Long] = {
    val hs = hashWindows(s, w)
    java.util.Arrays.sort(hs)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < hs.length && out.length < k) {
      if (out.isEmpty || out.last != hs(i)) out += hs(i)
      i += 1
    }
    out.toArray
  }

  /** Single 64-bit fingerprint: the minimum window hash (w chars). */
  def minFingerprint(s: String, w: Int): Long = {
    val hs = hashWindows(s, w)
    var min = Long.MaxValue
    var i = 0
    while (i < hs.length) { if (hs(i) < min) min = hs(i); i += 1 }
    min
  }
}

package graft.core

import java.nio.charset.StandardCharsets

/**
 * Deterministic page geocoding from raw HTML bytes (SURVEY.md §1.7): the
 * reference took article coordinates from the Wikipedia API / nuts4nuts
 * [PK]; the web-scale restatement geocodes "from parsed HTML"
 * (BASELINE.json north_star). Spec: the first
 *   <meta name="geo.position" content="LAT;LON">
 * tag wins; `ICBM` ("LAT, LON") is the fallback — both real conventions
 * from the Common-Crawl era. Parsing is byte-deterministic: strict decimal
 * doubles via java.lang.Double.parseDouble, no locale.
 */
object Geocode {

  private val geoPosRe =
    ("""(?is)<meta\s+name\s*=\s*["']geo\.position["']\s+content\s*=\s*["']\s*""" +
     """(-?\d+(?:\.\d+)?)\s*;\s*(-?\d+(?:\.\d+)?)\s*["']""").r
  private val icbmRe =
    ("""(?is)<meta\s+name\s*=\s*["']ICBM["']\s+content\s*=\s*["']\s*""" +
     """(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*["']""").r

  /** Hot path: byte-level case-insensitive search for the marker literal,
    * then the regex runs only on a +-256-byte window around each hit — no
    * full-page UTF-8 decode, no full-page regex scan (the meta tag's
    * attributes are ASCII; a window of 512 bytes comfortably covers the
    * tag). Same accepted language as fromString for any page whose marker
    * occurrences fit the window. */
  def fromHtml(html: Array[Byte]): Option[(Double, Double)] = {
    val geo = scanMarker(html, geoSearcher, geoPosRe)
    if (geo.isDefined) geo else scanMarker(html, icbmSearcher, icbmRe)
  }

  private val geoSearcher = new CaselessSearcher("geo.position")
  private val icbmSearcher = new CaselessSearcher("icbm")

  private def scanMarker(html: Array[Byte], searcher: CaselessSearcher,
                         re: scala.util.matching.Regex): Option[(Double, Double)] = {
    var i = searcher.indexOf(html, 0)
    while (i >= 0) {
      val lo = math.max(0, i - 256)
      val hi = math.min(html.length, i + 256)
      val window = new String(html, lo, hi - lo, StandardCharsets.UTF_8)
      val m = re.findFirstMatchIn(window)
      m.flatMap(parseMatch) match {
        case some @ Some(_) => return some
        case None => i = searcher.indexOf(html, i + 1)
      }
    }
    None
  }

  /** Caseless Boyer-Moore-Horspool over raw bytes (round-6, guide §1.2
    * "per-task work"): a page WITHOUT markers pays two full-body scans
    * (geo.position, then ICBM), and the flagship corpus is one-third such
    * pages — the previous per-byte comparison loop was the dominant
    * engine cost of the coverage job after the parquet scan itself. The
    * bad-byte table advances ~|needle| bytes per probe on non-matching
    * text (~8x fewer byte reads for the 12-byte geo marker). First-match
    * positions are identical to the naive scan — fuzz-asserted against it
    * in TextSpec. `needle` must be lowercase ASCII. */
  private[core] final class CaselessSearcher(needle: String) {
    private val n = needle.length
    private val lastChar = needle.charAt(n - 1)
    private val skip: Array[Int] = {
      val t = Array.fill(256)(n)
      var k = 0
      while (k < n - 1) {
        val c = needle.charAt(k)
        t(c.toInt) = n - 1 - k
        t(Character.toUpperCase(c).toInt) = n - 1 - k
        k += 1
      }
      t
    }
    def indexOf(hay: Array[Byte], from: Int): Int = {
      val limit = hay.length - n
      var i = math.max(0, from)
      while (i <= limit) {
        val last = hay(i + n - 1)
        if (lowerByte(last) == lastChar) {
          var j = 0
          while (j < n - 1 && lowerByte(hay(i + j)) == needle.charAt(j)) j += 1
          if (j == n - 1) return i
        }
        i += skip(last & 0xff)
      }
      -1
    }
  }

  @inline private def lowerByte(b: Byte): Char = {
    val c = (b & 0xff).toChar
    if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
  }

  private def parseMatch(mm: scala.util.matching.Regex.Match): Option[(Double, Double)] = {
    try {
      val lat = java.lang.Double.parseDouble(mm.group(1))
      val lon = java.lang.Double.parseDouble(mm.group(2))
      if (lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180) Some((lat, lon))
      else None
    } catch { case _: NumberFormatException => None }
  }

  /** Reference implementation (tests, mini-oracle parity): full-string
    * regex. fromHtml is the byte-windowed equivalent. */
  def fromString(s: String): Option[(Double, Double)] = {
    val m = geoPosRe.findFirstMatchIn(s).orElse(icbmRe.findFirstMatchIn(s))
    m.flatMap(parseMatch)
  }
}

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
    val geo = scanMarker(html, "geo.position", geoPosRe)
    if (geo.isDefined) geo else scanMarker(html, "icbm", icbmRe)
  }

  private def scanMarker(html: Array[Byte], marker: String,
                         re: scala.util.matching.Regex): Option[(Double, Double)] = {
    var i = byteIndexOfCI(html, marker, 0)
    while (i >= 0) {
      val lo = math.max(0, i - 256)
      val hi = math.min(html.length, i + 256)
      val window = new String(html, lo, hi - lo, StandardCharsets.UTF_8)
      val m = re.findFirstMatchIn(window)
      m.flatMap(parseMatch) match {
        case some @ Some(_) => return some
        case None => i = byteIndexOfCI(html, marker, i + 1)
      }
    }
    None
  }

  /** Case-insensitive ASCII substring search over raw bytes. */
  private def byteIndexOfCI(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.length
    val limit = hay.length - n
    var i = math.max(0, from)
    while (i <= limit) {
      var j = 0
      while (j < n && lowerByte(hay(i + j)) == needle.charAt(j)) j += 1
      if (j == n) return i
      i += 1
    }
    -1
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

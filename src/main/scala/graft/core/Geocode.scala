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

  def fromHtml(html: Array[Byte]): Option[(Double, Double)] =
    fromString(new String(html, StandardCharsets.UTF_8))

  def fromString(s: String): Option[(Double, Double)] = {
    val m = geoPosRe.findFirstMatchIn(s).orElse(icbmRe.findFirstMatchIn(s))
    m.flatMap { mm =>
      try {
        val lat = java.lang.Double.parseDouble(mm.group(1))
        val lon = java.lang.Double.parseDouble(mm.group(2))
        if (lat >= -90 && lat <= 90 && lon >= -180 && lon <= 180) Some((lat, lon))
        else None
      } catch { case _: NumberFormatException => None }
    }
  }
}

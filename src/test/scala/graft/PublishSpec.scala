package graft

import org.apache.spark.sql.functions._

import graft.operators.Publish

/** The publish sink (reference stage H: static per-region progress pages
  * with Wikipedia / OSM / JOSM links): deterministic rendering goldens,
  * escaping, link formats, summary math, file materialization. A sink —
  * spec-tested like the GeoJSON sink, not DuckDB-oracled. */
class PublishSpec extends SparkTestBase {
  import spark.implicits._

  private def features = Seq(
    (7L, 101L, "node", "it:Duomo di Milano", "ok"),
    (7L, 2001L, "way", "de:Some & <Way>", "ok"),
    (7L, 3001L, "relation", null, "url_value"),
    (9L, 104L, "node", "fr:Tour: Eiffel", "ok"))
    .toDF("region_id", "feature_id", "feature_type", "tag_key", "error_class")

  test("progressSummary: exact counts and one-decimal percentage") {
    val s = Publish.progressSummary(features).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toMap
    assert(s(7L) == ((3L, 2L, 1L, "66.7")))
    assert(s(9L) == ((1L, 1L, 0L, "100.0")))
  }

  test("progressPages: deterministic page with links, escaping, error rows") {
    val pages = Publish.progressPages(features).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    val (path7, html7) = pages(7L)
    assert(path7 == "region_7.html")
    assert(html7.contains("<h1>Region 7</h1>"))
    assert(html7.contains("2 of 3 features tagged (66.7%)"))
    // wikipedia link: lang from the prefix, spaces -> underscores
    assert(html7.contains(
      "https://it.wikipedia.org/wiki/Duomo_di_Milano"))
    // escaping: the raw tag text is HTML-escaped in the anchor body
    assert(html7.contains("de:Some &amp; &lt;Way&gt;"))
    assert(!html7.contains("<Way>"))
    // osm + josm links with the right type prefix
    assert(html7.contains("https://www.openstreetmap.org/way/2001"))
    assert(html7.contains("http://localhost:8111/load_object?objects=w2001"))
    assert(html7.contains("load_object?objects=n101"))
    // error rows render the error class, never a broken wikipedia link
    assert(html7.contains("<span class=\"err\">url_value</span>"))
    // rows are feature_id-sorted regardless of input order
    val i101 = html7.indexOf("<tr><td>101<")
    val i2001 = html7.indexOf("<tr><td>2001<")
    val i3001 = html7.indexOf("<tr><td>3001<")
    assert(i101 >= 0 && i101 < i2001 && i2001 < i3001)
    // title keeps everything after the FIRST colon
    assert(pages(9L)._2.contains("https://fr.wikipedia.org/wiki/Tour:_Eiffel"))
  }

  test("rendering is identical across partitionings") {
    def render(parts: Int) =
      Publish.progressPages(features.repartition(parts)).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(render(1) == render(7))
  }

  test("writeHtml materializes pages + index as files") {
    val dir = java.nio.file.Files.createTempDirectory("graftpub").toString
    Publish.writeHtml(Publish.progressPages(features), dir)
    val idx = Publish.indexHtml(Publish.progressSummary(features))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/index.html"), idx)
    val f7 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$dir/region_7.html"))
    assert(f7.contains("<h1>Region 7</h1>"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/region_9.html")))
    assert(idx.contains("<a href=\"region_7.html\">region 7</a>") &&
      idx.contains("<td>2/3</td><td>66.7%</td>") &&
      idx.contains("<td>1/1</td><td>100.0%</td>"))
    // index lists regions in sorted order
    assert(idx.indexOf("region_7") < idx.indexOf("region_9"))
  }
}

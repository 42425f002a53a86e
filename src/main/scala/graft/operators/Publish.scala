package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Publish layer (SURVEY §1.1 [PK] stage H: the reference emits static HTML
 * progress pages per region — tagged/untagged counts, per-feature rows
 * with Wikipedia / OSM / JOSM remote-control links — served as a static
 * site). Re-expressed as a deterministic SINK: page HTML is assembled
 * from per-row codegen'd string expressions + one per-region aggregation,
 * so rendering scales like any other aggregation (never a driver loop
 * over features); the only driver-bounded artifact is the index page (one
 * row per region — the same bounded-dimension rule as the cover summary).
 *
 * Determinism contract (same as the GeoJSON sink): feature rows are
 * sorted by feature_id inside each page via sort_array over
 * (feature_id, line) structs — never collect_list order; numbers are
 * integers or %.1f percentages; link formats are the public conventions
 * (JOSM remote control load_object, openstreetmap.org object URLs,
 * per-language wikipedia.org titles with space -> underscore).
 *
 * Input contract: (region_id, feature_id, feature_type ∈ node|way|
 * relation, tag_key nullable "lang:Title", error_class) — the tag-match
 * output shape (OsmXml.features joined to a region assignment).
 */
object Publish {

  private def escapeHtml(c: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(c,
      "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\"", "&quot;")

  /** Per-region progress summary: total / tagged-ok / errors / pct. */
  def progressSummary(features: DataFrame): DataFrame =
    features.groupBy(col("region_id"))
      .agg(count("*").as("total"),
        sum(when(col("error_class") === "ok", 1L).otherwise(0L)).as("tagged"),
        sum(when(col("error_class") =!= "ok", 1L).otherwise(0L)).as("errors"))
      .withColumn("pct",
        format_string("%.1f", col("tagged") * 100.0 / col("total")))

  /** One (path, html) row per region: the reference's per-region progress
    * page. Feature links: wikipedia (from the normalized lang:Title key),
    * osm.org object page, JOSM remote-control load_object. */
  def progressPages(features: DataFrame, dir: String = ""): DataFrame = {
    val typeChar = substring(col("feature_type"), 1, 1) // n / w / r
    // split at the FIRST colon only: titles may themselves contain colons;
    // the title is HTML-escaped here too (it lands in an attribute value)
    val wikiHref = concat(lit("https://"),
      substring_index(col("tag_key"), ":", 1), lit(".wikipedia.org/wiki/"),
      escapeHtml(regexp_replace(
        expr("substring(tag_key, instr(tag_key, ':') + 1)"), " ", "_")))
    val osmHref = concat(lit("https://www.openstreetmap.org/"),
      col("feature_type"), lit("/"), col("feature_id"))
    val josmHref = concat(
      lit("http://localhost:8111/load_object?objects="),
      typeChar, col("feature_id"))
    val line = concat(
      lit("<tr><td>"), col("feature_id"),
      lit("</td><td>"), col("feature_type"),
      lit("</td><td>"),
      // round-6 (r5 advice): an 'ok' row with a NULL tag_key must not
      // null-propagate through wikiHref and silently vanish from the
      // table while the 'tagged' count still includes it — such rows now
      // render through the error branch with a synthetic class
      when(col("error_class") === "ok" && col("tag_key").isNotNull,
        concat(lit("<a href=\""), wikiHref, lit("\">"),
          escapeHtml(col("tag_key")), lit("</a>")))
        .otherwise(concat(lit("<span class=\"err\">"),
          escapeHtml(when(col("error_class") === "ok", lit("missing_tag_key"))
            // error_class is non-null by the input contract (tagClassify
            // output), but a row from a looser upstream must degrade to a
            // visible class, not null the whole line out of the table
            .otherwise(coalesce(col("error_class"), lit("null_error_class")))),
          lit("</span>"))),
      lit("</td><td><a href=\""), osmHref, lit("\">osm</a> "),
      lit("<a href=\""), josmHref, lit("\">josm</a></td></tr>"))
    val page = features
      .groupBy(col("region_id"))
      .agg(
        count("*").as("total"),
        sum(when(col("error_class") === "ok", 1L).otherwise(0L)).as("tagged"),
        sort_array(collect_list(struct(col("feature_id"), line.as("line"))))
          .as("rows"))
      .select(col("region_id"),
        concat(lit(dir), lit("region_"), col("region_id"), lit(".html")).as("path"),
        concat(
          lit("<!DOCTYPE html><html><head><meta charset=\"utf-8\">" +
            "<title>Region "), col("region_id"), lit(" tagging progress" +
            "</title></head><body><h1>Region "), col("region_id"),
          lit("</h1><p>"), col("tagged"), lit(" of "), col("total"),
          lit(" features tagged ("),
          format_string("%.1f", col("tagged") * 100.0 / col("total")),
          lit("%)</p><table><tr><th>id</th><th>type</th><th>wikipedia" +
            "</th><th>links</th></tr>"),
          array_join(transform(col("rows"), r => r.getField("line")), ""),
          lit("</table></body></html>")).as("html"))
    page.select("region_id", "path", "html")
  }

  /** The index page (one row per region — bounded dimension): coverage
    * table linking to each region page. Deterministic: regions sorted. */
  def indexHtml(summary: DataFrame): String = {
    val rows = summary.select(col("region_id"), col("total"), col("tagged"),
        col("pct"))
      .collect().sortBy(_.getLong(0))
      .map { r =>
        val rid = r.getLong(0)
        s"""<tr><td><a href="region_$rid.html">region $rid</a></td>""" +
          s"""<td>${r.getLong(2)}/${r.getLong(1)}</td><td>${r.getString(3)}%</td></tr>"""
      }.mkString
    "<!DOCTYPE html><html><head><meta charset=\"utf-8\">" +
      "<title>Tagging progress</title></head><body><h1>Tagging progress" +
      "</h1><table><tr><th>region</th><th>tagged</th><th>%</th></tr>" +
      rows + "</table></body></html>"
  }

  /** Materialize (path, html) rows as files, executor-side via Hadoop FS
    * (works on local paths, HDFS and object stores alike); page count is
    * bounded by the region dimension, page size by its feature count. */
  def writeHtml(pages: DataFrame, dir: String): Unit = {
    // driver conf shipped with the closure — see plans.HadoopConf
    val confProps = graft.plans.HadoopConf.capture(pages.sparkSession)
    pages.select("path", "html").foreachPartition {
      it: Iterator[org.apache.spark.sql.Row] =>
        val conf = graft.plans.HadoopConf.restore(confProps)
        it.foreach { r =>
          val p = new org.apache.hadoop.fs.Path(dir, r.getString(0))
          val fs = p.getFileSystem(conf)
          val out = fs.create(p, true)
          try out.write(r.getString(1).getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
        }
    }
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Deterministic synthesis of the production input table — exact
 * `input_hint` shape (BASELINE.json): (url:string, warc_ts:timestamp,
 * html:binary, text:string, lang:string). No wall clock, no RNG: every
 * column is a pure function of the row index, so any two runs (and the
 * mini-oracle) agree byte-for-byte. ~2/3 of pages carry a geo.position
 * meta tag; 15% of the geocoded ones land in one 0.2 deg hot box (inside
 * the quad AND mega fixture regions) to exercise skew handling.
 *
 * At production scale this table is an Iceberg/Parquet scan; the reader
 * below goes through DataFrameReader so swapping format is config, and the
 * generator writes many splits so scans parallelize (SURVEY.md §6.1).
 */
object Pages {

  final val Epoch2024 = 1704067200L // 2024-01-01T00:00:00Z

  private def repeatCol(s: org.apache.spark.sql.Column,
                        n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.concat_ws("",
      org.apache.spark.sql.functions.array_repeat(s, n))

  /** In-memory synthesized pages. */
  def synthesize(spark: SparkSession, n: Long,
                 numPartitions: Int = 128): DataFrame = {
    val base = spark.range(0, n, 1, numPartitions)
    val geocoded = col("id") % 3 < 2
    val hot = col("id") % 20 < 3
    val lat = when(hot, lit(9.80) + (col("id") * 13 % 20) / 100.0)
      .otherwise(lit(-60) + (col("id") * 7919 % 12000) / 100.0)
    val lon = when(hot, lit(19.80) + (col("id") * 17 % 20) / 100.0)
      .otherwise(lit(-180) + (col("id") * 104729 % 36000) / 100.0)
    val geoMeta = when(geocoded,
      concat(lit("<meta name=\"geo.position\" content=\""),
        format_string("%.2f", lat), lit(";"), format_string("%.2f", lon),
        lit("\">"))).otherwise(lit(""))
    val entities = when(col("id") % 17 === 0,
      lit("<p>caf&#233; &amp; bar &lt;tags&gt; &quot;q&quot;</p>")).otherwise(lit(""))
    // 1-4 KB of body markup (FIXTURES.md §P sizing): a seeded sentence
    // repeated 12..72 times, with id-derived tokens so texts differ
    val sentence = concat(lit("<p>word"), col("id") % 997,
      lit(" lorem ipsum dolor sit amet consectetur adipiscing elit sed "),
      lit("do eiusmod tempor incididunt ut labore page "), col("id") % 7919,
      lit("</p>"))
    val body = concat(
      expr("repeat('<div class=\"filler\">markup noise</div>', 4)"),
      repeatCol(sentence, (col("id") % 61 + lit(12)).cast("int")))
    val htmlStr = concat(lit("<html><head>"), geoMeta,
      lit("<title>Page "), col("id"), lit("</title></head><body>"),
      body, entities, lit("<script>var x = 1;</script></body></html>"))
    val html = encode(htmlStr, "UTF-8")
    base.select(
      concat(lit("https://site"), col("id") % 97, lit(".example/page/"),
        col("id")).as("url"),
      timestamp_seconds(lit(Epoch2024) + col("id")).as("warc_ts"),
      html.as("html"),
      TextFunctions.extractText(html).as("text"),
      element_at(array(lit("it"), lit("en"), lit("de"), lit("fr"), lit("es")),
        (col("id") % 5 + 1).cast("int")).as("lang"))
  }

  /** Write a bench corpus once (>= numPartitions row groups / splits). */
  def writeCorpus(spark: SparkSession, n: Long, path: String,
                  numPartitions: Int = 128): Unit =
    synthesize(spark, n, numPartitions).write.mode("overwrite").parquet(path)

  /** Read a pages table (format-pluggable: parquet in-sandbox, iceberg in
    * production — same downstream plan). */
  def read(spark: SparkSession, path: String,
           format: String = "parquet"): DataFrame =
    spark.read.format(format).load(path)
}

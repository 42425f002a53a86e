package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/**
 * Distributed OSM XML parsing (SURVEY.md §2.A2 — the reference's stage B
 * stream-parses an osmfilter'ed national extract with a SAX parser [PK]).
 *
 * Spark mapping: one XML document per file, parsed executor-side with a
 * forward-only StAX pull parser inside `mapPartitions` over the file list
 * (plain Scala, no Catalyst extension needed — SURVEY.md §2.A2). Files
 * parallelize across executors; production-scale inputs arrive as many
 * per-region extracts (or PBF blocks), so per-file is the natural split.
 *
 * Extracted per object: id, type (node/way/relation), lat/lon (nodes only;
 * ways/relations would need geometry assembly — the reference's matching
 * needs only the wikipedia tags + node coords), and the full tag map.
 */
object OsmXml {

  final case class OsmObject(
      featureId: Long,
      featureType: String,
      lat: Option[Double],
      lon: Option[Double],
      tags: Map[String, String])

  /** Parse one OSM XML document (string form). Pure, deterministic. */
  def parseDocument(xml: String): Iterator[OsmObject] = {
    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    factory.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    val reader = factory.createXMLStreamReader(new java.io.StringReader(xml))
    val out = scala.collection.mutable.ArrayBuffer.empty[OsmObject]
    var cur: OsmObject = null
    var tags = Map.newBuilder[String, String]
    import javax.xml.stream.XMLStreamConstants._
    while (reader.hasNext) {
      reader.next() match {
        case START_ELEMENT =>
          reader.getLocalName match {
            case t @ ("node" | "way" | "relation") =>
              def attr(n: String): Option[String] =
                Option(reader.getAttributeValue(null, n))
              cur = OsmObject(
                attr("id").map(_.toLong).getOrElse(-1L), t,
                attr("lat").map(java.lang.Double.parseDouble),
                attr("lon").map(java.lang.Double.parseDouble),
                Map.empty)
              tags = Map.newBuilder
            case "tag" if cur != null =>
              val k = reader.getAttributeValue(null, "k")
              val v = reader.getAttributeValue(null, "v")
              if (k != null && v != null) tags += (k -> v)
            case _ =>
          }
        case END_ELEMENT =>
          reader.getLocalName match {
            case "node" | "way" | "relation" if cur != null =>
              out += cur.copy(tags = tags.result())
              cur = null
            case _ =>
          }
        case _ =>
      }
    }
    reader.close()
    out.iterator
  }

  /** Distributed read: each file parsed on an executor. */
  def read(spark: SparkSession, pathGlob: String): Dataset[OsmObject] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(pathGlob)
      .flatMap { case (_, content) => parseDocument(content) }
      .toDS()
  }

  /** Feature relation for the tag-match join: objects carrying any
    * wikipedia tag, with the normalized key and error routing columns
    * (SURVEY.md §1.2-2: malformed values flow to errors, never join). */
  def features(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions
    val objs = read(spark, pathGlob)
    objs.filter(o => o.tags.keys.exists(k =>
        k == "wikipedia" || k.startsWith("wikipedia:")))
      .map(o => (o.featureId, o.featureType,
        o.lat.getOrElse(Double.NaN), o.lon.getOrElse(Double.NaN),
        o.tags, o.tags.getOrElse("wikipedia",
          o.tags.collectFirst {
            // wikipedia:lang=Title variant -> lang:Title
            case (k, v) if k.startsWith("wikipedia:") =>
              k.substring("wikipedia:".length) + ":" + v
          }.getOrElse(""))))
      .toDF("feature_id", "feature_type", "lat", "lon", "tags", "raw_value")
      .withColumn("tag_key", TextFunctions.tagParse(col("raw_value")))
      .withColumn("error_class", TextFunctions.tagClassify(col("raw_value")))
  }
}

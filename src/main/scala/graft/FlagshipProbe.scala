package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{GeoFunctions, TextFunctions}

/** Round-6 flagship decomposition probe (guide §1): times the coverage
  * pipeline and its per-stage prefixes over the bench corpus so the
  * engine cost is attributable stage by stage. Reuses (or synthesizes)
  * the same corpus as graft.Bench; every stage is timed with the noop
  * sink except the stated aggregations, min of `reps`.
  *
  * Usage: runMain graft.FlagshipProbe [reps] [stage...]
  * Stages: scan extract geocode encode assign flagship (default: all).
  */
object FlagshipProbe {
  def main(args: Array[String]): Unit = {
    // first arg is reps when numeric; a bare stage list works too
    // (e.g. `runMain graft.FlagshipProbe flagnoop`)
    val (reps, stageArgs) = args.headOption.flatMap(_.toIntOption) match {
      case Some(r) => (r, args.drop(1))
      case None => (3, args)
    }
    val stages = if (stageArgs.nonEmpty) stageArgs.toSet
                 else Set("scan", "extract", "geocode", "encode", "assign", "extractf", "flagship", "flagnoop")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "8000000").toLong
    val corpus = s"target/bench_pages_$nPages"
    if (!new java.io.File(s"$corpus/_SUCCESS").exists())
      sources.Pages.writeCorpus(spark, nPages, corpus, numPartitions = 128)
    val pages = spark.read.parquet(corpus)

    def timed(name: String)(act: => Unit): Unit = {
      act // warm-up
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); act; (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-10s min=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }

    if (stages("scan"))
      timed("scan") { pages.selectExpr("sum(length(html))").collect(); () }
    if (stages("extract"))
      timed("extract") {
        pages.select(
          TextFunctions.tokenCountWs(TextFunctions.extractText(col("html")))
            .as("tokens"))
          .selectExpr("sum(tokens)").collect(); ()
      }
    if (stages("geocode"))
      timed("geocode") {
        pages.select(TextFunctions.geoLat(col("html")).as("lat"),
            TextFunctions.geoLon(col("html")).as("lon"))
          .selectExpr("sum(lat)", "sum(lon)").collect(); ()
      }
    if (stages("encode"))
      timed("encode") { // geocode + tokens + cell encode, pre-join shape
        val pts = pages.select(col("url"),
            TextFunctions.geoLat(col("html")).as("lat"),
            TextFunctions.geoLon(col("html")).as("lon"),
            TextFunctions.tokenCountWs(TextFunctions.extractText(col("html")))
              .as("tokens"))
          .where(col("lat").isNotNull && col("lon").isNotNull)
          .withColumn("tile", GeoFunctions.cellEncode(col("lat"), col("lon"), lit(8)))
        // tile & 0xFFFFF keeps the sum far from long overflow (ANSI mode)
        pts.selectExpr("sum(tile & 1048575)", "sum(tokens)").collect(); ()
      }
    if (stages("assign"))
      timed("assign") { // full pipeline minus the final per-tile agg
        val tsCol = lit(null).cast("timestamp")
        val pts = pages.select(col("url"), tsCol.as("warc_ts"),
            TextFunctions.geoLat(col("html")).as("lat"),
            TextFunctions.geoLon(col("html")).as("lon"),
            TextFunctions.tokenCountWs(TextFunctions.extractText(col("html")))
              .as("tokens"))
          .where(col("lat").isNotNull && col("lon").isNotNull)
          .withColumn("tile", GeoFunctions.cellEncode(col("lat"), col("lon"), lit(8)))
        operators.SpatialJoin.assignRegions(pts, "url",
            operators.SpatialJoin.coverDF(spark))
          .selectExpr("count(*)").collect(); ()
      }
    if (stages("extractf"))
      timed("extractf") { // extract restricted to geocoded rows (the
        // flagship's actual extraction volume: the lat/lon filter pushes
        // below the projection, so tokens is computed post-filter)
        pages.select(TextFunctions.geoLat(col("html")).as("lat"),
            TextFunctions.geoLon(col("html")).as("lon"),
            TextFunctions.tokenCountWs(TextFunctions.extractText(col("html")))
              .as("tokens"))
          .where(col("lat").isNotNull && col("lon").isNotNull)
          .selectExpr("sum(tokens)", "sum(lat)").collect(); ()
      }
    if (stages("flagship"))
      timed("flagship") { Pipeline.coverageStats(spark, pages, z = 8).count(); () }
    if (stages("flagnoop"))
      timed("flagnoop") { // noop sink: computes EVERY output column — no
        // count()-side pruning of the final aggregates (guide §1.4)
        Pipeline.coverageStats(spark, pages, z = 8)
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}

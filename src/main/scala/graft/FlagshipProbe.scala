package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time the flagship (Pipeline.coverageStats) in isolation —
  * min of N reps after one warm-up, plus the scan-only control — without
  * paying for the full Bench query loop or ScalingBench's three
  * parallelism levels. Used to A/B plan changes on the measured path.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_PROBE_REPS=3 \
  *     sbt -batch "runMain graft.FlagshipProbe"
  */
object FlagshipProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "8000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = s"target/bench_pages_$nPages"
    if (!new java.io.File(s"$corpus/_SUCCESS").exists())
      sources.Pages.writeCorpus(spark, nPages, corpus, numPartitions = 128)
    val pages = spark.read.parquet(corpus)
    // SPARK_GRAFT_PROBE_MODE=salted-hot A/Bs the crawl-cycle skew mode:
    // a first coverage pass stands in for the previous run's tile stats,
    // then the timed reps join through the pre-declared hot/cold split
    val mode: operators.SpatialJoin.Mode =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_MODE", "auto") match {
        case "auto" => operators.SpatialJoin.Auto()
        case "shuffle" => operators.SpatialJoin.Shuffle
        case "salted-hot" =>
          val threshold =
            sys.env.getOrElse("SPARK_GRAFT_HOT_THRESHOLD", "5000").toLong
          val hot = operators.SpatialJoin.hotTilesFromStats(
            Pipeline.coverageStats(spark, pages, z = 8), 8, threshold)
          println(s"""{"hot_tiles":${hot.length}}""")
          operators.SpatialJoin.ShuffleSaltedHot(8, hot, 8)
        case other => sys.error(s"unknown SPARK_GRAFT_PROBE_MODE $other")
      }
    def once(): Double = {
      val t0 = System.nanoTime()
      Pipeline.coverageStats(spark, pages, z = 8, joinMode = mode).count()
      (System.nanoTime() - t0) / 1e9
    }
    def scanOnce(): Double = {
      val t0 = System.nanoTime()
      pages.selectExpr("sum(length(html))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up
    val times = Seq.fill(reps)(once())
    val scan = Seq.fill(2)(scanOnce()).min
    val best = times.min
    println(s"""{"flagship_sec":$best,"all_reps":[${times.mkString(",")}],"pages_per_sec":${nPages / best},"scan_sec":$scan,"flagship_over_scan":${scan / best}}""")
    spark.stop()
  }
}

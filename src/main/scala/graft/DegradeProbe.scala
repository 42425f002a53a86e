package graft
import org.apache.spark.sql.SparkSession

/** Round-6 probe for the post-query-loop flagship degradation (guide §7):
  * graft.Bench measures the flagship AFTER the 86-query loop in the same
  * JVM, and this session's baseline showed 15.5 s there vs 4.2 s in a
  * fresh JVM (scan control similar) — a degraded-JVM artifact, not an
  * engine cost. This main replays Bench's exact sequence with JVM
  * telemetry between phases to attribute it. Diagnostic only; the frozen
  * driver bench is untouched.
  *
  * Usage: runMain graft.DegradeProbe [nQueries] */
object DegradeProbe {
  private def mb(b: Long) = b / (1024 * 1024)
  private def stats(tag: String): Unit = {
    import scala.jdk.CollectionConverters._
    val gcs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    val gcTime = gcs.map(_.getCollectionTime).sum
    val gcCount = gcs.map(_.getCollectionCount).sum
    val pools = java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
    val code = pools.filter(_.getName.contains("CodeHeap"))
      .map(p => s"${p.getName.replace("CodeHeap '", "").replace("'", "")}=${mb(p.getUsage.getUsed)}M").mkString(" ")
    val meta = pools.find(_.getName == "Metaspace")
      .map(p => mb(p.getUsage.getUsed)).getOrElse(-1L)
    val heap = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    println(s"STATS $tag heapUsed=${mb(heap.getUsed)}M gcTime=${gcTime}ms " +
      s"gcCount=$gcCount metaspace=${meta}M $code threads=${Thread.activeCount()}")
  }

  def main(args: Array[String]): Unit = {
    val nQueries = if (args.nonEmpty) args(0).toInt else Int.MaxValue
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    stats("fresh")

    SparkEntry.queries.toSeq.sortBy(_._1).take(nQueries).foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(); fn(spark, sfDir).count() }
      catch { case _: Throwable => () }
    }
    stats("after-loop")
    graft.plans.SessionCaches.clear(spark)
    stats("after-clear")

    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "8000000").toLong
    val corpus = s"target/bench_pages_$nPages"
    if (!new java.io.File(s"$corpus/_SUCCESS").exists())
      sources.Pages.writeCorpus(spark, nPages, corpus, numPartitions = 128)
    val pages = spark.read.parquet(corpus)
    def flagshipOnce(): Double = {
      val t0 = System.nanoTime()
      Pipeline.coverageStats(spark, pages, z = 8).count()
      (System.nanoTime() - t0) / 1e9
    }
    def scanOnce(): Double = {
      val t0 = System.nanoTime()
      pages.selectExpr("sum(length(html))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"FLAGSHIP warm=${flagshipOnce()}%.2f")
    stats("after-warm")
    (1 to 3).foreach(i => println(f"FLAGSHIP rep$i=${flagshipOnce()}%.2f"))
    (1 to 2).foreach(i => println(f"SCAN rep$i=${scanOnce()}%.2f"))
    stats("end")
    spark.stop()
  }
}

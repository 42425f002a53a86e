package graft
import org.apache.spark.sql.SparkSession

/** Driver bench contract: one JSON line with per-query wall seconds at
  * local[$SPARK_GRAFT_CPUS] on $SPARK_GRAFT_SF_DIR, plus the flagship
  * spatial-join+tiling throughput (pages/sec — the BASELINE.json metric)
  * over a parquet pages corpus synthesized once per invocation.
  *
  * Measurement protocol (round-2 verdict items 1+2):
  * - a query ANY of whose reps throws is reported in the `"errors"` map
  *   and its slot in `"queries"` is -1 — never a flattering fast number,
  *   not even a flaky query's one successful rep (a populated time that is
  *   excluded from the total would mislead consumers) — and it is excluded
  *   from the suite total; invariant: queries[q] >= 0 iff q is absent from
  *   errors iff q's time is included in the total;
  * - between the query loop and the flagship, SessionCaches.clear drops
  *   every memoized/localCheckpointed block the 65-query loop accumulated
  *   (the round-2 degraded-JVM artifact understated the flagship ~6x);
  * - the flagship reports MIN of 3 timed reps after one warm-up (min is
  *   the least-interference capacity estimate on this shared VM, matching
  *   the per-query protocol), plus an in-run scan-only control
  *   (`sum(length(html))`, no engine code) so the figure is interpretable
  *   under host interference. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    // session warm-up (standard bench hygiene): exercise the parquet
    // reader, hash-agg and shuffle codegen paths once so the first
    // alphabetical query's figure measures the query, not JVM start-up
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()
    // min of 2 reps per query: this VM is a shared hypervisor with bursty
    // interference (BENCH.md methodology) — the min is the least-
    // interference estimate of the plan's cost, and the second rep also
    // excludes the per-query codegen compile from the figure
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Either[String, Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          Left(e.getClass.getSimpleName + ": " +
            Option(e.getMessage).getOrElse("").replaceAll("[\"\\\\\n\r\t]", " ").take(160))
        }
      }
      (once(), once()) match {
        case (Right(a), Right(b)) => (name, math.min(a, b), None)
        case (Right(_), Left(e))  => (name, -1.0, Some(e)) // flaky: -1 too
        case (Left(e), _)         => (name, -1.0, Some(e))
      }
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      s"\"" + k + "\":\"" + e + "\"" }
    val errJson = errs.mkString("{", ",", "}")
    val ok = results.filter(r => r._3.isEmpty && r._2 >= 0)
    val total = ok.map(_._2).sum

    // drop the 65-query loop's pinned checkpoint blocks + memo caches
    // BEFORE measuring the flagship (round-2 verdict item 1)
    graft.plans.SessionCaches.clear(spark)

    // flagship throughput: pages/sec through extract + geocode -> spatial
    // join -> tile aggregation over a parquet corpus (>= 128 splits,
    // SURVEY.md §6.1)
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
    // scan-only control, measured in-run: what the box's memory/IO
    // bandwidth gives a no-engine-code scan right now
    def scanOnce(): Double = {
      val t0 = System.nanoTime()
      pages.selectExpr("sum(length(html))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    flagshipOnce() // warm-up (JIT + codegen + broadcast)
    val flagshipSec = Seq.fill(3)(flagshipOnce()).min
    val scanSec = Seq.fill(2)(scanOnce()).min
    val pps = nPages / flagshipSec

    println(s"""{"metric":"total","value":$total,"unit":"sec","reps_per_query":2,"queries":$qs,"errors":$errJson,"n_failed":${errs.length},"sf":"$sfDir","flagship_pages":$nPages,"flagship_sec":$flagshipSec,"flagship_reps":3,"flagship_stat":"min","flagship_pages_per_sec":$pps,"scan_only_sec":$scanSec,"scan_only_pages_per_sec":${nPages / scanSec}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/**
 * Scaling-efficiency evidence (BASELINE.json: ">= 0.8 from N to 4N
 * executors"; sandbox proxy per BASELINE.md: the same job at two
 * parallelism levels on the same input, shuffle.partitions scaled with
 * cores). Runs the flagship pipeline (geocode -> cover join -> PIP ->
 * tile agg) over one shared parquet corpus.
 *
 * Methodology note (recorded in BENCH.md): this sandbox is a shared
 * hypervisor — a pure 32-thread arithmetic burn shows up to 2.2x wall
 * variance between identical reps. Per parallelism level we therefore
 * take the MINIMUM of `reps` runs after a warm-up (the least-interference
 * estimate of machine capacity), and we report two independent N->4N
 * pairs (4->16 and 8->32).
 */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // the synthesized corpus compresses hard (~1.7 MB/file); default
      // 128 MB split packing would starve 32 cores (SURVEY.md §6.1:
      // input splits >= 4x max cores)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "128k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** One timed flagship execution on a fresh session at `cores`. */
  def runOnce(cores: Int, corpus: String): (Double, Long) = {
    val spark = session(cores)
    try {
      val pages = spark.read.parquet(corpus)
      val t0 = System.nanoTime()
      val rows = Pipeline.tileStats(spark, pages, z = 8).count()
      ((System.nanoTime() - t0) / 1e9, rows)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "24000000").toLong
    val rounds = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "5").toInt
    val corpus = s"target/bench_pages_$nPages"
    locally {
      val s = session(32)
      try {
        if (!new java.io.File(s"$corpus/_SUCCESS").exists())
          sources.Pages.writeCorpus(s, nPages, corpus, numPartitions = 128)
      } finally s.stop()
    }
    val levels = Seq(4, 8, 16, 32)
    // interleaved rounds: host interference on this shared VM is bursty,
    // so measuring one level at a time biases whichever level hits a slow
    // burst; round-robin + min per level cancels it. Round 0 is JIT/
    // codegen warm-up and is discarded.
    val samples = (0 to rounds).flatMap { round =>
      levels.map(c => (round, c, runOnce(c, corpus)))
    }
    val reps = rounds
    val rowSet = samples.map(_._3._2).toSet
    val res = levels.map { c =>
      c -> ((samples.collect { case (r, `c`, (sec, _)) if r > 0 => sec }.min,
        rowSet.head))
    }.toMap
    require(rowSet.size == 1, s"result rows differ across parallelism: $rowSet")
    def pps(c: Int) = nPages / res(c)._1
    val eff416 = pps(16) / (4.0 * pps(4))
    val eff832 = pps(32) / (4.0 * pps(8))
    val json = levels.map(c =>
      s""""local${c}_sec":${res(c)._1},"local${c}_pages_per_sec":${pps(c)}""")
      .mkString("{", ",", s""","pages":$nPages,"reps":$reps,"eff_4_to_16":$eff416,"eff_8_to_32":$eff832,"tile_rows":${rowSet.head}}""")
    println(json)
    val md =
      s"""# BENCH — flagship throughput + scaling efficiency
         |
         |Job: pages -> geocode (html meta parse) -> cell encode r7..12 ->
         |compact-cover candidate join -> exact PIP refine -> tile agg (z=8)
         |on a ${nPages}-page parquet corpus (128 files, input_hint schema,
         |synthesized deterministically — `graft.sources.Pages`). MIN of
         |$reps reps after one warm-up per level (shared-hypervisor sandbox:
         |a pure 32-thread arithmetic burn shows up to 2.2x wall variance,
         |so min is the least-interference capacity estimate).
         |`spark.sql.shuffle.partitions` = cores; split size tuned so scan
         |splits >= 4x cores. Identical tile output at every level
         |(asserted: ${rowSet.head} rows). Machine: 32-core Xeon VM, 125 GiB.
         |
         || parallelism | best sec | pages/sec |
         ||---|---|---|
         |${levels.map(c => f"| local[$c] | ${res(c)._1}%.2f | ${pps(c)}%.0f |").mkString("\n")}
         |
         || pair (N -> 4N) | scaling efficiency |
         ||---|---|
         || local[4] -> local[16] | ${f"$eff416%.3f"} |
         || local[8] -> local[32] | ${f"$eff832%.3f"} |
         |
         |Target >= 0.8 (BASELINE.json). Reproduce:
         |`sbt -batch "runMain graft.ScalingBench"`.
         |""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.md"), md)
  }
}

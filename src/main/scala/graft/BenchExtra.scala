package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round measurement harness (guide §1) — NOT the driver
  * contract (graft.Bench is frozen and untouched). This main isolates
  * individual registry queries under the same session config and the same
  * `count()` action the driver times, reports min-of-N seconds per query,
  * and dumps `.explain("formatted")` per query for the plan evidence in
  * plans/r06/.
  *
  * Usage: runMain graft.BenchExtra <reps> <planDir|-> [query substring...]
  *   reps     timed repetitions per query (min is reported)
  *   planDir  directory for <query>.txt formatted plans, or '-' to skip
  *   filters  substrings; a query runs when it matches any (empty = all)
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val planDir = if (args.length > 1) args(1) else "-"
    val filters = args.drop(2).toSeq
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
    // same warm-up as the driver bench
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().count()

    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      filters.isEmpty || filters.exists(n.contains)
    }
    val results = selected.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      if (planDir != "-") {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        val dir = new java.io.File(planDir)
        dir.mkdirs()
        val w = new java.io.PrintWriter(new java.io.File(dir, s"$name.txt"))
        try w.write(plan) finally w.close()
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      (name, times.min)
    }
    spark.sparkContext.setJobDescription(null)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"extra","reps":$reps,"queries":$qs,"total":${results.map(_._2).sum}}""")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B two plan shapes on bench-scale relations (round-4
  * verdict item 9 + the round-5 interpreted-HOF finding). Interleaved
  * reps, min per variant (the shared-VM interference defense).
  *
  * 1. Bucket-cap shape over a SYNTHETIC skewed banded relation
  *    (20M rows, ~20% piled into two mega buckets — the boilerplate
  *    shape the cap exists for):
  *    A window count(*) over (band,bucket)  vs
  *    B groupBy oversize set + broadcast left-anti.
  * 2. MinHash signature build (1M docs): per-row higher-order-function
  *    form (transform/array_min — interpreted lambdas, the r1-r4 shape)
  *    vs explode + codegen hash-agg form (shipped r5).
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.CapProbe"
  */
object CapProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val nBanded = sys.env.getOrElse("SPARK_GRAFT_CAP_ROWS", "20000000").toLong
    val nSigDocs = sys.env.getOrElse("SPARK_GRAFT_SIG_DOCS", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }

    // --- 1. cap shape on synthetic skewed banded rows ---
    val banded = spark.range(0, nBanded, 1, cpus.toInt * 4).select(
        concat(lit("doc"), col("id")).as("doc_id"),
        (col("id") % 2).cast("int").as("band"),
        when(col("id") % 10 < 2, concat(lit("MEGA"), col("id") % 2))
          .otherwise(md5((col("id") % 500000).cast("string"))).as("bucket"))
      .localCheckpoint(true)
    val maxBucket = 100
    def windowShape(): Unit = {
      val wSz = org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("bucket"))
      banded.withColumn("__bn", count("*").over(wSz))
        .where(col("__bn") <= maxBucket).drop("__bn")
        .groupBy("band").count().count()
      ()
    }
    def antiShape(): Unit = {
      val oversize = banded.groupBy(col("band"), col("bucket"))
        .agg(count("*").as("__bn")).where(col("__bn") > maxBucket)
        .select("band", "bucket")
      banded.join(broadcast(oversize), Seq("band", "bucket"), "left_anti")
        .groupBy("band").count().count()
      ()
    }
    windowShape(); antiShape() // warm-up
    val (as, bs) = (1 to reps).map { _ =>
      (time(windowShape _), time(antiShape _))
    }.unzip

    // --- 2. signature build: HOF per-row vs explode+agg ---
    val docs = spark.range(0, nSigDocs, 1, cpus.toInt * 4).select(
        concat(lit("d"), col("id")).as("doc_id"),
        // ~120-word synthetic text, id-salted so shingles differ
        concat_ws(" ", (0 until 120).map(i =>
          concat(lit(s"w$i"), (col("id") + i) % 997)): _*).as("text"))
      .localCheckpoint(true)
    def hofShape(): Unit = {
      val sig = (0 until 4).map(i =>
        operators.Dedup.minhash(
          operators.Dedup.shingles(col("text"), 3), i).as(s"mh$i"))
      docs.select(col("doc_id") +: sig: _*)
        .select(max(length(col("mh0")))).collect()
      ()
    }
    def aggShape(): Unit = {
      operators.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 4)
        .select(max(length(col("mh0")))).collect()
      ()
    }
    hofShape(); aggShape() // warm-up
    val (hs, gs) = (1 to reps).map { _ =>
      (time(hofShape _), time(aggShape _))
    }.unzip

    println(s"""{"cap_rows":$nBanded,"window_sec":${as.min},"anti_sec":${bs.min},"window_reps":[${as.mkString(",")}],"anti_reps":[${bs.mkString(",")}],"sig_docs":$nSigDocs,"sig_hof_sec":${hs.min},"sig_agg_sec":${gs.min},"sig_hof_reps":[${hs.mkString(",")}],"sig_agg_reps":[${gs.mkString(",")}]}""")
    spark.stop()
  }
}

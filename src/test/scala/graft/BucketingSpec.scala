package graft

import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions
import graft.sources.GeoFixtures

/** Co-located joins via bucketed tables (the pre-shuffle alternative to
  * runtime repartitioning at 10^12 scale: pay the shuffle ONCE at write
  * time, every subsequent cell-keyed join reads bucket-aligned files with
  * no Exchange at all). */
class BucketingSpec extends SparkTestBase {

  test("both sides bucketed by cell -> join plans with zero Exchange") {
    import spark.implicits._
    val feats = GeoFixtures.features(spark, sfDir)
      .withColumn("cell", GeoFunctions.cellEncode($"lat", $"lon", lit(7)))
    val pts = GeoFixtures.points(spark, sfDir)
      .withColumn("cell", GeoFunctions.cellEncode($"lat", $"lon", lit(7)))
    spark.sql("DROP TABLE IF EXISTS feats_b")
    spark.sql("DROP TABLE IF EXISTS pts_b")
    // the in-memory catalog forgets tables across JVMs but the managed
    // location on disk persists — clear it so saveAsTable can recreate
    Seq("feats_b", "pts_b").foreach { t =>
      val dir = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    feats.write.mode("overwrite").bucketBy(8, "cell").sortBy("cell")
      .saveAsTable("feats_b")
    pts.write.mode("overwrite").bucketBy(8, "cell").sortBy("cell")
      .saveAsTable("pts_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("pts_b").as("p")
        .join(spark.table("feats_b").as("f"), "cell")
        .select($"p.k", $"f.fid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(2000))

      // and the result equals the plain (shuffled) join
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = pts.as("p").join(feats.as("f"), "cell")
        .select($"p.k", $"f.fid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.nonEmpty && got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("quadkey-prefix layout: subtree reads scan only the subtree's files") {
    import graft.plans.QuadkeyLayout
    import graft.sources.Pages

    // actual files SCANNED (not just rows returned): the numFiles metric
    // of the executed FileSourceScan, through AQE's final plan
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      // execute THIS df's own plan (count() would build a separate query
      // whose metrics never reach df.queryExecution.executedPlan)
      df.queryExecution.toRdd.count()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves().collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.sum
    }

    val pts = Pipeline.geocode(Pages.synthesize(spark, 2000, 8))
    val dir = java.nio.file.Files.createTempDirectory("graftqk").toString + "/qk"
    QuadkeyLayout.write(pts, dir, prefixRes = 3)

    // NB: QuadkeyLayout.read, not a bare parquet read — all-digit partition
    // values would otherwise be type-inferred to INT, eating leading zeros
    val all = QuadkeyLayout.read(spark, dir)
    val prefixes = all.select("qk_prefix").distinct().collect()
      .map(_.getString(0)).sorted
    assert(prefixes.length > 1 &&
      prefixes.forall(p => p.length == 3 && p.forall(c => c >= '0' && c <= '3')))
    // prefix property ties the layout to the codec: the partition value IS
    // the first 3 digits of the row's full-resolution quadkey
    val viol = QuadkeyLayout.withQkPrefix(
        all.select("url", "lat", "lon"), prefixRes = 12)
      .withColumnRenamed("qk_prefix", "qk12")
      .join(all.select("url", "qk_prefix"), "url")
      .where(substring(col("qk12"), 1, 3) =!= col("qk_prefix")).count()
    assert(viol == 0)

    // subtree read at a COARSER prefix (resolution 1: a quarter of the
    // world): partition pruning must skip every other subtree's files
    val qk1 = prefixes.head.take(1)
    val sub = QuadkeyLayout.readSubtree(spark, dir, qk1)
    val total = scannedFiles(all)
    val pruned = scannedFiles(sub)
    // files on disk under matching qk_prefix= dirs — the expected scan set
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get(dir)
    val diskFiles = java.nio.file.Files.walk(base).iterator().asScala
      .filter(f => f.toString.endsWith(".parquet")).toSeq
    val matching = diskFiles.count(_.toString.contains(s"qk_prefix=$qk1"))
    assert(total == diskFiles.length && total > matching)
    assert(pruned == matching && pruned > 0, s"scanned $pruned of $total")
    // and the rows are exactly the subtree's
    val expected = QuadkeyLayout.withQkPrefix(pts, 3)
      .where(col("qk_prefix").startsWith(qk1)).count()
    assert(sub.count() == expected && expected > 0)

    // every prefix length 1..3 (coarser and exact-depth subtrees): rows
    // equal an independent recompute from lat/lon
    (1 to 3).foreach { len =>
      prefixes.map(_.take(len)).distinct.foreach { p =>
        val got = QuadkeyLayout.readSubtree(spark, dir, p).count()
        val exp = QuadkeyLayout.withQkPrefix(pts, 3)
          .where(col("qk_prefix").startsWith(p)).count()
        assert(got == exp, s"prefix $p")
      }
    }
  }
}

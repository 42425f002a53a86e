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
}

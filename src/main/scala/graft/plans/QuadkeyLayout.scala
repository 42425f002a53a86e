package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GeoFunctions

/**
 * Quadkey-prefix storage layout — the STRING sibling of the numeric
 * `cell_prefix` partitioning used by [[Lineage]].
 *
 * The quadkey codec's prefix property (core.Cells.quadkey: the base-4 key
 * of `parent(c, rp)` is a string prefix of the key of `c`) means every
 * quadtree SUBTREE is exactly one lexicographic key range. Writing the
 * output partitioned by the coarse quadkey therefore gives readers free
 * spatial pruning with nothing but an ordinary string predicate: a
 * `startsWith(prefix)` filter on the partition column is evaluated
 * driver-side over partition values, and Spark's partition pruning skips
 * every non-matching directory — no file under another subtree is opened
 * (asserted by scan-metric file counts in BucketingSpec). The same
 * property holds for Iceberg identity partitioning / sort orders on the
 * key, so the layout survives the mandated production format swap.
 */
object QuadkeyLayout {

  /** Add the partition key: the quadkey of the point's cell at
    * `prefixRes` (== the first `prefixRes` digits of any finer quadkey). */
  def withQkPrefix(df: DataFrame, prefixRes: Int = Lineage.PrefixRes): DataFrame =
    df.withColumn("qk_prefix",
      GeoFunctions.cellQuadkey(
        GeoFunctions.cellEncode(col("lat"), col("lon"), lit(prefixRes))))

  /** Write `df` (carrying lat/lon) partitioned by quadkey prefix. */
  def write(df: DataFrame, outPath: String,
            prefixRes: Int = Lineage.PrefixRes): Unit =
    withQkPrefix(df, prefixRes).write.mode("overwrite")
      .partitionBy("qk_prefix").parquet(outPath)

  /** Read the layout back with `qk_prefix` pinned to STRING. Without the
    * explicit schema, partition-column type inference parses the all-digit
    * directory values as integers — "012" becomes 12, silently dropping
    * the leading quadkey digit and corrupting every prefix comparison.
    * Providing a user schema overrides inference and keeps the raw value. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val inferred = spark.read.parquet(path).schema
    val pinned = org.apache.spark.sql.types.StructType(inferred.map(f =>
      if (f.name == "qk_prefix")
        f.copy(dataType = org.apache.spark.sql.types.StringType)
      else f))
    spark.read.schema(pinned).parquet(path)
  }

  /** All rows in the subtree of the cell whose quadkey is `prefix` (any
    * length <= the written prefixRes). Partition-pruned: only files under
    * matching `qk_prefix=` directories are scanned. */
  def readSubtree(spark: SparkSession, path: String, prefix: String): DataFrame =
    read(spark, path).where(col("qk_prefix").startsWith(prefix))
}

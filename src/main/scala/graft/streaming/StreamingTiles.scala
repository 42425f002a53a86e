package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.Pipeline
import graft.operators.SpatialJoin

/**
 * Incremental ingest path (SURVEY.md §2.J maps the batch design onto
 * Structured Streaming; descoped from the correctness bar — the north rule
 * is batch + resume — but provided so a pages stream can drive the same
 * spatial join). `foreachBatch` reuses the EXACT batch operators, so
 * streaming results match batch semantics by construction; watermarked
 * tumbling windows give per-window tile stats for a live coverage map.
 */
object StreamingTiles {

  /** Streaming per-(window, tile, region) counts from a pages stream
    * (exact input_hint schema + event time = warc_ts). */
  def windowedTileStats(spark: SparkSession, pages: DataFrame, z: Int,
                        window_ : String = "1 hour",
                        watermark: String = "2 hours"): DataFrame = {
    import spark.implicits._
    val pts = pages
      .withWatermark("warc_ts", watermark)
      .select($"url", $"warc_ts",
        graft.functions.TextFunctions.geoLat($"html").as("lat"),
        graft.functions.TextFunctions.geoLon($"html").as("lon"))
      .where($"lat".isNotNull && $"lon".isNotNull)
    val assigned = SpatialJoin.assign(pts, "url",
      SpatialJoin.coverDF(spark), SpatialJoin.Broadcast)
    assigned
      .withColumn("tile", graft.functions.GeoFunctions
        .cellEncode($"lat", $"lon", lit(z)))
      .groupBy(window($"warc_ts", window_), $"tile", $"region_id")
      .agg(count("*").as("n"))
  }

  /** Streaming exact dedup over a pages stream: first occurrence of each
    * content hash wins; duplicates arriving later are dropped. State is
    * bounded by the watermark (`dropDuplicatesWithinWatermark`: a repeat of
    * a page older than the watermark may re-emit, which is the standard
    * trade for bounded state at 10^12-page scale — unbounded exact dedup
    * state is the batch job's business, SURVEY.md §2 Dedup row). Keyed by
    * md5(html): the shuffle key is the hash, so state is evenly spread. */
  def dedupStream(pages: DataFrame, watermark: String = "2 hours"): DataFrame =
    pages
      .withColumn("html_md5", md5(col("html")))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("html_md5")

  /** Batch-parity variant: stream -> foreachBatch -> the batch pipeline,
    * appending matches to a parquet sink. */
  def matchesSink(spark: SparkSession, pages: DataFrame,
                  outPath: String): DataStreamWriter[org.apache.spark.sql.Row] =
    pages.writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Pipeline.matches(spark, batch)
          .withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(outPath)
      }
      .trigger(Trigger.AvailableNow())
}

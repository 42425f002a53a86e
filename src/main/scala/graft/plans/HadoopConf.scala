package graft.plans

import org.apache.spark.sql.SparkSession

/**
 * Ships the driver's Hadoop configuration to executor-side code that opens
 * filesystems OUTSIDE Spark's own readers (the PBF blob decoder, the
 * publish HTML sink). A bare `new Configuration()` on an executor sees
 * only classpath defaults — every `spark.hadoop.*` setting the job was
 * launched with (object-store credentials, endpoints, timeouts) is
 * silently dropped, so an S3/GCS path that works for the driver-side
 * framing scan fails at decode time. Spark's own SerializableConfiguration
 * has a private[spark] signature, so the properties ride as a plain Map.
 */
object HadoopConf {

  /** All effective entries of the driver session's hadoopConfiguration. */
  def capture(spark: SparkSession): Map[String, String] = {
    val c = spark.sparkContext.hadoopConfiguration
    val it = c.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  /** Rebuild a Configuration from captured entries (executor-side). */
  def restore(props: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    props.foreach { case (k, v) => c.set(k, v) }
    c
  }
}

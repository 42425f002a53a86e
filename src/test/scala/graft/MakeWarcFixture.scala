package graft

import org.apache.spark.sql.SparkSession

/** Test-scope helper main: writes a small WARC corpus (synthesized pages)
  * for the spark-submit `--warc` CLI smoke. Usage:
  *   sbt "Test/runMain graft.MakeWarcFixture /tmp/graftwarc 60000 8"
  */
object MakeWarcFixture {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graftwarc")
    val n = args.lift(1).map(_.toLong).getOrElse(60000L)
    val files = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Warc.writeDir(
      graft.sources.Pages.synthesize(spark, n, 8), dir, files, gzip = true)
    println(s"wrote $files warc.gz files under $dir")
    spark.stop()
  }
}

package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.sources.{Pages, Warc}

class WarcSpec extends SparkTestBase {

  private def roundTrip(gzip: Boolean): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graftwarc").toString
    val pages = Pages.synthesize(spark, 300, numPartitions = 4)
      .select("url", "warc_ts", "html")
    Warc.writeDir(pages, dir, n = 4, gzip = gzip)
    val ext = if (gzip) "*.warc.gz" else "*.warc"
    val back = Warc.read(spark, s"$dir/$ext")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime,
        new String(r.getAs[Array[Byte]](2), StandardCharsets.UTF_8))).toSet
    val orig = key(pages)
    val got = key(back)
    assert(got.size == 300 && got == orig)
    // file = parallelism unit: one input partition per WARC file
    assert(back.rdd.getNumPartitions >= 1)
  }

  test("WARC round-trip: plain files") { roundTrip(gzip = false) }
  test("WARC round-trip: gzipped files") { roundTrip(gzip = true) }

  test("parser surfaces only response records and skips warcinfo/request") {
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val resp = Warc.writeBytes(Iterator(("https://a.example/x", ts,
      "<html>ok</html>".getBytes(StandardCharsets.UTF_8))))
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val stream = new java.io.ByteArrayInputStream(info ++ resp ++ info)
    val recs = Warc.parse(stream).toList
    assert(recs.map(_._1) == List("https://a.example/x"))
    assert(new String(recs.head._3, StandardCharsets.UTF_8) == "<html>ok</html>")
    assert(recs.head._2 == ts)
  }

  test("truncated record fails loudly, bad version line fails loudly") {
    val ts = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val good = Warc.writeBytes(Iterator(("https://a/x", ts,
      "0123456789".getBytes(StandardCharsets.UTF_8))))
    // chop the payload mid-record: the pull parser must throw, not emit
    // a silent partial record
    val truncated = good.take(good.length - 8)
    intercept[Exception] {
      Warc.parse(new java.io.ByteArrayInputStream(truncated)).toList
    }
    val garbage = "NOT-A-WARC/9.9\r\n\r\n".getBytes(StandardCharsets.UTF_8)
    intercept[IllegalArgumentException] {
      Warc.parse(new java.io.ByteArrayInputStream(garbage)).toList
    }
  }

  test("malformed header line (no colon) and oversize Content-Length fail loudly") {
    // a header line without ':' used to throw a raw
    // StringIndexOutOfBoundsException from substring(0, -1); it must be a
    // diagnosable require instead
    val noColon = ("WARC/1.0\r\nWARC-Type response\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    val e1 = intercept[IllegalArgumentException] {
      Warc.parse(new java.io.ByteArrayInputStream(noColon)).toList
    }
    assert(e1.getMessage.contains("malformed WARC header"))
    // Content-Length past the JVM array limit must not silently truncate
    // via len.toInt (wrong payload size or negative-array crash)
    val huge = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${Int.MaxValue.toLong + 10}\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    val e2 = intercept[IllegalArgumentException] {
      Warc.parse(new java.io.ByteArrayInputStream(huge)).toList
    }
    assert(e2.getMessage.contains("exceeds the JVM array limit"))
  }

  test("WARC scan feeds the flagship pipeline unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graftwarc2").toString
    val pages = Pages.synthesize(spark, 400, numPartitions = 2)
    Warc.writeDir(pages.select("url", "warc_ts", "html"), dir, n = 2)
    // re-derive text/lang downstream of the scan (the production shape:
    // WARC carries bytes; text is OUR extraction, per the B2 invariant)
    val scanned = Warc.read(spark, s"$dir/*.warc")
      .withColumn("text", graft.functions.TextFunctions.extractText(col("html")))
    def stats(df: org.apache.spark.sql.DataFrame) =
      Pipeline.tileStats(spark, df, z = 8).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaWarc = stats(scanned)
    val viaParquet = stats(pages)
    assert(viaWarc.nonEmpty && viaWarc == viaParquet)
  }
}

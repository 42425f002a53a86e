package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * WARC source for Common-Crawl-style web-page corpora (WARC/1.0, ISO
 * 28500 — the format CC publishes; spec is public). Pages land in the
 * exact `input_hint` scan shape: (url, warc_ts, html).
 *
 * Scale shape: the FILE is the parallelism unit — exactly how the real
 * Common Crawl corpus is consumed (crawls ship as ~64k independent .warc.gz
 * files of ~1 GB; a 10^12-page job schedules one task per file, and the
 * scheduler's locality + AQE handle the rest). `binaryFile` streams each
 * file to one task; records are parsed with a pull parser that never
 * materializes more than one record. Gzip is detected per file (multi-
 * member streams — CC gzips member-per-record — decode transparently
 * through JDK GZIPInputStream).
 *
 * Restrictions vs full ISO 28500 (documented, not silent): only
 * `WARC-Type: response` records are surfaced; HTTP response headers inside
 * the payload, if present, are NOT stripped (CC "WET"-like payloads write
 * the body directly, which is what [[write]] produces).
 */
object Warc {

  final val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true)))

  private val CRLF = "\r\n"
  private val iso = java.time.format.DateTimeFormatter.ISO_INSTANT

  /** Serialize records as a WARC/1.0 byte stream (optionally gzipped). */
  def writeBytes(records: Iterator[(String, java.sql.Timestamp, Array[Byte])],
                 gzip: Boolean = false): Array[Byte] = {
    val raw = new ByteArrayOutputStream()
    val out = if (gzip) new GZIPOutputStream(raw) else raw
    records.foreach { case (url, ts, payload) =>
      val header =
        "WARC/1.0" + CRLF +
        "WARC-Type: response" + CRLF +
        s"WARC-Target-URI: $url" + CRLF +
        s"WARC-Date: ${iso.format(ts.toInstant)}" + CRLF +
        s"Content-Length: ${payload.length}" + CRLF + CRLF
      out.write(header.getBytes(StandardCharsets.UTF_8))
      out.write(payload)
      out.write((CRLF + CRLF).getBytes(StandardCharsets.UTF_8))
    }
    out.close()
    raw.toByteArray
  }

  /** Pull-parse one WARC stream; emits only WARC-Type: response records. */
  def parse(in: InputStream): Iterator[(String, java.sql.Timestamp, Array[Byte])] =
    new Iterator[(String, java.sql.Timestamp, Array[Byte])] {
      private val din = new DataInputStream(in)
      private var nextRec: (String, java.sql.Timestamp, Array[Byte]) = _
      private var eof = false

      private def readLine(): String = {
        // WARC header lines are US-ASCII, CRLF-terminated
        val buf = new ByteArrayOutputStream(128)
        var b = din.read()
        if (b < 0) throw new EOFException
        while (b >= 0 && b != '\n') { buf.write(b); b = din.read() }
        val s = buf.toString(StandardCharsets.UTF_8.name())
        if (s.endsWith("\r")) s.dropRight(1) else s
      }

      @annotation.tailrec
      private def advance(): Unit = {
        // seek the next version line (skips inter-record blank lines)
        var line: String = null
        try {
          line = readLine()
          while (line.isEmpty) line = readLine()
        } catch { case _: EOFException => eof = true; return }
        require(line.startsWith("WARC/"), s"not a WARC record header: $line")
        var url: String = null
        var ts: java.sql.Timestamp = null
        var wtype: String = null
        var len = -1L
        var h = readLine()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          require(i > 0, s"malformed WARC header line (no ':'): $h")
          val (k, v) = (h.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT),
            h.substring(i + 1).trim)
          k match {
            case "warc-target-uri" => url = v
            case "warc-date" =>
              ts = java.sql.Timestamp.from(java.time.Instant.parse(v))
            case "warc-type" => wtype = v
            case "content-length" => len = v.toLong
            case _ => // ignore other headers
          }
          h = readLine()
        }
        require(len >= 0, "WARC record without Content-Length")
        // a JVM byte[] tops out at Int.MaxValue; a silently truncated
        // len.toInt would read the wrong payload size (or crash on a
        // negative array) — fail loudly with the offending length instead
        require(len <= Int.MaxValue - 8,
          s"WARC Content-Length $len exceeds the JVM array limit")
        val payload = new Array[Byte](len.toInt)
        din.readFully(payload)
        if (wtype == "response") nextRec = (url, ts, payload)
        else advance() // skip warcinfo/request/metadata records
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !eof) advance()
        nextRec != null
      }
      override def next(): (String, java.sql.Timestamp, Array[Byte]) = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRec
        nextRec = null
        r
      }
    }

  private def open(path: String, content: Array[Byte]): InputStream = {
    val base = new ByteArrayInputStream(content)
    if (path.endsWith(".gz")) new GZIPInputStream(base) else base
  }

  /** Distributed WARC scan -> (url, warc_ts, html). One task per file (the
    * Common-Crawl parallelism unit); `binaryFile` handles discovery,
    * locality and max-file guards. */
  def read(spark: SparkSession, glob: String): DataFrame = {
    val files = spark.read.format("binaryFile").load(glob)
      .select("path", "content")
    val rows = files.rdd.flatMap { r =>
      val path = r.getString(0)
      val content = r.getAs[Array[Byte]](1)
      parse(open(path, content)).map { case (url, ts, payload) =>
        Row(url, ts, payload)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Write a DataFrame with (url, warc_ts, html) columns as `n` WARC files
    * under `dir` (test/bench corpus writer; gz when `gzip`). */
  def writeDir(df: DataFrame, dir: String, n: Int, gzip: Boolean = false): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val ext = if (gzip) ".warc.gz" else ".warc"
    df.select("url", "warc_ts", "html").repartition(n).rdd
      .mapPartitionsWithIndex { (i, it) =>
        val recs = it.map(r => (r.getString(0), r.getTimestamp(1),
          r.getAs[Array[Byte]](2)))
        Iterator((i, writeBytes(recs, gzip)))
      }
      .collect()
      .foreach { case (i, bytes) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(f"$dir/part-$i%05d$ext"), bytes)
      }
  }
}

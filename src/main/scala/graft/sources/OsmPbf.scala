package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.sources.OsmXml.{OsmMember, OsmObject}

/**
 * Splittable OSM PBF source (SURVEY.md §2.A2; the round-4 verdict's top
 * format gap: real planet data ships as PBF, and a single planet file
 * neither splits nor fits through the one-file-one-record XML path).
 *
 * Format (public OSM PBF spec, fileformat.proto + osmformat.proto): a file
 * is a sequence of [4-byte big-endian length][BlobHeader][Blob] frames;
 * OSMData blobs hold a (usually zlib-deflated) PrimitiveBlock with a
 * string table, dense/plain nodes, ways and relations, coordinates as
 * nanodegree integers (lat = (lat_offset + granularity*raw) nanodeg).
 *
 * Spark mapping — BLOB = PARALLELISM UNIT: the driver scans only the blob
 * FRAMING (4-byte length + ~32-byte BlobHeader per blob, seeking past the
 * payloads — a planet file is ~50k blobs, so this touches ~2 MB of a
 * ~80 GB file), then parallelizes (path, offset, length) slices; executors
 * read, inflate and decode their own byte ranges. No whole-file records,
 * no driver-side payload.
 *
 * The protobuf wire format is decoded by a ~100-line hand reader (varint /
 * zigzag / length-delimited — the whole wire grammar PBF uses) rather than
 * generated stubs: zero codegen deps, and the reader only materializes the
 * fields the engine consumes. Unsupported compression or a required
 * feature beyond OsmSchema-V0.6/DenseNodes fails loudly at framing time.
 *
 * Determinism: coordinates decode as `(offset + granularity*raw) / 1e9`.
 * The sum is exact in Long and 1e9 is a power-of-ten double with an exact
 * binary representation, so the correctly-rounded IEEE division yields THE
 * nearest double to the exact decimal value — bit-identical to
 * Double.parseDouble of the same coordinate written out in decimal (the
 * XML path). Verified over 2M random nanodegree values; `1e-9 * x` (the
 * naive reading of the spec constant) differs by 1 ulp on ~40% of values
 * and is deliberately NOT used. XML->PBF->parse round-trip parity is
 * asserted exactly, not approximately, in SourcesSpec.
 */
object OsmPbf {

  /** One decodable byte range: an OSMData blob's payload position. */
  final case class BlobSlice(path: String, offset: Long, length: Int)

  // ---- protobuf wire reader (varint / zigzag / length-delimited) ----

  /** Forward-only reader over buf[from, to). */
  private final class Wire(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var v = 0L
      while (shift < 64) {
        // fail loudly at the reader's own bound: without this, a
        // truncated field would silently decode bytes belonging to
        // sibling fields of the shared buffer
        require(pos < end, "varint overruns field boundary")
        val b = buf(pos)
        pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
      }
      throw new IllegalArgumentException("malformed varint (>64 bits)")
    }
    def sint(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1L) }
    /** Returns (fieldNumber, wireType). */
    def tag(): (Int, Int) = { val t = varint(); ((t >>> 3).toInt, (t & 7).toInt) }
    /** Length-delimited payload as a sub-reader. */
    def sub(): Wire = {
      // long math before the Int narrowing: a corrupt length of 2^32
      // would truncate to 0 and misparse silently
      val nl = varint()
      require(nl >= 0 && pos + nl <= end,
        s"length-delimited field overruns blob")
      val n = nl.toInt
      val w = new Wire(buf, pos, pos + n)
      pos += n
      w
    }
    def bytes(): Array[Byte] = {
      val w = sub()
      java.util.Arrays.copyOfRange(buf, w.pos, w.end)
    }
    def string(): String = {
      val w = sub()
      new String(buf, w.pos, w.end - w.pos, java.nio.charset.StandardCharsets.UTF_8)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end, "fixed64 overruns field"); pos += 8
      case 2 => sub(); ()
      case 5 => require(pos + 4 <= end, "fixed32 overruns field"); pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
    def packedLongs(zigzag: Boolean): Array[Long] = {
      val w = sub()
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      while (w.hasMore) out += (if (zigzag) w.sint() else w.varint())
      out.toArray
    }
  }

  // ---- framing (driver-side, header-only scan) ----

  private def parseBlobHeader(hdr: Array[Byte]): (String, Int) = {
    val w = new Wire(hdr, 0, hdr.length)
    var btype = ""
    var datasize = -1
    while (w.hasMore) w.tag() match {
      case (1, 2) => btype = w.string()
      case (3, 0) => datasize = w.varint().toInt
      case (_, wt) => w.skip(wt)
    }
    require(btype.nonEmpty && datasize >= 0, "malformed BlobHeader")
    (btype, datasize)
  }

  /** Validate an OSMHeader blob: fail loudly on required features this
    * reader does not implement (forward-compat contract of the format). */
  private def checkHeaderBlock(payload: Array[Byte]): Unit = {
    val supported = Set("OsmSchema-V0.6", "DenseNodes")
    val w = new Wire(payload, 0, payload.length)
    while (w.hasMore) w.tag() match {
      case (4, 2) =>
        val f = w.string()
        require(supported(f), s"unsupported required_feature: $f")
      case (_, wt) => w.skip(wt)
    }
  }

  /** Scan blob framing only: seek over payloads, return OSMData slices.
    * Uses Hadoop FS streams, so local, HDFS and object-store paths all
    * work; per-blob cost is one ~40-byte header read + one seek. On an
    * object store each seek is a ranged GET (~50k for a planet file —
    * one-time framing cost, small next to decoding the ~80 GB of
    * payload; if it ever matters, persist the slice list once per file
    * revision the same way the banded-keys table is persisted). */
  def blobSlices(spark: SparkSession, pathGlob: String): Seq[BlobSlice] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val glob = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = glob.getFileSystem(conf)
    val files = fs.globStatus(glob)
    require(files != null && files.nonEmpty, s"no files match $pathGlob")
    files.toSeq.filter(_.isFile).sortBy(_.getPath.toString).flatMap { st =>
      val path = st.getPath
      val in = fs.open(path)
      try {
        val out = scala.collection.mutable.ArrayBuffer.empty[BlobSlice]
        val flen = st.getLen
        var pos = 0L
        while (pos < flen) {
          in.seek(pos)
          val hlen = in.readInt() // 4-byte big-endian BlobHeader length
          require(hlen > 0 && hlen < 64 * 1024, s"implausible BlobHeader length $hlen")
          val hdr = new Array[Byte](hlen)
          in.readFully(hdr)
          val (btype, datasize) = parseBlobHeader(hdr)
          require(datasize < 64 * 1024 * 1024, // 32 MB is the spec max; 2x headroom
            s"implausible blob size $datasize")
          val dataOff = pos + 4 + hlen
          btype match {
            case "OSMData" =>
              out += BlobSlice(path.toString, dataOff, datasize)
            case "OSMHeader" =>
              val payload = new Array[Byte](datasize)
              in.readFully(payload)
              checkHeaderBlock(decompressBlob(payload))
            case other =>
              throw new IllegalArgumentException(s"unknown blob type '$other'")
          }
          pos = dataOff + datasize
        }
        out.toSeq
      } finally in.close()
    }
  }

  /** Blob -> uncompressed PrimitiveBlock/HeaderBlock payload (raw or
    * zlib; other codecs fail loudly with the codec named). */
  private[sources] def decompressBlob(blob: Array[Byte]): Array[Byte] = {
    val w = new Wire(blob, 0, blob.length)
    var raw: Array[Byte] = null
    var rawSize = -1
    var zlib: Array[Byte] = null
    while (w.hasMore) w.tag() match {
      case (1, 2) => raw = w.bytes()
      case (2, 0) => rawSize = w.varint().toInt
      case (3, 2) => zlib = w.bytes()
      case (f, 2) if f == 4 || f == 5 || f == 6 || f == 7 =>
        throw new IllegalArgumentException(
          s"unsupported blob compression (field $f: lzma/bzip2/lz4/zstd)")
      case (_, wt) => w.skip(wt)
    }
    if (raw != null) raw
    else {
      require(zlib != null, "blob carries neither raw nor zlib_data")
      require(rawSize >= 0, "zlib blob without raw_size")
      val inf = new java.util.zip.Inflater()
      inf.setInput(zlib)
      val out = new Array[Byte](rawSize)
      var off = 0
      while (off < rawSize && !inf.finished()) {
        val n = inf.inflate(out, off, rawSize - off)
        // any zero-progress state (needs more input on a fully-provided
        // buffer, preset-dictionary header, corrupt stream) must fail
        // loudly — a needsInput-only guard loops forever on
        // needsDictionary
        require(n > 0, "stalled or truncated zlib stream")
        off += n
      }
      inf.end()
      require(off == rawSize, s"zlib inflated $off bytes, expected $rawSize")
      out
    }
  }

  // ---- PrimitiveBlock decode ----

  /** Decode one OSMData payload into OsmObjects (pure, deterministic). */
  private[sources] def decodePrimitiveBlock(payload: Array[Byte]): Iterator[OsmObject] = {
    val top = new Wire(payload, 0, payload.length)
    var strings: Array[String] = Array("")
    val groups = scala.collection.mutable.ArrayBuffer.empty[Wire]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    while (top.hasMore) top.tag() match {
      case (1, 2) => // StringTable: repeated bytes s = 1
        val st = top.sub()
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (st.hasMore) st.tag() match {
          case (1, 2) => buf += st.string()
          case (_, wt) => st.skip(wt)
        }
        strings = buf.toArray
      case (2, 2) => groups += top.sub()
      case (17, 0) => granularity = top.varint()
      case (19, 0) => latOffset = top.varint()
      case (20, 0) => lonOffset = top.varint()
      case (_, wt) => top.skip(wt)
    }
    // nanodegrees are exact in Long; the division by the EXACT double 1e9
    // is correctly rounded, hence bit-identical to parsing the decimal
    // (see object scaladoc) — never 1e-9 * x
    def toLat(raw: Long): Double = (latOffset + granularity * raw) / 1e9
    def toLon(raw: Long): Double = (lonOffset + granularity * raw) / 1e9
    def tagsOf(keys: Array[Long], vals: Array[Long]): Map[String, String] = {
      require(keys.length == vals.length, "keys/vals length mismatch")
      keys.iterator.zip(vals.iterator)
        .map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap
    }

    groups.iterator.flatMap { g =>
      val out = scala.collection.mutable.ArrayBuffer.empty[OsmObject]
      while (g.hasMore) g.tag() match {
        case (1, 2) => // plain Node
          val n = g.sub()
          var id = 0L
          var latRaw = 0L
          var lonRaw = 0L
          var keys = Array.empty[Long]
          var vals = Array.empty[Long]
          while (n.hasMore) n.tag() match {
            case (1, 0) => id = n.sint()
            case (2, 2) => keys = n.packedLongs(zigzag = false)
            case (3, 2) => vals = n.packedLongs(zigzag = false)
            case (8, 0) => latRaw = n.sint()
            case (9, 0) => lonRaw = n.sint()
            case (_, wt) => n.skip(wt)
          }
          out += OsmObject(id, "node", Some(toLat(latRaw)), Some(toLon(lonRaw)),
            tagsOf(keys, vals))
        case (2, 2) => // DenseNodes: delta-coded parallel arrays
          val d = g.sub()
          var ids = Array.empty[Long]
          var lats = Array.empty[Long]
          var lons = Array.empty[Long]
          var kv = Array.empty[Long]
          while (d.hasMore) d.tag() match {
            case (1, 2) => ids = d.packedLongs(zigzag = true)
            case (8, 2) => lats = d.packedLongs(zigzag = true)
            case (9, 2) => lons = d.packedLongs(zigzag = true)
            case (10, 2) => kv = d.packedLongs(zigzag = false)
            case (_, wt) => d.skip(wt)
          }
          require(ids.length == lats.length && ids.length == lons.length,
            "DenseNodes parallel arrays disagree")
          var id = 0L; var la = 0L; var lo = 0L
          var kvPos = 0
          var i = 0
          while (i < ids.length) {
            id += ids(i); la += lats(i); lo += lons(i)
            var tags = Map.empty[String, String]
            if (kv.nonEmpty) {
              while (kvPos < kv.length && kv(kvPos) != 0L) {
                tags += (strings(kv(kvPos).toInt) -> strings(kv(kvPos + 1).toInt))
                kvPos += 2
              }
              kvPos += 1 // the 0 terminator
            }
            out += OsmObject(id, "node", Some(toLat(la)), Some(toLon(lo)), tags)
            i += 1
          }
        case (3, 2) => // Way
          val wv = g.sub()
          var id = 0L
          var keys = Array.empty[Long]
          var vals = Array.empty[Long]
          var refs = Array.empty[Long]
          while (wv.hasMore) wv.tag() match {
            case (1, 0) => id = wv.varint()
            case (2, 2) => keys = wv.packedLongs(zigzag = false)
            case (3, 2) => vals = wv.packedLongs(zigzag = false)
            case (8, 2) => refs = wv.packedLongs(zigzag = true)
            case (_, wt) => wv.skip(wt)
          }
          var acc = 0L
          val nds = refs.map { d => acc += d; acc }.toSeq
          out += OsmObject(id, "way", None, None, tagsOf(keys, vals), nds)
        case (4, 2) => // Relation
          val r = g.sub()
          var id = 0L
          var keys = Array.empty[Long]
          var vals = Array.empty[Long]
          var roles = Array.empty[Long]
          var memids = Array.empty[Long]
          var types = Array.empty[Long]
          while (r.hasMore) r.tag() match {
            case (1, 0) => id = r.varint()
            case (2, 2) => keys = r.packedLongs(zigzag = false)
            case (3, 2) => vals = r.packedLongs(zigzag = false)
            case (8, 2) => roles = r.packedLongs(zigzag = false)
            case (9, 2) => memids = r.packedLongs(zigzag = true)
            case (10, 2) => types = r.packedLongs(zigzag = false)
            case (_, wt) => r.skip(wt)
          }
          require(roles.length == memids.length && roles.length == types.length,
            s"relation $id member arrays disagree")
          var acc = 0L
          val members = (0 until memids.length).map { i =>
            acc += memids(i)
            val t = types(i) match {
              case 0 => "node"
              case 1 => "way"
              case 2 => "relation"
              case x => throw new IllegalArgumentException(
                s"relation $id: unknown member type $x")
            }
            OsmMember(t, acc, strings(roles(i).toInt))
          }
          out += OsmObject(id, "relation", None, None, tagsOf(keys, vals),
            Nil, members)
        case (5, 2) => g.skip(2) // changesets: not an engine concern
        case (_, wt) => g.skip(wt)
      }
      out.iterator
    }
  }

  // ---- the Spark source ----

  /** Distributed read: blob slices decoded executor-side. Emits the same
    * OsmObject rows as OsmXml.read on equivalent content, so everything
    * downstream (features, boundary assembly driver or distributed,
    * coverDFDistributed) runs unchanged on PBF input. */
  def read(spark: SparkSession, pathGlob: String): Dataset[OsmObject] = {
    import spark.implicits._
    val slices = blobSlices(spark, pathGlob)
    val parallelism = math.max(1,
      math.min(slices.length, spark.sparkContext.defaultParallelism * 2))
    // the driver's Hadoop conf must travel with the closure: a bare
    // executor-side `new Configuration()` drops every spark.hadoop.*
    // setting (object-store credentials/endpoints) and the decode tasks
    // would fail on exactly the paths the framing scan just read
    val confProps = graft.plans.HadoopConf.capture(spark)
    spark.sparkContext.parallelize(slices, parallelism)
      .mapPartitions { it =>
        // one FS connection per (partition, file); closed at task end —
        // a close-on-exhaustion iterator would leak the streams whenever
        // a task stops early (limit/take, kill, downstream exception)
        val conf = graft.plans.HadoopConf.restore(confProps)
        val streams = scala.collection.mutable.Map.empty[
          String, org.apache.hadoop.fs.FSDataInputStream]
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit] { _ =>
          streams.values.foreach(s =>
            try s.close() catch { case _: java.io.IOException => })
        }
        def stream(p: String) = streams.getOrElseUpdate(p, {
          val hp = new org.apache.hadoop.fs.Path(p)
          hp.getFileSystem(conf).open(hp)
        })
        it.flatMap { s =>
          val in = stream(s.path)
          in.seek(s.offset)
          val blob = new Array[Byte](s.length)
          in.readFully(blob)
          decodePrimitiveBlock(decompressBlob(blob))
        }
      }.toDS()
  }
}

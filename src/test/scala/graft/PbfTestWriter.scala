package graft

import java.io.ByteArrayOutputStream

import graft.sources.OsmXml.OsmObject

/** Test-only OSM PBF ENCODER: builds spec-conformant .pbf files from
  * OsmObjects so OsmPbfSpec can assert decode parity against the XML
  * parser without any external fixture. Hand-rolled wire format (varint /
  * zigzag / length-delimited), zlib blobs, dense or plain nodes,
  * configurable granularity/offsets and objects-per-blob (to force
  * multi-blob framing at tiny scale). */
object PbfTestWriter {

  private def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def zz(v: Long): Long = (v << 1) ^ (v >> 63)
  private def tag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    varint(out, (field.toLong << 3) | wire)
  private def lenDelim(out: ByteArrayOutputStream, field: Int, body: Array[Byte]): Unit = {
    tag(out, field, 2); varint(out, body.length.toLong); out.write(body)
  }
  private def packed(field: Int, vs: Seq[Long]): (ByteArrayOutputStream => Unit) = out => {
    if (vs.nonEmpty) {
      val b = new ByteArrayOutputStream()
      vs.foreach(varint(b, _))
      lenDelim(out, field, b.toByteArray)
    }
  }
  private def bytesOf(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val b = new ByteArrayOutputStream(); f(b); b.toByteArray
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** [4-byte BE len][BlobHeader][Blob(zlib payload)] — one frame. */
  private def frame(blobType: String, payload: Array[Byte],
                    compress: Boolean): Array[Byte] = {
    val blob = bytesOf { b =>
      if (compress) {
        tag(b, 2, 0); varint(b, payload.length.toLong) // raw_size
        lenDelim(b, 3, deflate(payload))               // zlib_data
      } else lenDelim(b, 1, payload)                   // raw
    }
    val hdr = bytesOf { h =>
      lenDelim(h, 1, blobType.getBytes("UTF-8"))
      tag(h, 3, 0); varint(h, blob.length.toLong)      // datasize
    }
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte]((hdr.length >>> 24).toByte, (hdr.length >>> 16).toByte,
      (hdr.length >>> 8).toByte, hdr.length.toByte))
    out.write(hdr); out.write(blob)
    out.toByteArray
  }

  private def headerBlock(features: Seq[String]): Array[Byte] = bytesOf { b =>
    features.foreach(f => lenDelim(b, 4, f.getBytes("UTF-8")))
  }

  /** String table: index 0 is the empty string per spec. */
  private final class Strings {
    private val idx = scala.collection.mutable.LinkedHashMap[String, Int]("" -> 0)
    def id(s: String): Long = idx.getOrElseUpdate(s, idx.size).toLong
    def encode: Array[Byte] = bytesOf { b =>
      idx.keys.foreach(s => lenDelim(b, 1, s.getBytes("UTF-8")))
    }
  }

  private def nanos(d: Double): Long = Math.round(d * 1e9)

  private def primitiveBlock(objs: Seq[OsmObject], dense: Boolean,
                             granularity: Long, latOffset: Long,
                             lonOffset: Long): Array[Byte] = {
    val st = new Strings
    def raw(nano: Long, offset: Long): Long = {
      val adj = nano - offset
      require(adj % granularity == 0,
        s"fixture coordinate $nano not on granularity $granularity grid")
      adj / granularity
    }
    val group = bytesOf { g =>
      val nodes = objs.filter(_.featureType == "node")
      if (dense && nodes.nonEmpty) {
        val d = bytesOf { db =>
          def deltas(vs: Seq[Long]): Seq[Long] =
            vs.headOption.toSeq ++ vs.sliding(2).collect { case Seq(a, b) => b - a }
          packed(1, deltas(nodes.map(_.featureId)).map(zz))(db)
          packed(8, deltas(nodes.map(n => raw(nanos(n.lat.get), latOffset))).map(zz))(db)
          packed(9, deltas(nodes.map(n => raw(nanos(n.lon.get), lonOffset))).map(zz))(db)
          if (nodes.exists(_.tags.nonEmpty))
            packed(10, nodes.flatMap(n =>
              n.tags.toSeq.flatMap { case (k, v) => Seq(st.id(k), st.id(v)) } :+ 0L))(db)
        }
        lenDelim(g, 2, d)
      } else nodes.foreach { n =>
        lenDelim(g, 1, bytesOf { nb =>
          tag(nb, 1, 0); varint(nb, zz(n.featureId))
          packed(2, n.tags.keys.map(st.id).toSeq)(nb)
          packed(3, n.tags.values.map(st.id).toSeq)(nb)
          tag(nb, 8, 0); varint(nb, zz(raw(nanos(n.lat.get), latOffset)))
          tag(nb, 9, 0); varint(nb, zz(raw(nanos(n.lon.get), lonOffset)))
        })
      }
      objs.filter(_.featureType == "way").foreach { w =>
        lenDelim(g, 3, bytesOf { wb =>
          tag(wb, 1, 0); varint(wb, w.featureId)
          packed(2, w.tags.keys.map(st.id).toSeq)(wb)
          packed(3, w.tags.values.map(st.id).toSeq)(wb)
          val deltas = w.ndRefs.headOption.toSeq ++
            w.ndRefs.sliding(2).collect { case Seq(a, b) => b - a }
          packed(8, deltas.map(zz))(wb)
        })
      }
      objs.filter(_.featureType == "relation").foreach { r =>
        lenDelim(g, 4, bytesOf { rb =>
          tag(rb, 1, 0); varint(rb, r.featureId)
          packed(2, r.tags.keys.map(st.id).toSeq)(rb)
          packed(3, r.tags.values.map(st.id).toSeq)(rb)
          packed(8, r.members.map(m => st.id(m.role)))(rb)
          val refs = r.members.map(_.ref)
          val deltas = refs.headOption.toSeq ++
            refs.sliding(2).collect { case Seq(a, b) => b - a }
          packed(9, deltas.map(zz))(rb)
          packed(10, r.members.map(_.mtype match {
            case "node" => 0L
            case "way" => 1L
            case "relation" => 2L
          }))(rb)
        })
      }
    }
    bytesOf { b =>
      lenDelim(b, 1, st.encode)
      lenDelim(b, 2, group)
      if (granularity != 100) { tag(b, 17, 0); varint(b, granularity) }
      if (latOffset != 0) { tag(b, 19, 0); varint(b, latOffset) }
      if (lonOffset != 0) { tag(b, 20, 0); varint(b, lonOffset) }
    }
  }

  /** Write objects as a .pbf file: header blob + ceil(n/perBlob) data
    * blobs (node/way/relation split preserved within each chunk). */
  def write(path: String, objs: Seq[OsmObject], dense: Boolean = true,
            perBlob: Int = Int.MaxValue, granularity: Long = 100,
            latOffset: Long = 0, lonOffset: Long = 0,
            compress: Boolean = true,
            requiredFeatures: Seq[String] = Seq("OsmSchema-V0.6", "DenseNodes")): Unit = {
    val out = new ByteArrayOutputStream()
    out.write(frame("OSMHeader", headerBlock(requiredFeatures), compress))
    objs.grouped(math.max(1, perBlob)).foreach { chunk =>
      out.write(frame("OSMData",
        primitiveBlock(chunk, dense, granularity, latOffset, lonOffset), compress))
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.toByteArray)
  }
}

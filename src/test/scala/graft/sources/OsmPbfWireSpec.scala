package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Wire-level corruption must fail loudly, never misparse: the reader's
  * fail-loud contract at the byte level (sibling-field bleed-through,
  * length truncation past Int range, stalled zlib) — the cases a
  * file-level truncation test cannot pin deterministically. Lives in
  * package graft.sources to reach the package-private decoders; no Spark
  * session needed, these are pure functions. */
class OsmPbfWireSpec extends AnyFunSuite {

  test("truncated varint inside a length-delimited field fails loudly") {
    // field 1 (stringtable), declared length 2, both bytes with the
    // continuation bit set: the inner varint would otherwise run past its
    // field boundary into sibling bytes and decode garbage silently
    val payload = Array[Byte](0x0a, 0x02, 0xff.toByte, 0xff.toByte)
    val e = intercept[IllegalArgumentException](
      OsmPbf.decodePrimitiveBlock(payload).toList)
    assert(e.getMessage.contains("varint overruns field boundary"))
  }

  test("length-delimited field longer than the remaining buffer fails loudly") {
    // field 1, declared length 127, zero bytes remain
    val payload = Array[Byte](0x0a, 0x7f)
    val e = intercept[IllegalArgumentException](
      OsmPbf.decodePrimitiveBlock(payload).toList)
    assert(e.getMessage.contains("overruns blob"))
  }

  test("corrupt zlib payload fails loudly instead of spinning or misparsing") {
    // Blob message: raw_size = 16 (field 2, varint), zlib_data (field 3)
    // carrying garbage that is not a zlib stream
    val zlibGarbage = Array[Byte](0x01, 0x02, 0x03, 0x04)
    val blob = Array[Byte](
      0x10, 0x10, // field 2 varint raw_size=16
      0x1a, zlibGarbage.length.toByte) ++ zlibGarbage
    intercept[Exception](OsmPbf.decompressBlob(blob))
  }

  test("zero-progress inflater (valid header, truncated stream) fails loudly") {
    // a real deflate of 64 bytes, truncated to its first 4 bytes: the
    // inflater consumes the header then stalls needing input that will
    // never come — the guard must throw, not loop
    val data = Array.fill[Byte](64)('x')
    val defl = new java.util.zip.Deflater()
    defl.setInput(data); defl.finish()
    val comp = new Array[Byte](128)
    val n = defl.deflate(comp)
    defl.end()
    assert(n > 4)
    val truncated = java.util.Arrays.copyOfRange(comp, 0, 4)
    val blob = Array[Byte](
      0x10, 0x40, // raw_size = 64
      0x1a, truncated.length.toByte) ++ truncated
    val e = intercept[Exception](OsmPbf.decompressBlob(blob))
    assert(e.getMessage != null)
  }
}

package graft.index

/**
 * Variable-byte (VByte) integer codec — 7 data bits per byte, high bit
 * set on the terminating byte (the classic Lucene/IR-textbook layout;
 * public knowledge, e.g. Manning/Raghavan/Schütze IIR §5.3). Used for
 * docId deltas, term frequencies, and doc lengths inside posting
 * blocks (FIXTURES.md §2 `postings.doc_deltas`/`tfs`).
 *
 * The reference (JesterJ) ships these bytes to Lucene which does its
 * own encoding; we own the format here, so it is round-trip
 * property-tested (VByteSpec).
 */
object VByte extends Serializable {

  /** Encoded size in bytes of one non-negative value. */
  def sizeOf(v: Long): Int = {
    require(v >= 0, s"VByte encodes non-negative values, got $v")
    var x = v >>> 7; var n = 1
    while (x != 0) { x >>>= 7; n += 1 }
    n
  }

  def encode(values: Array[Long]): Array[Byte] = {
    var total = 0
    var i = 0
    while (i < values.length) { total += sizeOf(values(i)); i += 1 }
    val out = new Array[Byte](total)
    var o = 0
    i = 0
    while (i < values.length) {
      var v = values(i)
      while ((v & ~0x7fL) != 0) { out(o) = (v & 0x7f).toByte; o += 1; v >>>= 7 }
      out(o) = (v | 0x80).toByte; o += 1 // terminator: high bit set
      i += 1
    }
    out
  }

  def encodeInts(values: Array[Int]): Array[Byte] =
    encode(values.map(_.toLong))

  def decode(bytes: Array[Byte]): Array[Long] = {
    val out = Array.newBuilder[Long]
    var v = 0L; var shift = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b & 0x80) != 0) { // terminator
        out += (v | ((b & 0x7fL) << shift)); v = 0L; shift = 0
      } else {
        v |= (b & 0x7fL) << shift; shift += 7
      }
      i += 1
    }
    require(shift == 0, "truncated VByte stream")
    out.result()
  }

  def decodeInts(bytes: Array[Byte]): Array[Int] = decode(bytes).map(_.toInt)

  /** Delta-encode an ascending sequence (first value absolute). */
  def deltas(sorted: Array[Long]): Array[Long] = {
    if (sorted.isEmpty) return Array.empty
    val out = new Array[Long](sorted.length)
    out(0) = sorted(0)
    var i = 1
    while (i < sorted.length) {
      val d = sorted(i) - sorted(i - 1)
      require(d > 0, s"docIds must be strictly ascending: ${sorted(i - 1)} -> ${sorted(i)}")
      out(i) = d
      i += 1
    }
    out
  }

  /** Inverse of [[deltas]]: prefix-sum back to absolute values. */
  def undeltas(ds: Array[Long]): Array[Long] = {
    if (ds.isEmpty) return Array.empty
    val out = new Array[Long](ds.length)
    out(0) = ds(0)
    var i = 1
    while (i < ds.length) { out(i) = out(i - 1) + ds(i); i += 1 }
    out
  }
}

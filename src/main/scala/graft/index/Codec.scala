package graft.index

/** Delta-gap + variable-byte posting codec (SURVEY §4 item 3).
  *
  * Standard IR compression (Manning et al., "Introduction to Information
  * Retrieval" ch.5; public knowledge): ascending docIds are stored as
  * first-relative gaps, each gap VByte-encoded (7 data bits per byte, high
  * bit = continuation). tf / doclen streams are plain VByte.
  *
  * All values must be ≥ 0. Within a posting block this always holds: blocks
  * never span a docId bucket (a bucket = one top-bits range of xxhash64
  * docIds), so consecutive signed docIds share their high bits and gaps are
  * non-negative and small.
  */
object Codec extends Serializable {

  /** VByte-encode one non-negative Long into the buffer. */
  @inline private def put(b: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    require(v0 >= 0, s"VByte requires non-negative values, got $v0")
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      b.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    b.write(v.toInt)
  }

  def encodeVByte(values: Array[Long]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream(values.length * 2)
    var i = 0
    while (i < values.length) { put(b, values(i)); i += 1 }
    b.toByteArray
  }

  def decodeVByte(bytes: Array[Byte], count: Int): Array[Long] = {
    val out = new Array[Long](count)
    var i = 0
    var pos = 0
    while (i < count) {
      var v = 0L
      var shift = 0
      var more = true
      while (more) {
        val byt = bytes(pos).toInt
        pos += 1
        v |= (byt & 0x7FL) << shift
        shift += 7
        more = (byt & 0x80) != 0
      }
      out(i) = v
      i += 1
    }
    out
  }

  /** Encode ascending docIds as gaps relative to `base` (the block's
    * firstDocId). Gaps must all be ≥ 0 — guaranteed within one bucket.
    */
  def encodeDocIds(docIds: Array[Long], base: Long): Array[Byte] = {
    val gaps = new Array[Long](docIds.length)
    var prev = base
    var i = 0
    while (i < docIds.length) {
      val g = docIds(i) - prev
      require(g >= 0, s"docIds not ascending at $i: ${docIds(i)} after $prev")
      gaps(i) = g
      prev = docIds(i)
      i += 1
    }
    encodeVByte(gaps)
  }

  def decodeDocIds(bytes: Array[Byte], count: Int, base: Long): Array[Long] = {
    val gaps = decodeVByte(bytes, count)
    var prev = base
    var i = 0
    while (i < count) {
      prev += gaps(i)
      gaps(i) = prev
      i += 1
    }
    gaps
  }

  def encodeInts(values: Array[Int]): Array[Byte] =
    encodeVByte(values.map(_.toLong))

  def decodeInts(bytes: Array[Byte], count: Int): Array[Int] =
    decodeVByte(bytes, count).map(_.toInt)
}

package graft.io

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal flatbuffers wire-format support — just enough of the public
  * FlatBuffers binary spec (vtables, size-prefixed tables, scalar/offset
  * fields, vectors, strings) to read and write FlatGeobuf files without any
  * external dependency. Layout rules follow the published format:
  *
  * - a buffer starts with a u32 offset to the root table;
  * - a table starts with an i32 soffset such that `vtablePos = tablePos - soffset`;
  * - a vtable is `[u16 vtableSize][u16 tableSize][u16 fieldOffset...]` where a
  *   field offset of 0 means "absent" and is otherwise relative to the table;
  * - offset-typed fields store a u32 *forward* offset relative to the field
  *   location; vectors are `[u32 count][elements...]`; strings are
  *   nul-terminated u8 vectors.
  *
  * The builder writes back-to-front exactly like the stock builders so
  * alignment guarantees match (scalars aligned to their size relative to the
  * finished buffer end, `finish` pads the total size to `minalign`).
  */
private[io] object FlatBuf {

  /** Read-side accessor over one flatbuffer (positions are absolute indexes
    * into `bb`, which must be little-endian). */
  final class Reader(val bb: ByteBuffer) {
    /** Bulk copy `len` bytes from absolute `pos` — array-backed buffers
      * (the wrap() case, i.e. every caller here) take one arraycopy
      * instead of per-byte bounds-checked gets on the per-feature
      * decode hot path. */
    private def copyBytes(pos: Int, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      if (bb.hasArray) System.arraycopy(bb.array(), bb.arrayOffset() + pos, out, 0, len)
      else { var i = 0; while (i < len) { out(i) = bb.get(pos + i); i += 1 } }
      out
    }

    def rootTable(start: Int): Int = start + bb.getInt(start)

    /** Absolute position of field `field` of the table at `tablePos`, or -1
      * when the field is absent. */
    def fieldPos(tablePos: Int, field: Int): Int = {
      val vt = tablePos - bb.getInt(tablePos)
      val vtSize = bb.getShort(vt) & 0xffff
      val slot = 4 + 2 * field
      if (slot + 2 > vtSize) -1
      else {
        val off = bb.getShort(vt + slot) & 0xffff
        if (off == 0) -1 else tablePos + off
      }
    }

    def indirect(pos: Int): Int = pos + bb.getInt(pos)

    def byteField(tablePos: Int, field: Int, default: Int): Int = {
      val p = fieldPos(tablePos, field)
      if (p < 0) default else bb.get(p) & 0xff
    }
    def boolField(tablePos: Int, field: Int, default: Boolean): Boolean = {
      val p = fieldPos(tablePos, field)
      if (p < 0) default else bb.get(p) != 0
    }
    def shortField(tablePos: Int, field: Int, default: Int): Int = {
      val p = fieldPos(tablePos, field)
      if (p < 0) default else bb.getShort(p) & 0xffff
    }
    def intField(tablePos: Int, field: Int, default: Int): Int = {
      val p = fieldPos(tablePos, field)
      if (p < 0) default else bb.getInt(p)
    }
    def longField(tablePos: Int, field: Int, default: Long): Long = {
      val p = fieldPos(tablePos, field)
      if (p < 0) default else bb.getLong(p)
    }

    /** String field → null when absent. */
    def stringField(tablePos: Int, field: Int): String = {
      val p = fieldPos(tablePos, field)
      if (p < 0) null
      else {
        val s = indirect(p)
        val len = bb.getInt(s)
        new String(copyBytes(s + 4, len), "UTF-8")
      }
    }

    /** Table-offset field → absolute table position, or -1. */
    def tableField(tablePos: Int, field: Int): Int = {
      val p = fieldPos(tablePos, field)
      if (p < 0) -1 else indirect(p)
    }

    /** Vector field → (elementsPos, count), or (-1, 0). */
    def vectorField(tablePos: Int, field: Int): (Int, Int) = {
      val p = fieldPos(tablePos, field)
      if (p < 0) (-1, 0)
      else {
        val v = indirect(p)
        (v + 4, bb.getInt(v))
      }
    }

    def doubleVector(tablePos: Int, field: Int): Array[Double] = {
      val (pos, n) = vectorField(tablePos, field)
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = bb.getDouble(pos + 8 * i); i += 1 }
      out
    }
    def uintVector(tablePos: Int, field: Int): Array[Int] = {
      val (pos, n) = vectorField(tablePos, field)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = bb.getInt(pos + 4 * i); i += 1 }
      out
    }
    /** Vector of table offsets → absolute table positions. */
    def tableVector(tablePos: Int, field: Int): Array[Int] = {
      val (pos, n) = vectorField(tablePos, field)
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = indirect(pos + 4 * i); i += 1 }
      out
    }
    def byteVector(tablePos: Int, field: Int): Array[Byte] = {
      val (pos, n) = vectorField(tablePos, field)
      copyBytes(pos, n)
    }
  }

  /** Back-to-front builder. Offsets handed to callers are offsets from the
    * end of the buffer, exactly like the stock implementations. */
  final class Builder(initial: Int = 1024) {
    private var buf = new Array[Byte](math.max(initial, 64))
    private var space = buf.length   // first used byte (data is [space, len))
    private var minalign = 1
    private var vtable: Array[Int] = null
    private var vtableInUse = 0
    private var objectStart = 0

    private def offset: Int = buf.length - space

    private def grow(needed: Int): Unit = {
      var cap = buf.length
      while (cap - (buf.length - space) < needed) cap *= 2
      if (cap != buf.length) {
        val nb = new Array[Byte](cap)
        val used = buf.length - space
        System.arraycopy(buf, space, nb, cap - used, used)
        space += cap - buf.length
        buf = nb
      }
    }

    private def pad(n: Int): Unit = {
      var i = 0
      while (i < n) { space -= 1; buf(space) = 0; i += 1 }
    }

    /** Align so a scalar of `size` written after `additional` bytes lands
      * aligned relative to the buffer end. */
    private def prep(size: Int, additional: Int): Unit = {
      if (size > minalign) minalign = size
      val alignSize = ((~(offset + additional)) + 1) & (size - 1)
      grow(alignSize + size + additional)
      pad(alignSize)
    }

    private def putByte(v: Int): Unit = { space -= 1; buf(space) = v.toByte }
    private def putShort(v: Int): Unit = {
      space -= 2
      buf(space) = v.toByte; buf(space + 1) = (v >>> 8).toByte
    }
    private def putInt(v: Int): Unit = {
      space -= 4
      buf(space) = v.toByte; buf(space + 1) = (v >>> 8).toByte
      buf(space + 2) = (v >>> 16).toByte; buf(space + 3) = (v >>> 24).toByte
    }
    private def putLong(v: Long): Unit = {
      space -= 8
      var i = 0
      while (i < 8) { buf(space + i) = (v >>> (8 * i)).toByte; i += 1 }
    }

    def addByteScalar(v: Int): Unit = { prep(1, 0); putByte(v) }
    def addShortScalar(v: Int): Unit = { prep(2, 0); putShort(v) }
    def addIntScalar(v: Int): Unit = { prep(4, 0); putInt(v) }
    def addLongScalar(v: Long): Unit = { prep(8, 0); putLong(v) }
    def addDoubleScalar(v: Double): Unit = {
      prep(8, 0); putLong(java.lang.Double.doubleToLongBits(v))
    }
    /** Write a u32 offset value pointing at `off` (offset-from-end). */
    def addOffsetScalar(off: Int): Unit = {
      prep(4, 0)
      putInt(offset - off + 4)
    }

    def createString(s: String): Int = {
      val bytes = s.getBytes("UTF-8")
      prep(4, bytes.length + 1)
      putByte(0)
      space -= bytes.length
      System.arraycopy(bytes, 0, buf, space, bytes.length)
      putInt(bytes.length)
      offset
    }

    def createByteVector(bytes: Array[Byte]): Int = {
      prep(4, bytes.length)
      space -= bytes.length
      System.arraycopy(bytes, 0, buf, space, bytes.length)
      putInt(bytes.length)
      offset
    }

    def createDoubleVector(values: Array[Double]): Int = {
      prep(4, values.length * 8)
      prep(8, values.length * 8)
      var i = values.length - 1
      while (i >= 0) { putLong(java.lang.Double.doubleToLongBits(values(i))); i -= 1 }
      putInt(values.length)
      offset
    }

    def createUIntVector(values: Array[Int]): Int = {
      prep(4, values.length * 4)
      var i = values.length - 1
      while (i >= 0) { putInt(values(i)); i -= 1 }
      putInt(values.length)
      offset
    }

    /** Vector of offsets to tables/strings created earlier. */
    def createOffsetVector(offsets: Array[Int]): Int = {
      prep(4, offsets.length * 4)
      var i = offsets.length - 1
      while (i >= 0) { putInt(offset - offsets(i) + 4); i -= 1 }
      putInt(offsets.length)
      offset
    }

    def startTable(numFields: Int): Unit = {
      vtable = new Array[Int](numFields)
      vtableInUse = numFields
      objectStart = offset
    }

    private def slot(field: Int): Unit = { vtable(field) = offset }

    def addByteField(field: Int, v: Int, default: Int): Unit =
      if (v != default) { addByteScalar(v); slot(field) }
    def addBoolField(field: Int, v: Boolean, default: Boolean): Unit =
      if (v != default) { addByteScalar(if (v) 1 else 0); slot(field) }
    def addShortField(field: Int, v: Int, default: Int): Unit =
      if (v != default) { addShortScalar(v); slot(field) }
    def addIntField(field: Int, v: Int, default: Int): Unit =
      if (v != default) { addIntScalar(v); slot(field) }
    def addLongField(field: Int, v: Long, default: Long): Unit =
      if (v != default) { addLongScalar(v); slot(field) }
    def addOffsetField(field: Int, off: Int): Unit =
      if (off != 0) { addOffsetScalar(off); slot(field) }

    def endTable(): Int = {
      prep(4, 0)
      putInt(0) // placeholder for the soffset to the vtable
      val vtableLoc = offset
      var i = vtableInUse - 1
      while (i >= 0) {
        addShortScalar(if (vtable(i) != 0) vtableLoc - vtable(i) else 0)
        i -= 1
      }
      addShortScalar(vtableLoc - objectStart)
      addShortScalar((vtableInUse + 2) * 2)
      // patch the placeholder: soffset = tablePos - vtablePos (both measured
      // from the end, so it's the difference of the offsets)
      val tableAbs = buf.length - vtableLoc
      val so = offset - vtableLoc
      buf(tableAbs) = so.toByte
      buf(tableAbs + 1) = (so >>> 8).toByte
      buf(tableAbs + 2) = (so >>> 16).toByte
      buf(tableAbs + 3) = (so >>> 24).toByte
      vtable = null
      vtableLoc
    }

    /** Finish with `root` as the root table; returns the completed bytes. */
    def finish(root: Int): Array[Byte] = {
      prep(minalign, 4)
      addOffsetScalar(root)
      java.util.Arrays.copyOfRange(buf, space, buf.length)
    }
  }

  def reader(bytes: Array[Byte], start: Int = 0): (Reader, Int) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val r = new Reader(bb)
    (r, r.rootTable(start))
  }
}

package graft

import graft.serde.EWKB
import org.scalatest.funsuite.AnyFunSuite

/** Exhaustive pin of the SINGLE header decoder ([[EWKB.header]]) over
  * every type id × dimension encoding × SRID presence × byte order —
  * the r10 consolidation moved all byte-level consumers (Curved's
  * reader and SRID surgery) onto this decoder, so its hybrid
  * ISO-code-plus-EWKB-flag nuance is pinned here once for all of them:
  *
  * - EWKB encoding: Z=0x8000_0000, M=0x4000_0000, SRID=0x2000_0000
  *   flag bits on the type word, SRID word present iff the flag is set.
  * - ISO encoding: type code + 1000 (Z), + 2000 (M), + 3000 (ZM); ISO
  *   WKB has no SRID word.
  * - Hybrid: an ISO dimension code WITH the EWKB SRID flag (what
  *   [[graft.serde.Curved.withSrid]] produces on ISO input — flag and
  *   code must compose, not conflict).
  */
class EWKBHeaderSpec extends AnyFunSuite {

  private def mkHeader(littleEndian: Boolean, typeWord: Int,
      srid: Option[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(if (srid.isDefined) 9 else 5)
      .order(if (littleEndian) java.nio.ByteOrder.LITTLE_ENDIAN
        else java.nio.ByteOrder.BIG_ENDIAN)
    bb.put(if (littleEndian) 1.toByte else 0.toByte)
    bb.putInt(typeWord)
    srid.foreach(bb.putInt)
    bb.array()
  }

  test("header: all 17 type ids x Z/M x SRID x byte order, EWKB flag encoding") {
    for {
      code <- 1 to 17
      z <- Seq(false, true)
      m <- Seq(false, true)
      le <- Seq(true, false)
      srid <- Seq(None, Some(27700), Some(0))
    } {
      var word = code
      if (z) word |= EWKB.FlagZ
      if (m) word |= EWKB.FlagM
      if (srid.isDefined) word |= EWKB.FlagSrid
      val h = EWKB.header(mkHeader(le, word, srid))
      val label = s"code=$code z=$z m=$m le=$le srid=$srid"
      assert(h.typeCode == code, label)
      assert(h.hasZ == z && h.hasM == m, label)
      assert(h.srid == srid.getOrElse(0), label)
      assert(h.hasSridField == srid.isDefined, label)
      assert(h.littleEndian == le, label)
      assert(h.payloadOffset == (if (srid.isDefined) 9 else 5), label)
      assert(h.dims == 2 + (if (z) 1 else 0) + (if (m) 1 else 0), label)
    }
  }

  test("header: ISO dimension codes, plain and SRID-flag hybrid") {
    for {
      code <- 1 to 17
      (isoOff, z, m) <- Seq((0, false, false), (1000, true, false),
        (2000, false, true), (3000, true, true))
      le <- Seq(true, false)
      srid <- Seq(None, Some(4326))
    } {
      var word = code + isoOff
      if (srid.isDefined) word |= EWKB.FlagSrid // the withSrid hybrid
      val h = EWKB.header(mkHeader(le, word, srid))
      val label = s"code=$code iso=$isoOff le=$le srid=$srid"
      assert(h.typeCode == code, label)
      assert(h.hasZ == z && h.hasM == m, label)
      assert(h.srid == srid.getOrElse(0), label)
      assert(h.hasSridField == srid.isDefined, label)
      assert(h.payloadOffset == (if (srid.isDefined) 9 else 5), label)
    }
  }

  test("header: EWKB flags and ISO codes compose (flagged Z + ISO M)") {
    // not produced by our writer, but a decoder that strips flags before
    // the ISO-dim division must handle the union of both conventions
    val word = (2 + 2000) | EWKB.FlagZ | EWKB.FlagSrid
    val h = EWKB.header(mkHeader(littleEndian = true, word, Some(31370)))
    assert(h.typeCode == 2 && h.hasZ && h.hasM && h.srid == 31370)
  }

  test("header: too-short inputs rejected") {
    intercept[IllegalArgumentException](EWKB.header(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](EWKB.header(null))
    // SRID flag set but no SRID word present
    intercept[IllegalArgumentException](
      EWKB.header(mkHeader(littleEndian = true, 1 | EWKB.FlagSrid, None)))
  }
}

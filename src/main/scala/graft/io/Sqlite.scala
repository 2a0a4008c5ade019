package graft.io

import scala.collection.mutable.ArrayBuffer

/** Minimal pure-JVM SQLite 3 file-format codec — enough of the published
  * spec (sqlite.org/fileformat2.html) to read and write the rowid-table
  * b-trees a GeoPackage is made of. No SQL engine, no indexes, no WAL:
  * a `.gpkg` is a plain SQLite database whose tables we enumerate via
  * `sqlite_master` and scan in full, which is exactly what a feature-table
  * read needs (same posture as the FlatGeobuf codec in [[FlatBuf]]: the
  * format is public, the container is simple, a dependency-free codec
  * keeps the offline build honest).
  *
  * Reader model: [[SqliteDb]] over a [[Sqlite.RandomAccess]] — only the
  * pages touched are read (header, interior pages, requested leaves,
  * overflow chains), so executors can each scan a *subset* of a table's
  * leaf pages against the same file: the b-tree gives a single-file format
  * a natural split axis (see `GeoIO.readGeoPackage`).
  *
  * Writer model: [[SqliteWriter]] builds rowid tables bottom-up (leaf
  * pages → interior levels → root), allocates overflow chains for
  * oversized records, and writes `sqlite_master` last into page 1. Output
  * is a conforming legacy-journal database readable by any SQLite.
  *
  * Values map: NULL → null, integers → Long, REAL → Double, TEXT →
  * String (UTF-8 only), BLOB → Array[Byte].
  */
object Sqlite {

  /** Positioned reads over an open database file. */
  trait RandomAccess {
    def readAt(pos: Long, len: Int): Array[Byte]
    def length: Long
  }

  final class BytesAccess(bytes: Array[Byte]) extends RandomAccess {
    def readAt(pos: Long, len: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(bytes, pos.toInt, pos.toInt + len)
    def length: Long = bytes.length.toLong
  }

  /** Hadoop-backed positioned reads (executor-side scans of a `.gpkg`). */
  final class HadoopAccess(in: org.apache.hadoop.fs.FSDataInputStream,
      val length: Long) extends RandomAccess {
    def readAt(pos: Long, len: Int): Array[Byte] = {
      val buf = new Array[Byte](len)
      in.readFully(pos, buf)
      buf
    }
  }

  case class MasterRow(typ: String, name: String, tblName: String,
      rootPage: Int, sql: String)

  // ------------------------------------------------------------ primitives

  private[io] def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private[io] def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** SQLite varint: 1-9 bytes, big-endian 7-bit groups, 9th byte all 8
    * bits. Returns (value, bytesConsumed). */
  private[io] def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i)
      v = (v << 7) | (x & 0x7fL)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xffL), 9)
  }

  private[io] def writeVarint(v: Long, out: ArrayBuffer[Byte]): Unit = {
    if (v < 0) { // 9-byte form
      out += ((v >>> 57) | 0x80).toByte
      var s = 50
      while (s >= 8) { out += (((v >>> s) & 0x7f) | 0x80).toByte; s -= 7 }
      out += (v & 0xff).toByte
      return
    }
    val tmp = new Array[Byte](9)
    var n = 0
    var x = v
    do { tmp(n) = (x & 0x7f).toByte; x >>>= 7; n += 1 } while (x != 0)
    var i = n - 1
    while (i > 0) { out += (tmp(i) | 0x80).toByte; i -= 1 }
    out += tmp(0)
  }

  // ------------------------------------------------------------ records

  /** Decode one record payload → column values. */
  private[io] def decodeRecord(p: Array[Byte]): Array[Any] = {
    val (hdrLen, n0) = readVarint(p, 0)
    val types = ArrayBuffer.empty[Long]
    var off = n0
    while (off < hdrLen) {
      val (t, n) = readVarint(p, off)
      types += t
      off += n
    }
    var body = hdrLen.toInt
    val out = new Array[Any](types.length)
    var i = 0
    while (i < types.length) {
      types(i) match {
        case 0 => out(i) = null
        case 8 => out(i) = 0L
        case 9 => out(i) = 1L
        case 7 =>
          out(i) = java.lang.Double.longBitsToDouble(readIntN(p, body, 8)); body += 8
        case t if t >= 1 && t <= 6 =>
          val len = intLen(t.toInt)
          out(i) = readIntN(p, body, len); body += len
        case t if t >= 12 && t % 2 == 0 =>
          val len = ((t - 12) / 2).toInt
          out(i) = java.util.Arrays.copyOfRange(p, body, body + len); body += len
        case t if t >= 13 =>
          val len = ((t - 13) / 2).toInt
          out(i) = new String(p, body, len, java.nio.charset.StandardCharsets.UTF_8)
          body += len
        case t => throw new java.io.IOException(s"sqlite: reserved serial type $t")
      }
      i += 1
    }
    out
  }

  private def intLen(serial: Int): Int = serial match {
    case 1 => 1; case 2 => 2; case 3 => 3; case 4 => 4; case 5 => 6; case 6 => 8
  }

  private def readIntN(b: Array[Byte], off: Int, len: Int): Long = {
    var v = b(off).toLong // sign-extend from the first byte
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Encode column values → record payload (header + body). */
  private[io] def encodeRecord(values: Seq[Any]): Array[Byte] = {
    val types = ArrayBuffer.empty[Long]
    val body = ArrayBuffer.empty[Byte]
    def putIntN(v: Long, len: Int): Unit = {
      var s = (len - 1) * 8
      while (s >= 0) { body += ((v >> s) & 0xff).toByte; s -= 8 }
    }
    values.foreach {
      case null => types += 0L
      case v: Long =>
        if (v == 0L) types += 8L
        else if (v == 1L) types += 9L
        else {
          val len =
            if (v >= -128 && v <= 127) 1
            else if (v >= -32768 && v <= 32767) 2
            else if (v >= -8388608 && v <= 8388607) 3
            else if (v >= Int.MinValue && v <= Int.MaxValue) 4
            else if (v >= -140737488355328L && v <= 140737488355327L) 6
            else 8
          types += (len match {
            case 1 => 1L; case 2 => 2L; case 3 => 3L; case 4 => 4L
            case 6 => 5L; case 8 => 6L
          })
          putIntN(v, len)
        }
      case v: Int => return encodeRecord(values.map {
        case x: Int => x.toLong; case x => x })
      case v: Double =>
        types += 7L
        putIntN(java.lang.Double.doubleToLongBits(v), 8)
      case v: String =>
        val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        types += (13L + 2L * b.length)
        body ++= b
      case v: Array[Byte] =>
        types += (12L + 2L * v.length)
        body ++= v
      case other => throw new IllegalArgumentException(
        s"sqlite record: unsupported value type ${other.getClass}")
    }
    // header length varint is part of the header: iterate to fixpoint
    val typeBytes = ArrayBuffer.empty[Byte]
    types.foreach(writeVarint(_, typeBytes))
    var hdrLen = typeBytes.length + 1
    var stable = false
    while (!stable) {
      val probe = ArrayBuffer.empty[Byte]
      writeVarint(hdrLen.toLong, probe)
      val candidate = typeBytes.length + probe.length
      if (candidate == hdrLen) stable = true else hdrLen = candidate
    }
    val out = ArrayBuffer.empty[Byte]
    writeVarint(hdrLen.toLong, out)
    out ++= typeBytes
    out ++= body
    out.toArray
  }

  // ------------------------------------------------------------ reader

  /** Read-only database over `ra`. Cheap to construct (reads the 100-byte
    * header); pages are fetched on demand and NOT cached — callers walk
    * each page once. */
  final class SqliteDb(ra: RandomAccess) {
    private val header = ra.readAt(0, 100)
    require(new String(header, 0, 15, "US-ASCII") == "SQLite format 3",
      "not a SQLite database (bad magic)")
    val pageSize: Int = { val p = u16(header, 16); if (p == 1) 65536 else p }
    private val reserved = header(20) & 0xff
    val usable: Int = pageSize - reserved
    require((header(18) & 0xff) <= 1 && (header(19) & 0xff) <= 1,
      "sqlite: WAL-mode database not supported (run PRAGMA journal_mode=DELETE)")
    require(u32(header, 56) == 1L || u32(header, 56) == 0L,
      "sqlite: only UTF-8 text encoding supported")
    val applicationId: Long = u32(header, 68)

    private def page(n: Int): Array[Byte] =
      ra.readAt((n.toLong - 1) * pageSize, pageSize)

    /** Full payload of a cell whose local part starts at `off`, following
      * the overflow chain when the record spills. `payload` = declared
      * total length. Returns (payloadBytes, bytesUsedLocally). */
    private def cellPayload(pg: Array[Byte], off: Int, payload: Long): Array[Byte] = {
      val x = usable - 35 // table-leaf max local
      if (payload <= x) return java.util.Arrays.copyOfRange(pg, off, off + payload.toInt)
      val m = (usable - 12) * 32 / 255 - 23
      val k = m + ((payload - m) % (usable - 4)).toInt
      val local = if (k <= x) k else m
      val out = new Array[Byte](payload.toInt)
      System.arraycopy(pg, off, out, 0, local)
      var filled = local
      var next = u32(pg, off + local).toInt
      while (next != 0 && filled < payload) {
        val op = page(next)
        val take = math.min(usable - 4, payload.toInt - filled)
        System.arraycopy(op, 4, out, filled, take)
        filled += take
        next = u32(op, 0).toInt
      }
      if (filled != payload) throw new java.io.IOException(
        s"sqlite: truncated overflow chain ($filled of $payload bytes)")
      out
    }

    /** (rowid, decoded record) for every cell of one table LEAF page. */
    /** Rows stored on a table leaf page (one cell = one row). The cell
      * pointer array gives direct access, so `skipCells` is pure index
      * arithmetic — no payload decode for skipped cells. */
    def leafRows(pageNo: Int, skipCells: Int = 0): Iterator[(Long, Array[Any])] = {
      val pg = page(pageNo)
      val base = if (pageNo == 1) 100 else 0
      val typ = pg(base) & 0xff
      require(typ == 0x0d, s"sqlite: page $pageNo is not a table leaf (type $typ)")
      val nCells = u16(pg, base + 3)
      (math.min(skipCells, nCells) until nCells).iterator.map { i =>
        var off = u16(pg, base + 8 + 2 * i)
        val (payload, n1) = readVarint(pg, off); off += n1
        val (rowid, n2) = readVarint(pg, off); off += n2
        (rowid, decodeRecord(cellPayload(pg, off, payload)))
      }
    }

    /** Row count of a table leaf page from its header alone (offset 3,
      * big-endian u16) — no cell decode; a positional scan window
      * (skip_features/max_features) plans from these. */
    def leafCellCount(pageNo: Int): Int = {
      val pg = page(pageNo)
      val base = if (pageNo == 1) 100 else 0
      val typ = pg(base) & 0xff
      require(typ == 0x0d, s"sqlite: page $pageNo is not a table leaf (type $typ)")
      u16(pg, base + 3)
    }

    /** B-tree point lookup: the single row with this rowid, descending
      * interior pages by key (each interior cell holds (child, largest
      * rowid in child)) — O(log n) page reads, no scan. None when the
      * rowid is absent. Backs the readers' `fids=` option: random access
      * to named features without touching the rest of the table. */
    def lookupRow(root: Int, rowid: Long): Option[(Long, Array[Any])] = {
      var n = root
      while (true) {
        val pg = page(n)
        val base = if (n == 1) 100 else 0
        (pg(base) & 0xff) match {
          case 0x0d =>
            val nCells = u16(pg, base + 3)
            var i = 0
            while (i < nCells) {
              var off = u16(pg, base + 8 + 2 * i)
              val (payload, n1) = readVarint(pg, off); off += n1
              val (rid, n2) = readVarint(pg, off); off += n2
              if (rid == rowid)
                return Some((rid, decodeRecord(cellPayload(pg, off, payload))))
              i += 1
            }
            return None
          case 0x05 =>
            val nCells = u16(pg, base + 3)
            var child = u32(pg, base + 8).toInt // rightmost by default
            var i = 0
            var found = false
            while (i < nCells && !found) {
              val off = u16(pg, base + 12 + 2 * i)
              val (key, _) = readVarint(pg, off + 4)
              if (rowid <= key) { child = u32(pg, off).toInt; found = true }
              i += 1
            }
            n = child
          case t => throw new java.io.IOException(
            s"sqlite: unexpected page type $t in table b-tree (page $n)")
        }
      }
      None // unreachable
    }

    /** All LEAF page numbers under a table b-tree root, in key order —
      * reads only interior pages, so planning a distributed scan touches
      * O(leaves / fanout) pages. */
    def leafPages(root: Int): Seq[Int] = {
      val out = ArrayBuffer.empty[Int]
      def walk(n: Int): Unit = {
        val pg = page(n)
        val base = if (n == 1) 100 else 0
        (pg(base) & 0xff) match {
          case 0x0d => out += n
          case 0x05 =>
            val nCells = u16(pg, base + 3)
            (0 until nCells).foreach { i =>
              val off = u16(pg, base + 12 + 2 * i)
              walk(u32(pg, off).toInt)
            }
            walk(u32(pg, base + 8).toInt) // rightmost pointer
          case t => throw new java.io.IOException(
            s"sqlite: unexpected page type $t in table b-tree (page $n)")
        }
      }
      walk(root)
      out.toSeq
    }

    /** Scan a whole rowid table. */
    def tableRows(root: Int): Iterator[(Long, Array[Any])] =
      leafPages(root).iterator.flatMap(pg => leafRows(pg))

    /** The schema table (`sqlite_master`, root = page 1). */
    def master: Seq[MasterRow] =
      tableRows(1).map { case (_, r) =>
        MasterRow(str(r(0)), str(r(1)), str(r(2)),
          r(3) match { case null => 0; case v: Long => v.toInt },
          str(r(4)))
      }.toSeq

    private def str(a: Any): String = a match {
      case null => null; case s: String => s; case other => other.toString
    }
  }

  // ------------------------------------------------------------ writer

  /** Build a conforming single-file database from rowid tables. Rows are
    * streamed in via [[SqliteWriter#addTable]]; [[SqliteWriter#build]]
    * lays out pages (data b-trees first, `sqlite_master` in page 1 last,
    * once every root page number is known) and returns the file bytes.
    *
    * `ipkOrdinal` marks an INTEGER PRIMARY KEY column: per the spec its
    * value lives in the rowid and the record stores NULL at that ordinal.
    *
    * `autoIndexKeys` declares the table's non-IPK PRIMARY KEY / UNIQUE
    * constraints (one Seq of key-column ordinals per constraint, in DDL
    * order): SQLite backs each with an automatic index
    * (`sqlite_autoindex_<table>_<n>`), and `PRAGMA integrity_check` flags
    * a database whose schema declares one without its b-tree. Single-leaf
    * index trees only — enough for metadata-sized tables (a build error
    * otherwise); big tables should key on the rowid (IPK) instead.
    */
  final class SqliteWriter(pageSize: Int = 4096) {
    require(pageSize >= 512 && pageSize <= 65536 &&
      Integer.bitCount(pageSize) == 1, s"bad page size $pageSize")
    private val usable = pageSize // no reserved space
    private case class Table(name: String, sql: String,
      rows: Seq[(Long, Seq[Any])], ipkOrdinal: Int, autoIndexKeys: Seq[Seq[Int]])
    private val tables = ArrayBuffer.empty[Table]

    def addTable(name: String, sql: String, rows: Seq[(Long, Seq[Any])],
        ipkOrdinal: Int = -1, autoIndexKeys: Seq[Seq[Int]] = Seq.empty): Unit =
      tables += Table(name, sql, rows, ipkOrdinal, autoIndexKeys)

    // pages(i) = page i+1; page 1 reserved until the end
    private val pages = ArrayBuffer.empty[Array[Byte]]
    private def alloc(): Int = { pages += new Array[Byte](pageSize); pages.length }

    private def put16(pg: Array[Byte], off: Int, v: Int): Unit = {
      pg(off) = ((v >> 8) & 0xff).toByte; pg(off + 1) = (v & 0xff).toByte
    }
    private def put32(pg: Array[Byte], off: Int, v: Long): Unit = {
      pg(off) = ((v >> 24) & 0xff).toByte; pg(off + 1) = ((v >> 16) & 0xff).toByte
      pg(off + 2) = ((v >> 8) & 0xff).toByte; pg(off + 3) = (v & 0xff).toByte
    }

    /** Record → leaf cell bytes, allocating overflow pages as needed. */
    private def leafCell(rowid: Long, record: Array[Byte]): Array[Byte] = {
      val p = record.length.toLong
      val x = usable - 35
      val out = ArrayBuffer.empty[Byte]
      writeVarint(p, out)
      writeVarint(rowid, out)
      if (p <= x) { out ++= record; return out.toArray }
      val m = (usable - 12) * 32 / 255 - 23
      val k = m + ((p - m) % (usable - 4)).toInt
      val local = if (k <= x) k else m
      out ++= record.view.slice(0, local)
      // overflow chain
      var off = local
      val chunks = ArrayBuffer.empty[Array[Byte]]
      while (off < record.length) {
        val take = math.min(usable - 4, record.length - off)
        chunks += java.util.Arrays.copyOfRange(record, off, off + take)
        off += take
      }
      val pageNos = chunks.map(_ => alloc())
      chunks.zipWithIndex.foreach { case (c, i) =>
        val pg = pages(pageNos(i) - 1)
        put32(pg, 0, if (i + 1 < pageNos.length) pageNos(i + 1).toLong else 0L)
        System.arraycopy(c, 0, pg, 4, c.length)
      }
      val four = new Array[Byte](4)
      put32(four, 0, pageNos.head.toLong)
      out ++= four
      out.toArray
    }

    /** Pack (key, cell) pairs into b-tree pages of one type; returns
      * (pageNo, maxKey) per page. `hdr` = page-header size (8 leaf /
      * 12 interior). Page 1 is NEVER allocated here. */
    private def packPages(cells: Seq[(Long, Array[Byte])], leaf: Boolean): Seq[(Int, Long)] = {
      val hdr = if (leaf) 8 else 12
      val out = ArrayBuffer.empty[(Int, Long)]
      var batch = ArrayBuffer.empty[(Long, Array[Byte])]
      var used = 0
      def flush(): Unit = if (batch.nonEmpty) {
        val no = alloc()
        writePage(pages(no - 1), 0, batch.toSeq, leaf, rightmost = 0L)
        out += ((no, batch.last._1))
        batch = ArrayBuffer.empty; used = 0
      }
      cells.foreach { case (k, c) =>
        val need = c.length + 2
        if (batch.nonEmpty && hdr + used + need > usable) flush()
        require(hdr + c.length + 2 <= usable,
          s"sqlite writer: cell of ${c.length} bytes exceeds page capacity")
        batch += ((k, c)); used += need
      }
      flush()
      out.toSeq
    }

    /** Serialize one b-tree page in place. For interior pages the LAST
      * cell's child becomes the rightmost pointer (cells drop it). */
    private def writePage(pg: Array[Byte], base: Int,
        cells: Seq[(Long, Array[Byte])], leaf: Boolean, rightmost: Long): Unit = {
      val hdr = if (leaf) 8 else 12
      pg(base) = if (leaf) 0x0d else 0x05
      put16(pg, base + 1, 0) // first freeblock
      put16(pg, base + 3, cells.length)
      var content = usable
      cells.zipWithIndex.foreach { case ((_, c), i) =>
        content -= c.length
        System.arraycopy(c, 0, pg, content, c.length)
        put16(pg, base + hdr + 2 * i, content)
      }
      put16(pg, base + 5, if (content == 65536) 0 else content)
      pg(base + 7) = 0 // fragmented free bytes
      if (!leaf) put32(pg, base + 8, rightmost)
    }

    /** Build one table's b-tree; returns the root page number. */
    private def buildTree(rows: Seq[(Long, Seq[Any])], ipkOrdinal: Int): Int = {
      val cells = rows.sortBy(_._1).map { case (rowid, vals) =>
        val stored = if (ipkOrdinal < 0) vals
          else vals.zipWithIndex.map { case (v, i) => if (i == ipkOrdinal) null else v }
        (rowid, leafCell(rowid, encodeRecord(stored)))
      }
      if (cells.isEmpty) { // empty table: one empty leaf
        val no = alloc()
        writePage(pages(no - 1), 0, Seq.empty, leaf = true, rightmost = 0L)
        return no
      }
      var level = packPages(cells, leaf = true)
      while (level.length > 1) {
        // interior cells: (childPage, maxKeyInChild); last child → rightmost
        val interiorCells = level.dropRight(1).map { case (child, maxKey) =>
          val c = ArrayBuffer.empty[Byte]
          val four = new Array[Byte](4); put32(four, 0, child.toLong)
          c ++= four
          writeVarint(maxKey, c)
          (maxKey, c.toArray)
        }
        val hdr = 12
        // pack interior cells; each page's rightmost = the child AFTER its
        // last cell, so pack manually to keep that association
        val next = ArrayBuffer.empty[(Int, Long)]
        var i = 0
        while (i < level.length) {
          val pageCells = ArrayBuffer.empty[(Long, Array[Byte])]
          var used = 0
          // greedily take cells while at least one child remains for rightmost
          while (i < level.length - 1 && {
            val c = interiorCells(i)._2
            hdr + used + c.length + 2 <= usable && {
              // peek: stop early if this would leave no rightmost child
              true
            }
          }) {
            pageCells += ((interiorCells(i)._1, interiorCells(i)._2))
            used += interiorCells(i)._2.length + 2
            i += 1
          }
          // the child at position i becomes this page's rightmost pointer
          val (rmChild, rmMax) = level(i)
          i += 1
          val no = alloc()
          writePage(pages(no - 1), 0, pageCells.toSeq, leaf = false, rmChild.toLong)
          next += ((no, rmMax))
        }
        level = next.toSeq
      }
      level.head._1
    }

    /** SQLite BINARY-collation ordering across storage classes:
      * NULL < numeric < TEXT (byte order) < BLOB (byte order). */
    private def compareValues(a: Any, b: Any): Int = {
      def rank(v: Any): Int = v match {
        case null => 0
        case _: Long | _: Double => 1
        case _: String => 2
        case _: Array[Byte] => 3
      }
      val (ra, rb) = (rank(a), rank(b))
      if (ra != rb) return ra - rb
      (a, b) match {
        case (null, null) => 0
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: Long, y: Double) => java.lang.Double.compare(x.toDouble, y)
        case (x: Double, y: Long) => java.lang.Double.compare(x, y.toDouble)
        case (x: Double, y: Double) => java.lang.Double.compare(x, y)
        case (x: String, y: String) =>
          java.util.Arrays.compareUnsigned(
            x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
            y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case (x: Array[Byte], y: Array[Byte]) =>
          java.util.Arrays.compareUnsigned(x, y)
        case _ => 0
      }
    }

    /** Build one automatic index (single LEAF page, type 0x0a): cells are
      * (key columns..., rowid) records sorted by key, no rowid header.
      * Returns the root page number. */
    private def buildIndexTree(tableName: String,
        rows: Seq[(Long, Seq[Any])], keyOrdinals: Seq[Int]): Int = {
      val ord = new Ordering[Seq[Any]] {
        def compare(x: Seq[Any], y: Seq[Any]): Int = {
          var i = 0
          while (i < x.length && i < y.length) {
            val c = compareValues(x(i), y(i))
            if (c != 0) return c
            i += 1
          }
          x.length - y.length
        }
      }
      val cells = rows
        .map { case (rowid, vals) => keyOrdinals.map(vals(_)) :+ (rowid: Any) }
        .sorted(ord)
        .map { entry =>
          val rec = encodeRecord(entry)
          val cell = ArrayBuffer.empty[Byte]
          writeVarint(rec.length.toLong, cell)
          cell ++= rec
          // key for packPages is unused on a single leaf
          (0L, cell.toArray)
        }
      val need = 8 + cells.map(_._2.length + 2).sum
      // INDEX pages have a much smaller inline-payload maximum than table
      // leaves: X = (usable−12)·64/255 − 23 (~1002 at 4096), NOT
      // usable−35. A key record between the two bounds written inline
      // would read back in real SQLite as having an overflow pointer —
      // 'database disk image is malformed'. Reject instead (this writer
      // does not spill index keys to overflow chains).
      val maxIndexLocal = (usable - 12) * 64 / 255 - 23
      require(need <= usable && cells.forall(_._2.length <= maxIndexLocal),
        s"sqlite writer: automatic index on $tableName exceeds one leaf page " +
          s"or a key exceeds the $maxIndexLocal-byte index inline maximum " +
          s"($need bytes total) — use an INTEGER PRIMARY KEY for large tables")
      val no = alloc()
      writeIndexLeaf(pages(no - 1), cells.map(_._2))
      no
    }

    private def writeIndexLeaf(pg: Array[Byte], cells: Seq[Array[Byte]]): Unit = {
      pg(0) = 0x0a
      put16(pg, 1, 0)
      put16(pg, 3, cells.length)
      var content = usable
      cells.zipWithIndex.foreach { case (c, i) =>
        content -= c.length
        System.arraycopy(c, 0, pg, content, c.length)
        put16(pg, 8 + 2 * i, content)
      }
      put16(pg, 5, if (content == 65536) 0 else content)
      pg(7) = 0
    }

    /** Lay out every page and return the database file bytes. */
    def build(applicationId: Long = 0L, userVersion: Long = 0L): Array[Byte] = {
      require(pages.isEmpty, "build() already called")
      alloc() // reserve page 1
      var masterRowid = 0L
      val masterRows = tables.flatMap { t =>
        val root = buildTree(t.rows, t.ipkOrdinal)
        masterRowid += 1
        val tableRow = (masterRowid, Seq[Any](
          "table", t.name, t.name, root.toLong, t.sql))
        val indexRows = t.autoIndexKeys.zipWithIndex.map { case (keys, n) =>
          val idxRoot = buildIndexTree(t.name, t.rows, keys)
          masterRowid += 1
          (masterRowid, Seq[Any]("index", s"sqlite_autoindex_${t.name}_${n + 1}",
            t.name, idxRoot.toLong, null))
        }
        tableRow +: indexRows
      }
      // master cells must fit page 1 (offset 100). True for GeoPackage's
      // handful of tables; a general writer would grow an interior level.
      val masterCells = masterRows.map { case (rowid, vals) =>
        (rowid, leafCell(rowid, encodeRecord(vals)))
      }
      val need = 100 + 8 + masterCells.map(_._2.length + 2).sum
      require(need <= usable,
        s"sqlite writer: schema table needs $need bytes; raise pageSize")
      writePage(pages(0), 100, masterCells.toSeq, leaf = true, rightmost = 0L)
      // 100-byte header
      val h = pages(0)
      // 16-byte magic: "SQLite format 3" + NUL (h(15) is already zero)
      System.arraycopy("SQLite format 3".getBytes("US-ASCII"), 0, h, 0, 15)
      put16(h, 16, if (pageSize == 65536) 1 else pageSize)
      h(18) = 1; h(19) = 1 // legacy journal r/w versions
      h(20) = 0 // reserved space
      h(21) = 64; h(22) = 32; h(23) = 32 // payload fractions (fixed by spec)
      put32(h, 24, 1L) // file change counter
      put32(h, 28, pages.length.toLong) // db size in pages
      put32(h, 32, 0L); put32(h, 36, 0L) // freelist
      put32(h, 40, tables.length.toLong) // schema cookie
      put32(h, 44, 4L) // schema format 4 (serial types 8/9 allowed)
      put32(h, 48, 0L) // default page cache size
      put32(h, 52, 0L) // largest root (vacuum) — 0 = no autovacuum
      put32(h, 56, 1L) // text encoding UTF-8
      put32(h, 60, userVersion)
      put32(h, 64, 0L) // incremental vacuum
      put32(h, 68, applicationId)
      put32(h, 92, 1L) // version-valid-for == change counter
      put32(h, 96, 3045000L) // sqlite version number (informational)
      val out = new Array[Byte](pages.length * pageSize)
      pages.zipWithIndex.foreach { case (p, i) =>
        System.arraycopy(p, 0, out, i * pageSize, pageSize)
      }
      out
    }
  }
}

package graft.sources

import java.util

import graft.io.{FlatGeobuf, GeoIO}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** `spark.read.format("flatgeobuf").load(path)` — the DSv2 face of
  * [[GeoIO.readFlatGeobuf]] over the shared [[GeoDsv2]] scan (column
  * pruning, decode-level filter pushdown, bbox option riding the packed
  * Hilbert R-tree). One partition per .fgb part file — a single FGB
  * stream is not splittable without consulting its index, so the
  * multi-file layout of [[GeoIO.writeFlatGeobufPartitioned]] is the
  * cluster-scale layout, and this source parallelizes exactly over it.
  *
  * Reference: the reference gets FlatGeobuf through GDAL/pyogrio
  * (`/root/reference/polars_st/input.py:30-153`); the DSv2 registration is
  * the Spark-catalog analog of a pyogrio driver entry. */
class FlatGeobufDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "flatgeobuf"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlatGeobufDataSource.tableOf(options).schema()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    FlatGeobufDataSource.tableOf(new CaseInsensitiveStringMap(properties),
      Option(schema))
}

private[sources] object FlatGeobufDataSource {

  /** Per-file feature iterator: whole-file read (size-prefixed stream,
    * not splittable), index-driven bbox candidates when the file carries
    * the packed R-tree, envelope-test fallback otherwise. */
  private val iterate: GeoDsv2.PartIterator = (part, conf, bbox) => {
    val bytes = readWhole(part.path, conf)
    val feats = bbox match {
      case None => FlatGeobuf.read(bytes)._2
      case Some((x0, y0, x1, y1)) =>
        FlatGeobuf.searchHits(bytes, x0, y0, x1, y1) match {
          case Some(hits) => FlatGeobuf.readFeaturesAt(bytes, hits.map(_._2))
          case None => FlatGeobuf.read(bytes)._2.filter { ft =>
            ft.geometry != null && !ft.geometry.isEmpty && {
              val e = ft.geometry.getEnvelopeInternal
              !(e.getMinX > x1 || e.getMaxX < x0 || e.getMinY > y1 || e.getMaxY < y0)
            }
          }
        }
    }
    feats.map(ft => (ft.geometry, ft.properties))
  }

  /** The ONE .fgb part-listing used by schema inference, the append
    * guard and the streaming offset listing (name-sorted; a single file
    * path lists as itself). */
  private[sources] def listFgbParts(path: String,
      conf: org.apache.hadoop.conf.Configuration): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Seq.empty
    else if (fs.getFileStatus(dir).isDirectory)
      fs.listStatus(dir).map(_.getPath).toSeq
        .filter(_.getName.endsWith(".fgb")).sortBy(_.getName).map(_.toString)
    else Seq(path)
  }

  private[sources] def readWhole(file: String,
      conf: SerializableConfiguration): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(file)
    GeoDsv2.readWhole(p.getFileSystem(conf.value), p)
  }

  def tableOf(options: CaseInsensitiveStringMap,
      writeSchema: Option[StructType] = None): GeoTable = {
    val path = GeoDsv2.pathOf(options)
    val geometryName = Option(options.get("geometry")).getOrElse("geometry")
    val bbox = GeoDsv2.parseBbox(options)
    val spark = SparkSession.active
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)
    val hconf = spark.sparkContext.hadoopConfiguration
    val files: Seq[String] = listFgbParts(path, hconf)
    // an explicit schema wins (the DSv2 contract when
    // supportsExternalMetadata is true): for writes it is the frame's
    // schema — an overwrite onto stale parts with a DIFFERENT schema
    // must resolve against the data being written, not the old files —
    // a schema-specified read trusts the caller, and a STREAM over a
    // not-yet-populated landing dir must pass .schema(...) too (nothing
    // exists to infer from — same rule as Spark's own file sources)
    // ONE header→StructType construction shared by inference and
    // validation — they must agree or validation drifts from what
    // inference produces.
    def storedSchemaOf(file: String): StructType = {
      val p = new org.apache.hadoop.fs.Path(file)
      val in = p.getFileSystem(hconf).open(p)
      val header = try FlatGeobuf.readHeaderFrom(in) finally in.close()
      StructType(
        StructField(geometryName, BinaryType, nullable = true) +:
          header.columns.map(c => StructField(c.name, GeoIO.sparkTypeFor(c.colType))))
    }
    val schema = writeSchema.getOrElse {
      require(files.nonEmpty,
        s"flatgeobuf: no .fgb files under $path to infer a schema from — " +
          "for a write this resolves from the frame; for a read or a " +
          "stream over an empty/not-yet-existing landing dir, pass an " +
          "explicit .schema(...)")
      storedSchemaOf(files.head)
    }
    // An externally-supplied schema is trusted for WRITES (overwrite must
    // resolve against the data being written, not stale parts) but a READ
    // decodes property arrays POSITIONALLY against the stored header —
    // geometry not first, reordered, or mismatched properties would
    // silently scramble column values and mis-evaluate pushed filters.
    // Validated at scan-build time (see GeoTable.validateRead), only when
    // files exist to validate against. EVERY part's header is checked
    // against the resolved layout — a directory with heterogeneous .fgb
    // parts (externally-produced files, mixed schemas) would otherwise
    // scramble silently (the same hazard the shapefile source rejects for
    // mixed .dbf layouts). Each part validates once per table instance.
    val validated = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val readValidation: () => Unit = () => if (files.nonEmpty) {
      def matches(a: StructType, b: StructType): Boolean =
        a.length == b.length &&
          a.fields.zip(b.fields).forall { case (x, y) =>
            x.name == y.name && x.dataType == y.dataType }
      writeSchema.foreach { s =>
        val stored = storedSchemaOf(files.head)
        require(matches(s, stored) &&
          s.fields.headOption.exists(f =>
            f.name == geometryName && f.dataType == BinaryType),
          s"flatgeobuf: explicit read schema ${s.catalogString} does not " +
            s"match the stored layout ${stored.catalogString} — the decoder " +
            "is positional (geometry column first, then the header's " +
            "properties in order), so a mismatched schema would silently " +
            "scramble column values; drop .schema(...) to infer, or match " +
            "the stored layout exactly")
      }
      files.foreach { f =>
        if (!validated.contains(f)) {
          val stored = storedSchemaOf(f)
          require(matches(schema, stored),
            s"flatgeobuf: part $f stores layout ${stored.catalogString} but " +
              s"the table resolved ${schema.catalogString} (from " +
              s"${files.head}) — mixed .fgb layouts in one directory " +
              "would decode positionally and scramble column values; " +
              "split the parts into separate directories")
          validated.add(f)
        }
      }
    }
    new FgbWritableTable(path, files.map(GeoDsv2.GeoPart(_)), schema,
      geometryName, bbox, conf, iterate, readValidation)
  }
}

/** [[GeoTable]] + the DSv2 write path:
  * `df.write.format("flatgeobuf").mode("overwrite"|"append").save(dir)`
  * mirrors [[GeoIO.writeFlatGeobufPartitioned]] — one .fgb part per input
  * partition, written executor-side with the streaming codec (no driver
  * funnel) — under a JOB-commit protocol: tasks write invisible
  * `.fgb.tmp` files named with the write's queryId (no cross-application
  * collisions), and only `BatchWrite.commit` makes them visible —
  * renaming the new parts FIRST and deleting superseded old parts LAST
  * (overwrite) — so any failure before commit leaves the directory
  * exactly as it was, and a crash inside commit itself can at worst
  * leave old parts alongside the new ones (re-run the overwrite to
  * converge); old data is never deleted before the new data is fully
  * visible. This
  * also makes self-overwrite (`read dir → transform → overwrite dir`)
  * safe: the input files outlive every read task and are replaced only
  * at job commit. Appends validate the frame's property columns against
  * the stored header (positional decode — a silent schema drift would
  * scramble columns on read). */
private[sources] class FgbWritableTable(path: String,
    parts: Seq[GeoDsv2.GeoPart], tableSchema: StructType, geometryName: String,
    bbox: Option[(Double, Double, Double, Double)],
    conf: SerializableConfiguration, iterate: GeoDsv2.PartIterator,
    readValidation: () => Unit = () => ())
    extends GeoTable("FlatGeobuf", path, parts, tableSchema, geometryName,
      bbox, conf, iterate, readValidation)
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  import org.apache.spark.sql.connector.catalog.TableCapability
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)
  /** Streaming face: the built scan is wrapped so
    * `toMicroBatchStream` resolves. Batch queries still negotiate
    * pruning/pushdown on the shared GeoScanBuilder before build();
    * STREAMING queries skip that negotiation entirely (Spark calls
    * build() directly) — see [[FgbStreamingScan]]'s contract notes. */
  override protected def wrapScan(s: GeoScan):
      org.apache.spark.sql.connector.read.Scan =
    new FgbStreamingScan(path, s, conf)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo):
      org.apache.spark.sql.connector.write.WriteBuilder =
    new FgbWriteBuilder(path, info.schema(), info.queryId(), geometryName,
      "true".equalsIgnoreCase(info.options().getOrDefault("spatialindex", "false")),
      conf)
}

/** Micro-batch streaming over a growing directory of .fgb parts — the
  * landing-zone ingestion pattern
  * (`spark.readStream.format("flatgeobuf").load(dir)`): each trigger
  * processes the part files that appeared since the last committed
  * offset.
  *
  * CONTRACT AND LIMITS (documented, not guessed):
  *  - The directory must be APPEND-ONLY while a stream runs: the write
  *    path's job-commit rename makes files immutable once visible, but
  *    `mode("overwrite")` (or external compaction) deletes and replaces
  *    visible parts — an in-flight batch then fails loudly on the
  *    missing file, and replacement parts carry new names, so a
  *    restarted stream would re-emit their rows. Compact a streamed
  *    landing zone only with the stream stopped and its checkpoint
  *    reset.
  *  - Offsets are the SET of processed file names (URL-encoded JSON
  *    string, memoized). That is simple and exactly-once, but grows
  *    with the directory — suitable for landing zones up to ~10k parts;
  *    beyond that, batch-load partitioned layouts instead (Spark's own
  *    FileStreamSource pays a compacted log for the same reason).
  *  - Spark builds the streaming scan WITHOUT the column-pruning /
  *    filter-pushdown negotiation (`newScanBuilder(options).build()`
  *    directly), so micro-batches decode full rows; Spark re-projects
  *    and re-filters above, so results are identical — only the batch
  *    path's decode-level skipping does not engage. The `bbox` /
  *    `geometry` load OPTIONS still apply (they ride the table, not the
  *    negotiation). */
private[sources] class FgbStreamingScan(path: String, delegate: GeoScan,
    conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.read.Scan {
  override def readSchema(): StructType = delegate.readSchema()
  override def description(): String = delegate.description()
  override def toBatch: org.apache.spark.sql.connector.read.Batch = delegate.toBatch
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FgbMicroBatchStream(path, delegate, conf)
}

private[sources] class FgbOffset(val files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  private lazy val jsonStr =
    "\"" + files.sorted.map(f =>
      java.net.URLEncoder.encode(f, "UTF-8")).mkString(",") + "\""
  override def json(): String = jsonStr
  override def equals(o: Any): Boolean = o match {
    case other: FgbOffset => files.toSet == other.files.toSet
    case _ => false
  }
  override def hashCode(): Int = files.toSet.hashCode()
}

private[sources] object FgbOffset {
  def fromJson(json: String): FgbOffset = {
    val body = json.trim.stripPrefix("\"").stripSuffix("\"")
    new FgbOffset(if (body.isEmpty) Seq.empty
      else body.split(",").toSeq.map(java.net.URLDecoder.decode(_, "UTF-8")))
  }
}

private[sources] class FgbMicroBatchStream(path: String, delegate: GeoScan,
    conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private def listing(): Seq[String] =
    FlatGeobufDataSource.listFgbParts(path, conf.value)

  // Trigger.AvailableNow: snapshot the listing once, drain to exactly it
  // and stop — files landing mid-drain wait for the next run
  @volatile private var availableNowEnd: Option[FgbOffset] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(new FgbOffset(listing()))

  override def initialOffset(): Offset = new FgbOffset(Seq.empty)
  override def latestOffset(): Offset =
    availableNowEnd.getOrElse(new FgbOffset(listing()))
  // SupportsAdmissionControl (via SupportsTriggerAvailableNow): no read
  // limits — every trigger takes all newly visible files
  override def latestOffset(startOffset: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset =
    latestOffset()
  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()
  override def deserializeOffset(json: String): Offset = FgbOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset):
      Array[org.apache.spark.sql.connector.read.InputPartition] = {
    val seen = start.asInstanceOf[FgbOffset].files.toSet
    end.asInstanceOf[FgbOffset].files.filterNot(seen).sorted
      .map(f => GeoDsv2.GeoPart(f): org.apache.spark.sql.connector.read.InputPartition)
      .toArray
  }

  override def createReaderFactory():
      org.apache.spark.sql.connector.read.PartitionReaderFactory =
    delegate.createReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class FgbWriteBuilder(path: String, schema: StructType,
    queryId: String, geometryName: String, spatialIndex: Boolean,
    conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new FgbWrite(path, schema, queryId, geometryName, spatialIndex, conf, doTruncate)
}

private[sources] case class FgbCommit(tmp: String, fin: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

private[sources] class FgbWrite(path: String, schema: StructType,
    queryId: String, geometryName: String, spatialIndex: Boolean,
    conf: SerializableConfiguration, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.Write
    with org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  require(schema.fieldNames.contains(geometryName),
    s"flatgeobuf: no geometry column $geometryName in write schema")

  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf.value)
    // append onto existing parts: the reader decodes property arrays
    // POSITIONALLY against the first file's header, so the frame's
    // property columns must match the stored ones exactly
    if (!truncate && fs.exists(dir)) {
      val existing = FlatGeobufDataSource.listFgbParts(path, conf.value).headOption
        .map(new org.apache.hadoop.fs.Path(_))
      existing.foreach { first =>
        val in = fs.open(first)
        val header = try FlatGeobuf.readHeaderFrom(in) finally in.close()
        val writeCols = schema.fields.filter(_.name != geometryName)
          .map(f => FlatGeobuf.Col(f.name, GeoIO.fgbTypeFor(f.dataType))).toSeq
        require(writeCols == header.columns,
          s"flatgeobuf append: property columns $writeCols do not match the " +
            s"stored layout ${header.columns} — positional decode would " +
            "scramble columns; use mode(\"overwrite\") to re-lay the store")
      }
    }
    fs.mkdirs(dir)
    new FgbWriterFactory(path, schema, queryId, geometryName, spatialIndex, conf)
  }

  /** Make the job's parts visible atomically-enough: rename every task's
    * committed tmp FIRST, and only then delete the superseded old parts
    * (overwrite). Ordering matters for crash behavior — a driver crash or
    * rename failure mid-commit then leaves the old parts intact next to
    * whatever new parts became visible (re-running the overwrite
    * converges), instead of a directory whose old data is gone and whose
    * new data is partial. Runs after ALL tasks (including any reads
    * feeding them) have finished. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf.value)
    // snapshot the superseded parts BEFORE any rename; queryId-stamped
    // final names can never collide with another job's parts
    val old: Array[org.apache.hadoop.fs.Path] =
      if (truncate && fs.exists(dir))
        fs.listStatus(dir).map(_.getPath).filter(_.getName.endsWith(".fgb"))
      else Array.empty
    // qualified comparison: listStatus paths are scheme-qualified while
    // fin strings inherit the user's save path form. (By construction the
    // pre-rename snapshot cannot contain this job's queryId-stamped names
    // — the guard is belt-and-braces against a commit retry.)
    val fresh = messages.collect { case FgbCommit(_, fin) =>
      fs.makeQualified(new org.apache.hadoop.fs.Path(fin)).toString }.toSet
    messages.foreach {
      case FgbCommit(tmp, fin) =>
        val t = new org.apache.hadoop.fs.Path(tmp)
        val f = new org.apache.hadoop.fs.Path(fin)
        if (!fs.rename(t, f)) throw new java.io.IOException(
          s"flatgeobuf: failed to commit $tmp -> $fin")
      case other => throw new IllegalStateException(s"unexpected commit message: $other")
    }
    old.filterNot(p => fresh.contains(fs.makeQualified(p).toString))
      .foreach(fs.delete(_, false))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf.value)
    // task-reported tmps, plus a sweep for this query's stragglers
    messages.foreach {
      case FgbCommit(tmp, _) =>
        try fs.delete(new org.apache.hadoop.fs.Path(tmp), false)
        catch { case scala.util.control.NonFatal(_) => () }
      case _ => ()
    }
    if (fs.exists(dir) && fs.getFileStatus(dir).isDirectory)
      fs.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.contains(queryId) && p.getName.endsWith(".fgb.tmp"))
        .foreach(p => try fs.delete(p, false)
          catch { case scala.util.control.NonFatal(_) => () })
  }
}

private[sources] class FgbWriterFactory(path: String, schema: StructType,
    queryId: String, geometryName: String, spatialIndex: Boolean,
    conf: SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long):
      org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] =
    new FgbDataWriter(path, schema, queryId, geometryName, spatialIndex, conf,
      partitionId, taskId)
}

/** Per-task streaming writer: rows stream into
  * `part-<pid>-<queryId>.fgb.tmp` (the queryId makes names unique across
  * applications and retries never collide with committed parts); the
  * task's commit message hands the (tmp, final) pair to
  * [[FgbWrite.commit]], which performs the renames at JOB commit. The
  * header-SRID protocol (leading-null buffering, mixed SRIDs raise) is
  * the shared [[FlatGeobuf.StreamWriter]]. */
private[sources] class FgbDataWriter(path: String, schema: StructType,
    queryId: String, geometryName: String, spatialIndex: Boolean,
    conf: SerializableConfiguration, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[org.apache.spark.sql.catalyst.InternalRow] {
  import org.apache.spark.sql.types._

  private val geomIdx = schema.fieldIndex(geometryName)
  private val propFields = schema.fields.zipWithIndex.filter(_._2 != geomIdx)
  private val cols = propFields.map { case (f, _) =>
    FlatGeobuf.Col(f.name, GeoIO.fgbTypeFor(f.dataType)) }.toSeq

  // task attempts of the same partition write DISTINCT tmps (taskId in
  // the tmp name) but the same final name (the committed attempt wins —
  // Spark commits exactly one)
  private val tmp = new org.apache.hadoop.fs.Path(path,
    f"part-$partitionId%05d-$queryId-$taskId.fgb.tmp")
  private val fin = new org.apache.hadoop.fs.Path(path,
    f"part-$partitionId%05d-$queryId.fgb")
  private val fs = tmp.getFileSystem(conf.value)
  private val out = fs.create(tmp, true)
  // spatialIndex buffers the partition's ENCODED features executor-side
  // (the packed Hilbert R-tree needs them all before the header can be
  // written — same per-partition buffering as the function surface, via
  // the shared FlatGeobuf.IndexedStreamWriter); the streaming path is
  // the default
  private val writer =
    if (spatialIndex) null else new FlatGeobuf.StreamWriter(out, cols)
  private val indexed =
    if (spatialIndex) new FlatGeobuf.IndexedStreamWriter(out, cols) else null

  override def write(row: org.apache.spark.sql.catalyst.InternalRow): Unit = {
    val geoBytes =
      if (row.isNullAt(geomIdx)) null else row.getBinary(geomIdx)
    val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
    val props = propFields.map { case (f, i) =>
      if (row.isNullAt(i)) null
      else f.dataType match {
        case StringType => row.getUTF8String(i).toString
        case BinaryType => row.getBinary(i)
        case BooleanType => row.getBoolean(i)
        case ByteType => row.getByte(i)
        case ShortType => row.getShort(i)
        case IntegerType => row.getInt(i)
        case LongType => row.getLong(i)
        case FloatType => row.getFloat(i)
        case DoubleType => row.getDouble(i)
        case other => throw new IllegalArgumentException(
          s"flatgeobuf: unsupported write type $other for ${f.name}")
      }
    }.asInstanceOf[Array[Any]]
    if (spatialIndex) indexed.write(geom, props)
    else writer.write(geom, props)
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    if (spatialIndex) indexed.close() else writer.close()
    FgbCommit(tmp.toString, fin.toString)
  }

  override def abort(): Unit = {
    try { if (spatialIndex) indexed.abortClose() else writer.abortClose() }
    catch { case scala.util.control.NonFatal(_) => () }
    fs.delete(tmp, false)
  }

  override def close(): Unit = ()
}

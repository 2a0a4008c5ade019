package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import org.locationtech.jts.geom.Geometry

/** Shared DataSourceV2 scan machinery for the geo file formats
  * (`spark.read.format("flatgeobuf" | "shapefile" | "geopackage")`) — the
  * idiomatic-Spark face of the `GeoIO.read*` function surface, which
  * stays unchanged with its full kwargs set. Each format contributes a
  * partition plan (driver side) and a per-partition feature iterator
  * (executor side); this layer supplies the uniform behaviors:
  *
  *  - **Column pruning** (`SupportsPushDownRequiredColumns`): the scan's
  *    output is exactly the referenced columns; a pruned-out geometry
  *    column skips EWKB serialization entirely (the dominant per-feature
  *    encode cost).
  *  - **Filter pushdown** (`SupportsPushDownFilters`): comparison/null/In
  *    filters on property columns are evaluated feature-by-feature at
  *    decode (rows dropped before Spark sees them) and reported in the
  *    scan node's description; pushed filters are ALSO returned for
  *    Spark-side re-evaluation — an optimization, never a semantics
  *    transfer.
  *  - **bbox option** (`option("bbox", "x0,y0,x1,y1")`): the format's own
  *    spatial access path (FGB packed R-tree, shapefile per-record boxes,
  *    GPKG stored envelopes), visible in the scan description.
  *
  * Scale shape: one [[InputPartition]] per natural unit of the format
  * (part file, or leaf-page group for the single-file SQLite container). */
private[sources] object GeoDsv2 {

  /** Generic partition: a path plus two provider-interpreted longs (e.g.
    * a GPKG leaf-page range). */
  final case class GeoPart(path: String, a: Long = 0L, b: Long = 0L)
      extends InputPartition

  /** Executor-side feature access for one partition: JTS geometry (null
    * allowed) + property values aligned with the table's property
    * columns (everything after the geometry field). */
  type PartIterator =
    (GeoPart, SerializableConfiguration, Option[(Double, Double, Double, Double)]) =>
      Iterator[(Geometry, Array[Any])]

  def parseBbox(options: CaseInsensitiveStringMap): Option[(Double, Double, Double, Double)] =
    Option(options.get("bbox")).map { s =>
      val parts = s.split(",").map(_.trim.toDouble)
      require(parts.length == 4, s"bbox must be 'x0,y0,x1,y1', got '$s'")
      (parts(0), parts(1), parts(2), parts(3))
    }

  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("'path' must be set (use .load(path))"))

  /** Whole-file read into one array, guarded against the ≥2 GiB part
    * that a JVM array cannot address — see
    * [[graft.io.GeoIO.readWholeGuarded]] (shared with the function
    * surface's codecs). */
  def readWhole(fs: org.apache.hadoop.fs.FileSystem,
      file: org.apache.hadoop.fs.Path): Array[Byte] =
    graft.io.GeoIO.readWholeGuarded(fs, file)
}

private[sources] class GeoTable(formatName: String, protected val path: String,
    parts: Seq[GeoDsv2.GeoPart], tableSchema: StructType, geometryName: String,
    bbox: Option[(Double, Double, Double, Double)],
    protected val conf: SerializableConfiguration, iterate: GeoDsv2.PartIterator,
    readValidation: () => Unit = () => ())
    extends Table with SupportsRead {
  override def name(): String = s"$formatName:`$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  /** Hook for subclasses that add execution modes on top of the shared
    * batch scan (e.g. the FGB streaming face): pruning/pushdown still
    * negotiate on the shared builder; only the BUILT scan is wrapped. */
  protected def wrapScan(s: GeoScan): Scan = s
  /** Read-path validation, run ONCE per table on the first scan build
    * (driver side) — not at table construction, because (a) a table built
    * for a WRITE legitimately carries a schema differing from stale
    * on-disk parts (overwrite), and (b) the DSv2 protocol constructs
    * tables from BOTH inferSchema and getTable, so eager per-construction
    * validation would double any O(files) sidecar IO before a single task
    * launches. The lazy val memoizes across the actions of one loaded
    * DataFrame (they share the table instance). */
  private lazy val validatedOnce: Unit = readValidation()
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    validatedOnce
    new GeoScanBuilder(formatName, parts, tableSchema, geometryName, bbox,
      conf, iterate, wrapScan)
  }
}

private[sources] class GeoScanBuilder(formatName: String,
    parts: Seq[GeoDsv2.GeoPart], fullSchema: StructType, geometryName: String,
    bbox: Option[(Double, Double, Double, Double)],
    conf: SerializableConfiguration, iterate: GeoDsv2.PartIterator,
    wrapScan: GeoScan => Scan = identity)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var requiredSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    this.requiredSchema = requiredSchema

  /** Accept the decode-evaluable subset; return ALL filters so Spark
    * re-evaluates (the conservative DSv2 contract). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GeoFilterEval.supported(_, fullSchema, geometryName))
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = wrapScan(new GeoScan(formatName, parts,
    fullSchema, requiredSchema, geometryName, bbox, pushed, conf, iterate))
}

private[sources] class GeoScan(formatName: String, parts: Seq[GeoDsv2.GeoPart],
    fullSchema: StructType, requiredSchema: StructType, geometryName: String,
    bbox: Option[(Double, Double, Double, Double)], pushed: Array[Filter],
    conf: SerializableConfiguration, iterate: GeoDsv2.PartIterator)
    extends Scan with Batch {

  override def readSchema(): StructType = requiredSchema

  override def description(): String = {
    val b = bbox.map(t => s"[${t._1},${t._2},${t._3},${t._4}]").getOrElse("[]")
    s"$formatName Bbox: $b, PushedFilters: ${pushed.mkString("[", ", ", "]")}, " +
      s"ReadSchema: ${requiredSchema.catalogString}"
  }

  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    parts.map(p => p: InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GeoReaderFactory(fullSchema, requiredSchema, geometryName, bbox,
      pushed, conf, iterate)
}

private[sources] class GeoReaderFactory(fullSchema: StructType,
    requiredSchema: StructType, geometryName: String,
    bbox: Option[(Double, Double, Double, Double)], pushed: Array[Filter],
    conf: SerializableConfiguration, iterate: GeoDsv2.PartIterator)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GeoPartitionReader(partition.asInstanceOf[GeoDsv2.GeoPart],
      fullSchema, requiredSchema, geometryName, bbox, pushed, conf, iterate)
}

/** Pushed-filter evaluation before row construction, required-column
  * projection at row build — the geometry column's EWKB serialization
  * runs only when the column survives pruning. */
private[sources] class GeoPartitionReader(part: GeoDsv2.GeoPart,
    fullSchema: StructType, requiredSchema: StructType, geometryName: String,
    bbox: Option[(Double, Double, Double, Double)], pushed: Array[Filter],
    conf: SerializableConfiguration, iterate: GeoDsv2.PartIterator)
    extends PartitionReader[InternalRow] {

  // full-schema property index per required column (-1 = the geometry)
  private val proj: Array[Int] = requiredSchema.fieldNames.map { n =>
    if (n == geometryName) -1
    else fullSchema.fieldIndex(n) - 1 // fullSchema = geometry +: properties
  }
  // filter plan, fully resolved at construction: per pushed filter, its
  // compiled eval and each referenced column's (name, property index) —
  // fieldIndex lookups and Filter.references allocation are loop-invariant
  // and must not run per row in the scan's hot path
  private val filterPlan: Array[((String, Any) => Boolean, Array[(String, Int)])] =
    pushed.map { f =>
      (GeoFilterEval.compile(f),
        f.references.map(n => (n, fullSchema.fieldIndex(n) - 1)))
    }

  private val it: Iterator[(Geometry, Array[Any])] = iterate(part, conf, bbox)

  private var current: InternalRow = _

  private def passes(props: Array[Any]): Boolean = {
    var i = 0
    while (i < filterPlan.length) {
      val (eval, refs) = filterPlan(i)
      var ok = true
      var j = 0
      while (ok && j < refs.length) {
        val (name, propIdx) = refs(j)
        val v = if (propIdx < 0) null else props(propIdx)
        ok = eval(name, v)
        j += 1
      }
      if (!ok) return false
      i += 1
    }
    true
  }

  override def next(): Boolean = {
    while (it.hasNext) {
      val (g, props) = it.next()
      if (passes(props)) {
        val vals = new Array[Any](proj.length)
        var i = 0
        while (i < proj.length) {
          vals(i) =
            if (proj(i) == -1) { if (g == null) null else graft.serde.EWKB.write(g) }
            else GeoFilterEval.toCatalyst(props(proj(i)))
          i += 1
        }
        current = new GenericInternalRow(vals)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Decode-time evaluation of the pushable V1 filter subset. Conservative
  * by construction: anything not confidently evaluable is simply not
  * pushed (Spark evaluates everything anyway). */
private[sources] object GeoFilterEval {

  def supported(f: Filter, schema: StructType, geometryName: String): Boolean = {
    def col(name: String): Boolean =
      name != geometryName && schema.fieldNames.contains(name)
    f match {
      case EqualTo(a, v) => col(a) && scalarV(v)
      case GreaterThan(a, v) => col(a) && scalarV(v)
      case GreaterThanOrEqual(a, v) => col(a) && scalarV(v)
      case LessThan(a, v) => col(a) && scalarV(v)
      case LessThanOrEqual(a, v) => col(a) && scalarV(v)
      case IsNull(a) => col(a)
      case IsNotNull(a) => col(a)
      case In(a, vs) => col(a) && vs.forall(scalarV)
      case _ => false
    }
  }

  private def scalarV(v: Any): Boolean = v match {
    case _: java.lang.Number | _: String | _: java.lang.Boolean => true
    case _ => false
  }

  private def asIntegral(v: Any): Option[Long] = v match {
    case b: java.lang.Byte    => Some(b.longValue)
    case s: java.lang.Short   => Some(s.longValue)
    case i: java.lang.Integer => Some(i.longValue)
    case l: java.lang.Long    => Some(l.longValue)
    case _ => None
  }

  /** Integral pairs compare as longs — a double fallback would round both
    * sides to the nearest representable double, so pushed filters on Long
    * columns holding values beyond 2^53 (ns timestamps, snowflake ids)
    * could DROP rows at decode that Spark's re-filter can never recover. */
  private def cmp(l: Any, r: Any): Option[Int] = (asIntegral(l), asIntegral(r)) match {
    case (Some(a), Some(b)) => Some(java.lang.Long.compare(a, b))
    case _ => (l, r) match {
      case (a: java.lang.Number, b: java.lang.Number) =>
        Some(java.lang.Double.compare(a.doubleValue(), b.doubleValue()))
      case (a: String, b: String) => Some(a.compareTo(b))
      case (a: java.lang.Boolean, b: java.lang.Boolean) => Some(a.compareTo(b))
      case _ => None
    }
  }

  /** filter → (columnName, decodedValue) => keep-this-row. A null value
    * fails every comparison (SQL three-valued logic: NULL comparisons are
    * not TRUE, and Spark re-filters anyway). */
  def compile(f: Filter): (String, Any) => Boolean = f match {
    case EqualTo(a, v) => (n, x) => n != a || (x != null && cmp(x, v).contains(0))
    case GreaterThan(a, v) => (n, x) => n != a || (x != null && cmp(x, v).exists(_ > 0))
    case GreaterThanOrEqual(a, v) => (n, x) => n != a || (x != null && cmp(x, v).exists(_ >= 0))
    case LessThan(a, v) => (n, x) => n != a || (x != null && cmp(x, v).exists(_ < 0))
    case LessThanOrEqual(a, v) => (n, x) => n != a || (x != null && cmp(x, v).exists(_ <= 0))
    case IsNull(a) => (n, x) => n != a || x == null
    case IsNotNull(a) => (n, x) => n != a || x != null
    case In(a, vs) => (n, x) => n != a || (x != null && vs.exists(v => cmp(x, v).contains(0)))
    case _ => (_, _) => true
  }

  /** External decoded value → catalyst representation (strings become
    * UTF8String; format scalars are already catalyst-compatible). */
  def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }
}

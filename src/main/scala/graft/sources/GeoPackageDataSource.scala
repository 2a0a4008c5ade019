package graft.sources

import java.util

import graft.io.{GeoIO, GeoPackage, Sqlite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** `spark.read.format("geopackage").load(path)` — the DSv2 face of
  * [[GeoIO.readGeoPackage]] over the shared [[GeoDsv2]] scan. A single
  * .gpkg SPLITS: the driver reads only the schema and b-tree interior
  * pages, then each partition is a leaf-page group (64 leaves ≈ a few MB)
  * whose task opens the file and reads just its pages — no whole-file
  * funnel. The `bbox` option prunes on each blob's STORED envelope before
  * any WKB parse; `layer` selects the feature table (default: first). */
class GeoPackageDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "geopackage"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoPackageDataSource.tableOf(options).schema()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    GeoPackageDataSource.tableOf(new CaseInsensitiveStringMap(properties))
}

private[sources] object GeoPackageDataSource {

  def tableOf(options: CaseInsensitiveStringMap): GeoTable = {
    val path = GeoDsv2.pathOf(options)
    val geometryName = Option(options.get("geometry")).getOrElse("geometry")
    val bbox = GeoDsv2.parseBbox(options)
    val spark = SparkSession.active
    val conf = new SerializableConfiguration(spark.sparkContext.hadoopConfiguration)

    def open(): (Sqlite.SqliteDb, org.apache.hadoop.fs.FSDataInputStream) = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf.value)
      val in = fs.open(p)
      (new Sqlite.SqliteDb(
        new Sqlite.HadoopAccess(in, fs.getFileStatus(p).getLen)), in)
    }
    val (db, in) = open()
    val (lay, leafGroups) = try {
      val all = GeoPackage.layers(db)
      require(all.nonEmpty, s"gpkg: no feature layers in $path")
      val lay = Option(options.get("layer")) match {
        case None => all.head
        case Some(want) => all.find(_.table == want).getOrElse(
          throw new IllegalArgumentException(
            s"gpkg: no such layer $want (have ${all.map(_.table).mkString(", ")})"))
      }
      if (lay.srid > 0 && !graft.functions.EpsgDb.isSupported(lay.srid))
        GeoPackage.srsDefinition(db, lay.srid).foreach { wkt =>
          try graft.functions.CrsRegistry.register(lay.srid, wkt)
          catch { case scala.util.control.NonFatal(_) => () }
        }
      val root = db.master.find(m => m.typ == "table" && m.name == lay.table).get.rootPage
      (lay, db.leafPages(root).grouped(64).toIndexedSeq)
    } finally in.close()

    val geomOrd = lay.columns.indexWhere(_.name.equalsIgnoreCase(lay.geometryColumn))
    require(geomOrd >= 0, s"gpkg: geometry column ${lay.geometryColumn} not in schema")
    val attrs = lay.columns.zipWithIndex.filter(_._2 != geomOrd)
    val schema = StructType(
      StructField(geometryName, BinaryType, nullable = true) +:
        attrs.map { case (c, _) => StructField(c.name, GeoIO.gpkgSparkType(c), nullable = true) })
    val layerSrid = lay.srid
    val attrArr = attrs.toArray
    val types = attrArr.map { case (c, _) => GeoIO.gpkgSparkType(c) }

    // executor-side: open the file, decode this partition's leaf group
    // (eagerly — the handle must close before downstream consumes the
    // iterator), stored-envelope bbox prune before any WKB parse, declared
    // -type coercion matching the function surface exactly
    val iterate: GeoDsv2.PartIterator = (part, taskConf, bbx) => {
      val group = leafGroups(part.a.toInt)
      val p = new org.apache.hadoop.fs.Path(part.path)
      val fs = p.getFileSystem(taskConf.value)
      val fin = fs.open(p)
      val fdb = new Sqlite.SqliteDb(
        new Sqlite.HadoopAccess(fin, fs.getFileStatus(p).getLen))
      val decoded =
        try group.flatMap { pg =>
          val rows = bbx match {
            case None => fdb.leafRows(pg)
            case Some((x0, y0, x1, y1)) => fdb.leafRows(pg).filterNot {
              case (_, rec) => GeoIO.gpkgBboxPruned(
                rec(geomOrd).asInstanceOf[Array[Byte]], x0, y0, x1, y1)
            }
          }
          rows.toVector
        } finally fin.close()
      decoded.iterator.map { case (rowid, rec) =>
        val blob = rec(geomOrd).asInstanceOf[Array[Byte]]
        val g = if (blob == null) null else {
          val (gg, _) = GeoPackage.readGeometryBlob(blob)
          if (gg.getSRID == 0 && layerSrid != 0) gg.setSRID(layerSrid)
          gg
        }
        val vals = new Array[Any](attrArr.length)
        var i = 0
        while (i < attrArr.length) {
          val (c, ord) = attrArr(i)
          vals(i) = (rec(ord), types(i)) match {
            case (null, _) => if (c.ipk) rowid else null // IPK NULL = rowid
            case (v: Long, LongType) => v
            case (v: Long, DoubleType) => v.toDouble
            case (v: Long, BooleanType) => v != 0L
            case (v: Long, StringType) => v.toString
            case (v: Double, DoubleType) => v
            case (v: Double, LongType) => v.toLong
            case (v: Double, StringType) => v.toString
            case (v: String, StringType) => v
            case (v: String, LongType) => v.toLong
            case (v: String, DoubleType) => v.toDouble
            case (v: Array[Byte], BinaryType) => v
            case (v, t) => throw new java.io.IOException(
              s"gpkg: column ${c.name}: cannot map ${v.getClass} to $t")
          }
          i += 1
        }
        (g, vals)
      }
    }

    new GeoTable("GeoPackage", path,
      leafGroups.indices.map(i => GeoDsv2.GeoPart(path, a = i.toLong)),
      schema, geometryName, bbox, conf, iterate)
  }
}

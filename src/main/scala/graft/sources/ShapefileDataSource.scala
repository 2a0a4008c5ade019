package graft.sources

import java.util

import graft.io.Shapefile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

/** `spark.read.format("shapefile").load(path)` — the DSv2 face of
  * [[graft.io.GeoIO.readShapefile]] over the shared [[GeoDsv2]] scan.
  * One partition per .shp file (a shapefile is record-chained and its
  * .dbf runs in lockstep — per-file is the natural parallel unit;
  * directory reads fan out across part files). The `bbox` option prunes
  * on each record's stored box before geometry decode; the .prj sidecar
  * resolves the SRID exactly like the function surface (AUTHORITY
  * clause, EPSG-table inference, or auto-registration). */
class ShapefileDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "shapefile"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ShapefileDataSource.tableOf(options).schema()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    ShapefileDataSource.tableOf(new CaseInsensitiveStringMap(properties))
}

private[sources] object ShapefileDataSource {

  private def sidecar(shp: org.apache.hadoop.fs.Path, ext: String) =
    graft.io.GeoIO.shpSidecar(shp, ext)

  /** Per-file iterator: .shp + .dbf whole-file reads, record-box bbox
    * prune inside the codec, SRID (packed in GeoPart.a by the driver
    * plan) stamped onto each geometry. */
  private val iterate: GeoDsv2.PartIterator = (part, conf, bbox) => {
    val p = new org.apache.hadoop.fs.Path(part.path)
    val fs = p.getFileSystem(conf.value)
    val dbfP = sidecar(p, ".dbf")
    val dbf = if (fs.exists(dbfP)) Some(GeoDsv2.readWhole(fs, dbfP)) else None
    Shapefile.readFeatures(GeoDsv2.readWhole(fs, p), dbf, bbox, srid = part.a.toInt)
  }


  def tableOf(options: CaseInsensitiveStringMap): GeoTable = {
    val path = GeoDsv2.pathOf(options)
    val geometryName = Option(options.get("geometry")).getOrElse("geometry")
    val bbox = GeoDsv2.parseBbox(options)
    val spark = SparkSession.active
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shps: Seq[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(hadoopPath).isDirectory) {
        val l = fs.listStatus(hadoopPath).map(_.getPath).toSeq
          .filter(_.getName.toLowerCase(java.util.Locale.ROOT).endsWith(".shp"))
          .sortBy(_.getName)
        require(l.nonEmpty, s"no .shp files in $path")
        l
      } else Seq(hadoopPath)
    // schema + srid from the first file's sidecars; every OTHER file's
    // sidecars are validated against them lazily at first scan build
    // (GeoTable.readValidation) — NOT here, because the DSv2 protocol
    // calls tableOf from both inferSchema and getTable, and an eager
    // O(files) sidecar sweep would run twice before any task launches.
    // Mixed .dbf layouts or provably-different CRS fail loudly instead of
    // silently misaligning attributes / mislabeling the CRS.
    val (fields, srid) = graft.io.GeoIO.shapefileHeadLayout(fs, shps.head)
    val schema = StructType(
      StructField(geometryName, BinaryType, nullable = true) +:
        fields.map(f => StructField(f.name, Shapefile.sparkType(f))))
    new GeoTable("Shapefile", path,
      shps.map(s => GeoDsv2.GeoPart(s.toString, a = srid.toLong)), schema,
      geometryName, bbox,
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration),
      iterate,
      readValidation =
        () => graft.io.GeoIO.validateShapefileDir(fs, shps, path, fields, srid))
  }
}

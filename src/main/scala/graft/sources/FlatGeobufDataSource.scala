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
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FlatGeobufDataSource.tableOf(options).schema()
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    FlatGeobufDataSource.tableOf(new CaseInsensitiveStringMap(properties))
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

  private[sources] def readWhole(file: String,
      conf: SerializableConfiguration): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(file)
    val fs = p.getFileSystem(conf.value)
    val in = fs.open(p)
    try {
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len); in.readFully(0, buf); buf
    } finally in.close()
  }

  def tableOf(options: CaseInsensitiveStringMap): GeoTable = {
    val path = GeoDsv2.pathOf(options)
    val geometryName = Option(options.get("geometry")).getOrElse("geometry")
    val bbox = GeoDsv2.parseBbox(options)
    val spark = SparkSession.active
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[String] =
      if (fs.getFileStatus(hadoopPath).isDirectory) {
        val l = fs.listStatus(hadoopPath).map(_.getPath).toSeq
          .filter(_.getName.endsWith(".fgb")).sortBy(_.getName)
        require(l.nonEmpty, s"no .fgb files in $path")
        l.map(_.toString)
      } else Seq(path)
    val in = fs.open(new org.apache.hadoop.fs.Path(files.head))
    val header = try FlatGeobuf.readHeaderFrom(in) finally in.close()
    val schema = StructType(
      StructField(geometryName, BinaryType, nullable = true) +:
        header.columns.map(c => StructField(c.name, GeoIO.sparkTypeFor(c.colType))))
    new GeoTable("FlatGeobuf", path, files.map(GeoDsv2.GeoPart(_)), schema,
      geometryName, bbox,
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration),
      iterate)
  }
}

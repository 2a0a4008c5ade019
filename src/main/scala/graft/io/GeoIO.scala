package graft.io

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Frame-level geometry I/O (reference §2.13, `/root/reference/polars_st/
  * input.py` + `geodataframe.py:385-553`).
  *
  * The JVM has no GDAL, so the supported formats are (documented gap for
  * OGR breadth, SURVEY.md §7):
  * - **(Geo)Parquet**: geometry as WKB/EWKB binary column — plain
  *   `spark.read.parquet` + [[geoDataFrame]] normalization; written with
  *   [[writeGeoParquet]] (geometry column tagged via column metadata).
  * - **CSV/JSON with WKT/GeoJSON geometry strings** — [[geoDataFrame]]
  *   with the right format.
  * - **GeoJSON / NDGeoJSON writers** — built from native expressions
  *   (`to_json` + string assembly), exactly like the reference builds them
  *   from Polars expressions (`geodataframe.py:493-553`).
  */
object GeoIO {

  /** Normalize a column of the given format into an EWKB geometry column —
    * the `GeoDataFrame` constructor analog (`geodataframe.py:40-98`).
    * Formats: wkb | wkt | ewkt | geojson | auto (sniffs strings: `{`→
    * geojson, `SRID=`→ewkt, else wkt; binary → wkb). */
  def geoDataFrame(df: DataFrame, geometryName: String = "geometry",
      format: String = "auto"): DataFrame = {
    val c = col(geometryName)
    val isBinary = df.schema(geometryName).dataType == BinaryType
    val parsed: Column = format match {
      case "wkb" => graft.functions.st_geomfromwkb(c)
      case "wkt" => st_geomfromtext(c)
      case "ewkt" => st_geomfromewkt(c)
      case "geojson" => st_geomfromgeojson(c)
      case "auto" =>
        if (isBinary) graft.functions.st_geomfromwkb(c)
        else when(trim(c).startsWith("{"), st_geomfromgeojson(c))
          .when(upper(c).startsWith("SRID="), st_geomfromewkt(c))
          .otherwise(st_geomfromtext(c))
      case other => throw new IllegalArgumentException(s"unknown geometry format: $other")
    }
    df.withColumn(geometryName, parsed)
  }

  /** Name of the bbox covering column written next to the geometry
    * (GeoParquet 1.1 "covering" design). */
  val BboxColumn = "__geo_bbox"

  /** The GeoParquet discovery metadata for `path`: the standard `geo`
    * footer key-value when present (written by [[writeGeoParquet]]'s
    * `writeMetadata` via [[ParquetFooter]], or by any conforming writer —
    * geopandas, DuckDB spatial, GDAL), else the `_geo_metadata.json`
    * sidecar (this library's pre-footer fallback). */
  def geoParquetMetadata(spark: SparkSession, path: String): Option[String] = {
    val footer =
      try ParquetFooter.readKeyValueMetadata(spark, path, "geo")
      catch { case _: Exception => None }
    footer.orElse {
      val p = new org.apache.hadoop.fs.Path(path, "_geo_metadata.json")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
        finally in.close()
      }
    }
  }

  /** Read parquet with a WKB geometry column → normalized geo frame.
    *
    * GeoParquet metadata (footer `geo` key or sidecar, see
    * [[geoParquetMetadata]]) is honored when present: a dataset-level
    * `srid` is applied to geometries that carry none, so standard
    * WKB-encoded files (GeoParquet 1.x stores CRS only in metadata) come
    * back with the right SRID.
    *
    * @param bbox optional (xmin, ymin, xmax, ymax) spatial filter — the
    *   Spark analog of the reference's `read_file(bbox=...)` GDAL pushdown
    *   (`/root/reference/polars_st/input.py:30-153`). When the file carries
    *   the [[BboxColumn]] covering column (written by [[writeGeoParquet]]),
    *   the filter is a plain column comparison, so Parquet row-group
    *   min/max statistics prune non-matching row groups at the scan — no
    *   geometry is even deserialized for pruned groups. Without the
    *   covering column it degrades to a per-row envelope test. */
  def readGeoParquet(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      bbox: Option[(Double, Double, Double, Double)] = None): DataFrame = {
    val raw = spark.read.parquet(path)
    val filtered = bbox match {
      case None => raw
      case Some((xmin, ymin, xmax, ymax)) if raw.columns.contains(BboxColumn) =>
        raw.filter(
          col(s"$BboxColumn.xmin") <= xmax && col(s"$BboxColumn.xmax") >= xmin &&
          col(s"$BboxColumn.ymin") <= ymax && col(s"$BboxColumn.ymax") >= ymin)
      case Some((xmin, ymin, xmax, ymax)) =>
        val env = graft.functions.st_bounds(col(geometryName))
        raw.filter(
          element_at(env, 1) <= xmax && element_at(env, 3) >= xmin &&
          element_at(env, 2) <= ymax && element_at(env, 4) >= ymin)
    }
    val parsed = geoDataFrame(filtered, geometryName, "wkb").drop(BboxColumn)
    val metaSrid = geoParquetMetadata(spark, path)
      .flatMap("\"srid\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).getOrElse(0)
    if (metaSrid == 0) parsed
    else {
      val g = col(geometryName)
      parsed.withColumn(geometryName,
        when(graft.functions.st_srid(g) === 0,
          graft.functions.st_set_srid(g, lit(metaSrid))).otherwise(g))
    }
  }

  /** Write parquet with the geometry column tagged in column metadata
    * (GeoParquet-style marker, enough for round-trip + discovery) and,
    * by default, a bbox covering column that future reads prune on
    * (see [[readGeoParquet]]).
    *
    * @param encoding geometry byte encoding: `"EWKB"` (default — this
    *   library's native convention, SRID travels in every value) or
    *   `"WKB"` (standard GeoParquet 1.x: plain ISO WKB, CRS only in the
    *   dataset metadata — what geopandas / DuckDB-spatial / GDAL expect).
    * @param writeMetadata write the GeoParquet `geo` metadata payload
    *   (version, primary column, encoding, inferred geometry types,
    *   dataset bbox, CRS/SRID, covering column): into every part file's
    *   FOOTER key-value metadata via [[ParquetFooter]] (standard
    *   discovery — external readers find it), and as a
    *   `_geo_metadata.json` sidecar (cheap discovery for this library;
    *   also covers filesystems where the footer-rewrite pass is
    *   undesirable). The footer pass re-copies each part file's bytes
    *   once (no decode) — the default write path skips it and pays
    *   nothing. Like the reference's `write_file`
    *   (`geodataframe.py:462-471`), geometry types and CRS are inferred
    *   from the data and **mixed SRIDs are rejected**. */
  def writeGeoParquet(df: DataFrame, path: String,
      geometryName: String = "geometry", mode: String = "overwrite",
      writeBbox: Boolean = true, writeMetadata: Boolean = false,
      encoding: String = "EWKB"): Unit = {
    require(encoding == "EWKB" || encoding == "WKB",
      s"writeGeoParquet: encoding must be EWKB or WKB, got $encoding")
    val meta = new MetadataBuilder()
      .putString("encoding", encoding)
      .putBoolean("geoparquet_geometry", true)
      .build()
    val geoCol =
      if (encoding == "WKB") graft.functions.st_aswkb(col(geometryName))
      else col(geometryName)
    val tagged = df.withColumn(geometryName, geoCol.as(geometryName, meta))
    val withBbox =
      if (!writeBbox) tagged
      else {
        val env = graft.functions.st_bounds(col(geometryName))
        // record which geometry column the envelopes were derived from, so
        // BboxFilterRule never prunes on a filter against a different
        // geometry column of the same table
        val bboxMeta = new MetadataBuilder().putString("covers", geometryName).build()
        tagged.withColumn(BboxColumn, struct(
          element_at(env, 1).as("xmin"), element_at(env, 2).as("ymin"),
          element_at(env, 3).as("xmax"), element_at(env, 4).as("ymax"))
          .as(BboxColumn, bboxMeta))
      }
    withBbox.write.mode(mode).parquet(path)
    if (writeMetadata) {
      val json = geoMetadataJson(df, geometryName, encoding,
        if (writeBbox) Some(BboxColumn) else None)
      val hadoopPath = new org.apache.hadoop.fs.Path(path, "_geo_metadata.json")
      val fs = hadoopPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      val out = fs.create(hadoopPath, true)
      out.write(json.getBytes("UTF-8"))
      out.close()
      // standard discovery: the same payload into every part footer
      ParquetFooter.addKeyValueMetadata(df.sparkSession, path, Map("geo" -> json))
    }
  }

  /** GeoParquet 1.1 `geo` metadata payload from the frame's own stats
    * (geometry types, single SRID enforced, total bounds) — shared by
    * [[writeGeoParquet]] and the bucketed spatial store's stamping. */
  /** The geo-stats aggregate columns (types, srids, total bounds) —
    * usable in a plain `.agg` or folded into a write via `.observe`. */
  private[graft] def geoStatsAggs(geometryName: String): Seq[Column] = {
    val g = col(geometryName)
    Seq(
      collect_set(graft.functions.st_geometrytype(g)).as("types"),
      collect_set(graft.functions.st_srid(g)).as("srids"),
      element_at(graft.functions.st_total_bounds(g), 1).as("xmin"),
      element_at(graft.functions.st_total_bounds(g), 2).as("ymin"),
      element_at(graft.functions.st_total_bounds(g), 3).as("xmax"),
      element_at(graft.functions.st_total_bounds(g), 4).as("ymax"))
  }

  /** GeoParquet 1.1 `geo` payload from computed [[geoStatsAggs]] values. */
  private[graft] def geoMetadataJsonFromStats(typesRaw: Seq[String],
      sridsRaw: Seq[Int], bbox: (Double, Double, Double, Double),
      geometryName: String, encoding: String,
      coveringColumn: Option[String]): String = {
    val types = typesRaw.sorted
    val srids = sridsRaw.sorted
    require(srids.length <= 1,
      s"write_file: mixed SRIDs are not supported (got ${srids.mkString(", ")})")
    val srid = srids.headOption.getOrElse(0)
    val crs = graft.functions.CrsImpl.crsFromCode(srid).map(w =>
      "\"" + w.replace("\\", "\\\\").replace("\"", "\\\"") + "\"").getOrElse("null")
    s"""{"version":"1.1.0","primary_column":"$geometryName","columns":{"$geometryName":{
       |"encoding":"$encoding","geometry_types":[${types.map("\"" + _ + "\"").mkString(",")}],
       |"bbox":[${bbox._1},${bbox._2},${bbox._3},${bbox._4}],
       |"srid":$srid,"crs":$crs,
       |"covering":${coveringColumn.map(c => "{\"bbox\":{\"column\":\"" + c + "\"}}").getOrElse("null")}}}}""".stripMargin
  }

  private[graft] def geoMetadataJson(df: DataFrame, geometryName: String,
      encoding: String, coveringColumn: Option[String]): String = {
    val stats = df.agg(geoStatsAggs(geometryName).head,
      geoStatsAggs(geometryName).tail: _*).collect()(0)
    geoMetadataJsonFromStats(stats.getSeq[String](0), stats.getSeq[Int](1),
      (stats.getDouble(2), stats.getDouble(3), stats.getDouble(4), stats.getDouble(5)),
      geometryName, encoding, coveringColumn)
  }

  /** Read newline-delimited GeoJSON features (one Feature per line):
    * properties become columns (via schema inference over the properties
    * objects), geometry becomes an EWKB column. */
  def readNdGeoJson(spark: SparkSession, path: String,
      geometryName: String = "geometry"): DataFrame = {
    val lines = spark.read.text(path)
    val props = spark.read.json(
      lines.select(get_json_object(col("value"), "$.properties").as("value"))
        .as(org.apache.spark.sql.Encoders.STRING))
    val propCols = props.columns
    val parsed = lines.select(
      graft.functions.st_geomfromgeojson(
        get_json_object(col("value"), "$.geometry")).as(geometryName),
      from_json(get_json_object(col("value"), "$.properties"), props.schema).as("__p"))
    propCols.foldLeft(parsed)((d, c) => d.withColumn(c, col(s"__p.$c"))).drop("__p")
  }

  /** Read a whole-file GeoJSON FeatureCollection (the reference's
    * `read_file` on .geojson): multiline JSON → one row per feature.
    * `skipFeatures`/`maxFeatures` window the feature sequence
    * (filename-ordered across a directory of collections) declaratively:
    * per-file counts are one `size(features)` aggregate, the window is a
    * broadcast join on filename + a `posexplode` range filter. */
  def readGeoJson(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue): DataFrame = {
    val windowed = skipFeatures > 0 || maxFeatures != Long.MaxValue
    val fc0 = spark.read.option("multiLine", "true").json(path)
    val exploded0 =
      if (!windowed) fc0.select(explode(col("features")).as("f"))
      else {
        val fc = fc0.withColumn("__file", input_file_name())
        val counts = fc.select(col("__file"),
          size(col("features")).cast("long").as("__n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
        val windows = featureWindows(counts.map(_._1).toSeq,
          skipFeatures, maxFeatures)(counts.toMap)
        import spark.implicits._
        val wdf = windows.toDF("__file", "__skip", "__take")
        fc.join(broadcast(wdf), "__file")
          .select(col("__skip"), col("__take"),
            posexplode(col("features")).as(Seq("__pos", "f")))
          .where(col("__pos") >= col("__skip") &&
            col("__pos") < col("__skip") + col("__take"))
          .select(col("f"))
      }
    val propsSchema = exploded0.schema("f").dataType
      .asInstanceOf[StructType].fields.find(_.name == "properties")
    val base = exploded0.select(
      graft.functions.st_geomfromgeojson(to_json(col("f.geometry"))).as(geometryName),
      col("f.properties").as("__p"))
    propsSchema.map(_.dataType.asInstanceOf[StructType].fieldNames.toSeq)
      .getOrElse(Seq.empty)
      .foldLeft(base)((d, c) => d.withColumn(c, col(s"__p.$c"))).drop("__p")
  }

  /** One GeoJSON Feature string per row: all non-geometry columns become
    * properties (reference `write_ndgeojson`, `geodataframe.py:529-553`). */
  def featureColumn(df: DataFrame, geometryName: String = "geometry"): Column = {
    val props = df.columns.filterNot(_ == geometryName).map(col)
    concat(
      lit("""{"type":"Feature","geometry":"""),
      st_asgeojson(col(geometryName)),
      lit(""","properties":"""),
      to_json(struct(props: _*)),
      lit("}"))
  }

  /** Newline-delimited GeoJSON writer. */
  def writeNdGeoJson(df: DataFrame, path: String,
      geometryName: String = "geometry", mode: String = "overwrite"): Unit =
    df.select(featureColumn(df, geometryName).as("value"))
      .write.mode(mode).text(path)

  /** Whole-FeatureCollection GeoJSON string (driver-side; small frames). */
  def toGeoJsonFeatureCollection(df: DataFrame, geometryName: String = "geometry"): String = {
    val features = df.select(featureColumn(df, geometryName).as("f"))
      .collect().map(_.getString(0))
    features.mkString("""{"type":"FeatureCollection","features":[""", ",", "]}")
  }

  /** Read a CSV with a WKT geometry column. */
  def readWktCsv(spark: SparkSession, path: String, geometryName: String = "geometry",
      header: Boolean = true): DataFrame =
    geoDataFrame(spark.read.option("header", header.toString).csv(path), geometryName, "wkt")

  // -------------------------------------------------------------- Shapefile

  private def dbfFieldFor(f: StructField): Shapefile.DbfField = f.dataType match {
    case ByteType | ShortType | IntegerType | LongType =>
      Shapefile.DbfField(f.name, 'N', 20, 0)
    case FloatType | DoubleType => Shapefile.DbfField(f.name, 'N', 30, 10)
    case BooleanType => Shapefile.DbfField(f.name, 'L', 1, 0)
    case StringType => Shapefile.DbfField(f.name, 'C', 128, 0)
    case other => throw new IllegalArgumentException(
      s"shapefile: unsupported attribute column type $other (cast to a " +
        "scalar/string type first)")
  }

  /** Read ESRI shapefile(s) → geo frame (EWKB geometry + attribute columns
    * typed from the .dbf header), mirroring the reference's `read_file`
    * on .shp (`/root/reference/polars_st/input.py:30-153`). `path` may be
    * one `.shp` or a directory of them (parallelism is per file — the
    * format is not splittable; 2 GB per-file spec cap bounds each task).
    *
    * @param columns  attribute subset to keep (data-source order, like
    *   pyogrio's `columns=`); geometry is always kept.
    * @param bbox     (xmin, ymin, xmax, ymax) — records whose STORED
    *   bounding box (read before any point data) misses it are skipped
    *   without geometry deserialization.
    * @param readGeometry false drops the geometry column (pyogrio's
    *   `read_geometry=False`).
    * @param skipFeatures / @param maxFeatures positional window over the
    *   (filename-ordered) feature sequence, pyogrio's `skip_features` /
    *   `max_features`. Without a bbox the skip is scan-level: per-file
    *   counts come from the .shx length alone (no data read), files
    *   outside the window are never opened, and in-file skips hop record
    *   headers without decoding. With a bbox the window applies AFTER the
    *   filter (pyogrio semantics), so multi-file planning needs one
    *   count pass over the stored-bbox tests.
    * @param fids 0-based record indexes to read (OGR shapefile FIDs;
    *   global across a filename-ordered directory read): random access
    *   through the .shx offsets — O(1) per feature, nothing else
    *   decoded. Mutually exclusive with bbox/skip/max (pyogrio rule).
    *   pyogrio additionally forbids fids+where; here the combination is
    *   DELIBERATELY allowed — `where` is a post-read Catalyst filter over
    *   the fids-selected rows (well-defined, order-independent), not a
    *   scan-level OGR clause, so there is no ambiguity to forbid.
    * @param where SQL boolean expression over the attribute columns,
    *   applied as a Catalyst filter on the result frame (pyogrio's
    *   `where`); `force2D` drops Z from the geometry (`force_2d`). The
    *   remaining readers take these as plain frame ops —
    *   `.filter(expr(...))` / `st_force_2d` compose identically there. */
  def readShapefile(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      columns: Option[Seq[String]] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      readGeometry: Boolean = true,
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue,
      fids: Option[Seq[Long]] = None,
      where: Option[String] = None,
      force2D: Boolean = false,
      returnFids: Boolean = false): DataFrame = {
    require(fids.isEmpty ||
      (bbox.isEmpty && skipFeatures == 0 && maxFeatures == Long.MaxValue),
      "shapefile: fids cannot be combined with bbox/skip_features/max_features")
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shps: Seq[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(hadoopPath).isDirectory)
        fs.listStatus(hadoopPath).map(_.getPath).toSeq
          .filter(_.getName.toLowerCase.endsWith(".shp")).sortBy(_.getName)
      else Seq(hadoopPath)
    require(shps.nonEmpty, s"no .shp files in $path")
    def sidecar(shp: org.apache.hadoop.fs.Path, ext: String): org.apache.hadoop.fs.Path =
      shpSidecar(shp, ext)
    // schema + srid from the first file's sidecars, every other file's
    // sidecars validated against them (mixed layouts/CRS fail loudly)
    val (fields, srid) = shapefileDirLayout(fs, shps, path)
    val keptIdx: Seq[Int] = columns match {
      case None => fields.indices
      case Some(want) =>
        val wantSet = want.toSet
        val idx = fields.indices.filter(i => wantSet.contains(fields(i).name))
        val missing = wantSet -- idx.map(fields(_).name)
        require(missing.isEmpty, s"shapefile: no such attribute column(s): ${missing.mkString(", ")}")
        idx
    }
    require(!returnFids || !keptIdx.exists(i => fields(i).name == "fid"),
      "shapefile: return_fids would collide with an attribute column " +
        "named 'fid' — exclude it via columns=")
    val schema = StructType(
      (if (returnFids) Seq(StructField("fid", LongType, nullable = false))
       else Seq.empty) ++
        (if (readGeometry) Seq(StructField(geometryName, BinaryType, nullable = true))
         else Seq.empty) ++
        keptIdx.map(i => StructField(fields(i).name, Shapefile.sparkType(fields(i)))))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fileList = shps.map(_.toString)
    val keptArr = keptIdx.toArray
    val windowed = skipFeatures > 0 || maxFeatures != Long.MaxValue
    val windows: Seq[(String, Long, Long)] =
      if (!windowed) fileList.map(f => (f, 0L, Long.MaxValue))
      else if (fileList.length == 1) Seq((fileList.head, skipFeatures, maxFeatures))
      else {
        val counts: String => Long =
          if (bbox.isEmpty) {
            // fixed-size .shx: count = (len - 100) / 8, from FileStatus
            // alone; files missing the sidecar fall back to a header hop
            val (withShx, needScan) = fileList.partition(f =>
              fs.exists(sidecar(new org.apache.hadoop.fs.Path(f), ".shx")))
            val quick = withShx.map(f => f -> Shapefile.recordCountFromShx(
              fs.getFileStatus(sidecar(new org.apache.hadoop.fs.Path(f), ".shx")).getLen)).toMap
            val scanned = lazyChunkedCounts(needScan, 16)(fs2 =>
              distributedCounts(spark, fs2)(f =>
                Shapefile.recordCount(readWholeFile(conf, f))))
            f => quick.getOrElse(f, scanned(f))
          } else
            // window applies post-filter → count the bbox survivors,
            // lazily in chunks (files past the window are never scanned)
            lazyChunkedCounts(fileList, 16)(fs2 =>
              distributedCounts(spark, fs2)(f =>
                Shapefile.readFeatures(readWholeFile(conf, f), None, bbox).size.toLong))
        featureWindows(fileList, skipFeatures, maxFeatures)(counts)
      }
    val doGeom = readGeometry
    val withFid = returnFids
    val toRow: ((Long, org.locationtech.jts.geom.Geometry, Array[Any])) => org.apache.spark.sql.Row = {
      case (fid, g, attrs) =>
        val lead: Seq[Any] = (if (withFid) Seq(fid) else Seq.empty) ++
          (if (!doGeom) Seq.empty
           else Seq(if (g == null) null else graft.serde.EWKB.write(g)))
        org.apache.spark.sql.Row.fromSeq(lead ++ keptArr.map(attrs(_)).toSeq)
    }
    val sidecarOf: (String, String) => org.apache.hadoop.fs.Path =
      (f, ext) => shpSidecar(new org.apache.hadoop.fs.Path(f), ext)
    // global-fid base per file (fids are global across a filename-ordered
    // directory read): .shx FileStatus when present, header-hop count
    // otherwise; only needed when fids must be returned or resolved
    lazy val fidBases: Map[String, Long] = {
      val counts = fileList.init.map { f =>
        val shxP = sidecarOf(f, ".shx")
        if (fs.exists(shxP))
          Shapefile.recordCountFromShx(fs.getFileStatus(shxP).getLen)
        else Shapefile.recordCount(readWholeFile(conf, f))
      }
      fileList.zip(counts.scanLeft(0L)(_ + _)).toMap
    }
    val rows = fids match {
      case Some(wanted) =>
        // random access: .shx lengths give per-file counts (driver-side,
        // FileStatus only); global fids map to (file, local index) and
        // each task O(1)-decodes just its features
        val counts: Seq[(String, Long)] = fileList.map { f =>
          val shxP = sidecarOf(f, ".shx")
          require(fs.exists(shxP), s"shapefile: fids read needs the .shx sidecar: $f")
          f -> Shapefile.recordCountFromShx(fs.getFileStatus(shxP).getLen)
        }
        val starts = counts.scanLeft(0L)(_ + _._2)
        val perFile: Seq[(String, Long, Seq[Long])] = counts.zip(starts).flatMap {
          case ((f, n), start) =>
            val local = wanted.filter(i => i >= start && i < start + n).map(_ - start)
            if (local.isEmpty) None else Some((f, start, local))
        }
        spark.sparkContext.parallelize(perFile, math.max(1, perFile.length))
          .flatMap { case (shpPath, start, local) =>
            val p = new org.apache.hadoop.fs.Path(shpPath)
            val pfs = p.getFileSystem(conf.value)
            val bytesOf =
              (path: org.apache.hadoop.fs.Path) => readWholeGuarded(pfs, path)
            val dbfPath = shpSidecar(p, ".dbf")
            val shxPath = shpSidecar(p, ".shx")
            val dbf = if (pfs.exists(dbfPath)) Some(bytesOf(dbfPath)) else None
            Shapefile.readFeaturesByFidsWithIds(bytesOf(p), bytesOf(shxPath), dbf,
              local, srid)
              .map { case (lfid, g, a) => toRow((start + lfid, g, a)) }
          }
      case None =>
        val bases: Map[String, Long] =
          if (returnFids) fidBases else fileList.map(_ -> 0L).toMap
        spark.sparkContext.parallelize(windows, math.max(1, windows.length))
          .flatMap { case (shpPath, wSkip, wTake) =>
            val p = new org.apache.hadoop.fs.Path(shpPath)
            val pfs = p.getFileSystem(conf.value)
            val bytesOf =
              (path: org.apache.hadoop.fs.Path) => readWholeGuarded(pfs, path)
            val dbfPath = shpSidecar(p, ".dbf")
            val dbf = if (pfs.exists(dbfPath)) Some(bytesOf(dbfPath)) else None
            val base = bases(shpPath)
            Shapefile.readFeaturesWithFids(bytesOf(p), dbf, bbox, srid, wSkip, wTake)
              .map { case (lfid, g, a) => toRow((base + lfid, g, a)) }
          }
    }
    applyReadOptions(spark.createDataFrame(rows, schema), geometryName,
      where, force2D)
  }

  /** The pyogrio options that are pure frame transforms: `where` becomes
    * a Catalyst filter, `force_2d` a `force2d` projection. They fuse into
    * the same whole-stage plan as any user-side `.filter`/`.select` —
    * which is why only IO-shaping options (bbox, columns, skip/max,
    * fids) live inside the codecs. */
  /** One-call reader mirroring the reference's `read_file`
    * (`/root/reference/polars_st/input.py:30-153`): dispatches on the
    * file extension to the format codecs, forwarding each option to the
    * format's native pushdown where one exists and falling back to the
    * equivalent Catalyst transform where the combination stays
    * order-correct (a post-read bbox filter cannot be combined with a
    * positional window, because pyogrio's order is filter-THEN-window —
    * such combos raise rather than silently reorder).
    *
    * `sql` runs a SPARK SQL statement over the read frame, registered as
    * a temp view named after the layer (or the file's basename) — the
    * reference forwards `sql` to OGR's SQL engine; here the engine is
    * Spark SQL, so `sqlDialect` accepts only "spark" (OGRSQL/SQLITE
    * grammars are not emulated — documented divergence). Filters and
    * projections inside the statement optimize like any Spark query
    * (scan pruning through the session's usual rules). */
  def readFile(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      layer: Option[String] = None,
      columns: Option[Seq[String]] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      readGeometry: Boolean = true,
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue,
      fids: Option[Seq[Long]] = None,
      where: Option[String] = None,
      force2D: Boolean = false,
      returnFids: Boolean = false,
      sql: Option[String] = None,
      sqlDialect: Option[String] = None): DataFrame = {
    require(sqlDialect.forall(_.equalsIgnoreCase("spark")),
      s"read_file: sql runs on Spark SQL; dialect ${sqlDialect.get} " +
        "(OGRSQL/SQLITE) is not emulated")
    require(sql.isDefined || sqlDialect.isEmpty, "read_file: sqlDialect without sql")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ext: String = {
      def extOf(n: String): String = {
        val i = n.lastIndexOf('.')
        // Locale.ROOT: a Turkish default locale maps 'I' → 'ı', so ".MIF"
        // would otherwise miss the dispatch table
        if (i < 0) "" else n.substring(i + 1).toLowerCase(java.util.Locale.ROOT)
      }
      val known = Set("shp", "gpkg", "fgb", "parquet", "geojson", "json",
        "ndjson", "ndgeojson", "jsonl", "csv", "kml", "gml", "gpx", "dxf", "mif")
      val direct = extOf(hp.getName)
      // an EXISTING directory lists its contents regardless of dots in
      // its own name (run.2024/ must dispatch on the contained .shp);
      // otherwise the name decides and the codec reports missing files
      val isDir = try fs.getFileStatus(hp).isDirectory
        catch { case _: java.io.FileNotFoundException => false }
      if (!isDir && direct.nonEmpty) direct
      else if (isDir) {
        // pick a RECOGNIZED data extension — a shapefile dir lists
        // .dbf/.prj/.shx sidecars that must not win the dispatch
        val inner = fs.listStatus(hp).iterator.map(_.getPath.getName).map(extOf)
          .filter(_.nonEmpty).toSeq
        inner.find(known.contains).orElse(inner.headOption).getOrElse(direct)
      } else direct
    }
    val windowed = skipFeatures > 0 || maxFeatures != Long.MaxValue
    def unsupported(what: String): Nothing =
      throw new IllegalArgumentException(s"read_file: $what is not supported for .$ext")
    def noFids(): Unit = { if (fids.isDefined) unsupported("fids"); if (returnFids) unsupported("return_fids") }
    // post-read fallbacks for formats without the native pushdown
    def genericBbox(df: DataFrame): DataFrame = bbox match {
      case None => df
      case Some((x0, y0, x1, y1)) =>
        require(!windowed, s"read_file: bbox+skip/max on .$ext would window " +
          "before filtering (pyogrio filters first) — filter yourself or drop the window")
        df.filter(graft.functions.st_intersects(
          graft.functions.st_envelope(col(geometryName)),
          graft.functions.st_rectangle(lit(x0), lit(y0), lit(x1), lit(y1))))
    }
    def genericColumns(df: DataFrame): DataFrame = columns match {
      case None => df
      case Some(want) =>
        // fid and geometry ride along: columns= selects ATTRIBUTES, it
        // must not silently drop what return_fids/read_geometry asked for
        // — nor duplicate them when the user lists them explicitly
        val lead = (if (returnFids && df.columns.contains("fid")) Seq("fid")
          else Seq.empty) ++
          (if (df.columns.contains(geometryName) && readGeometry)
            Seq(geometryName) else Seq.empty)
        val keep = lead ++ want.filterNot(lead.contains)
        df.select(keep.map(col): _*)
    }
    def genericNoGeom(df: DataFrame): DataFrame =
      if (readGeometry || !df.columns.contains(geometryName)) df
      else df.drop(geometryName)
    // OGR evaluates `where` against ALL fields BEFORE column selection —
    // filter first so a where over an unselected attribute still works
    def genericShape(df: DataFrame): DataFrame = {
      val filtered = where.map(df.filter).getOrElse(df)
      val pruned = genericNoGeom(genericColumns(filtered))
      if (force2D && pruned.columns.contains(geometryName))
        pruned.withColumn(geometryName,
          graft.functions.st_force_2d(col(geometryName)))
      else pruned
    }
    val base: DataFrame = ext match {
      case "shp" =>
        readShapefile(spark, path, geometryName, columns, bbox, readGeometry,
          skipFeatures, maxFeatures, fids, where, force2D, returnFids)
      case "gpkg" =>
        readGeoPackage(spark, path, layer, geometryName, columns, bbox,
          readGeometry, skipFeatures, maxFeatures, fids, where, force2D, returnFids)
      case "fgb" =>
        if (fids.isDefined) unsupported("fids")
        val df = readFlatGeobuf(spark, path, geometryName, skipFeatures,
          maxFeatures, bbox, returnFids)
        genericShape(df)
      case "parquet" =>
        noFids()
        if (windowed) unsupported("skip_features/max_features")
        val df = readGeoParquet(spark, path, geometryName, bbox)
        genericShape(df)
      case "geojson" | "json" =>
        noFids()
        val df = genericBbox(readGeoJson(spark, path, geometryName, skipFeatures, maxFeatures))
        genericShape(df)
      case "ndjson" | "ndgeojson" | "jsonl" =>
        noFids()
        if (windowed) unsupported("skip_features/max_features")
        val df = genericBbox(readNdGeoJson(spark, path, geometryName))
        genericShape(df)
      case "csv" =>
        noFids()
        if (windowed) unsupported("skip_features/max_features")
        val df = genericBbox(readWktCsv(spark, path, geometryName))
        genericShape(df)
      case "kml" =>
        noFids()
        val df = genericBbox(readKml(spark, path, geometryName, skipFeatures, maxFeatures))
        genericShape(df)
      case "gml" =>
        noFids()
        val df = genericBbox(readGml(spark, path, geometryName, skipFeatures, maxFeatures))
        genericShape(df)
      case "gpx" =>
        noFids()
        val df = genericBbox(readGpx(spark, path, layer.getOrElse("waypoints"),
          geometryName, skipFeatures, maxFeatures))
        genericShape(df)
      case "dxf" =>
        noFids()
        val df = genericBbox(readDxf(spark, path, geometryName, skipFeatures, maxFeatures))
        genericShape(df)
      case "mif" =>
        noFids()
        val df = genericBbox(readMif(spark, path, geometryName, skipFeatures, maxFeatures))
        genericShape(df)
      case other =>
        throw new IllegalArgumentException(
          s"read_file: unrecognized extension .$other (supported: shp, gpkg, fgb, " +
            "parquet, geojson/json, ndjson, csv, kml, gml, gpx, dxf, mif)")
    }
    sql match {
      case None => base
      case Some(stmt) =>
        // view named like OGR's layer: the explicit layer, else basename.
        // A pre-existing temp view with that name belongs to the USER —
        // replacing and then dropping it would silently destroy it, so
        // collide loudly instead.
        val baseName = hp.getName
        val dotted = baseName.lastIndexOf('.')
        val stem = if (dotted > 0) baseName.substring(0, dotted) else baseName
        val view = layer.getOrElse(stem).replaceAll("[^A-Za-z0-9_]", "_")
        require(!spark.catalog.tableExists(view),
          s"read_file: sql would register temp view '$view' but a table/view " +
            "with that name already exists in the session — drop/rename it, " +
            "or pass layer= to pick a different view name")
        base.createOrReplaceTempView(view)
        try spark.sql(stmt) // analyzed now — the plan owns the resolved subtree
        finally spark.catalog.dropTempView(view)
    }
  }

  private def applyReadOptions(df: DataFrame, geometryName: String,
      where: Option[String], force2D: Boolean): DataFrame = {
    val filtered = where.map(df.filter).getOrElse(df)
    if (force2D && filtered.columns.contains(geometryName))
      filtered.withColumn(geometryName,
        graft.functions.st_force_2d(col(geometryName)))
    else filtered
  }

  /** Write one shapefile set (`base.shp`/`.shx`/`.dbf`, plus `.prj` when
    * the SRID resolves in the EPSG db), streaming rows through the driver.
    * The record body is buffered in memory to back-patch the header — safe
    * because the format itself caps files at 2 GB; shapefile is an
    * EXPORT/interchange sink (the cluster-scale sink is GeoParquet).
    * Mixed shape classes and mixed SRIDs are rejected like the reference's
    * `write_file` (`geodataframe.py:462-471`). `path` is the `.shp` path;
    * sidecars are derived. */
  def writeShapefile(df: DataFrame, path: String,
      geometryName: String = "geometry"): Unit = {
    require(path.toLowerCase.endsWith(".shp"), s"shapefile path must end in .shp: $path")
    val attrFields = df.schema.fields.toSeq.filterNot(_.name == geometryName)
    val dbfFields = attrFields.map(dbfFieldFor)
    val ordered = df.select((col(geometryName) +: attrFields.map(f => col(f.name))): _*)
    val writer = new Shapefile.Writer(dbfFields)
    var srid = Int.MinValue
    val it = ordered.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
      val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
      if (geom != null) {
        if (srid == Int.MinValue) srid = geom.getSRID
        else if (geom.getSRID != srid) throw new IllegalArgumentException(
          s"shapefile: mixed SRIDs are not supported ($srid vs ${geom.getSRID})")
      }
      writer.write(geom, Array.tabulate(attrFields.length)(i => row.get(i + 1)))
    }
    val bytes = writer.result()
    val base = path.replaceAll("(?i)\\.shp$", "")
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    def put(ext: String, data: Array[Byte]): Unit = {
      val p = new org.apache.hadoop.fs.Path(base + ext)
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write(data) finally out.close()
    }
    put(".shp", bytes.shp); put(".shx", bytes.shx); put(".dbf", bytes.dbf)
    if (srid != Int.MinValue && srid != 0)
      graft.functions.CrsImpl.crsFromCode(srid).foreach(wkt =>
        put(".prj", wkt.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  // ------------------------------------------------------------- FlatGeobuf

  private[graft] def fgbTypeFor(dt: DataType): Int = dt match {
    case BooleanType => FlatGeobuf.CtBool
    case ByteType => FlatGeobuf.CtByte
    case ShortType => FlatGeobuf.CtShort
    case IntegerType => FlatGeobuf.CtInt
    case LongType => FlatGeobuf.CtLong
    case FloatType => FlatGeobuf.CtFloat
    case DoubleType => FlatGeobuf.CtDouble
    case StringType => FlatGeobuf.CtString
    case BinaryType => FlatGeobuf.CtBinary
    case other => throw new IllegalArgumentException(
      s"flatgeobuf: unsupported property column type $other (cast to a " +
        "scalar/string/binary type first)")
  }

  private[graft] def sparkTypeFor(ct: Int): DataType = ct match {
    case FlatGeobuf.CtBool => BooleanType
    case FlatGeobuf.CtByte => ByteType
    case FlatGeobuf.CtUByte | FlatGeobuf.CtShort => ShortType
    case FlatGeobuf.CtUShort | FlatGeobuf.CtInt => IntegerType
    case FlatGeobuf.CtUInt | FlatGeobuf.CtLong | FlatGeobuf.CtULong => LongType
    case FlatGeobuf.CtFloat => FloatType
    case FlatGeobuf.CtDouble => DoubleType
    case FlatGeobuf.CtString | FlatGeobuf.CtJson | FlatGeobuf.CtDateTime => StringType
    case FlatGeobuf.CtBinary => BinaryType
    case other => throw new IllegalArgumentException(s"flatgeobuf: column type $other")
  }

  /** Read FlatGeobuf file(s) → geo frame (EWKB geometry column + property
    * columns typed from the FGB header). `path` may be a single .fgb or a
    * directory/glob of them; parallelism is per file (one FGB stream is not
    * splittable without consulting its spatial index — the multi-file layout
    * written by [[writeFlatGeobufPartitioned]] is the cluster-scale path). */
  /** @param bbox spatial filter (envelope-intersects, like the other
    *   readers): files carrying the packed Hilbert R-tree answer it by
    *   index search + random-access decode of just the hits; unindexed
    *   files fall back to a sequential decode with an envelope test. A
    *   skip/max window composes AFTER the filter (pyogrio order). */
  def readFlatGeobuf(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue,
      bbox: Option[(Double, Double, Double, Double)] = None,
      returnFids: Boolean = false): DataFrame = {
    // schema comes from the first file's header (all parts share one schema)
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(hadoopPath).isDirectory) {
        val l = fs.listStatus(hadoopPath).map(_.getPath).toSeq
          .filter(_.getName.endsWith(".fgb")).sortBy(_.getName)
        require(l.nonEmpty, s"no .fgb files in $path")
        l
      } else Seq(hadoopPath)
    val in = fs.open(files.head)
    val header = try FlatGeobuf.readHeaderFrom(in) finally in.close()
    require(!returnFids || !header.columns.exists(_.name == "fid"),
      "flatgeobuf: return_fids would collide with a column named 'fid'")
    val schema = StructType(
      (if (returnFids) Seq(StructField("fid", LongType, nullable = false))
       else Seq.empty) ++
        (StructField(geometryName, BinaryType, nullable = true) +:
          header.columns.map(c => StructField(c.name, sparkTypeFor(c.colType)))))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fileList = files.map(_.toString)
    val bbx = bbox
    // features of one file surviving the bbox (index-driven when the
    // file has one), skip already applied scan-level when there is no
    // bbox to respect the filter-before-window order. Each feature rides
    // with its IN-FILE ordinal (the OGR fid): sequential position for
    // scans, the R-tree leaf index for indexed bbox reads.
    val matched: (String, Long) => Iterator[(Long, FlatGeobuf.Feature)] = (f, preSkip) => {
      val bytes = readWholeFile(conf, f)
      bbx match {
        case None => FlatGeobuf.read(bytes, preSkip)._2.zipWithIndex
          .map { case (ft, i) => (preSkip + i, ft) }
        case Some((x0, y0, x1, y1)) =>
          FlatGeobuf.searchHits(bytes, x0, y0, x1, y1) match {
            case Some(hits) => hits.iterator.map(_._1)
              .zip(FlatGeobuf.readFeaturesAt(bytes, hits.map(_._2)))
            case None => FlatGeobuf.read(bytes)._2.zipWithIndex.collect {
              case (ft, i) if ft.geometry != null && !ft.geometry.isEmpty && {
                  val e = ft.geometry.getEnvelopeInternal
                  !(e.getMinX > x1 || e.getMaxX < x0 || e.getMinY > y1 || e.getMaxY < y0)
                } => (i.toLong, ft)
            }
          }
      }
    }
    val windowed = skipFeatures > 0 || maxFeatures != Long.MaxValue
    val windows: Seq[(String, Long, Long)] =
      if (!windowed) fileList.map(f => (f, 0L, Long.MaxValue))
      else if (fileList.length == 1) Seq((fileList.head, skipFeatures, maxFeatures))
      else if (bbx.isDefined) {
        // post-filter window → per-file MATCH counts, lazily in chunks;
        // indexed files count through the R-tree without decoding
        val matchCount: String => Long = f => {
          val bytes = readWholeFile(conf, f)
          val (x0, y0, x1, y1) = bbx.get
          FlatGeobuf.searchOffsets(bytes, x0, y0, x1, y1) match {
            case Some(offsets) => offsets.size.toLong
            case None => FlatGeobuf.read(bytes)._2.count { ft =>
              ft.geometry != null && !ft.geometry.isEmpty && {
                val e = ft.geometry.getEnvelopeInternal
                !(e.getMinX > x1 || e.getMaxX < x0 || e.getMinY > y1 || e.getMaxY < y0)
              }
            }.toLong
          }
        }
        featureWindows(fileList, skipFeatures, maxFeatures)(
          lazyChunkedCounts(fileList, 16)(fs2 =>
            distributedCounts(spark, fs2)(matchCount)))
      } else {
        // header featuresCount when the writer recorded it (header-only
        // read per file); else lazily chunked size-prefix hop passes
        val fromHeaders: Map[String, Long] = fileList.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val hin = fs.open(p)
          val h = try FlatGeobuf.readHeaderFrom(hin) finally hin.close()
          f -> h.featuresCount
        }.toMap
        val needScan = fileList.filter(fromHeaders(_) == 0L)
        val scanned = lazyChunkedCounts(needScan, 16)(fs2 =>
          distributedCounts(spark, fs2)(f =>
            FlatGeobuf.recordCount(readWholeFile(conf, f))))
        featureWindows(fileList, skipFeatures, maxFeatures)(f => {
          val h = fromHeaders(f)
          if (h != 0L) h else scanned(f)
        })
      }
    // global-fid base per file (directory reads number features across
    // filename order): header featuresCount when recorded, size-prefix
    // hop count otherwise; computed only when fids are requested
    val fidBases: Map[String, Long] =
      if (!returnFids || fileList.length == 1) fileList.map(_ -> 0L).toMap
      else {
        val counts = fileList.init.map { f =>
          val hin = fs.open(new org.apache.hadoop.fs.Path(f))
          val h = try FlatGeobuf.readHeaderFrom(hin) finally hin.close()
          if (h.featuresCount != 0L) h.featuresCount
          else FlatGeobuf.recordCount(readWholeFile(conf, f))
        }
        fileList.zip(counts.scanLeft(0L)(_ + _)).toMap
      }
    val withFid = returnFids
    val rows = spark.sparkContext.parallelize(windows, math.max(1, windows.length))
      .flatMap { case (f, wSkip, wTake) =>
        // without a bbox the skip is scan-level (size prefixes hopped, no
        // flatbuffer decode); with one, the window slices the match set
        val preSkip = if (bbx.isEmpty) wSkip else 0L
        val postSkip = if (bbx.isEmpty) 0L else wSkip
        val base = fidBases(f)
        sliceIterator(matched(f, preSkip), postSkip, wTake).map { case (lfid, ft) =>
          val geo = if (ft.geometry == null) null else graft.serde.EWKB.write(ft.geometry)
          val lead: Seq[Any] = if (withFid) Seq(base + lfid) else Seq.empty
          org.apache.spark.sql.Row.fromSeq(lead ++ (geo +: ft.properties.toSeq))
        }
      }
    spark.createDataFrame(rows, schema)
  }

  private[graft] def fgbColumns(df: DataFrame, geometryName: String): Seq[FlatGeobuf.Col] =
    df.schema.fields.toSeq.filterNot(_.name == geometryName)
      .map(f => FlatGeobuf.Col(f.name, fgbTypeFor(f.dataType)))

  /** Write a single .fgb file, streaming rows through the driver (bounded
    * memory via `toLocalIterator`; the single-file format is inherently a
    * one-writer sink — use [[writeFlatGeobufPartitioned]] at scale). The
    * header SRID is taken from the first geometry; FGB carries one CRS per
    * file, so mixed-SRID frames are rejected like the reference's
    * `write_file` (`geodataframe.py:462-471`). */
  /** @param spatialIndex write the spec's packed Hilbert R-tree: features
    *   are Hilbert-REORDERED and buffered in memory for the two-pass
    *   layout, and [[readFlatGeobuf]] bbox reads (and any external FGB
    *   client) seek straight to matching features. Default off — the
    *   streaming writer preserves frame order, which the positional
    *   options (skip/max) read back deterministically. */
  def writeFlatGeobuf(df: DataFrame, path: String,
      geometryName: String = "geometry",
      spatialIndex: Boolean = false): Unit = {
    val cols = fgbColumns(df, geometryName)
    val ordered = df.select((col(geometryName) +: cols.map(c => col(c.name))): _*)
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(hadoopPath, true)
    if (spatialIndex) {
      // shared indexed sink protocol (encode-as-they-arrive, SRID from
      // the first real geometry, mixed SRIDs raise): IndexedStreamWriter
      val iw = new FlatGeobuf.IndexedStreamWriter(out, cols)
      var ok = false
      try {
        ordered.toLocalIterator().asScala.foreach { row =>
          val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
          val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
          iw.write(geom, Array.tabulate[Any](cols.length)(i => row.get(i + 1)))
        }
        ok = true
      } finally {
        if (ok) iw.close() else iw.abortClose()
      }
      return
    }
    // shared streaming sink protocol (leading-null buffering, header SRID
    // from the first real geometry, mixed SRIDs raise): FlatGeobuf.StreamWriter
    val writer = new FlatGeobuf.StreamWriter(out, cols)
    val it = ordered.toLocalIterator()
    var ok = false
    try {
      while (it.hasNext) {
        val row = it.next()
        val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
        val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
        writer.write(geom, Array.tabulate[Any](cols.length)(i => row.get(i + 1)))
      }
      ok = true
    } finally {
      if (ok) writer.close() else writer.abortClose()
    }
  }

  /** Scale-path FlatGeobuf sink: one part-NNNNN.fgb per partition, written
    * executor-side in parallel (no driver funnel); [[readFlatGeobuf]] reads
    * the directory back with per-file parallelism. */
  /** @param spatialIndex give EACH part its own packed Hilbert R-tree
    *   (buffering is per partition, executor-side): a bbox read then
    *   index-searches every part in parallel — the directory behaves as
    *   a sharded spatial index. */
  def writeFlatGeobufPartitioned(df: DataFrame, path: String,
      geometryName: String = "geometry",
      spatialIndex: Boolean = false): Unit = {
    val cols = fgbColumns(df, geometryName)
    val ordered = df.select((col(geometryName) +: cols.map(c => col(c.name))): _*)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    val doIndex = spatialIndex
    ordered.rdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val part = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.fgb")
      val pfs = part.getFileSystem(conf.value)
      val out = pfs.create(part, true)
      if (doIndex) {
        val iw = new FlatGeobuf.IndexedStreamWriter(out, cols)
        var ok = false
        try {
          rows.foreach { row =>
            val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
            val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
            iw.write(geom, Array.tabulate[Any](cols.length)(i => row.get(i + 1)))
          }
          ok = true
        } finally {
          if (ok) iw.close() else iw.abortClose()
        }
      } else {
        // shared streaming sink protocol — see FlatGeobuf.StreamWriter
        // (leading-null buffering; mixed SRIDs now raise here too,
        // matching the indexed branch, the single-file writer and the
        // DSv2 DataWriter)
        val writer = new FlatGeobuf.StreamWriter(out, cols)
        var ok = false
        try {
          rows.foreach { row =>
            val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
            val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
            writer.write(geom, Array.tabulate[Any](cols.length)(i => row.get(i + 1)))
          }
          ok = true
        } finally {
          if (ok) writer.close() else writer.abortClose()
        }
      }
    }
  }

  // ------------------------------------------------------------ GeoPackage

  private[graft] def gpkgSparkType(c: GeoPackage.GpkgColumn): DataType = {
    val t = c.sqlType
    if (t.contains("INT")) LongType
    else if (t == "REAL" || t == "FLOAT" || t.contains("DOUBLE")) DoubleType
    else if (t.contains("BOOL")) BooleanType
    else if (t.isEmpty || t.contains("BLOB")) BinaryType
    else StringType // TEXT/CHAR/CLOB/DATE/DATETIME — gpkg stores these as text
  }

  /** Read a GeoPackage feature layer → geo frame (EWKB geometry + attribute
    * columns typed from the declared table schema), via the pure-JVM
    * [[Sqlite]] codec — the `.gpkg` leg of the reference's `read_file`
    * (`/root/reference/polars_st/input.py:30-153`).
    *
    * Scale shape: the driver reads only the schema + b-tree INTERIOR pages
    * to plan, then distributes the table's leaf-page list; each task opens
    * the file and reads just its pages (plus any overflow chains) — a
    * single `.gpkg` splits like a columnar file, no whole-file funnel.
    *
    * @param layer feature table to read; default = first layer in
    *   `gpkg_geometry_columns` (like the reference's single-layer default).
    * @param columns attribute subset (geometry always kept);
    * @param bbox    (xmin, ymin, xmax, ymax) — rows whose STORED blob
    *   envelope misses it are skipped before WKB parsing. */
  /** Stored-envelope bbox test on a gpkg geometry blob — header-only, no
    * WKB parse. A bbox read is a spatial predicate, so NULL geometries
    * (and null blobs) prune too; a blob without a stored envelope cannot
    * be pruned. */
  private[graft] def gpkgBboxPruned(blob: Array[Byte],
      xmin: Double, ymin: Double, xmax: Double, ymax: Double): Boolean =
    blob == null || {
      val flags = blob(3) & 0xff
      val envInd = (flags >> 1) & 0x07
      if (envInd == 0) false
      else {
        val little = (flags & 1) == 1
        def d(i: Int): Double = java.lang.Double.longBitsToDouble {
          var v = 0L
          var j = 0
          while (j < 8) {
            val idx = 8 + 8 * i + (if (little) 7 - j else j)
            v = (v << 8) | (blob(idx) & 0xffL); j += 1
          }
          v
        }
        d(0) > xmax || d(1) < xmin || d(2) > ymax || d(3) < ymin
      }
    }

  /** @param fids gpkg FIDs (= sqlite rowids) to read: each becomes an
    *   O(log n) b-tree point lookup — interior-page descent, no scan of
    *   the rest of the table. Mutually exclusive with
    *   bbox/skip_features/max_features (pyogrio rule); fids+where is
    *   deliberately allowed here (post-read Catalyst filter — see
    *   [[readShapefile]]'s fids doc for the divergence rationale).
    * @param where / @param force2D pure frame transforms (Catalyst
    *   filter / `force2d` projection), see [[readShapefile]]. */
  def readGeoPackage(spark: SparkSession, path: String,
      layer: Option[String] = None,
      geometryName: String = "geometry",
      columns: Option[Seq[String]] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      readGeometry: Boolean = true,
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue,
      fids: Option[Seq[Long]] = None,
      where: Option[String] = None,
      force2D: Boolean = false,
      returnFids: Boolean = false): DataFrame = {
    require(fids.isEmpty ||
      (bbox.isEmpty && skipFeatures == 0 && maxFeatures == Long.MaxValue),
      "gpkg: fids cannot be combined with bbox/skip_features/max_features")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    def open(): (Sqlite.SqliteDb, org.apache.hadoop.fs.FSDataInputStream) = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf.value)
      val in = fs.open(p)
      (new Sqlite.SqliteDb(
        new Sqlite.HadoopAccess(in, fs.getFileStatus(p).getLen)), in)
    }
    val (db, in) = open()
    val (lay, rootPage, leafList) =
      try {
        val all = GeoPackage.layers(db)
        require(all.nonEmpty, s"gpkg: no feature layers in $path")
        val lay = layer match {
          case None => all.head
          case Some(want) => all.find(_.table == want).getOrElse(
            throw new IllegalArgumentException(
              s"gpkg: no such layer $want (have ${all.map(_.table).mkString(", ")})"))
        }
        // non-EPSG srs_id (ESRI-authored packages): register the stored
        // definition WKT so st_to_srid works on the read frame
        if (lay.srid > 0 && !graft.functions.EpsgDb.isSupported(lay.srid))
          GeoPackage.srsDefinition(db, lay.srid).foreach { wkt =>
            try graft.functions.CrsRegistry.register(lay.srid, wkt)
            catch { case scala.util.control.NonFatal(_) => () }
          }
        val root = db.master.find(m => m.typ == "table" && m.name == lay.table).get.rootPage
        // fids reads never scan: skip leaf enumeration entirely
        (lay, root, if (fids.isDefined) Seq.empty[Int] else db.leafPages(root))
      } finally in.close()
    val geomOrd = lay.columns.indexWhere(_.name.equalsIgnoreCase(lay.geometryColumn))
    require(geomOrd >= 0, s"gpkg: geometry column ${lay.geometryColumn} not in schema")
    val attrs = lay.columns.zipWithIndex.filter(_._2 != geomOrd)
    val kept: Seq[(GeoPackage.GpkgColumn, Int)] = columns match {
      case None => attrs
      case Some(want) =>
        val wantSet = want.toSet
        val sel = attrs.filter { case (c, _) => wantSet.contains(c.name) }
        val missing = wantSet -- sel.map(_._1.name)
        require(missing.isEmpty,
          s"gpkg: no such attribute column(s): ${missing.mkString(", ")}")
        sel
    }
    require(!returnFids || !kept.exists(_._1.name == "fid"),
      "gpkg: return_fids would collide with the layer's own 'fid' column " +
        "(for a rowid-IPK layer that column already carries the fid — read " +
        "it directly, or exclude it via columns=)")
    val schema = StructType(
      (if (returnFids) Seq(StructField("fid", LongType, nullable = false))
       else Seq.empty) ++
        (if (readGeometry) Seq(StructField(geometryName, BinaryType, nullable = true))
         else Seq.empty) ++
        kept.map { case (c, _) => StructField(c.name, gpkgSparkType(c), nullable = true) })
    val keptArr = kept.toArray
    val layerSrid = lay.srid
    val doGeom = readGeometry
    val bbx = bbox
    // a function val, not a local def: defs lift to methods on the
    // (non-serializable) GeoIO module and poison task closures
    val openTask: () => (Sqlite.SqliteDb, org.apache.hadoop.fs.FSDataInputStream) = () => {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf.value)
      val fin = fs.open(p)
      (new Sqlite.SqliteDb(
        new Sqlite.HadoopAccess(fin, fs.getFileStatus(p).getLen)), fin)
    }
    // skip_features/max_features: per-LEAF (skip, take) windows in rowid
    // order. Counts come from leaf page headers alone when there is no
    // bbox (no cell decode); under a bbox the window applies post-filter
    // (pyogrio semantics), so counting pays the stored-envelope tests.
    // Leaves wholly outside the window are pruned — never read again.
    val windowed = skipFeatures > 0 || maxFeatures != Long.MaxValue
    val leafWindows: Seq[(Int, Long, Long)] =
      if (!windowed) leafList.map(pg => (pg, 0L, Long.MaxValue))
      else {
        // lazily chunked: leaves past the window's end are never read
        val countMany: Seq[Int] => Map[Int, Long] = leaves0 => {
          val cgroups = leaves0.grouped(64).toSeq
          spark.sparkContext
            .parallelize(cgroups, math.max(1, cgroups.length))
            .flatMap { leaves =>
              val (fdb, fin) = openTask()
              try leaves.map(pg => pg -> (bbx match {
                case None => fdb.leafCellCount(pg).toLong
                case Some((x0, y0, x1, y1)) => fdb.leafRows(pg).count { case (_, rec) =>
                  !gpkgBboxPruned(rec(geomOrd).asInstanceOf[Array[Byte]], x0, y0, x1, y1)
                }.toLong
              }))
              finally fin.close()
            }.collect().toMap
        }
        featureWindows(leafList, skipFeatures, maxFeatures)(
          lazyChunkedCounts(leafList, 256)(countMany))
      }
    val withFid = returnFids
    val buildRow: ((Long, Array[Any])) => org.apache.spark.sql.Row = {
      case (rowid, rec) =>
        val blob = rec(geomOrd).asInstanceOf[Array[Byte]]
        val fidLead: Seq[Any] = if (withFid) Seq(rowid) else Seq.empty
        val geo: Seq[Any] =
          if (!doGeom) Seq.empty
          else if (blob == null) Seq(null)
          else {
            val (g, _) = GeoPackage.readGeometryBlob(blob)
            if (g.getSRID == 0 && layerSrid != 0) g.setSRID(layerSrid)
            Seq(graft.serde.EWKB.write(g))
          }
        val vals = keptArr.map { case (c, ord) =>
          (rec(ord), gpkgSparkType(c)) match {
            case (null, _) =>
              if (c.ipk) rowid else null // IPK stored as NULL = rowid
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
        }.toSeq
        org.apache.spark.sql.Row.fromSeq(fidLead ++ geo ++ vals)
    }
    val rows = fids match {
      case Some(wanted) =>
        // point lookups: each fid descends the rowid b-tree from the
        // root — O(log n) page reads per feature, no leaf enumeration
        val fidGroups = wanted.grouped(256).toSeq
        spark.sparkContext
          .parallelize(fidGroups, math.max(1, fidGroups.length))
          .flatMap { group =>
            val (fdb, fin) = openTask()
            val decoded =
              try group.flatMap(rid => fdb.lookupRow(rootPage, rid))
              finally fin.close()
            decoded.map(buildRow)
          }
      case None =>
        // one task per leaf-page group; 64 leaves/task ≈ a few MB of pages
        val groups = leafWindows.grouped(64).toSeq
        spark.sparkContext
          .parallelize(groups, math.max(1, groups.length))
          .flatMap { leaves =>
            val (fdb, fin) = openTask()
            // decode this task's leaves eagerly (≤64 pages, a few MB) so
            // the file handle closes before the iterator is consumed
            // downstream; bbox prune on the stored envelope, before any
            // WKB parse
            val decoded =
              try leaves.flatMap { case (pg, lskip, ltake) =>
                val windowedRows = bbx match {
                  case None =>
                    // scan-level skip: the cell pointer array jumps lskip cells
                    sliceIterator(fdb.leafRows(pg, lskip.toInt), 0L, ltake)
                  case Some((x0, y0, x1, y1)) =>
                    sliceIterator(fdb.leafRows(pg).filterNot { case (_, rec) =>
                      gpkgBboxPruned(rec(geomOrd).asInstanceOf[Array[Byte]], x0, y0, x1, y1)
                    }, lskip, ltake)
                }
                windowedRows.toVector
              }
              finally fin.close()
            decoded.iterator.map(buildRow)
          }
    }
    applyReadOptions(spark.createDataFrame(rows, schema), geometryName,
      where, force2D)
  }

  private def gpkgSqlTypeFor(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType | LongType => "INTEGER"
    case FloatType | DoubleType => "REAL"
    case BooleanType => "BOOLEAN"
    case StringType => "TEXT"
    case BinaryType => "BLOB"
    case other => throw new IllegalArgumentException(
      s"geopackage: unsupported attribute column type $other (cast to a " +
        "scalar/string/binary type first)")
  }

  /** Write one GeoPackage (single layer), streaming rows through the
    * driver — like [[writeShapefile]]/[[writeFlatGeobuf]], a single-file
    * EXPORT/interchange sink (the cluster-scale sink is GeoParquet). Emits
    * the required `gpkg_spatial_ref_sys` / `gpkg_contents` /
    * `gpkg_geometry_columns` tables plus the feature table with an `fid`
    * INTEGER PRIMARY KEY, readable by GDAL/QGIS/DuckDB-spatial. Mixed
    * SRIDs are rejected like the reference's `write_file`
    * (`geodataframe.py:462-471`). */
  def writeGeoPackage(df: DataFrame, path: String, tableName: String = "layer",
      geometryName: String = "geometry"): Unit = {
    val attrFields = df.schema.fields.toSeq.filterNot(_.name == geometryName)
    require(df.schema.fieldNames.contains(geometryName),
      s"geopackage: no geometry column $geometryName")
    val ordered = df.select((col(geometryName) +: attrFields.map(f => col(f.name))): _*)
    val rows = ArrayBuffer.empty[(Long, Seq[Any])]
    var srid = Int.MinValue
    var geomTypes = Set.empty[String]
    var (minX, minY, maxX, maxY) =
      (Double.MaxValue, Double.MaxValue, Double.MinValue, Double.MinValue)
    var fid = 0L
    val it = ordered.toLocalIterator()
    while (it.hasNext) {
      val row = it.next()
      fid += 1
      val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
      val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
      val blob = if (geom == null) null else {
        if (srid == Int.MinValue) srid = geom.getSRID
        else if (geom.getSRID != srid) throw new IllegalArgumentException(
          s"geopackage: mixed SRIDs are not supported ($srid vs ${geom.getSRID})")
        geomTypes += geom.getGeometryType.toUpperCase
        if (!geom.isEmpty) {
          val e = geom.getEnvelopeInternal
          minX = math.min(minX, e.getMinX); minY = math.min(minY, e.getMinY)
          maxX = math.max(maxX, e.getMaxX); maxY = math.max(maxY, e.getMaxY)
        }
        GeoPackage.writeGeometryBlob(geom, math.max(geom.getSRID, 0))
      }
      val attrs = attrFields.zipWithIndex.map { case (f, i) =>
        (row.get(i + 1), f.dataType) match {
          case (null, _) => null
          case (v: Byte, _) => v.toLong
          case (v: Short, _) => v.toLong
          case (v: Int, _) => v.toLong
          case (v: Long, _) => v
          case (v: Float, _) => v.toDouble
          case (v: Double, _) => v
          case (v: Boolean, _) => if (v) 1L else 0L
          case (v: String, _) => v
          case (v: Array[Byte], _) => v
          case (v, t) => throw new IllegalArgumentException(
            s"geopackage: column ${f.name}: unsupported value type $t")
        }
      }
      rows += ((fid, (null +: blob +: attrs))) // null = fid (IPK → rowid)
    }
    val theSrid = if (srid == Int.MinValue || srid < 0) 0 else srid
    val geomTypeName =
      if (geomTypes.size == 1) geomTypes.head else "GEOMETRY"
    val hasBounds = minX != Double.MaxValue
    def q(s: String) = "\"" + s.replace("\"", "\"\"") + "\""
    val w = new Sqlite.SqliteWriter()
    // gpkg_spatial_ref_sys: the two mandatory rows + the layer's CRS
    val srsSql = """CREATE TABLE gpkg_spatial_ref_sys (srs_name TEXT NOT NULL, srs_id INTEGER NOT NULL PRIMARY KEY, organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL, definition TEXT NOT NULL, description TEXT)"""
    val mandatory = Seq(
      (-1L, Seq[Any]("Undefined Cartesian SRS", null, "NONE", -1L, "undefined", null)),
      (0L, Seq[Any]("Undefined geographic SRS", null, "NONE", 0L, "undefined", null)))
    val layerSrs =
      if (theSrid == 0) Seq.empty
      else Seq((theSrid.toLong, Seq[Any](s"EPSG:$theSrid", null, "EPSG",
        theSrid.toLong,
        graft.functions.CrsImpl.crsFromCode(theSrid).getOrElse("undefined"), null)))
    // rowid must be positive: remap -1/0 to rowids 1/2 via IPK=srs_id?
    // srs_id IS the IPK — rowids -1/0 are legal in SQLite (any int64),
    // but our writer sorts by rowid, which keeps them ordered fine.
    w.addTable("gpkg_spatial_ref_sys", srsSql,
      (mandatory ++ layerSrs).map { case (id, vals) =>
        (id, vals.updated(1, null)) }, ipkOrdinal = 1)
    val contentsSql = """CREATE TABLE gpkg_contents (table_name TEXT NOT NULL PRIMARY KEY, data_type TEXT NOT NULL, identifier TEXT UNIQUE, description TEXT DEFAULT '', last_change DATETIME NOT NULL DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')), min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)"""
    // table_name PRIMARY KEY → autoindex 1; identifier UNIQUE → autoindex 2
    w.addTable("gpkg_contents", contentsSql, Seq((1L, Seq[Any](
      tableName, "features", tableName, "",
      "2000-01-01T00:00:00.000Z",
      if (hasBounds) minX else null, if (hasBounds) minY else null,
      if (hasBounds) maxX else null, if (hasBounds) maxY else null,
      theSrid.toLong))), autoIndexKeys = Seq(Seq(0), Seq(2)))
    val geomColsSql = """CREATE TABLE gpkg_geometry_columns (table_name TEXT NOT NULL, column_name TEXT NOT NULL, geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL, z TINYINT NOT NULL, m TINYINT NOT NULL, CONSTRAINT pk_geom_cols PRIMARY KEY (table_name, column_name))"""
    // composite PRIMARY KEY (table_name, column_name) → autoindex 1
    w.addTable("gpkg_geometry_columns", geomColsSql, Seq((1L, Seq[Any](
      tableName, geometryName, geomTypeName, theSrid.toLong, 0L, 0L))),
      autoIndexKeys = Seq(Seq(0, 1)))
    val featureSql = s"CREATE TABLE ${q(tableName)} (fid INTEGER PRIMARY KEY AUTOINCREMENT, " +
      s"${q(geometryName)} ${if (geomTypeName == "GEOMETRY") "GEOMETRY" else geomTypeName}" +
      attrFields.map(f => s", ${q(f.name)} ${gpkgSqlTypeFor(f.dataType)}").mkString + ")"
    w.addTable(tableName, featureSql, rows.toSeq, ipkOrdinal = 0)
    val bytes = w.build(applicationId = 0x47504B47L, userVersion = 10300L)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  // --------------------------------------------------------------- KML / GPX

  /** List `path` (a file, or a directory of files with `ext`) and return
    * (paths, bytes-of-first) — the shared discovery step for the
    * whole-file XML formats. Parallelism is per file; neither format is
    * splittable. */
  private def xmlFileList(spark: SparkSession, path: String, ext: String)
      : (Seq[String], Array[Byte]) = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files: Seq[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(hadoopPath).isDirectory)
        fs.listStatus(hadoopPath).map(_.getPath).toSeq
          .filter(_.getName.toLowerCase.endsWith(ext)).sortBy(_.getName)
      else Seq(hadoopPath)
    require(files.nonEmpty, s"no $ext files in $path")
    val first = readWholeGuarded(fs, files.head)
    (files.map(_.toString), first)
  }

  /** Whole-file read into one array — the shared primitive under every
    * single-file codec (and the DSv2 sources). A file at or beyond 2 GiB
    * cannot be addressed by a JVM array: an unguarded `.toInt` throws
    * NegativeArraySizeException at 2–4 GiB and silently WRAPS beyond
    * 4 GiB (size-prefixed record loops would quietly yield fewer
    * features), so the length is checked before allocation. */
  private[graft] def readWholeGuarded(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Array[Byte] = {
    val len = fs.getFileStatus(p).getLen
    require(len <= Int.MaxValue - 8,
      s"$p is $len bytes — a single file must stay below 2 GiB to be " +
        "decoded in memory; repartition the write into more, smaller " +
        "part files")
    val in = fs.open(p)
    try { val buf = new Array[Byte](len.toInt); in.readFully(0, buf); buf }
    finally in.close()
  }

  private def readWholeFile(conf: org.apache.spark.util.SerializableConfiguration,
      path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    readWholeGuarded(p.getFileSystem(conf.value), p)
  }

  private[graft] def shpSidecar(shp: org.apache.hadoop.fs.Path,
      ext: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(shp.getParent,
      shp.getName.replaceAll("(?i)\\.shp$", "") + ext)

  /** Header-only .dbf field list (the 32-byte prologue carries the header
    * length; field descriptors live entirely inside the header) —
    * plan-time sidecar validation must not pay whole-file reads. */
  private[graft] def dbfHeaderFields(fs: org.apache.hadoop.fs.FileSystem,
      dbfP: org.apache.hadoop.fs.Path): Seq[Shapefile.DbfField] = {
    val in = fs.open(dbfP)
    try {
      val pre = new Array[Byte](32); in.readFully(0, pre)
      val headerSize = java.nio.ByteBuffer.wrap(pre)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getShort(8) & 0xffff
      val buf = new Array[Byte](math.max(headerSize, 32))
      System.arraycopy(pre, 0, buf, 0, 32)
      if (headerSize > 32) in.readFully(32, buf, 32, headerSize - 32)
      Shapefile.readDbf(buf)._1
    } finally in.close()
  }

  private def shpFieldsOf(fs: org.apache.hadoop.fs.FileSystem,
      shp: org.apache.hadoop.fs.Path): Seq[Shapefile.DbfField] = {
    val dbfP = shpSidecar(shp, ".dbf")
    if (fs.exists(dbfP)) dbfHeaderFields(fs, dbfP) else Seq.empty
  }

  private def shpPrjOf(fs: org.apache.hadoop.fs.FileSystem,
      shp: org.apache.hadoop.fs.Path): Option[String] = {
    val prj = shpSidecar(shp, ".prj")
    if (fs.exists(prj)) Some(new String(readWholeGuarded(fs, prj),
      java.nio.charset.StandardCharsets.UTF_8))
    else None
  }

  private def sridOfPrj(prj: Option[String]): Int =
    prj.map(graft.functions.CrsRegistry.sridForWkt).getOrElse(0)

  /** First file's (fields, srid) — the layout a directory read decodes
    * every file against. */
  private[graft] def shapefileHeadLayout(fs: org.apache.hadoop.fs.FileSystem,
      shp: org.apache.hadoop.fs.Path): (Seq[Shapefile.DbfField], Int) =
    (shpFieldsOf(fs, shp), sridOfPrj(shpPrjOf(fs, shp)))

  /** Validate every OTHER file's sidecars against the first file's
    * (header-only reads) — a directory mixing .dbf layouts would silently
    * misalign attributes, and mixed .prj files would mislabel the CRS of
    * the other files, so heterogeneity fails loudly at plan/scan time.
    *
    * CRS comparison is deliberately conservative against false positives:
    * identical (whitespace-normalized) .prj text is always accepted, and
    * differing text only fails when BOTH files resolve to KNOWN distinct
    * codes — two WKT dialects for the same CRS, neither carrying an
    * AUTHORITY clause, auto-register as distinct synthetic codes
    * (CrsRegistry 990000..998999) and must not reject a homogeneous
    * directory that read fine before validation existed. */
  private[graft] def validateShapefileDir(fs: org.apache.hadoop.fs.FileSystem,
      shps: Seq[org.apache.hadoop.fs.Path], path: String,
      fields: Seq[Shapefile.DbfField], srid: Int): Unit = {
    if (shps.lengthCompare(1) <= 0) return
    def norm(prj: Option[String]): String =
      prj.getOrElse("").replaceAll("\\s+", "")
    def known(s: Int): Boolean = s != 0 && s < 990000
    val headPrj = norm(shpPrjOf(fs, shps.head))
    shps.drop(1).foreach { shp =>
      val f = shpFieldsOf(fs, shp)
      require(f == fields,
        s"shapefile: mixed .dbf layouts under $path — ${shps.head.getName} " +
          s"has fields $fields but ${shp.getName} has $f; directory reads " +
          "need a homogeneous layout (split heterogeneous files into " +
          "separate directories)")
      val prj = shpPrjOf(fs, shp)
      if (norm(prj) != headPrj) {
        val s = sridOfPrj(prj)
        require(!(known(s) && known(srid) && s != srid),
          s"shapefile: mixed CRS under $path — ${shps.head.getName} resolves " +
            s"to SRID $srid but ${shp.getName} resolves to SRID $s; directory " +
            "reads stamp one SRID onto every file (split by CRS, or to_srid " +
            "after loading each directory)")
      }
    }
  }

  /** [[shapefileHeadLayout]] + [[validateShapefileDir]] in one call — the
    * function-surface path, where plan time and read time coincide. */
  private[graft] def shapefileDirLayout(fs: org.apache.hadoop.fs.FileSystem,
      shps: Seq[org.apache.hadoop.fs.Path],
      path: String): (Seq[Shapefile.DbfField], Int) = {
    val (fields, srid) = shapefileHeadLayout(fs, shps.head)
    validateShapefileDir(fs, shps, path, fields, srid)
    (fields, srid)
  }

  // ------------------------------------------- skip_features/max_features

  /** Per-unit (skip, take) windows implementing pyogrio's
    * `skip_features`/`max_features` over an ordered sequence of scan units
    * (files, or gpkg leaf pages). `count` is consulted lazily: units after
    * the window's end are never counted, and once the window is open-ended
    * the remaining units skip counting entirely. Units wholly outside the
    * window are dropped — they are never scanned. */
  private[io] def featureWindows[K](units: Seq[K], skip: Long, max: Long)(
      count: K => Long): Seq[(K, Long, Long)] = {
    var remSkip = math.max(0L, skip)
    var remMax = max
    val out = Seq.newBuilder[(K, Long, Long)]
    val it = units.iterator
    while (it.hasNext && remMax > 0) {
      val u = it.next()
      if (remSkip == 0 && remMax == Long.MaxValue) out += ((u, 0L, Long.MaxValue))
      else {
        val n = count(u)
        if (remSkip >= n) remSkip -= n
        else {
          val localSkip = remSkip
          remSkip = 0
          val take = math.min(n - localSkip, remMax)
          out += ((u, localSkip, take))
          if (remMax != Long.MaxValue) remMax -= take
        }
      }
    }
    out.result()
  }

  /** One small job counting features per file (used only when a windowed
    * read spans several files and the count is not derivable from file
    * metadata alone). */
  private def distributedCounts(spark: SparkSession, files: Seq[String])(
      countOne: String => Long): Map[String, Long] =
    spark.sparkContext.parallelize(files, math.max(1, files.length))
      .map(f => (f, countOne(f))).collect().toMap

  /** Lazily materialized, IN-ORDER chunked counts: [[featureWindows]]
    * consults units front-to-back and stops at the window's end, so this
    * fetches `chunk` units at a time via `countMany` (typically one small
    * distributed job per chunk) — units past the window are never
    * counted, honoring featureWindows' laziness contract. */
  private def lazyChunkedCounts[K](units: Seq[K], chunk: Int)(
      countMany: Seq[K] => Map[K, Long]): K => Long = {
    val cache = scala.collection.mutable.HashMap.empty[K, Long]
    var next = 0
    k => {
      while (!cache.contains(k) && next < units.length) {
        val slice = units.slice(next, next + chunk)
        next += slice.length
        cache ++= countMany(slice)
      }
      cache(k)
    }
  }

  /** Windows for the whole-document formats (KML/GML/GPX/MIF/DXF): their
    * framing requires a parse, so a windowed multi-file read plans with
    * one distributed parse-count pass; single-file reads (the common
    * interchange case) slice in-stream with no extra pass. */
  private def xmlWindows(spark: SparkSession, files: Seq[String],
      skip: Long, max: Long)(count: String => Long): Seq[(String, Long, Long)] =
    if (skip <= 0 && max == Long.MaxValue) files.map(f => (f, 0L, Long.MaxValue))
    else if (files.length == 1) Seq((files.head, skip, max))
    else featureWindows(files, skip, max)(
      lazyChunkedCounts(files, 16)(fs => distributedCounts(spark, fs)(count)))

  private def sliceIterator[T](it: Iterator[T], skip: Long, take: Long): Iterator[T] = {
    // Long-counting slice: Iterator.drop/take truncate at Int.MaxValue,
    // which would silently under-skip / over-take a >2^31 window
    val skip0 = skip
    val take0 = take
    new Iterator[T] {
      private var toSkip = math.max(skip0, 0L)
      private var remaining = take0
      private def ensureSkipped(): Unit =
        while (toSkip > 0 && it.hasNext) { it.next(); toSkip -= 1 }
      def hasNext: Boolean = { ensureSkipped(); remaining > 0 && it.hasNext }
      def next(): T = {
        if (!hasNext) throw new NoSuchElementException("sliceIterator exhausted")
        remaining -= 1
        it.next()
      }
    }
  }

  /** Read KML file(s) → geo frame: EWKB geometry (SRID 4326, fixed by the
    * KML spec) + `name` + `description` + one STRING column per
    * ExtendedData key (KML carries no attribute types without a Schema
    * element — cast downstream). Attribute schema is discovered from the
    * first file. `path` may be one `.kml` or a directory of them;
    * parallelism is per file (whole-document XML is not splittable). */
  def readKml(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue): DataFrame = {
    val (files, first) = xmlFileList(spark, path, ".kml")
    val keys = Kml.dataKeys(first)
    val schema = StructType(
      StructField(geometryName, BinaryType, nullable = true) +:
        StructField("name", StringType) +: StructField("description", StringType) +:
        keys.map(StructField(_, StringType)))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val keyArr = keys.toArray
    val windows = xmlWindows(spark, files, skipFeatures, maxFeatures)(
      f => Kml.readFeatures(readWholeFile(conf, f)).size.toLong)
    val rows = spark.sparkContext.parallelize(windows, math.max(1, windows.length))
      .flatMap { case (f, wSkip, wTake) =>
        sliceIterator(Kml.readFeatures(readWholeFile(conf, f)).iterator, wSkip, wTake)
          .map { ft =>
            org.apache.spark.sql.Row.fromSeq(
              (if (ft.geom == null) null else graft.serde.EWKB.write(ft.geom)) +:
                ft.name +: ft.description +:
                keyArr.toSeq.map(k => ft.data.getOrElse(k, null)))
          }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Write one KML document (export sink — KML is an interchange format;
    * the cluster-scale sink is GeoParquet). `nameColumn` (if present in
    * the frame) feeds the Placemark name; every other non-geometry column
    * becomes an ExtendedData pair. */
  def writeKml(df: DataFrame, path: String, geometryName: String = "geometry",
      nameColumn: String = "name", documentName: String = "graft",
      descriptionColumn: String = "description"): Unit = {
    val hasName = df.columns.contains(nameColumn)
    val hasDesc = df.columns.contains(descriptionColumn)
    val dataCols = df.columns.filterNot(c =>
      c == geometryName || c == nameColumn || c == descriptionColumn)
    val ordered = df.select(
      (Seq(col(geometryName)) ++
        (if (hasName) Seq(col(nameColumn).cast("string")) else Seq.empty) ++
        (if (hasDesc) Seq(col(descriptionColumn).cast("string")) else Seq.empty) ++
        dataCols.map(c => col(c).cast("string"))): _*)
    val it = ordered.toLocalIterator()
    val rows = new Iterator[(org.locationtech.jts.geom.Geometry, String, String, Seq[(String, String)])] {
      def hasNext: Boolean = it.hasNext
      def next(): (org.locationtech.jts.geom.Geometry, String, String, Seq[(String, String)]) = {
        val row = it.next()
        val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
        val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
        var off = 1
        val name = if (hasName) { val v = row.getString(off); off += 1; v } else null
        val desc = if (hasDesc) { val v = row.getString(off); off += 1; v } else null
        (geom, name, desc,
          dataCols.toSeq.zipWithIndex.map { case (c, i) => (c, row.getString(off + i)) })
      }
    }
    val bytes = Kml.write(rows, documentName)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Read GML file(s) → geo frame: EWKB geometry (SRID from `srsName`,
    * urn-form axis order normalized to lon/lat) + one STRING column per
    * simple property (GML carries no types without its XSD — cast
    * downstream). Attribute schema from the first file; `path` may be one
    * `.gml` (or `.xml`) file or a directory of `.gml`; parallelism is per
    * file. */
  def readGml(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue): DataFrame = {
    val (files, first) = xmlFileList(spark, path, ".gml")
    val keys = Gml.dataKeys(first)
    val schema = StructType(
      StructField(geometryName, BinaryType, nullable = true) +:
        keys.map(StructField(_, StringType)))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val keyArr = keys.toArray
    val windows = xmlWindows(spark, files, skipFeatures, maxFeatures)(
      f => Gml.readFeatures(readWholeFile(conf, f)).size.toLong)
    val rows = spark.sparkContext.parallelize(windows, math.max(1, windows.length))
      .flatMap { case (f, wSkip, wTake) =>
        sliceIterator(Gml.readFeatures(readWholeFile(conf, f)).iterator, wSkip, wTake)
          .map { ft =>
            org.apache.spark.sql.Row.fromSeq(
              (if (ft.geom == null) null else graft.serde.EWKB.write(ft.geom)) +:
                keyArr.toSeq.map(k => ft.data.getOrElse(k, null)))
          }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Write one GML 3.2 feature collection (export sink): every
    * non-geometry column becomes a string property; the legacy `EPSG:n`
    * srsName (lon/lat axis order) is written. */
  def writeGml(df: DataFrame, path: String, geometryName: String = "geometry",
      featureName: String = "feature"): Unit = {
    val dataCols = df.columns.filterNot(_ == geometryName)
    val ordered = df.select(
      (Seq(col(geometryName)) ++ dataCols.map(c => col(c).cast("string"))): _*)
    val it = ordered.toLocalIterator()
    val rows = new Iterator[(org.locationtech.jts.geom.Geometry, Seq[(String, String)])] {
      def hasNext: Boolean = it.hasNext
      def next(): (org.locationtech.jts.geom.Geometry, Seq[(String, String)]) = {
        val row = it.next()
        val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
        val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
        (geom,
          dataCols.toSeq.zipWithIndex.map { case (c, i) => (c, row.getString(1 + i)) })
      }
    }
    val bytes = Gml.write(rows, featureName)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Read DXF file(s) → geo frame: EWKB geometry + the `layer` string
    * (the one attribute the format carries). ENTITIES subset: POINT /
    * LINE / LWPOLYLINE / POLYLINE / CIRCLE / ARC (arcs linearized);
    * closed polylines come back as closed LINESTRINGs (OGR semantics).
    * DXF has no CRS — SRID is 0. `path` is one `.dxf` or a directory;
    * parallelism is per file. */
  def readDxf(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue): DataFrame = {
    val (files, _) = xmlFileList(spark, path, ".dxf")
    val schema = StructType(Seq(
      StructField(geometryName, BinaryType, nullable = true),
      StructField("layer", StringType)))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    // function val, not a def: a local def would capture the GeoIO module
    val entities: String => Seq[Dxf.Entity] = f => Dxf.readEntities(
      new String(readWholeFile(conf, f), java.nio.charset.StandardCharsets.UTF_8))
    val windows = xmlWindows(spark, files, skipFeatures, maxFeatures)(
      f => entities(f).size.toLong)
    val rows = spark.sparkContext.parallelize(windows, math.max(1, windows.length))
      .flatMap { case (f, wSkip, wTake) =>
        sliceIterator(entities(f).iterator, wSkip, wTake).map { e =>
          org.apache.spark.sql.Row(
            if (e.geom == null) null else graft.serde.EWKB.write(e.geom), e.layer)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Write one DXF document (export sink): Point → POINT, (Multi)
    * LineString → LWPOLYLINE(s), Polygon → one closed LWPOLYLINE per
    * ring (boundary export — DXF has no simple polygon entity; reads
    * back as closed linestrings). `layerColumn` (if present) names each
    * entity's layer. */
  def writeDxf(df: DataFrame, path: String, geometryName: String = "geometry",
      layerColumn: String = "layer"): Unit = {
    val hasLayer = df.columns.contains(layerColumn)
    val ordered =
      if (hasLayer) df.select(col(geometryName), col(layerColumn).cast("string"))
      else df.select(col(geometryName))
    val it = ordered.toLocalIterator()
    val rows = new Iterator[(org.locationtech.jts.geom.Geometry, String)] {
      def hasNext: Boolean = it.hasNext
      def next(): (org.locationtech.jts.geom.Geometry, String) = {
        val row = it.next()
        val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
        val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
        (geom, if (hasLayer) row.getString(1) else "0")
      }
    }
    val text = Dxf.write(rows)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read MapInfo MIF/MID file pair(s) → geo frame: EWKB geometry +
    * attribute columns typed from the MIF `Columns` header. `path` is one
    * `.mif` (its `.mid` sidecar is discovered case-insensitively) or a
    * directory of them; parallelism is per file. */
  def readMif(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue): DataFrame = {
    val (files, first) = xmlFileList(spark, path, ".mif")
    val cols = MapInfo.readMif(
      new String(first, java.nio.charset.StandardCharsets.UTF_8), None).columns
    val schema = StructType(
      StructField(geometryName, BinaryType, nullable = true) +:
        cols.map(c => StructField(c.name, MapInfo.sparkType(c))))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val colArr = cols.toArray
    // function val, not a def: a local def would capture the GeoIO module
    val parse: (String, Boolean) => MapInfo.MifFile = (f, withMid) => {
      val p = new org.apache.hadoop.fs.Path(f)
      val fs = p.getFileSystem(conf.value)
      val text = (pp: org.apache.hadoop.fs.Path) =>
        new String(readWholeFile(conf, pp.toString),
          java.nio.charset.StandardCharsets.UTF_8)
      val midPath =
        if (!withMid) None
        else Seq(".mid", ".MID").map(ext =>
          new org.apache.hadoop.fs.Path(p.getParent,
            p.getName.replaceAll("(?i)\\.mif$", "") + ext)).find(fs.exists)
      MapInfo.readMif(text(p), midPath.map(text))
    }
    val windows = xmlWindows(spark, files, skipFeatures, maxFeatures)(
      f => parse(f, false).geoms.size.toLong)
    val rows = spark.sparkContext.parallelize(windows, math.max(1, windows.length))
      .flatMap { case (f, wSkip, wTake) =>
        val parsed = parse(f, true)
        sliceIterator(parsed.geoms.iterator.zipWithIndex, wSkip, wTake)
          .map { case (g, ri) =>
            val attrs = colArr.indices.map { ci =>
              if (ri < parsed.rows.length && ci < parsed.rows(ri).length)
                MapInfo.parseValue(colArr(ci), parsed.rows(ri)(ci))
              else null
            }
            org.apache.spark.sql.Row.fromSeq(
              (if (g == null) null else graft.serde.EWKB.write(g)) +: attrs)
          }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Write one MIF/MID pair (export sink). `path` is the `.mif` path;
    * the `.mid` sidecar is derived. Column types map to the nearest MIF
    * type (Integer/Smallint/Float/Logical/Char). */
  def writeMif(df: DataFrame, path: String,
      geometryName: String = "geometry"): Unit = {
    require(path.toLowerCase.endsWith(".mif"), s"mif path must end in .mif: $path")
    val attrFields = df.schema.fields.toSeq.filterNot(_.name == geometryName)
    val cols = attrFields.map { f =>
      val t = f.dataType match {
        case LongType => "Integer"
        case IntegerType | ShortType | ByteType => "Smallint"
        case DoubleType | FloatType => "Float"
        case BooleanType => "Logical"
        case _ => "Char(254)"
      }
      MapInfo.MifColumn(f.name, t)
    }
    val ordered = df.select(
      (Seq(col(geometryName)) ++ attrFields.map(f => col(f.name).cast("string"))): _*)
    val it = ordered.toLocalIterator()
    var srid = 0
    val buffered = new scala.collection.mutable.ArrayBuffer[
      (org.locationtech.jts.geom.Geometry, Array[String])]()
    while (it.hasNext) {
      val row = it.next()
      val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
      val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
      if (geom != null && srid == 0) srid = geom.getSRID
      buffered += ((geom, Array.tabulate(attrFields.length)(i => row.getString(1 + i))))
    }
    val (mif, mid) = MapInfo.write(cols, buffered.iterator, srid)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    def put(pp: String, data: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(pp)
      val fs = p.getFileSystem(conf)
      val out = fs.create(p, true)
      try out.write(data.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    put(path, mif)
    put(path.replaceAll("(?i)\\.mif$", "") + ".mid", mid)
  }

  /** Read GPX file(s) → geo frame for one of the five OGR-style layers:
    * `waypoints` (default), `routes`, `tracks`, `route_points`,
    * `track_points`. CRS is fixed by the GPX spec: EPSG:4326; waypoint
    * `ele` becomes both the point Z and an `ele` column. `path` may be
    * one `.gpx` or a directory; parallelism is per file. */
  def readGpx(spark: SparkSession, path: String, layer: String = "waypoints",
      geometryName: String = "geometry",
      skipFeatures: Long = 0L,
      maxFeatures: Long = Long.MaxValue): DataFrame = {
    val (files, _) = xmlFileList(spark, path, ".gpx")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val g = StructField(geometryName, BinaryType, nullable = true)
    val schema: StructType = layer match {
      case "waypoints" => StructType(Seq(g, StructField("ele", DoubleType),
        StructField("time", StringType), StructField("name", StringType),
        StructField("desc", StringType), StructField("sym", StringType),
        StructField("type", StringType)))
      case "routes" | "tracks" => StructType(Seq(g,
        StructField("name", StringType), StructField("desc", StringType)))
      case "route_points" => StructType(Seq(g,
        StructField("route_fid", LongType), StructField("route_point_id", LongType),
        StructField("ele", DoubleType), StructField("time", StringType),
        StructField("name", StringType)))
      case "track_points" => StructType(Seq(g,
        StructField("track_fid", LongType), StructField("track_seg_id", LongType),
        StructField("track_seg_point_id", LongType),
        StructField("ele", DoubleType), StructField("time", StringType)))
      case other => throw new IllegalArgumentException(
        s"gpx: unknown layer '$other' (waypoints|routes|tracks|route_points|track_points)")
    }
    // function val, not a def: a local def would capture the GeoIO module
    val layerRows: String => Seq[org.apache.spark.sql.Row] = f => {
      val doc = Gpx.read(readWholeFile(conf, f))
      val ewkb = (geom: org.locationtech.jts.geom.Geometry) => graft.serde.EWKB.write(geom)
      layer match {
        case "waypoints" => doc.waypoints.map(p =>
          org.apache.spark.sql.Row(ewkb(Gpx.pointGeom(p)), p.ele.orNull,
            p.time, p.name, p.desc, p.sym, p.typ))
        case "routes" => doc.routes.map(rt =>
          org.apache.spark.sql.Row(ewkb(Gpx.routeGeom(rt)), rt.name, rt.desc))
        case "tracks" => doc.tracks.map(t =>
          org.apache.spark.sql.Row(ewkb(Gpx.trackGeom(t)), t.name, t.desc))
        case "route_points" => doc.routes.zipWithIndex.flatMap { case (rt, fid) =>
          rt.points.zipWithIndex.map { case (p, i) =>
            org.apache.spark.sql.Row(ewkb(Gpx.pointGeom(p)), fid.toLong, i.toLong,
              p.ele.orNull, p.time, p.name)
          }
        }
        case "track_points" => doc.tracks.zipWithIndex.flatMap { case (t, fid) =>
          t.segments.zipWithIndex.flatMap { case (seg, sid) =>
            seg.zipWithIndex.map { case (p, i) =>
              org.apache.spark.sql.Row(ewkb(Gpx.pointGeom(p)), fid.toLong,
                sid.toLong, i.toLong, p.ele.orNull, p.time)
            }
          }
        }
      }
    }
    val windows = xmlWindows(spark, files, skipFeatures, maxFeatures)(
      f => layerRows(f).size.toLong)
    val rows = spark.sparkContext.parallelize(windows, math.max(1, windows.length))
      .flatMap { case (f, wSkip, wTake) =>
        sliceIterator(layerRows(f).iterator, wSkip, wTake)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Write one GPX document (export sink): Point rows → `wpt`,
    * (Multi)LineString rows → `trk`; Z → `ele`; `nameColumn` (if
    * present) feeds the element name. */
  def writeGpx(df: DataFrame, path: String, geometryName: String = "geometry",
      nameColumn: String = "name", creator: String = "graft"): Unit = {
    val hasName = df.columns.contains(nameColumn)
    val ordered =
      if (hasName) df.select(col(geometryName), col(nameColumn).cast("string"))
      else df.select(col(geometryName))
    val it = ordered.toLocalIterator()
    val rows = new Iterator[(org.locationtech.jts.geom.Geometry, String)] {
      def hasNext: Boolean = it.hasNext
      def next(): (org.locationtech.jts.geom.Geometry, String) = {
        val row = it.next()
        val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
        val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
        (geom, if (hasName) row.getString(1) else null)
      }
    }
    val bytes = Gpx.write(rows.filter(_._1 != null), creator)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }
}

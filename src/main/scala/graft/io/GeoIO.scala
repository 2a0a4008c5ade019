package graft.io

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
      val g = col(geometryName)
      val stats = df.agg(
        collect_set(graft.functions.st_geometrytype(g)).as("types"),
        collect_set(graft.functions.st_srid(g)).as("srids"),
        element_at(graft.functions.st_total_bounds(g), 1).as("xmin"),
        element_at(graft.functions.st_total_bounds(g), 2).as("ymin"),
        element_at(graft.functions.st_total_bounds(g), 3).as("xmax"),
        element_at(graft.functions.st_total_bounds(g), 4).as("ymax")
      ).collect()(0)
      val types = stats.getSeq[String](0).sorted
      val srids = stats.getSeq[Int](1).sorted
      require(srids.length <= 1,
        s"write_file: mixed SRIDs are not supported (got ${srids.mkString(", ")})")
      val srid = srids.headOption.getOrElse(0)
      val crs = graft.functions.CrsImpl.crsFromCode(srid).map(w =>
        "\"" + w.replace("\\", "\\\\").replace("\"", "\\\"") + "\"").getOrElse("null")
      val json =
        s"""{"version":"1.1.0","primary_column":"$geometryName","columns":{"$geometryName":{
           |"encoding":"$encoding","geometry_types":[${types.map("\"" + _ + "\"").mkString(",")}],
           |"bbox":[${stats.getDouble(2)},${stats.getDouble(3)},${stats.getDouble(4)},${stats.getDouble(5)}],
           |"srid":$srid,"crs":$crs,
           |"covering":${if (writeBbox) "{\"bbox\":{\"column\":\"" + BboxColumn + "\"}}" else "null"}}}}""".stripMargin
      val hadoopPath = new org.apache.hadoop.fs.Path(path, "_geo_metadata.json")
      val fs = hadoopPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      val out = fs.create(hadoopPath, true)
      out.write(json.getBytes("UTF-8"))
      out.close()
      // standard discovery: the same payload into every part footer
      ParquetFooter.addKeyValueMetadata(df.sparkSession, path, Map("geo" -> json))
    }
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
    * `read_file` on .geojson): multiline JSON → one row per feature. */
  def readGeoJson(spark: SparkSession, path: String,
      geometryName: String = "geometry"): DataFrame = {
    val fc = spark.read.option("multiLine", "true").json(path)
    val exploded = fc.select(explode(col("features")).as("f"))
    val propsSchema = exploded.schema("f").dataType
      .asInstanceOf[StructType].fields.find(_.name == "properties")
    val base = exploded.select(
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
    *   `read_geometry=False`). */
  def readShapefile(spark: SparkSession, path: String,
      geometryName: String = "geometry",
      columns: Option[Seq[String]] = None,
      bbox: Option[(Double, Double, Double, Double)] = None,
      readGeometry: Boolean = true): DataFrame = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shps: Seq[org.apache.hadoop.fs.Path] =
      if (fs.getFileStatus(hadoopPath).isDirectory)
        fs.listStatus(hadoopPath).map(_.getPath).toSeq
          .filter(_.getName.toLowerCase.endsWith(".shp")).sortBy(_.getName)
      else Seq(hadoopPath)
    require(shps.nonEmpty, s"no .shp files in $path")
    def sidecar(shp: org.apache.hadoop.fs.Path, ext: String): org.apache.hadoop.fs.Path =
      new org.apache.hadoop.fs.Path(shp.getParent,
        shp.getName.replaceAll("(?i)\\.shp$", "") + ext)
    def readAll(p: org.apache.hadoop.fs.Path): Array[Byte] = {
      val in = fs.open(p)
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        buf
      } finally in.close()
    }
    // schema + srid from the first file's sidecars
    val firstDbf = sidecar(shps.head, ".dbf")
    val fields: Seq[Shapefile.DbfField] =
      if (fs.exists(firstDbf)) Shapefile.readDbf(readAll(firstDbf))._1 else Seq.empty
    val keptIdx: Seq[Int] = columns match {
      case None => fields.indices
      case Some(want) =>
        val wantSet = want.toSet
        val idx = fields.indices.filter(i => wantSet.contains(fields(i).name))
        val missing = wantSet -- idx.map(fields(_).name)
        require(missing.isEmpty, s"shapefile: no such attribute column(s): ${missing.mkString(", ")}")
        idx
    }
    val prj = sidecar(shps.head, ".prj")
    val srid =
      if (fs.exists(prj)) Shapefile.sridFromPrj(
        new String(readAll(prj), java.nio.charset.StandardCharsets.UTF_8))
      else 0
    val schema = StructType(
      (if (readGeometry) Seq(StructField(geometryName, BinaryType, nullable = true))
       else Seq.empty) ++
        keptIdx.map(i => StructField(fields(i).name, Shapefile.sparkType(fields(i)))))
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val fileList = shps.map(_.toString)
    val keptArr = keptIdx.toArray
    val rows = spark.sparkContext.parallelize(fileList, fileList.length).flatMap { shpPath =>
      val p = new org.apache.hadoop.fs.Path(shpPath)
      val pfs = p.getFileSystem(conf.value)
      def bytesOf(path: org.apache.hadoop.fs.Path): Array[Byte] = {
        val in = pfs.open(path)
        try {
          val len = pfs.getFileStatus(path).getLen.toInt
          val buf = new Array[Byte](len); in.readFully(0, buf); buf
        } finally in.close()
      }
      val dbfPath = new org.apache.hadoop.fs.Path(p.getParent,
        p.getName.replaceAll("(?i)\\.shp$", "") + ".dbf")
      val dbf = if (pfs.exists(dbfPath)) Some(bytesOf(dbfPath)) else None
      Shapefile.readFeatures(bytesOf(p), dbf, bbox, srid).map { case (g, attrs) =>
        val geo: Seq[Any] =
          if (!readGeometry) Seq.empty
          else Seq(if (g == null) null else graft.serde.EWKB.write(g))
        org.apache.spark.sql.Row.fromSeq(geo ++ keptArr.map(attrs(_)).toSeq)
      }
    }
    spark.createDataFrame(rows, schema)
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

  private def fgbTypeFor(dt: DataType): Int = dt match {
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

  private def sparkTypeFor(ct: Int): DataType = ct match {
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
  def readFlatGeobuf(spark: SparkSession, path: String,
      geometryName: String = "geometry"): DataFrame = {
    // schema comes from the first file's header (all parts share one schema)
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first =
      if (fs.getFileStatus(hadoopPath).isDirectory)
        fs.listStatus(hadoopPath).map(_.getPath)
          .filter(_.getName.endsWith(".fgb")).sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(s"no .fgb files in $path"))
      else hadoopPath
    val in = fs.open(first)
    val header = try FlatGeobuf.readHeaderFrom(in) finally in.close()
    val schema = StructType(
      StructField(geometryName, BinaryType, nullable = true) +:
        header.columns.map(c => StructField(c.name, sparkTypeFor(c.colType))))
    val glob = if (fs.getFileStatus(hadoopPath).isDirectory) s"$path/*.fgb" else path
    val rows = spark.sparkContext.binaryFiles(glob).flatMap { case (_, pds) =>
      val (_, features) = FlatGeobuf.read(pds.toArray())
      features.map { f =>
        val geo = if (f.geometry == null) null else graft.serde.EWKB.write(f.geometry)
        org.apache.spark.sql.Row.fromSeq(geo +: f.properties.toSeq)
      }
    }
    spark.createDataFrame(rows, schema)
  }

  private def fgbColumns(df: DataFrame, geometryName: String): Seq[FlatGeobuf.Col] =
    df.schema.fields.toSeq.filterNot(_.name == geometryName)
      .map(f => FlatGeobuf.Col(f.name, fgbTypeFor(f.dataType)))

  /** Write a single .fgb file, streaming rows through the driver (bounded
    * memory via `toLocalIterator`; the single-file format is inherently a
    * one-writer sink — use [[writeFlatGeobufPartitioned]] at scale). The
    * header SRID is taken from the first geometry; FGB carries one CRS per
    * file, so mixed-SRID frames are rejected like the reference's
    * `write_file` (`geodataframe.py:462-471`). */
  def writeFlatGeobuf(df: DataFrame, path: String,
      geometryName: String = "geometry"): Unit = {
    val cols = fgbColumns(df, geometryName)
    val ordered = df.select((col(geometryName) +: cols.map(c => col(c.name))): _*)
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(hadoopPath, true)
    var writer: FlatGeobuf.Writer = null
    var srid = -1
    val it = ordered.toLocalIterator()
    try {
      while (it.hasNext) {
        val row = it.next()
        val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
        val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
        if (writer == null) {
          srid = if (geom == null) 0 else geom.getSRID
          writer = new FlatGeobuf.Writer(out, cols, srid)
        } else if (geom != null && geom.getSRID != srid)
          throw new IllegalArgumentException(
            s"flatgeobuf: mixed SRIDs are not supported ($srid vs ${geom.getSRID})")
        writer.write(geom, Array.tabulate(cols.length)(i => row.get(i + 1)))
      }
      if (writer == null) writer = new FlatGeobuf.Writer(out, cols, 0)
    } finally {
      if (writer != null) writer.close() else out.close()
    }
  }

  /** Scale-path FlatGeobuf sink: one part-NNNNN.fgb per partition, written
    * executor-side in parallel (no driver funnel); [[readFlatGeobuf]] reads
    * the directory back with per-file parallelism. */
  def writeFlatGeobufPartitioned(df: DataFrame, path: String,
      geometryName: String = "geometry"): Unit = {
    val cols = fgbColumns(df, geometryName)
    val ordered = df.select((col(geometryName) +: cols.map(c => col(c.name))): _*)
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.delete(dir, true)
    fs.mkdirs(dir)
    ordered.rdd.foreachPartition { rows =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val part = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.fgb")
      val pfs = part.getFileSystem(conf.value)
      val out = pfs.create(part, true)
      var writer: FlatGeobuf.Writer = null
      try {
        rows.foreach { row =>
          val geoBytes = row.get(0).asInstanceOf[Array[Byte]]
          val geom = if (geoBytes == null) null else graft.serde.EWKB.read(geoBytes)
          if (writer == null)
            writer = new FlatGeobuf.Writer(out, cols,
              if (geom == null) 0 else geom.getSRID)
          writer.write(geom, Array.tabulate(cols.length)(i => row.get(i + 1)))
        }
        if (writer == null) writer = new FlatGeobuf.Writer(out, cols, 0)
      } finally {
        if (writer != null) writer.close() else out.close()
      }
    }
  }
}

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

  /** Read parquet with a WKB geometry column → normalized geo frame.
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
    geoDataFrame(filtered, geometryName, "wkb").drop(BboxColumn)
  }

  /** Write parquet with the geometry column tagged in column metadata
    * (GeoParquet-style marker, enough for round-trip + discovery) and,
    * by default, a bbox covering column that future reads prune on
    * (see [[readGeoParquet]]).
    *
    * With `writeMetadata`, a `_geo_metadata.json` sidecar is written next
    * to the parquet files carrying the GeoParquet `geo` metadata payload
    * (version, primary column, encoding, inferred geometry types, dataset
    * bbox, CRS) — Spark's parquet writer exposes no hook for custom footer
    * key-value metadata, so the sidecar is the discovery mechanism. Like
    * the reference's `write_file` (`geodataframe.py:462-471`), geometry
    * types and CRS are inferred from the data and **mixed SRIDs are
    * rejected**. */
  def writeGeoParquet(df: DataFrame, path: String,
      geometryName: String = "geometry", mode: String = "overwrite",
      writeBbox: Boolean = true, writeMetadata: Boolean = false): Unit = {
    val meta = new MetadataBuilder()
      .putString("encoding", "EWKB")
      .putBoolean("geoparquet_geometry", true)
      .build()
    val tagged = df.withColumn(geometryName, col(geometryName).as(geometryName, meta))
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
           |"encoding":"EWKB","geometry_types":[${types.map("\"" + _ + "\"").mkString(",")}],
           |"bbox":[${stats.getDouble(2)},${stats.getDouble(3)},${stats.getDouble(4)},${stats.getDouble(5)}],
           |"srid":$srid,"crs":$crs,
           |"covering":${if (writeBbox) "{\"bbox\":{\"column\":\"" + BboxColumn + "\"}}" else "null"}}}}""".stripMargin
      val hadoopPath = new org.apache.hadoop.fs.Path(path, "_geo_metadata.json")
      val fs = hadoopPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
      val out = fs.create(hadoopPath, true)
      out.write(json.getBytes("UTF-8"))
      out.close()
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
}

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

  /** Read parquet with a WKB geometry column → normalized geo frame. */
  def readGeoParquet(spark: SparkSession, path: String,
      geometryName: String = "geometry"): DataFrame =
    geoDataFrame(spark.read.parquet(path), geometryName, "wkb")

  /** Write parquet with the geometry column tagged in column metadata
    * (GeoParquet-style marker, enough for round-trip + discovery). */
  def writeGeoParquet(df: DataFrame, path: String,
      geometryName: String = "geometry", mode: String = "overwrite"): Unit = {
    val meta = new MetadataBuilder()
      .putString("encoding", "EWKB")
      .putBoolean("geoparquet_geometry", true)
      .build()
    df.withColumn(geometryName, col(geometryName).as(geometryName, meta))
      .write.mode(mode).parquet(path)
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

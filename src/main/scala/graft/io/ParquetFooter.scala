package graft.io

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
import org.apache.spark.sql.SparkSession

/** Custom parquet footer key-value metadata, via public parquet-hadoop
  * APIs. Spark's parquet writer exposes no hook for extra footer
  * key-values, so standard-GeoParquet discovery metadata (the `geo` key,
  * spec geoparquet.org v1.x) is added as a POST-WRITE pass:
  * `ParquetFileWriter.appendFile` copies the row groups of each part file
  * byte-for-byte (no decode/re-encode), then `end()` writes a footer
  * carrying the original key-values (including Spark's own schema entry)
  * plus the new ones, and the rewritten file is renamed over the original.
  *
  * Cost: one sequential read + write of each file — O(bytes), no CPU
  * decode, executor-parallel per file. That is the price of standard
  * interop; the default write path skips it (sidecar only) and pays
  * nothing.
  */
object ParquetFooter {

  private def partFiles(spark: SparkSession, dir: String): Seq[Path] = {
    val d = new Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.getFileStatus(d).isDirectory) Seq(d)
    else fs.listStatus(d).map(_.getPath).toSeq
      .filter(p => p.getName.endsWith(".parquet") && !p.getName.startsWith("_")
        && !p.getName.startsWith("."))
      .sortBy(_.getName)
  }

  /** Merge `kv` into the footer of every part file under `dir`
    * (executor-parallel, one task per file). */
  def addKeyValueMetadata(spark: SparkSession, dir: String,
      kv: Map[String, String]): Unit = {
    val files = partFiles(spark, dir).map(_.toString)
    if (files.isEmpty) return
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    spark.sparkContext.parallelize(files, files.length).foreach { f =>
      val path = new Path(f)
      val fs = path.getFileSystem(conf.value)
      val in = HadoopInputFile.fromPath(path, conf.value)
      val (schema, existing) = {
        val r = ParquetFileReader.open(in)
        try {
          val md = r.getFooter.getFileMetaData
          (md.getSchema, Map.empty[String, String] ++
            scala.jdk.CollectionConverters.MapHasAsScala(md.getKeyValueMetaData).asScala)
        } finally r.close()
      }
      val tmp = new Path(path.getParent, s".${path.getName}.geo_tmp")
      val w = new ParquetFileWriter(HadoopOutputFile.fromPath(tmp, conf.value),
        schema, ParquetFileWriter.Mode.OVERWRITE, 128L * 1024 * 1024, 8 * 1024 * 1024)
      w.start()
      w.appendFile(in)
      w.end(scala.jdk.CollectionConverters.MapHasAsJava(existing ++ kv).asJava)
      fs.delete(path, false)
      if (!fs.rename(tmp, path))
        throw new java.io.IOException(s"parquet footer rewrite: rename failed for $f")
    }
  }

  /** Read one footer key from the FIRST part file under `dir` (all parts
    * of one write carry the same payload) — the discovery read is a
    * footer-only open, no row groups touched. */
  def readKeyValueMetadata(spark: SparkSession, dir: String,
      key: String): Option[String] = {
    val files = partFiles(spark, dir)
    files.headOption.flatMap { p =>
      val in = HadoopInputFile.fromPath(p, spark.sparkContext.hadoopConfiguration)
      val r = ParquetFileReader.open(in)
      try Option(r.getFooter.getFileMetaData.getKeyValueMetaData.get(key))
      finally r.close()
    }
  }
}

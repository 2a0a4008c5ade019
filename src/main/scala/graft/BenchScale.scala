package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-regression bench: the same headline keys as [[Bench]], on a
  * SYNTHETIC `SCALE`× blow-up of an sf dir (default 10× sf0.1 ≈ sf1).
  * The driver-generated testdata stops at sf0.1; sf0.1 cannot surface
  * hot-cell salting, broadcast-guard flips or checkpoint-IO cliffs, so
  * this main manufactures the next decade once per machine
  * (key-shifted copies — clearly synthetic, used for SCALE REGRESSION
  * ONLY, never for oracle correctness, which always runs on the driver's
  * own parquet) and reports the same one-line JSON shape as [[Bench]]
  * with `"sf":"synthetic-<SCALE>x-<dir>"`.
  *
  * Key shifting: each copy i adds i·(max(key)+1) to the table's key, so
  * group-bys keep their cardinality ratios and the spatial keys spread
  * rather than stacking 10 identical geometries per cell. Text/vector
  * payloads repeat — which is itself scale-realistic for the dedup keys
  * (duplicate groups grow 10×, exercising the hot-bucket caps). */
object BenchScale {

  private val Tables = Seq(
    ("orders", "o_orderkey"), ("lineitem", "l_orderkey"),
    ("documents", "doc_id"), ("embeddings", "vec_id"))

  private def ensureScaled(spark: SparkSession, sfDir: String,
      outDir: String, scale: Int): Unit = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for ((tbl, key) <- Tables) {
      val out = new org.apache.hadoop.fs.Path(s"$outDir/$tbl.parquet")
      if (!fs.exists(out)) {
        val base = spark.read.parquet(s"$sfDir/$tbl.parquet")
        val maxK = base.agg(max(col(key))).head().getLong(0) + 1L
        val scaled = (0 until scale)
          .map(i => base.withColumn(key, col(key) + lit(i * maxK)))
          .reduce(_.unionAll(_))
        scaled.repartition(64).write.mode("overwrite").parquet(out.toString)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureScaled(spark, sfDir, outDir, scale)
    spark.range(1000).select(sum(col("id"))).collect()
    val results = Bench.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val pinUnfused = name.endsWith("_udf") || name.endsWith("_unfused")
      if (pinUnfused) spark.conf.set("spark.graft.fuse", "false")
      val (sec, spread, noisy, _) =
        try Bench.timeWarm(fn(spark, outDir))
        catch {
          case e: Throwable =>
            System.err.println(s"[bench-scale] $name: ${e.getMessage}")
            (-1.0, 0.0, true, -1.0)
        } finally if (pinUnfused) spark.conf.set("spark.graft.fuse", "true")
      System.err.println(f"[bench-scale] $name%-28s $sec%8.2f s (spread $spread%.2f)")
      (name, sec, spread, noisy)
    }
    // same compact stdout contract as Bench (r19): 3-dp medians, the
    // diagnostic blocks on stderr — a full-precision line with inline
    // spread/noisy was the exact shape whose length truncated the
    // driver-archived Bench line mid-JSON for two rounds
    def r3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    val qs = results.map { case (n, v, _, _) => "\"" + n + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val spreads = results.map { case (n, _, sp, _) => "\"" + n + "\":" + r3(sp) }
      .mkString("{", ",", "}")
    val noisyKeys = results.collect { case (n, _, _, true) => "\"" + n + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).sum
    System.err.println(s"""[bench-diag] {"spread":$spreads,"noisy":$noisyKeys}""")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"synthetic-${scale}x-$sfDir"}""")
    spark.stop()
  }
}

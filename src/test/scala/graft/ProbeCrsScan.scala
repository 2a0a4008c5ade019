package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Manual probe (r16, VERDICT #2): does st_to_srid warrant a native
  * codegen promotion? The measure-family precedent was ~3×
  * (geo_scan_measure_udf), but reprojection's per-row work is math-
  * heavy (trig per coordinate), so the UDF overhead may already be
  * noise. A/B alternating (box drift can't masquerade as the delta),
  * 2M-point lattice, two closed-form families: web mercator (cheap
  * math) and a UTM zone (transverse-mercator series, expensive math).
  *
  * Run: Test/runMain graft.ProbeCrsScan
  */
object ProbeCrsScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.graft.ColumnBridge

    val n = 2000000L
    def lattice = spark.range(n).select(st_set_srid(st_point(
      (col("id") % 360).cast("double") - 180.0 + 0.5,
      (col("id") % 170).cast("double") / 2.0 - 42.25), lit(4326)).as("g"))
    def nativeToSrid(g: Column, srid: Int): Column =
      ColumnBridge.column(graft.plans.STToSridNative(
        ColumnBridge.expression(g), ColumnBridge.expression(lit(srid))))
    // UTM zone 33N only accepts lon in a band — clamp the lattice for it
    def utmLattice = spark.range(n).select(st_set_srid(st_point(
      (col("id") % 12).cast("double") + 9.5,
      (col("id") % 140).cast("double") / 2.0 - 20.25), lit(4326)).as("g"))

    def checksum(df: org.apache.spark.sql.DataFrame, m: Column): Double =
      df.select(m.as("m"))
        .agg(sum(st_x(col("m"))) + sum(st_y(col("m")))).collect()(0).getDouble(0)

    def time(f: => Double): (Double, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val variants: Seq[(String, () => Double)] = Seq(
      "merc_udf   " -> (() => checksum(lattice, st_to_srid(col("g"), lit(3857)))),
      "merc_native" -> (() => checksum(lattice, nativeToSrid(col("g"), 3857))),
      "utm_udf    " -> (() => checksum(utmLattice, st_to_srid(col("g"), lit(32633)))),
      "utm_native " -> (() => checksum(utmLattice, nativeToSrid(col("g"), 32633))))
    val warm = variants.map { case (nm, f) => nm -> f() }
    assert(warm(0)._2 == warm(1)._2, s"mercator checksum mismatch: $warm")
    assert(warm(2)._2 == warm(3)._2, s"utm checksum mismatch: $warm")
    val samples: Seq[Seq[Double]] = (1 to 4).map { _ =>
      variants.map { case (_, f) => time(f())._2 }
    }
    variants.map(_._1).zipWithIndex.foreach { case (nm, i) =>
      val xs = samples.map(_(i))
      println(f"$nm min ${xs.min}%.2f  runs ${xs.map(s => f"$s%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}

package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** White-box pins for the FGB micro-batch stream (package-private
  * internals, hence the graft.sources test package): the LIVE listing
  * arm of latestOffset (the path every plain `.start()` user hits — the
  * end-to-end test in DataSourceV2Spec only exercises the AvailableNow
  * snapshot), the offset's URL-encoded JSON round trip, and delta
  * partition planning. */
class FgbStreamInternalsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("live listing arm, offset round trip, delta planning") {
    import graft.functions._
    val dir = Files.createTempDirectory("fgb_mbs").toFile.getAbsolutePath + "/in"
    val df = spark.range(10).toDF("id").repartition(1)
      .withColumn("geometry", st_point(col("id").cast("double"), lit(0.0)))
    df.write.format("flatgeobuf").mode("append").save(dir)
    val table = FlatGeobufDataSource.tableOf(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("path", dir)))
    val scan = table.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(java.util.Map.of()))
      .build()
    val stream = scan.toMicroBatchStream(
      Files.createTempDirectory("fgb_mbs_ckpt").toString)
    // LIVE arm (no prepareForTriggerAvailableNow): latestOffset re-lists
    val o1 = stream.latestOffset().asInstanceOf[FgbOffset]
    assert(o1.files.size == 1)
    df.write.format("flatgeobuf").mode("append").save(dir)
    val o2 = stream.latestOffset().asInstanceOf[FgbOffset]
    assert(o2.files.size == 2, "live listing did not pick up the new part")
    // offset JSON round trip (URL-encoded set)
    val back = stream.deserializeOffset(o2.json()).asInstanceOf[FgbOffset]
    assert(back.files.toSet == o2.files.toSet)
    assert(back == o2)
    // delta planning: (o1 -> o2) plans exactly the new part
    val parts = stream.planInputPartitions(o1, o2)
    assert(parts.length == 1)
    assert(!o1.files.contains(parts.head.asInstanceOf[GeoDsv2.GeoPart].path))
    // empty-offset initial state
    assert(stream.initialOffset().asInstanceOf[FgbOffset].files.isEmpty)
    assert(FgbOffset.fromJson(new FgbOffset(Seq.empty).json()).files.isEmpty)
  }
}

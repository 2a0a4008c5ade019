package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Dedup

/** The persistent decontamination suite
  * ([[Dedup.writeDecontamStore]] / [[Dedup.contaminatedAgainstStore]] /
  * [[Dedup.decontaminateAgainstStore]]): the store door must reproduce
  * the direct [[Dedup.contaminated]] door exactly at the stamped n,
  * appends must widen the suite, and the stamp must refuse mixed n and
  * foreign tables. */
class DecontamStoreSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def drop(table: String): Unit =
    graft.join.SpatialJoin.dropBucketedTable(spark, table)

  test("store door == direct door; append widens; stamp refusals") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a wholly unrelated training document with its own words"),
      (3L, "quiz answer key the capital of france is paris obviously"),
      (4L, "another clean row that is free of any benchmark trace"),
      (5L, "the capital of france is paris end of answer"),
      (6L, null.asInstanceOf[String])) // null text: never contaminated
      .toDF("doc_id", "text")
    val bench1 = Seq("the capital of france is paris").toDF("text")
    val bench2 = Seq("quick brown fox jumps").toDF("text")
    val table = "graft_dc_store"
    drop(table)
    try {
      Dedup.writeDecontamStore(bench1, table, n = 3)
      val viaStore = Dedup.contaminatedAgainstStore(spark, train,
        "doc_id", "text", table).as[Long].collect().toSet
      val direct = Dedup.contaminated(train, "doc_id", "text",
        bench1, "text", n = 3).as[Long].collect().toSet
      assert(viaStore === direct, "store door diverged from the direct door")
      assert(viaStore === Set(3L, 5L), s"fixture drifted: $viaStore")
      val clean = Dedup.decontaminateAgainstStore(spark, train,
        "doc_id", "text", table)
      assert(clean.select($"doc_id").as[Long].collect().toSet ===
        Set(1L, 2L, 4L, 6L))
      // appending a second suite widens the contaminated set
      Dedup.writeDecontamStore(bench2, table, n = 3, mode = "append")
      val widened = Dedup.contaminatedAgainstStore(spark, train,
        "doc_id", "text", table).as[Long].collect().toSet
      assert(widened === Set(1L, 3L, 5L), s"append did not widen: $widened")
      // mixed n refused on append (grams of a different n never match)
      val mixed = intercept[IllegalArgumentException] {
        Dedup.writeDecontamStore(bench2, table, n = 4, mode = "append")
      }
      assert(mixed.getMessage.contains("stamped"))
      // a non-store table is refused
      train.createOrReplaceTempView("graft_dc_plain")
      val notStore = intercept[IllegalArgumentException] {
        Dedup.contaminatedAgainstStore(spark, train, "doc_id", "text",
          "graft_dc_plain")
      }
      assert(notStore.getMessage.contains("writeDecontamStore"))
    } finally drop(table)
  }
}

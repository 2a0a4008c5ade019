package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Manual plan probe: exact dedup must partial-aggregate map-side. */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val deduped = graft.pipeline.Dedup.exact(docs, Seq("text"), "doc_id")
    deduped.explain("formatted")
    spark.stop()
  }
}

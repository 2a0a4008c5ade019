package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: round-6 plan audits — crossDocGramStats exchange reuse and
  * the IVF store partition-pruned scan. */
object ProbePlan6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "a b c d e f x y z w"))
      .toDF("doc_id", "text")
    val cd = graft.pipeline.Dedup.crossDocGramStats(docs, "doc_id", "text", n = 3)
    cd.collect() // let AQE finalize stages (reuse happens at runtime)
    val plan = cd.queryExecution.executedPlan.toString
    println("== crossdup final plan reuse: " +
      (plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage") ||
        plan.contains("StageReuse")))
    val nScans = "LocalTableScan".r.findAllIn(plan).length
    println("== crossdup source scans in final plan: " + nScans)

    val rnd = new scala.util.Random(3)
    val corpus = (1L to 200L).map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val idx = graft.pipeline.Similarity.trainIvf(corpus, "vec_id", "embedding", nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfplan").toString
    graft.pipeline.Similarity.buildIvfStore(idx, corpus, "vec_id", "embedding", dir + "/s")
    val q = corpus.filter($"vec_id" === 7).toDF("query_id", "embedding")
    val stored = graft.pipeline.Similarity.ivfTopKStored(spark, idx, dir + "/s",
      q, "query_id", "embedding", k = 3, nprobe = 2)
    val splan = stored.queryExecution.executedPlan.toString
    val scanLine = splan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("NONE")
    println("== ivf store scan: " + scanLine.trim.take(200))
    spark.stop()
  }
}

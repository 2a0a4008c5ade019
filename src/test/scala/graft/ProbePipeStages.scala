package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Probe (r18): per-stage decomposition of pipe_minhash, pipe_minhash_store
  * and pipe_ann_ivfpq. */
object ProbePipeStages {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()

    @volatile var lines = List.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        val tm = si.taskMetrics
        lines ::= f"stage ${si.stageId}%4d tasks=${si.numTasks}%4d wall=${ms / 1000.0}%7.2fs " +
          f"cpu=${tm.executorCpuTime / 1e9}%7.2fs run=${tm.executorRunTime / 1e3}%7.2fs " +
          f"shW=${tm.shuffleWriteMetrics.bytesWritten / 1e6}%8.2fMB shR=${tm.shuffleReadMetrics.totalBytesRead / 1e6}%8.2fMB"
      }
    })

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect(); ()
    }
    def run(tag: String)(df: => DataFrame): Unit = {
      force(df)
      lines = Nil
      val t0 = System.nanoTime()
      force(df)
      println(f"[probe] ==== $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      Thread.sleep(400)
      lines.reverse.foreach(l => println("[probe] " + l))
    }

    def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")

    run("pipe_minhash") {
      val d = t("documents").select(col("doc_id"), col("text"))
      val all = d.unionAll(d.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      graft.pipeline.Dedup.minhashCandidates(all, "doc_id", "text")
        .agg(count(lit(1)).as("n"))
    }

    graft.pipeline.Dedup.dropMinhashStore(spark, "graft_probe_mh_store")
    graft.pipeline.Dedup.writeMinhashStore(
      t("documents").select(col("doc_id"), col("text")), "graft_probe_mh_store")
    run("pipe_minhash_store") {
      val batch = t("documents")
        .select((col("doc_id") + 10000).as("doc_id"), col("text"))
      graft.pipeline.Dedup.minhashCandidatesAgainstStore(spark, batch,
          "graft_probe_mh_store")
        .agg(count(lit(1)).as("n"), sum(col("jaccard_est")).as("sj"))
    }

    val e = t("embeddings").select(col("vec_id"), col("embedding"))
    val ix = graft.pipeline.Similarity.trainIvf(e, "vec_id", "embedding", nlist = 16)
    val om = graft.pipeline.Similarity.trainOpqResidual(ix, e, "vec_id",
      "embedding", m = 8, ksub = 32, opqIters = 4)
    val st = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_probe_ivfpq").toString + "/store_opq"
    graft.pipeline.Similarity.buildIvfPqStore(ix, om.book, e, "vec_id",
      "embedding", st, residual = true, rotation = Some(om.rotation))
    run("pipe_ann_ivfpq") {
      val q = e.filter(col("vec_id") % 10 === 0)
      graft.pipeline.Similarity.ivfPqTopKStored(spark, ix, om.book, st,
        q, "vec_id", "embedding", k = 5, nprobe = 2, candidates = 16,
        residual = true, rotation = Some(om.rotation))
    }

    run("pipe_topk") {
      val q = e.filter(col("vec_id") % 10 === 0)
      graft.pipeline.Similarity.bruteForceTopK(e, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5)
    }
    spark.stop()
  }
}

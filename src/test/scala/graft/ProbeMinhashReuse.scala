package graft.pipeline

import graft.plans.GraftExtensions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe (r18): minhashCandidates evaluates the banded frame TWICE (the
  * self-join's two sides project different column names below their
  * exchanges, so ReuseExchange can't dedup them and the signature pass
  * runs per side). A/B against an alias self-join whose two exchange
  * subtrees are canonically identical (signature pass once, shuffle
  * written once and read twice) + result equality check. */
object ProbeMinhashReuse {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect(); ()
    }

    def docsAll = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      d.unionAll(d.select((col("doc_id") + 10000).as("doc_id"), col("text")))
    }

    // A: current door
    def a = Dedup.minhashCandidates(docsAll, "doc_id", "text")
      .agg(count(lit(1)).as("n"))

    // B: alias self-join over ONE banded frame (reuse candidate)
    def b = {
      val banded = Dedup.capBuckets(Dedup.minhashBanded(docsAll, "doc_id", "text", 64, 8, 5), Seq("band", "bucket"), 100000)
      val j = banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"),
          Dedup.jaccardEstExpr(col("sig_a"), col("sig_b"), 64).as("jaccard_est"))
      j.agg(count(lit(1)).as("n"))
    }

    // result equality (counts + jaccard sum)
    val ra = Dedup.minhashCandidates(docsAll, "doc_id", "text")
      .agg(count(lit(1)).as("n"), sum("jaccard_est").as("s")).collect()(0)
    println(s"[probe] A result: $ra")

    def ab(tag: String)(fa: => DataFrame)(fb: => DataFrame): Unit = {
      force(fa); force(fb)
      val as = scala.collection.mutable.ArrayBuffer.empty[Double]
      val bs = scala.collection.mutable.ArrayBuffer.empty[Double]
      (1 to 4).foreach { _ =>
        var t0 = System.nanoTime(); force(fa); as += (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime(); force(fb); bs += (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[probe] $tag A med=${med(as.toSeq)}%6.3f (${as.map(t => f"$t%.2f").mkString(",")})  " +
        f"B med=${med(bs.toSeq)}%6.3f (${bs.map(t => f"$t%.2f").mkString(",")})")
    }
    // C: window-based cap + alias self-join — ONE sign pass total
    def cWindow = {
      import org.apache.spark.sql.expressions.Window
      val banded = Dedup.minhashBanded(docsAll, "doc_id", "text", 64, 8, 5)
      val wn = Window.partitionBy(col("band"), col("bucket"))
      val capped = banded.withColumn("__bsz", count(lit(1)).over(wn))
        .filter(col("__bsz") <= 100000).drop("__bsz")
      val j = capped.alias("a").join(capped.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"),
          Dedup.jaccardEstExpr(col("sig_a"), col("sig_b"), 64).as("jaccard_est"))
      j.agg(count(lit(1)).as("n"))
    }
    val rc = {
      import org.apache.spark.sql.expressions.Window
      val banded = Dedup.minhashBanded(docsAll, "doc_id", "text", 64, 8, 5)
      val wn = Window.partitionBy(col("band"), col("bucket"))
      val capped = banded.withColumn("__bsz", count(lit(1)).over(wn))
        .filter(col("__bsz") <= 100000).drop("__bsz")
      capped.alias("a").join(capped.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"),
          Dedup.jaccardEstExpr(col("sig_a"), col("sig_b"), 64).as("jaccard_est"))
        .agg(count(lit(1)).as("n"), sum("jaccard_est").as("s")).collect()(0)
    }
    println(s"[probe] C result: $rc")
    ab("minhash alias-vs-window")(a)(cWindow)
    ab("minhash cur-vs-alias")(a)(b)
    // did ReuseExchange fire in B? and is B's result identical to A's?
    val bj = {
      val banded = Dedup.capBuckets(Dedup.minhashBanded(docsAll, "doc_id", "text", 64, 8, 5), Seq("band", "bucket"), 100000)
      banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"),
          Dedup.jaccardEstExpr(col("sig_a"), col("sig_b"), 64).as("jaccard_est"))
    }
    val rb = bj.agg(count(lit(1)).as("n"), sum("jaccard_est").as("s")).collect()(0)
    println(s"[probe] B result: $rb")
    bj.collect()
    val plan = bj.queryExecution.executedPlan.toString
    println("[probe] B plan ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).length)
    println("[probe] B plan Exchange count: " + "Exchange".r.findAllIn(plan).length)
    spark.stop()
  }
}

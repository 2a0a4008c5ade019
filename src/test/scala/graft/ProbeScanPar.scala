package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Probe (r18 optimization): the sf parquet fixtures are single-row-group
  * files, so every scan-shaped bench query runs its heavy per-row compute
  * in ONE task (a row group is the atomic split unit — no file-split conf
  * can parallelize it). Quantifies the A/B of repartitioning the narrow
  * key column right after the read (guide §2.5 "input skew: one huge
  * unsplittable file → repartition immediately after the read").
  */
object ProbeScanPar {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).select(sum(col("id"))).collect()

    def force(df: DataFrame): Unit = {
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      ()
    }
    def time3(tag: String)(df: => DataFrame): Unit = {
      force(df) // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); force(df); (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag%-28s med=${ts.sorted.apply(1)}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def k = col("k")
    def xmin = (k % 1000000).cast("double") * 16.0
    def ymin = (k % 16).cast("double") * 16.0
    def w = lit(1.0) + (k % 13).cast("double") / 4.0
    def h = lit(1.0) + (k % 11).cast("double") / 4.0
    def rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)

    val ordersRaw = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
    val par = spark.sparkContext.defaultParallelism

    def overlay(src: DataFrame): DataFrame =
      src.select(rect.as("a"), st_translate(rect, w / 2, lit(0.0)).as("c"))
        .select(st_area(st_intersection(col("a"), col("c"))).as("ia"),
          st_area(st_buffer(col("a"), lit(0.5))).as("ba"))

    time3("overlay AS-IS (1 task)")(overlay(ordersRaw))
    time3(s"overlay repartition($par)")(overlay(ordersRaw.repartition(par)))

    def audio(src: DataFrame): DataFrame = {
      val d = src.select(col("doc_id"))
        .withColumn("wav", graft.pipeline.Multimodal.makeWavSine(
          lit(8192), lit(8192),
          ((lit(64) + col("doc_id") % 8 * 16) * 8).cast("double"), lit(12000)))
      d.select(graft.pipeline.Multimodal.audioSpectral(1024)(col("wav")).as("sp"))
        .agg(sum(col("sp.dominantHz")).as("s"), avg(col("sp.centroidHz")).as("c"))
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time3("audio AS-IS (1 task)")(audio(docs))
    time3(s"audio repartition($par)")(audio(docs.repartition(par)))

    def unionGroups(src: DataFrame): DataFrame =
      src.select((k % 1024).as("grp"), rect.as("g"))
        .groupBy(col("grp"))
        .agg(st_area(st_union_all(col("g"))).as("area"))
    time3("union_groups AS-IS")(unionGroups(ordersRaw))
    time3(s"union_groups repart($par)")(unionGroups(ordersRaw.repartition(par)))

    def q1(src: DataFrame): DataFrame =
      src.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    time3("q1_agg AS-IS")(q1(li))
    time3(s"q1_agg repart($par)")(q1(li.repartition(par)))

    // union_groups keyed repartition: same key as the groupBy, so the
    // aggregation's distribution is already satisfied (no second exchange)
    time3(s"union_groups repart(grp)")(unionGroups(
      ordersRaw.select(k, (k % 1024).as("grp0")).repartition(par, col("grp0")).drop("grp0")))

    def scanMeasure(src: DataFrame): DataFrame =
      src.select(k, rect.as("g"))
        .select(st_area(col("g")).as("area"), st_length(col("g")).as("len"),
          st_x(st_centroid(col("g"))).as("cx"))
    time3("scan_measure AS-IS")(scanMeasure(ordersRaw))
    time3(s"scan_measure repart($par)")(scanMeasure(ordersRaw.repartition(par)))

    def scanPred(src: DataFrame): DataFrame =
      src.select(rect.as("a"), st_translate(rect, w / 2, lit(0.0)).as("c"),
          st_point(xmin + w / 2, ymin + h / 2).as("p"))
        .select(st_intersects(col("a"), col("c")).as("i"),
          st_contains(col("a"), col("p")).as("ct"),
          st_dwithin(col("a"), col("p"), lit(1.0)).as("dw"))
    time3("scan_pred AS-IS")(scanPred(ordersRaw))
    time3(s"scan_pred repart($par)")(scanPred(ordersRaw.repartition(par)))

    def curvedLin(src: DataFrame): DataFrame = {
      val cs = st_circularstring(array(
        array(xmin, ymin), array(xmin + w, ymin + w), array(xmin + w + w, ymin)))
      src.select(st_linearize(cs, lit(32)).as("c"))
        .select(st_length(col("c")).as("len"),
          element_at(st_bounds(col("c")), 4).as("ymax"))
        .agg(sum(col("len")).as("s_len"), sum(col("ymax")).as("s_ymax"))
    }
    time3("curved_lin AS-IS")(curvedLin(ordersRaw))
    time3(s"curved_lin repart($par)")(curvedLin(ordersRaw.repartition(par)))

    def crsScan(src: DataFrame): DataFrame = {
      val g = st_set_srid(st_point(
        (k % 360).cast("double") - 180.0 + 0.5,
        (k % 170).cast("double") / 2.0 - 42.25), lit(4326))
      src.select(st_to_srid(g, lit(3857)).as("m"))
        .agg(sum(st_x(col("m"))).as("sx"), sum(st_y(col("m"))).as("sy"))
    }
    time3("crs_scan AS-IS")(crsScan(ordersRaw))
    time3(s"crs_scan repart($par)")(crsScan(ordersRaw.repartition(par)))

    def text(src: DataFrame): DataFrame = {
      val txt = col("text")
      src.select(
        graft.pipeline.TextAnalysis.tokenCount(txt).as("n_tok"),
        graft.pipeline.TextAnalysis.alphaRatio(txt).as("alpha"),
        graft.pipeline.TextAnalysis.langId(txt).as("lang"),
        graft.pipeline.TextAnalysis.qualityScore(txt).as("q"),
        graft.pipeline.TextAnalysis.fingerprint(txt).as("fp"))
    }
    time3("text AS-IS")(text(docs))
    time3(s"text repart($par)")(text(docs.repartition(par)))

    def minhash(src: DataFrame): DataFrame = {
      val d = src.select(col("doc_id"), col("text"))
      val all = d.unionAll(d.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      graft.pipeline.Dedup.minhashCandidates(all, "doc_id", "text")
        .agg(count(lit(1)).as("n"))
    }
    time3("minhash AS-IS")(minhash(docs))
    time3(s"minhash repart($par)")(minhash(docs.repartition(par)))

    def topk(src: DataFrame): DataFrame = {
      val e = src.select(col("vec_id"), col("embedding"))
      val q = e.filter(col("vec_id") % 10 === 0)
      graft.pipeline.Similarity.bruteForceTopK(e, "vec_id", "embedding",
        q, "vec_id", "embedding", k = 5)
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    time3("topk AS-IS")(topk(emb))
    time3(s"topk repart($par)")(topk(emb.repartition(par)))

    // how many tasks does the as-is scan actually get?
    println("[probe] overlay as-is partitions: " + overlay(ordersRaw).rdd.getNumPartitions)
    spark.stop()
  }
}

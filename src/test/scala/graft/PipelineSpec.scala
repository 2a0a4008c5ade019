package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{Dedup, Similarity, TextAnalysis, Multimodal}

class PipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "The quick brown fox jumps over the lazy dog near the river bank yesterday"), // near-dup of 1
    (3L, "Der schnelle braune Fuchs springt und die Katze ist nicht mit dem Hund"),
    (4L, "Completely different content about database engines and query optimizers"),
    (5L, "The quick brown fox jumps over the lazy dog near the river bank today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup keeps first by order") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(out.count() === 4)
    assert(out.filter($"doc_id" === 5).count() === 0)
    val groups = Dedup.exactGroups(docs, TextAnalysis.normalized($"text"), $"doc_id")
    assert(groups.filter($"copies" === 2).select("kept_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("jaccard on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("a", "b")
    assert(df.select(Dedup.jaccard($"a", $"b")).as[Double].collect()(0) === 0.5)
  }

  test("minhash near-dup finds the near pair, not the distinct pair") {
    val out = Dedup.nearDupMinhash(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 2L)), s"expected (1,2) in $out")
    assert(out.contains((1L, 5L))) // exact dup always caught
    assert(!out.exists(p => p._1 == 4L || p._2 == 4L), s"distinct doc matched: $out")
  }

  test("simhash near-dup") {
    val out = Dedup.nearDupSimhash(docs, "doc_id", "text", maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out.contains((1L, 5L)), s"exact dup must have hamming 0: $out")
    assert(!out.exists(p => Set(p._1, p._2) == Set(3L, 4L)))
  }

  test("embedding near-dup and similarity top-k") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.99f, 0.1f, 0.0f)), // near 1
      (3L, Seq(0.0f, 1.0f, 0.0f)),
      (4L, Seq(0.0f, 0.0f, 1.0f))
    ).toDF("vec_id", "embedding")

    val nd = Dedup.nearDupEmbedding(vecs, "vec_id", "embedding", threshold = 0.98, bits = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(nd === Set((1L, 2L)), s"got $nd")

    val queries = vecs.filter($"vec_id" === 1).toDF("query_id", "embedding")
    val topk = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      queries, "query_id", "embedding", k = 2)
      .select("rank", "corpus_id").as[(Int, Long)].collect().toMap
    assert(topk(1) === 1L) // itself
    assert(topk(2) === 2L) // nearest neighbor

    val lsh = Similarity.lshTopK(vecs, "vec_id", "embedding",
      queries, "query_id", "embedding", k = 2, bits = 2)
    assert(lsh.filter($"rank" === 1).select("corpus_id").as[Long].collect()(0) === 1L)
  }

  test("text analysis: counts, ratios, langid, fingerprint") {
    val df = Seq(("The cat and the dog sat in the house for a while",
      "der hund und die katze ist nicht hier von dem haus")).toDF("en", "de")
    val r = df.select(
      TextAnalysis.tokenCount($"en").as("tc"),
      TextAnalysis.langId($"en").as("lang_en"),
      TextAnalysis.langId($"de").as("lang_de"),
      TextAnalysis.alphaRatio($"en").as("ar"),
      TextAnalysis.fingerprint($"en").as("fp"),
      TextAnalysis.qualityScore($"en").as("q")).collect()(0)
    assert(r.getAs[Int]("tc") === 12)
    assert(r.getAs[String]("lang_en") === "en")
    assert(r.getAs[String]("lang_de") === "de")
    assert(r.getAs[Double]("ar") > 0.7)
    assert(r.getAs[String]("fp").length === 32)
    assert(r.getAs[Double]("q") > 0.3 && r.getAs[Double]("q") <= 1.0)
    // zh detection via CJK
    val zh = Seq("数据 库 引擎 很 快").toDF("t")
      .select(TextAnalysis.langId($"t")).as[String].collect()(0)
    assert(zh === "zh")
  }

  test("multimodal plumbing: schema and frame explode") {
    val media = Seq((1L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)),
      (2L, Array[Byte](9, 9, 9, 9))).toDF("id", "payload")
    val feat = Multimodal.withImageFeatures(media, "payload", featureDim = 8)
    assert(feat.schema("image_meta").dataType.typeName === "struct")
    val row = feat.filter($"id" === 1).select($"image_meta.width", size($"features")).collect()(0)
    assert(row.getInt(0) >= 64)
    assert(row.getInt(1) === 8)
    // deterministic across runs
    val f1 = feat.select($"features").collect()(0).getSeq[Float](0)
    val f2 = Multimodal.withImageFeatures(media, "payload", featureDim = 8)
      .select($"features").collect()(0).getSeq[Float](0)
    assert(f1 === f2)
    val frames = Multimodal.explodeFrames(media, "id", "payload", 4)
    assert(frames.count() === 8)
    assert(frames.columns.toSeq === Seq("id", "frame_idx", "frame"))
  }
}

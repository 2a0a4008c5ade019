package graft

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions._
import scala.collection.mutable.ArrayBuffer

/** Scratch probe: is the union_all cost the udaf machinery or JTS? */
object Probe3 {
  class NoopAgg extends Aggregator[Array[Byte], ArrayBuffer[Array[Byte]], Array[Byte]] {
    def zero: ArrayBuffer[Array[Byte]] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[Array[Byte]], a: Array[Byte]): ArrayBuffer[Array[Byte]] = {
      if (a != null && b.isEmpty) b += a; b
    }
    def merge(a: ArrayBuffer[Array[Byte]], b: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] = {
      a ++= b; a
    }
    def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] =
      if (b.isEmpty) Array.empty else b.head
    def bufferEncoder: Encoder[ArrayBuffer[Array[Byte]]] = Encoders.kryo[ArrayBuffer[Array[Byte]]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def k = col("k")
    def xmin = (k % 100000).cast("double") * 16.0
    def ymin = (k % 16).cast("double") * 16.0
    def w = lit(1.0) + (k % 13).cast("double") / 4.0
    def h = lit(1.0) + (k % 11).cast("double") / 4.0
    def rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    val o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
      .select(col("o_orderkey").as("k"))
    o.select(sum(k)).collect() // warm

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val noop = udaf(new NoopAgg)
    val grouped = o.select((k % 1024).as("grp"), rect.as("g"))
    grouped.groupBy(col("grp")).agg(st_area(st_union_all(col("g")))).explain()
    time("noop kryo agg") {
      grouped.groupBy(col("grp")).agg(length(noop(col("g"))).as("n"))
        .select(sum(col("n"))).collect()
    }
    time("union_all") {
      grouped.groupBy(col("grp")).agg(st_area(st_union_all(col("g"))).as("a"))
        .select(sum(col("a"))).collect()
    }
    spark.stop()
  }
}

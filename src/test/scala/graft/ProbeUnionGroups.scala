package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Probe (r18): decompose geo_union_groups (~4 s at sf0.1). Offline JTS
  * union cost for the exact per-group workload vs the Spark aggregation
  * plumbing (hash map, sort fallback, buffer serialization, exchange).
  */
object ProbeUnionGroups {
  def main(args: Array[String]): Unit = {
    // ---- offline: the exact union kernel work of one group, x1024
    val fact = graft.serde.EWKB.geometryFactory
    def rectG(k: Long): org.locationtech.jts.geom.Geometry = {
      val xmin = (k % 1000000).toDouble * 16.0
      val ymin = (k % 16).toDouble * 16.0
      val w = 1.0 + (k % 13).toDouble / 4.0
      val h = 1.0 + (k % 11).toDouble / 4.0
      fact.toGeometry(new org.locationtech.jts.geom.Envelope(xmin, xmin + w, ymin, ymin + h))
    }
    import scala.jdk.CollectionConverters._
    val groups: Map[Long, Seq[org.locationtech.jts.geom.Geometry]] =
      (0L until 150000L).groupBy(_ % 1024).map { case (g, ks) => g -> ks.map(rectG) }
    // warm
    groups.take(64).foreach { case (_, gs) =>
      org.locationtech.jts.operation.union.UnaryUnionOp.union(gs.asJava)
    }
    var t0 = System.nanoTime()
    groups.foreach { case (_, gs) =>
      org.locationtech.jts.operation.union.UnaryUnionOp.union(gs.asJava)
    }
    println(f"[probe] offline UnaryUnionOp all 1024 groups (1 thread): ${(System.nanoTime() - t0) / 1e9}%.3f s")
    // EWKB serde roundtrip cost of all rows
    val bytes = groups.values.flatten.map(graft.serde.EWKB.write).toArray
    t0 = System.nanoTime()
    var i = 0; var acc = 0L
    while (i < bytes.length) { acc += graft.serde.EWKB.read(bytes(i)).getNumPoints; i += 1 }
    println(f"[probe] offline EWKB read all 150k: ${(System.nanoTime() - t0) / 1e9}%.3f s (acc=$acc)")

    // ---- Spark side
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
        .agg(expr("bit_xor(h)")).collect(); ()
    }
    def time3(tag: String)(df: => DataFrame): Unit = {
      force(df)
      val ts = (1 to 3).map { _ =>
        val t1 = System.nanoTime(); force(df); (System.nanoTime() - t1) / 1e9
      }
      println(f"[probe] $tag%-34s med=${ts.sorted.apply(1)}%7.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    def k = col("k")
    def xmin = (k % 1000000).cast("double") * 16.0
    def ymin = (k % 16).cast("double") * 16.0
    def w = lit(1.0) + (k % 13).cast("double") / 4.0
    def h = lit(1.0) + (k % 11).cast("double") / 4.0
    def rect = st_rectangle(xmin, ymin, xmin + w, ymin + h)
    val dir = "/root/testdata/sf0.1"
    def orders0 = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey").as("k"))
    val par = spark.sparkContext.defaultParallelism

    // full key as benched
    def ug(src: DataFrame): DataFrame =
      src.select((k % 1024).as("grp"), rect.as("g"))
        .groupBy(col("grp")).agg(st_area(st_union_all(col("g"))).as("area"))
    time3("union_groups AS-IS")(ug(orders0))
    // skeleton: same shape, trivial agg (prices scan+shuffle+hashagg skeleton)
    time3("count skeleton")(
      orders0.select((k % 1024).as("grp"), rect.as("g"))
        .groupBy(col("grp")).agg(count(col("g")).as("n")))
    // collect_list of the EWKB then one udf union at finish — separates
    // list accumulation from the ListAgg buffer encoder
    time3("collect_list skeleton")(
      orders0.select((k % 1024).as("grp"), rect.as("g"))
        .groupBy(col("grp")).agg(count_distinct(col("g")).as("n")))
    // spread + keyed repartition variants
    time3("union_groups spread")(ug(orders0.repartition(par)))
    time3("union_groups repart(grp)")(
      ug(orders0.repartition(par, k % 1024)))
    // raise the objecthashagg fallback so the single/32-task hash map
    // holds all 1024 groups without the sort fallback
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
    time3("union_groups fallback=4096")(ug(orders0))
    time3("union_groups spread+fb4096")(ug(orders0.repartition(par)))
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
    spark.stop()
  }
}

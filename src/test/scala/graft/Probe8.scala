package graft

/** Scratch driver: EpsgDb numeric accuracy probes (round trips, origins). */
object Probe8 {
  def main(args: Array[String]): Unit = {
    import graft.functions.EpsgDb

    def rt(code: Int, lon: Double, lat: Double): Unit = {
      val (x, y) = EpsgDb.fromWgs84(lon, lat, code)
      val (lo, la) = EpsgDb.toWgs84(x, y, code)
      println(f"$code%6d  ($lon%9.4f,$lat%8.4f) -> ($x%14.4f,$y%14.4f) -> err (${lo - lon}%10.3e, ${la - lat}%10.3e)")
    }
    for (lon <- Seq(-5.0, -2.0, 0.75); lat <- Seq(50.25, 53.0, 56.5)) rt(27700, lon, lat)
    rt(31370, 4.367486666666666, 50.5)
    rt(25832, 9.0, 50.0)

    // origin probes
    val bng = EpsgDb.table(27700)
    println("bng fwd at OSGB origin: " + bng.proj.forward(-2.0, 49.0))
    val be = EpsgDb.table(31370)
    println("belge fwd at lat0=90: " + be.proj.forward(4.367486666666666, 90.0))
    println("belge fwd at (4.3675, 50.5): " + be.proj.forward(4.367486666666666, 50.5))

    // geodetic <-> XYZ self-consistency on Airy via the public surface:
    // 4277 (geographic) -> 27700 uses Helmert fwd+exact-inverse; compare
    // with the pure-projection forward above
    import graft.serde.EWKB
    import graft.functions.CrsImpl
    val f = EWKB.geometryFactory
    val p = f.createPoint(new org.locationtech.jts.geom.Coordinate(-2.0, 49.0))
    p.setSRID(4277)
    val out = CrsImpl.toSrid(p, 27700)
    println("4277->27700 origin: " + out)
  }
}

package graft.pipeline

/** Scratch probe for the OPQ internals (same package → private access). */
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(43)
    // 1. Procrustes sanity: R = argmax tr(RᵀM) ⇒ RᵀM symmetric PSD
    val d = 8
    val m = Array.fill(d, d)(rnd.nextGaussian())
    val r = Similarity.probeProcrustes(m)
    // orthogonality
    var worstOrtho = 0.0
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(k => r(i)(k) * r(j)(k)).sum
      worstOrtho = math.max(worstOrtho, math.abs(dot - (if (i == j) 1.0 else 0.0)))
    }
    println(s"orthogonality worst deviation: $worstOrtho")
    // RᵀM symmetry
    val rtm = Array.tabulate(d, d)((i, j) =>
      (0 until d).map(k => r(k)(i) * m(k)(j)).sum)
    var worstSym = 0.0
    for (i <- 0 until d; j <- 0 until d)
      worstSym = math.max(worstSym, math.abs(rtm(i)(j) - rtm(j)(i)))
    println(s"RtM symmetry worst deviation: $worstSym")
    // trace vs identity trace (should be >= tr(M) for any orthogonal alt)
    val trR = (0 until d).map(i => rtm(i)(i)).sum
    val trI = (0 until d).map(i => m(i)(i)).sum
    println(s"tr(RtM) = $trR vs tr(M) = $trI (must be >=)")

    // 2. MSE per OPQ iteration on the anisotropic fixture
    val sig = Array.tabulate(16)(i => if (i < 8) 1.0 else 0.05)
    val sample = Array.fill(2000) {
      val v = Array.tabulate(16)(j => rnd.nextGaussian() * sig(j))
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    Similarity.probeOpqMse(sample, mSub = 8, ksub = 16, iters = 12)
  }
}

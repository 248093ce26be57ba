package graft.tools
object KernelMicro {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(7)
    val dim = 64
    val n = 10000
    val refs = Array.fill(n)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val q = Array.fill(dim)(rnd.nextFloat() * 2 - 1)
    // warm
    var s = 0.0
    for (_ <- 0 until 3) s += graft.plans.KnnAvgMicrosExpr.knnAvg(q, refs, 4, true)
    var t0 = System.nanoTime()
    for (_ <- 0 until 100) s += graft.plans.KnnAvgMicrosExpr.knnAvg(q, refs, 4, true)
    println(f"knnAvg over 10k refs: ${(System.nanoTime()-t0)/100/1e6}%.2f ms/row  (${(System.nanoTime()-t0)/100.0/n}%.0f ns/pair)  [$s]")
    // cosine only
    t0 = System.nanoTime()
    var d = 0.0
    var it = 0
    while (it < 100) { var i = 0; while (i < n) { d += graft.plans.CosineSimilarityExpr.cosine(q, refs(i)); i += 1 }; it += 1 }
    println(f"cosine only: ${(System.nanoTime()-t0)/100.0/n}%.0f ns/pair [$d]")
    // round6 only on cosine-like values
    val xs = Array.fill(100000)(rnd.nextDouble() * 2 - 1)
    t0 = System.nanoTime()
    var m = 0L
    it = 0
    while (it < 100) { var i = 0; while (i < xs.length) { m += graft.plans.Round6.micros(graft.plans.Round6.round6(xs(i))); i += 1 }; it += 1 }
    println(f"round6+micros: ${(System.nanoTime()-t0)/100.0/xs.length}%.0f ns/val [$m]")
  }
}

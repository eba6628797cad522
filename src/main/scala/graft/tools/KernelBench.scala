package graft.tools

import org.apache.spark.unsafe.types.UTF8String

import graft.sim.SimKernels

/** Microbenchmark for the scoring kernels on scaling-workload-shaped
  * strings (long filler names, near-dup and cross-entity pairs), so
  * kernel changes can be judged outside the Spark job overhead.
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val rng = new scala.util.Random(42)
    def tokens(k: Int): String =
      (0 until k).map(_ => rng.alphanumeric.take(6).mkString.toLowerCase).mkString(" ")
    // near-dup pair: one substituted token mid-string (same-entity shape)
    val base = tokens(64)
    val toks = base.split(" ")
    val near = toks.updated(32, "zzzzzz").mkString(" ")
    // cross pair: unrelated strings of the same length
    val cross = tokens(64)
    val a = UTF8String.fromString(base)
    val b = UTF8String.fromString(near)
    val c = UTF8String.fromString(cross)

    def bench(name: String)(f: => Double): Unit = {
      var sink = 0.0
      var i = 0
      while (i < n / 10) { sink += f; i += 1 } // warm-up
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { sink += f; i += 1 }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[kbench] $name%-22s ${n / dt}%12.0f ops/s  (${dt * 1e6 / n}%8.2f us/op, sink=$sink%.1f)")
    }

    println(s"[kbench] len(base)=${base.length} n=$n")
    bench("lev near-dup")(SimKernels.levSim(a, b))
    bench("lev cross")(SimKernels.levSim(a, c))
    bench("jw  near-dup")(SimKernels.jaroWinkler(a, b))
    bench("jw  cross")(SimKernels.jaroWinkler(a, c))
    bench("jac near-dup")(SimKernels.tokenJaccard(a, b))
    bench("jac cross")(SimKernels.tokenJaccard(a, c))
  }
}

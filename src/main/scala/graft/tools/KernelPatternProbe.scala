package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.unsafe.types.UTF8String

import graft.sim.SimKernels

/** Isolates WHY the production kernels scale ~0.95 on the thread-local
  * host probe but ~0.49 inside the scoring stage: the only structural
  * difference is the data pattern — the stage scores a different string
  * pair every call, fetched from a shared ~72 MB dim, while the host
  * probe re-scores one L1-resident pair forever. Four access patterns,
  * each at 1 and N threads:
  *
  *   fixed      — one thread-local pair reused (the old host probe)
  *   localArr   — per-thread PRIVATE 160k-name array, sliding-window pair walk
  *   sharedArr  — one SHARED 160k-name array, same walk (the real stage)
  *   sharedRand — shared array, uniformly random pairs (no locality)
  *
  * Usage: KernelPatternProbe [threads] [names] [fillerTokens] [secs]
  */
object KernelPatternProbe {

  private def mkName(rng: scala.util.Random, tokens: Int): UTF8String =
    UTF8String.fromString(
      (0 until tokens).map(_ => rng.alphanumeric.take(6).mkString.toLowerCase)
        .mkString(" "))

  private def mkNames(seed: Int, n: Int, tokens: Int): Array[UTF8String] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n)(mkName(rng, tokens))
  }

  private def score(a: UTF8String, b: UTF8String): Double =
    SimKernels.levSim(a, b) + SimKernels.jaroWinkler(a, b) +
      SimKernels.tokenJaccard(a, b)

  /** ops/sec with `threads` concurrent workers running `body(tid)` per op. */
  private def rate(threads: Int, secs: Int)(mk: Int => () => Double): Double = {
    val stop = new AtomicLong(0)
    val ops = new AtomicLong(0)
    val ts = (0 until threads).map { tid =>
      new Thread(() => {
        val body = mk(tid)
        var local = 0L
        var sink = 0.0
        while (stop.get() == 0) { sink += body(); local += 1 }
        ops.addAndGet(local)
        if (sink == Double.MinValue) println("")
      })
    }
    ts.foreach(_.start()); Thread.sleep(secs * 1000L); stop.set(1)
    ts.foreach(_.join())
    ops.get().toDouble / secs
  }

  def main(args: Array[String]): Unit = {
    val nThreads = if (args.length > 0) args(0).toInt else 4
    val nNames = if (args.length > 1) args(1).toInt else 160000
    val tokens = if (args.length > 2) args(2).toInt else 68
    val secs = if (args.length > 3) args(3).toInt else 5

    val shared = mkNames(1, nNames, tokens)
    val locals = Array.tabulate(nThreads)(t => mkNames(100 + t, nNames, tokens))
    val window = 50 // approximates the sorted pair scan's b-side spread

    def walk(arr: Array[UTF8String], tid: Int): () => Double = {
      val rng = new scala.util.Random(7 * tid + 1)
      var a = rng.nextInt(nNames)
      () => {
        a = (a + 1) % nNames
        val b = (a + 1 + rng.nextInt(window)) % nNames
        score(arr(a), arr(b))
      }
    }
    def rand(arr: Array[UTF8String], tid: Int): () => Double = {
      val rng = new scala.util.Random(13 * tid + 1)
      () => {
        val a = rng.nextInt(nNames)
        val b = rng.nextInt(nNames)
        score(arr(a), arr(b))
      }
    }

    def bench(label: String)(mk: Int => () => Double): Unit = {
      val r1 = rate(1, secs)(mk)
      val rN = rate(nThreads, secs)(mk)
      println(f"[pattern] $label%-10s 1t=$r1%8.0f ops/s  ${nThreads}t=$rN%8.0f  " +
        f"speedup=${rN / r1}%.2fx  eff=${rN / r1 / nThreads}%.3f")
    }

    // JIT warm
    (0 until 20000).foreach { i =>
      score(shared(i % nNames), shared((i * 31 + 7) % nNames))
    }

    bench("fixed") { tid =>
      val rng = new scala.util.Random(tid)
      val a = mkName(rng, tokens); val b = mkName(rng, tokens)
      () => score(a, b)
    }
    bench("localArr") { tid => walk(locals(tid), tid) }
    bench("sharedArr") { tid => walk(shared, tid) }
    bench("sharedRand") { tid => rand(shared, tid) }
  }
}

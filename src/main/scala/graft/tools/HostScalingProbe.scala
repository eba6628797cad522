package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.unsafe.types.UTF8String

import graft.sim.SimKernels

/** Measures the HOST's own thread-scaling ceiling with an embarrassingly
  * parallel, zero-shared-state workload: each thread scores its own
  * private pair corpus with the production kernels (thread-local
  * scratch, no locks, no allocation in steady state). Any departure from
  * linear aggregate throughput here is the machine (vCPU co-scheduling,
  * shared memory system), not the engine — the curve this prints is the
  * upper bound ANY engine can record for N -> 4N thread scaling on this
  * box, and the honest denominator for judging the Spark job's measured
  * efficiency.
  */
object HostScalingProbe {
  def main(args: Array[String]): Unit = {
    val secs = if (args.nonEmpty) args(0).toInt else 10
    val threadCounts =
      if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 2, 4, 8, 16, 32)
    def mkPair(tid: Int): (UTF8String, UTF8String) = {
      val rng = new scala.util.Random(1000 + tid)
      def tokens(k: Int) =
        (0 until k).map(_ => rng.alphanumeric.take(6).mkString.toLowerCase).mkString(" ")
      (UTF8String.fromString(tokens(64)), UTF8String.fromString(tokens(64)))
    }
    var base = -1.0
    for (n <- threadCounts) {
      val stop = new AtomicLong(0)
      val ops = new AtomicLong(0)
      val threads = (0 until n).map { tid =>
        new Thread(() => {
          val (a, b) = mkPair(tid)
          var local = 0L
          var sink = 0.0
          while (stop.get() == 0) {
            sink += SimKernels.levSim(a, b)
            sink += SimKernels.jaroWinkler(a, b)
            sink += SimKernels.tokenJaccard(a, b)
            local += 1
          }
          ops.addAndGet(local)
          if (sink == Double.MinValue) println("") // keep sink alive
        })
      }
      threads.foreach(_.start())
      Thread.sleep(secs * 1000L)
      stop.set(1)
      threads.foreach(_.join())
      val rate = ops.get().toDouble / secs
      if (base < 0) base = rate
      println(f"[host-probe] threads=$n%2d pairs_per_sec=$rate%10.0f " +
        f"speedup=${rate / base}%5.2f per_thread_eff=${rate / base / n}%5.3f")
    }
  }
}

package graft

/** Host memory-bandwidth profile — evidence for BENCH/BASELINE.md.
  *
  * Streams long arrays (read-sum) from T threads and reports aggregate
  * GB/s per thread count. If the MACHINE's 8→32-thread bandwidth scaling
  * is itself far below 4x, then no shuffle/scatter-bound job on this host
  * can scale 4x from local[8] to local[32] — the cluster analogue breaks
  * down because 4N real executors bring 4N memory systems, while 4N local
  * threads share one. No Spark involved: pure JVM threads + primitive
  * arrays.
  *
  * Usage: runMain graft.MemBandwidth [gbPerThreadSet] [reps]
  * Prints one JSON line per thread count.
  */
object MemBandwidth {
  def main(args: Array[String]): Unit = {
    val totalGb = if (args.length > 0) args(0).toDouble else 8.0
    val reps = if (args.length > 1) args(1).toInt else 3
    val threadCounts = Seq(1, 2, 4, 8, 16, 32)
    val words = (totalGb * (1L << 30) / 8).toLong
    // one shared pool of arrays, far larger than LLC; each thread strides
    // its own disjoint chunk
    val chunkWords = (words / 32).toInt
    val chunks = Array.tabulate(32) { c =>
      val a = new Array[Long](chunkWords)
      var i = 0
      while (i < chunkWords) { a(i) = c + i; i += 1 }
      a
    }
    def sumChunk(a: Array[Long]): Long = {
      var s = 0L
      var i = 0
      while (i < a.length) { s += a(i); i += 1 }
      s
    }
    // warmup
    chunks.foreach(sumChunk)
    for (t <- threadCounts) {
      var best = 0.0
      for (_ <- 1 to reps) {
        val t0 = System.nanoTime()
        val threads = (0 until t).map { ti =>
          val th = new Thread(() => {
            // each thread streams 32/t chunks so every run touches the
            // SAME total bytes regardless of thread count
            var c = ti
            var s = 0L
            while (c < 32) { s += sumChunk(chunks(c)); c += t }
            if (s == 42) println("") // defeat dead-code elimination
          })
          th.start(); th
        }
        threads.foreach(_.join())
        val secs = (System.nanoTime() - t0) / 1e9
        val gbps = totalGb / secs
        if (gbps > best) best = gbps
      }
      println(s"""{"bench":"membw","threads":$t,"gb":$totalGb,"gbps":$best}""")
    }

    // DEPENDENT-LOAD latency probe (pointer chase over a shuffled cycle,
    // Sattolo's algorithm — one single-cycle permutation, so every load
    // depends on the previous one and the prefetcher gets nothing).
    // Rationale: tracing GC is latency-bound dependent pointer chasing,
    // not prefetchable streaming — round-5 host phases showed QUIET
    // streaming curves while Spark legs GC-stalled 6x, so this is the
    // probe that can actually see the phase the gate rejects.
    val chaseWords = 1 << 26 // 512 MiB, far beyond LLC
    val perm = new Array[Int](chaseWords)
    var i2 = 0
    while (i2 < chaseWords) { perm(i2) = i2; i2 += 1 }
    val rnd = new java.util.Random(20260819L)
    var k = chaseWords - 1
    while (k > 0) { // Sattolo: single cycle
      val j = rnd.nextInt(k)
      val tmp = perm(k); perm(k) = perm(j); perm(j) = tmp
      k -= 1
    }
    def chase(steps: Int): Double = {
      var p = 0
      var n = 0
      val t0 = System.nanoTime()
      while (n < steps) { p = perm(p); n += 1 }
      if (p == -1) println("")
      (System.nanoTime() - t0).toDouble / steps
    }
    chase(1 << 22) // warmup
    for (t <- Seq(1, 8)) {
      var best = Double.MaxValue
      for (_ <- 1 to reps) {
        val results = new Array[Double](t)
        val threads = (0 until t).map { ti =>
          val th = new Thread(() => results(ti) = chase(1 << 24))
          th.start(); th
        }
        threads.foreach(_.join())
        val avg = results.sum / t
        if (avg < best) best = avg
      }
      println(
        s"""{"bench":"memlat","threads":$t,"ns_per_load":${math.round(best * 10) / 10.0}}""")
    }
  }
}

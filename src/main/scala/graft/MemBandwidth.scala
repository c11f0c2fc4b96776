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
  }
}

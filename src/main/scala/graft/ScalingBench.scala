package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algos.PageRank

/** The two-cluster-size scaling evidence (BASELINE.json:2,14).
  *
  * The north rule demands throughput scaling efficiency >= 0.8 from N to
  * 4N executors on a real cluster; this sandbox has no cluster, so (per
  * the task brief) the SAME job runs on the SAME input at two parallelism
  * levels — local[8] vs local[32] — and efficiency is
  * throughput(32) / (4 * throughput(8)). Each level runs in its own JVM
  * (one SparkContext per JVM): invoke once per level.
  *
  * Usage: runMain graft.ScalingBench <cores> [nRows] [iters]
  * Prints one JSON line:
  *   {"bench":"scaling","cores":N,"edges":E,"iters":I,
  *    "seconds":S,"edges_per_sec":T}
  *
  * The workload is the engine's primary path: synthetic source corpus →
  * co-occurrence edge build → PageRank supersteps over CSR adjacency.
  * Fixed iteration count (tol=0) so both levels do identical work.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val nRows = if (args.length > 1) args(1).toLong else 4000000L
    val iters = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val src = Synth.sourceTable(spark, nRows)
    val edges = EdgeBuilder.edges(src)
      .select(col("src"), col("dst"), col("weight"))
      .as[Edge]
    // materialize edges once so PageRank timing excludes the build
    val cached = edges.localCheckpoint(true)
    val res = PageRank.run(cached, PrConfig(tol = 0.0, maxIter = iters))
    println(
      s"""{"bench":"scaling","cores":$cores,"rows":$nRows,"edges":${res.edgeCount},"iters":${res.iterations},"seconds":${res.wallSeconds},"edges_per_sec":${res.edgesPerSec}}"""
    )
    spark.stop()
  }
}

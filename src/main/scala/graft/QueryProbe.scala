package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE named SparkEntry query (repeatedly) and print its
  * wall time — for isolating a single query's perf without the full
  * Bench sweep. Usage:
  *   runMain graft.QueryProbe <queryName> [reps] [sfDir]
  * Env: SPARK_GRAFT_CPUS (default 32), GRAFT_DEBUG for per-iter lines.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val sfDir =
      if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_DEBUG: report the driver-side Janino compile tax per rep —
    // generated-class compile time is a real component of a query's
    // first-run wall (guide §1: measure before optimizing)
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    def cgSnap(): (Long, Long) =
      (cg.METRIC_COMPILATION_TIME.getCount,
        cg.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum)
    // comma-separated names probe several queries in ONE warm JVM
    name.split(",").foreach { nm =>
      val fn = SparkEntry.queries(nm)
      // GRAFT_EXPLAIN=1: dump the formatted physical plan once before the
      // timing loop (plan audit without a timing rep)
      if (sys.env.get("GRAFT_EXPLAIN").contains("1"))
        fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { i =>
        val (c0, s0) = cgSnap()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        val (c1, s1) = cgSnap()
        println(
          f"[probe] $nm rep=$i rows=$n $wall%.2fs" +
            (if (sys.env.contains("GRAFT_DEBUG"))
               s" codegen_compiles=${c1 - c0} codegen_ms~${s1 - s0}"
             else ""))
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Evidence tool (round 6, guide §1.4): times named queries with the
  * NOOP sink — `df.write.format("noop")` computes every column of every
  * row and discards it, so the wall measures the computation without
  * either output-write cost or `.count()`'s column pruning. NOT part of
  * the frozen measurement surface ([[Bench]] is unchanged); numbers from
  * here are cited in OPTIMIZATION_r06.md as sink-isolated corroboration.
  *
  * Usage: runMain graft.BenchExtra [reps] [query ...]
  * (no query args = every SparkEntry query). Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args.head.toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    val results = names.map { n =>
      val walls = (1 to reps).map { i =>
        spark.sparkContext.setJobDescription(s"noop:$n rep=$i")
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench-extra] $n rep=$i $w%.2fs")
        w
      }
      spark.sparkContext.setJobDescription(null)
      n -> walls
    }
    def f3(v: Double) =
      java.lang.String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results
      .map { case (k, ws) => s"\"$k\":[" + ws.map(f3).mkString(",") + "]" }
      .mkString("{", ",", "}")
    println(
      s"""{"bench":"noop","sf":"$sfDir","unit":"sec","reps":$reps,"queries":$qs}""")
    spark.stop()
  }
}

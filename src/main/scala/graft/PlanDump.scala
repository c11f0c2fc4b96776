package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Evidence tool (round 6): dumps `.explain("formatted")` for named
  * queries to `plans/<tag>/<name>_<suffix>.txt`. Not part of the bench
  * contract — [[Bench]] is the frozen measurement surface; this exists so
  * plan-shape claims in OPTIMIZATION_r06.md are committed artifacts.
  *
  * Usage: runMain graft.PlanDump <suffix> [query ...]
  * (no query args = every SparkEntry query). Env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, GRAFT_PLAN_DIR (default plans/r06).
  *
  * Note: for the iterative kernels the returned frame's plan covers the
  * final derivation only (the loop ran eagerly while building it); the
  * inner-loop shapes are pinned by PlanShapeSpec instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <suffix> [query ...]")
    val suffix = args.head
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_PLAN_DIR", "plans/r06"))
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names =
      if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq
    names.foreach { n =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
      System.err.println(
        f"[plandump] $n -> ${n}_$suffix.txt (${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    spark.stop()
  }
}

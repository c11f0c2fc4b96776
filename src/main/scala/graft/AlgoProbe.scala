package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.algos.{Bfs, Mis, Sssp}

/** Dev tool: run BFS / SSSP over the driver-testdata co-occurrence graph
  * and print convergence evidence (rounds, reached counts, max/total
  * distance) — used to size the unrolled-round oracles (each oracle must
  * unroll at least the engine's measured fixpoint round count; committed
  * numbers in SURVEY §2.B / the oracle comments). Usage:
  *   runMain graft.AlgoProbe [bfs|sssp|both] [sfDir] [minWeight]
  */
object AlgoProbe {
  def main(args: Array[String]): Unit = {
    val which = if (args.length > 0) args(0) else "both"
    val sfDir =
      if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val minW = if (args.length > 2) args(2).toDouble else 2.0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val edges = EdgeBuilder
      .cooccurrence(
        spark.read.parquet(s"$sfDir/lineitem.parquet"),
        "l_orderkey",
        "l_partkey",
      )
      .select(col("src"), col("dst"), col("weight").cast("double"))
      .as[Edge]
      .filter(col("weight") >= minW)
    val seeds = Superstep.vertices(edges).where(col("vid") % 10 === 0)
    val nSeeds = seeds.count()
    if (which == "bfs" || which == "both") {
      val r = Bfs.run(edges, seeds)
      val row = r.dists.agg(count(lit(1)), max(col("dist"))).head()
      println(s"[algoprobe] bfs sf=$sfDir minW=$minW seeds=$nSeeds " +
        s"iterations=${r.iterations} reached=${row.getLong(0)} " +
        s"maxHop=${row.get(1)}")
    }
    if (which == "sssp" || which == "both") {
      val r = Sssp.run(edges, seeds)
      val row = r.dists.agg(count(lit(1)), max(col("dist"))).head()
      println(s"[algoprobe] sssp sf=$sfDir minW=$minW seeds=$nSeeds " +
        s"iterations=${r.iterations} reached=${row.getLong(0)} " +
        s"maxDist=${row.get(1)}")
    }
    if (which == "mis") {
      // portable mode: the exact configuration q_mis's oracle replays
      val r = Mis.run(edges, graft.functions.Hash64.Portable)
      println(s"[algoprobe] mis sf=$sfDir minW=$minW " +
        s"rounds=${r.rounds} misSize=${r.mis.count()}")
    }
    if (which == "coloring") {
      // portable mode: the exact configuration q_coloring's oracle replays
      val r = graft.algos.Coloring
        .speculative(edges, hash = graft.functions.Hash64.Portable)
      val row = r.colors.agg(max(col("color")), count(lit(1))).head()
      println(s"[algoprobe] coloring(speculative) sf=$sfDir minW=$minW " +
        s"rounds=${r.rounds} maxColor=${row.get(0)} verts=${row.getLong(1)}")
    }
    if (which == "coloring-jp") {
      val r = graft.algos.Coloring.run(edges, graft.functions.Hash64.Portable)
      val row = r.colors.agg(max(col("color")), count(lit(1))).head()
      println(s"[algoprobe] coloring(jp) sf=$sfDir minW=$minW " +
        s"rounds=${r.rounds} maxColor=${row.get(0)} verts=${row.getLong(1)}")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import graft.algos.PageRank

/** Dev-only profiling probe for superstep overhead (not part of the API). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "default"
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    val b2 = mode match {
      case "noaqe" => b.config("spark.sql.adaptive.enabled", "false")
      case "nocodegen" => b.config("spark.sql.codegen.wholeStage", "false")
      case "both" => b
          .config("spark.sql.adaptive.enabled", "false")
          .config("spark.sql.codegen.wholeStage", "false")
      case _ => b
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    if (mode == "explain") { explainSuperstep(spark); spark.stop(); return }
    val r = new scala.util.Random(42)
    val g = (1 to 4000)
      .map(_ => ((math.pow(r.nextDouble(), 2.5) * 1000).toLong,
        (math.pow(r.nextDouble(), 2.5) * 1000).toLong))
      .filter { case (a, c) => a != c }.distinct
      .map { case (a, c) => Edge(a, c, 1.0) }
    val ds = spark.createDataset(g)
    val t0 = System.nanoTime()
    val res = PageRank.run(ds, PrConfig(tol = 0.0, maxIter = 25))
    res.ranks.count()
    val total = (System.nanoTime() - t0) / 1e9
    println(s"MODE=$mode total=${"%.1f".format(total)}s iters=${res.iterations}")
    res.perIter.foreach(m =>
      println(f"  iter ${m.iter}%2d  ${m.seconds}%6.2fs  delta=${m.delta}%.3e"))
    spark.stop()
  }

  /** Print the physical plan of one PageRank superstep — the design claim
    * is: ONE exchange total (the message aggregation); the adj⋈state and
    * state⋈msgs joins must be exchange-free (co-partitioned).
    */
  private def explainSuperstep(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val r = new scala.util.Random(42)
    val g = (1 to 4000)
      .map(_ => ((math.pow(r.nextDouble(), 2.5) * 1000).toLong,
        (math.pow(r.nextDouble(), 2.5) * 1000).toLong))
      .filter { case (a, c) => a != c }.distinct
      .map { case (a, c) => Edge(a, c, 1.0) }
    val edges = spark.createDataset(g)
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val adj = Csr.build(edges, p).localCheckpoint(true)
    val state = Superstep.vertices(edges)
      .select(col("vid"), lit(false).as("dangling"), lit(0.001).as("rank"))
      .localCheckpoint(true)
    val msgs = state.join(adj, state("vid") === adj("src"))
      .select(col("rank"),
        explode(arrays_zip(col("dsts"), col("weights"))).as("e"))
      .select(col("e.dsts").as("vid"), (col("rank") * col("e.weights")).as("m"))
      .groupBy("vid").agg(sum("m").as("msg"))
    val next = state.join(msgs, Seq("vid"), "left_outer")
      .select(col("vid"), col("dangling"),
        (lit(0.1) + coalesce(col("msg"), lit(0.0))).as("rank"))
    println("=== ONE SUPERSTEP PLAN ===")
    next.explain("formatted")
    val plan = next.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    println(s"EXCHANGES IN PLAN: $exchanges")
    // superstep 2: does the checkpoint of superstep 1's output (which
    // leaves the SMJ sorted by vid) DECLARE that ordering, eliding the
    // two state-side sorts?
    val state2 = Superstep.cut(next)
    val msgs2 = state2.join(adj, state2("vid") === adj("src"))
      .select(col("rank"),
        explode(arrays_zip(col("dsts"), col("weights"))).as("e"))
      .select(col("e.dsts").as("vid"), (col("rank") * col("e.weights")).as("m"))
      .groupBy("vid").agg(sum("m").as("msg"))
    val next2 = state2.join(msgs2, Seq("vid"), "left_outer")
      .select(col("vid"), col("dangling"),
        (lit(0.1) + coalesce(col("msg"), lit(0.0))).as("rank"))
    val plan2 = next2.queryExecution.executedPlan.toString
    println("=== SUPERSTEP 2 (post-checkpoint state) ===")
    println(plan2)
    println(s"SORTS IN SUPERSTEP 2: ${"Sort ".r.findAllIn(plan2).length}")
  }
}

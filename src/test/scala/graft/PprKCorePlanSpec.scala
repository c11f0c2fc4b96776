package graft

import org.apache.spark.sql.functions._

/** Plan pins for the round-4 graph loops: PPR and k-core supersteps must
  * keep the engine's one-exchange contract (the message aggregation) —
  * the state/adjacency joins stay exchange-free on the shared vid/src
  * hash partitioning. Same guard style as PlanShapeSpec.
  */
class PprKCorePlanSpec extends GraftSuite {
  import spark.implicits._

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ppr/kcore superstep message path = exactly one exchange") {
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val edges = edgeDs(Fixtures.powerlaw1k)
      val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val adj = Csr.build(edges, p).localCheckpoint(true)
      // PPR-shaped state (vid, rank) — the pruned projection Ppr.run
      // scatters per superstep
      val state = Superstep.vertices(edges)
        .select(col("vid"), lit(0.001).as("rank"))
        .localCheckpoint(true)
      val pprMsgs = Superstep.scatter(adj.as[AdjBlock], state)
        .select(col("vid"), (col("w") * col("rank")).as("m"))
        .groupBy("vid").agg(sum("m").as("msg"))
      val pprPlan = pprMsgs.queryExecution.executedPlan.toString
      val pprEx = "Exchange".r.findAllIn(pprPlan).length
      assert(pprEx == 1, s"ppr msgs: expected 1 exchange, got $pprEx:\n$pprPlan")

      // KCore-shaped state: active-filtered (vid) scatter + count
      val kstate = Superstep.vertices(edges)
        .select(col("vid"), lit(true).as("active"))
        .localCheckpoint(true)
      val kMsgs = Superstep
        .scatter(adj.as[AdjBlock], kstate.where(col("active")).select(col("vid")))
        .groupBy("vid").agg(count(lit(1)).as("activeDeg"))
      val kPlan = kMsgs.queryExecution.executedPlan.toString
      val kEx = "Exchange".r.findAllIn(kPlan).length
      assert(kEx == 1, s"kcore msgs: expected 1 exchange, got $kEx:\n$kPlan")
    }
  }
}

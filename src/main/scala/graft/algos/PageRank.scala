package graft.algos

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Per-superstep metrics (also persisted into checkpoint manifests). */
final case class IterMetric(
    iter: Int,
    seconds: Double,
    delta: Double,
    danglingMass: Double,
)

final case class PrResult(
    ranks: Dataset[RankState],
    iterations: Int,
    edgeCount: Long,
    wallSeconds: Double,
    perIter: Seq[IterMetric],
) {
  /** The headline metric of BASELINE.json:2. */
  def edgesPerSec: Double =
    if (wallSeconds > 0) edgeCount.toDouble * iterations / wallSeconds else 0.0
}

/** Distributed PageRank over CSR-blocked adjacency (BASELINE.json:6, B1).
  *
  * Semantics (shared verbatim with the in-repo oracle, SURVEY §7.4.6):
  *   rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)·w(u,v) + danglingMass/N )
  * where w is the out-normalized edge weight and danglingMass is the total
  * rank held by zero-out-degree vertices. Iterate until max|Δ| < tol or
  * maxIter. Float64 throughout; the compare contract is allclose 1e-6
  * (shuffle reduction order is not fixed, so bitwise equality is
  * impossible by design — BASELINE.json:14, SURVEY §7.4.2).
  *
  * Execution shape per superstep (the whole point at 100 TB scale):
  *   1. adj ⋈ state on src=vid — both sides hash-partitioned by the same
  *      key with the same P, so this join is EXCHANGE-FREE;
  *   2. partition-local SpMV: explode the CSR arrays and multiply — stays
  *      inside whole-stage codegen; partial HashAggregate combines
  *      messages per dst BEFORE the shuffle (map-side combine);
  *   3. the ONE shuffle per superstep: final message aggregation by dst;
  *   4. state ⋈ messages on vid — exchange-free again (message agg output
  *      is already hash-partitioned by vid);
  *   5. one action returns (maxDelta, danglingMass, Σrank) for the driver's
  *      convergence decision — dangling mass costs no extra job.
  *
  * Lineage is truncated every `cfg.checkpointEvery` supersteps either via
  * the resumable [[SnapshotStore]] (parquet + manifest with per-partition
  * lineage and these metrics) or `localCheckpoint` — without this the
  * logical plan grows per iteration and planning time/driver memory
  * explode (SURVEY §7.4.1).
  *
  * `salted = true` additionally spreads hub-vertex adjacency chunks across
  * partitions: adjacency is partitioned by (src, salt) and the state side
  * is replicated per salt via a broadcast hub map — trading one cheap
  * state shuffle per superstep for the elimination of hub stragglers
  * (SURVEY §2.A J8). Results are identical either way (tested).
  */
object PageRank {

  private val debug = sys.env.contains("GRAFT_DEBUG")

  def run(
      edges: Dataset[Edge],
      cfg: PrConfig = PrConfig(),
      store: Option[SnapshotStore] = None,
      salted: Boolean = false,
      maxDegPerBlock: Int = 1 << 16,
  ): PrResult = {
    val spark = edges.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val mode =
      if (cfg.weighted) Csr.WeightMode.NormWeighted
      else Csr.WeightMode.NormUniform
    val adjBase = Csr.build(edges, p, mode, maxDegPerBlock)
    val adj =
      (if (salted) adjBase.repartition(p, col("src"), col("salt"))
       else adjBase).persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCnt = Csr.edgeCount(adj) // also materializes the cache
    // hub map for salted state replication: tiny (only vertices whose
    // degree exceeds maxDegPerBlock), broadcast to every task
    val hubs =
      if (salted)
        Some(
          adj.groupBy("src").agg(max("salt").as("maxSalt"))
            .where(col("maxSalt") > 0)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
      else None
    hubs.foreach(_.count())

    val verts = edges.select(col("src").as("vid"))
      .unionByName(edges.select(col("dst").as("vid")))
      .distinct()
    val outs = edges.select(col("src").as("vid")).distinct()
      .withColumn("hasOut", lit(true))
    val n = verts.count().toDouble
    val d = cfg.damping
    val teleport = (1.0 - d) / n

    val resumed = store.flatMap(_.latest(spark))
    var iter = resumed.map(_._1.iteration).getOrElse(0)
    val startIter = iter
    // Lineage is truncated EVERY superstep via eager localCheckpoint: the
    // state plan references the previous state twice (messages + update
    // join), so without truncation the logical plan DOUBLES per iteration
    // — analysis alone goes exponential long before any data is big
    // (SURVEY §7.4.1). localCheckpoint leaves a flat scan of the
    // materialized partitions, which also preserves the hash partitioning
    // for the next superstep's exchange-free joins. Old iterations'
    // blocks are reclaimed by Spark's ContextCleaner once unreferenced.
    var state: DataFrame = (resumed match {
      case Some((_, df)) => df.repartition(p, col("vid"))
      case None =>
        verts.join(outs, Seq("vid"), "left_outer")
          .select(
            col("vid"),
            col("hasOut").isNull.as("dangling"),
            lit(1.0 / n).as("rank"),
          )
    }).localCheckpoint(true)
    var dm = state
      .agg(sum(when(col("dangling"), col("rank")).otherwise(0.0)))
      .head() match {
      case r if r.isNullAt(0) => 0.0
      case r                  => r.getDouble(0)
    }
    var delta = Double.MaxValue
    val perIter = Seq.newBuilder[IterMetric]
    val t0 = System.nanoTime()

    while (iter < cfg.maxIter && delta > cfg.tol) {
      val it0 = System.nanoTime()
      val stateIn =
        if (salted) saltState(state, hubs.get, p) else state
      val msgs = stateIn.join(
          adj,
          if (salted)
            stateIn("vid") === adj("src") && stateIn("salt") === adj("salt")
          else stateIn("vid") === adj("src"),
        )
        .select(
          col("rank"),
          explode(arrays_zip(col("dsts"), col("weights"))).as("e"),
        )
        .select(col("e.dsts").as("vid"), (col("rank") * col("e.weights")).as("m"))
        .groupBy("vid")
        .agg(sum("m").as("msg"))
      val newRank = lit(teleport) +
        lit(d) * (coalesce(col("msg"), lit(0.0)) + lit(dm / n))
      val next = state.join(msgs, Seq("vid"), "left_outer")
        .select(
          col("vid"),
          col("dangling"),
          newRank.as("rank"),
          abs(newRank - col("rank")).as("delta"),
        )
        .localCheckpoint(true)
      val r = next.agg(
          max("delta"),
          sum(when(col("dangling"), col("rank")).otherwise(0.0)),
        ).head()
      delta = r.getDouble(0)
      dm = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      iter += 1
      val secs = (System.nanoTime() - it0) / 1e9
      perIter += IterMetric(iter, secs, delta, dm)
      if (debug)
        println(f"[pagerank] iter $iter%3d ${secs}%6.2fs delta=$delta%.3e")
      state = next.drop("delta")
      val converged = delta <= cfg.tol || iter >= cfg.maxIter
      // durable snapshot for resume (distinct from per-iter lineage cuts)
      if (iter % cfg.checkpointEvery == 0 || converged) store.foreach { s =>
        s.write(
          iter,
          state,
          Map(
            "delta" -> delta,
            "danglingMass" -> dm,
            "seconds" -> secs,
            "edgesTraversed" -> edgeCnt.toDouble,
            "numPartitions" -> p.toDouble,
          ),
        )
      }
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val ranks = state
      .select(col("vid"), col("rank"), col("dangling"))
      .as[RankState]
    adj.unpersist(false)
    hubs.foreach(_.unpersist(false))
    PrResult(ranks, iter - startIter, edgeCnt, wall, perIter.result())
  }

  /** Replicate hub-vertex state rows once per salt chunk (broadcast join on
    * the tiny hub map), so a hub's chunks — spread across partitions by the
    * (src, salt) partitioning — each find their rank. Non-hubs keep salt 0.
    */
  private def saltState(
      state: DataFrame,
      hubs: DataFrame,
      p: Int,
  ): DataFrame =
    state
      .join(broadcast(hubs), state("vid") === hubs("src"), "left_outer")
      .select(
        col("vid"),
        col("rank"),
        explode(
          sequence(lit(0), coalesce(col("maxSalt"), lit(0)))
        ).as("salt"),
      )
      .repartition(p, col("vid"), col("salt"))
}

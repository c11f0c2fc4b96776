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
  *   2. partition-local scatter+combine, two interchangeable forms (the
  *      `spmv` flag): the typed [[graft.LongDoubleMap]] SpMV over the CSR
  *      primitive arrays, or the fully-codegen posexplode + partial
  *      HashAggregate. At small scale (~1M edges) the typed SpMV measured
  *      faster; at 13M+ edges the codegen path wins at every core count
  *      (16M-row run: 4.08M vs 3.78M e/s at 8 cores, 7.36M vs 6.95M at
  *      32) because it allocates NOTHING per row while the typed path's
  *      tuple+array churn turns into GC pressure exactly when many cores
  *      contend — so the form is auto-selected by edge count (`spmv =
  *      None`); pass Some(...) to force one;
  *   3. the ONE shuffle per superstep: final message aggregation by dst,
  *      fed map-combined partials per task;
  *   4. state ⋈ messages on vid — exchange-free again (message agg output
  *      is already hash-partitioned by vid);
  *   5. dangling mass, two strategies picked by the same edge-count
  *      boundary as the scatter form: LARGE graphs fold it in as a
  *      LITERAL — one cheap aggregate job per superstep over the fresh
  *      checkpoint computes max|Δ| and the next dangling sum together
  *      (a BroadcastExchange barrier inside every superstep job is
  *      measurable serial floor at high core counts); SMALL graphs keep
  *      the broadcast one-row aggregate riding the superstep job itself,
  *      where the extra job would cost more than the barrier.
  *
  * Lineage is truncated EVERY superstep via eager localCheckpoint (the
  * state plan references itself twice per iteration — without truncation
  * analysis goes exponential, SURVEY §7.4.1); durable resumable snapshots
  * (parquet + manifest with per-partition lineage and metrics) go through
  * the [[SnapshotStore]] every `cfg.checkpointEvery` supersteps.
  *
  * `salted = true` splits the adjacency once: hub vertices' chunk rows
  * (out-degree > maxDegPerBlock) spread across ALL partitions by
  * (src, salt) and join a BROADCAST of just the hub states, so a hub's
  * scatter parallelizes across the cluster instead of straggling in one
  * partition — with no extra state shuffle (SURVEY §2.A J8). Results are
  * identical either way (tested).
  */
object PageRank {

  private val debug = sys.env.contains("GRAFT_DEBUG")

  def run(
      edges: Dataset[Edge],
      cfg: PrConfig = PrConfig(),
      store: Option[SnapshotStore] = None,
      salted: Boolean = false,
      maxDegPerBlock: Int = 1 << 16,
      spmv: Option[Boolean] = None,
      onLoopStart: () => Unit = () => (),
  ): PrResult = Superstep.withAqeOff(edges.sparkSession) {
    val spark = edges.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val mode =
      if (cfg.weighted) Csr.WeightMode.NormWeighted
      else Csr.WeightMode.NormUniform
    val adjAll = Csr.build(edges, p, mode, maxDegPerBlock)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCnt = Csr.edgeCount(adjAll) // also materializes the cache
    if (edgeCnt == 0) {
      // an empty filter result must not kill a pipeline job: return the
      // empty typed result (no vertices -> no ranks; 1/n is undefined
      // anyway) instead of the round-2 require()
      adjAll.unpersist(false)
      return PrResult(
        spark.emptyDataset[RankState], 0, 0L, 0.0, Seq.empty)
    }
    // auto scatter form (Scaladoc item 2): typed SpMV wins below a few
    // million edges (per-row overhead dominates), codegen above (object
    // churn becomes the multi-core GC ceiling). The same boundary picks
    // the dangling-mass strategy: small graphs take the in-job broadcast
    // aggregate (one action per superstep — per-job overhead dominates
    // small supersteps), large graphs take the driver-literal form (the
    // BroadcastExchange barrier inside every superstep job is measurable
    // serial floor at high core counts).
    val smallGraph = edgeCnt < 4L * 1000 * 1000
    val useSpmv = spmv.getOrElse(smallGraph)
    val literalDm = !smallGraph
    // Salted skew handling (J8): split the adjacency ONCE. Hub vertices
    // (out-degree > maxDegPerBlock, i.e. salt > 0 exists) get their chunk
    // rows spread across ALL partitions by (src, salt); everyone else
    // keeps the plain src-hash partitioning. Per superstep the hub
    // chunks join against a BROADCAST of just the hub states (a handful
    // of rows under any power law), so the hub scatter parallelizes
    // across the cluster with NO extra state shuffle and NO straggler.
    val hubSrcs =
      if (salted)
        Some(
          adjAll.where(col("salt") > 0).select(col("src")).distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
      else None
    val (adj, hubAdj) = hubSrcs match {
      case Some(h) =>
        // the per-superstep hub-state broadcast assumes "a handful of
        // rows"; check it instead of assuming it — a maxDegPerBlock far
        // below the degree distribution would silently broadcast millions
        val hubCnt = h.count()
        require(
          hubCnt <= 4L * 1000 * 1000,
          s"salted mode found $hubCnt hub vertices (deg > $maxDegPerBlock)" +
            " — too many for a per-superstep broadcast; raise maxDegPerBlock",
        )
        if (debug) println(s"[pagerank] salted: $hubCnt hub vertices")
        val normal = adjAll
          .join(broadcast(h), adjAll("src") === h("src"), "left_anti")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val hub = adjAll
          .join(broadcast(h), adjAll("src") === h("src"), "left_semi")
          .repartition(p, col("src"), col("salt"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        normal.count(); hub.count()
        (normal, Some(hub))
      case None => (adjAll.toDF(), None)
    }

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
    // Lineage is truncated EVERY superstep ([[Superstep.cut]] — eager
    // localCheckpoint, storage form adaptive to |V|): the state plan
    // references the previous state twice (messages + update join), so
    // without truncation the logical plan DOUBLES per iteration —
    // analysis alone goes exponential long before any data is big
    // (SURVEY §7.4.1). The cut leaves a flat scan of the materialized
    // partitions, preserving the hash partitioning for the next
    // superstep's exchange-free joins. Old iterations' blocks are
    // reclaimed by Spark's ContextCleaner once unreferenced.
    var state: DataFrame = (resumed match {
      case Some((_, df)) => df.repartition(p, col("vid"))
      case None =>
        verts.join(outs, Seq("vid"), "left_outer")
          .select(
            col("vid"),
            col("hasOut").isNull.as("dangling"),
            lit(1.0 / n).as("rank"),
          )
    })
    state = Superstep.cut(state, n.toLong)
    var delta = Double.MaxValue
    // dangling mass of the CURRENT state (literal-dm mode only)
    var dm =
      if (!literalDm) Double.NaN
      else
        state
          .agg(coalesce(sum(when(col("dangling"), col("rank"))
            .otherwise(0.0)), lit(0.0)))
          .head()
          .getDouble(0)
    val perIter = Seq.newBuilder[IterMetric]
    onLoopStart()
    val t0 = System.nanoTime()

    // Partition-local scatter+combine (BASELINE.json:6) — see item 2 of
    // the Scaladoc for the spmv-vs-codegen measurement history. Both
    // forms emit map-combined partials into the superstep's ONE shuffle.
    // (A cache-blocked SpMV variant sweeping sorted dst ranges with an
    // L2-resident map was also tried and measured slower.)
    def joined(a: DataFrame, st: DataFrame, bcastState: Boolean): DataFrame =
      (if (bcastState) a.join(broadcast(st), a("src") === st("vid"))
       else st.join(a, st("vid") === a("src")))
        .select(col("rank"), col("dsts"), col("weights"), col("uweight"))

    def scatter(
        a: DataFrame,
        st: DataFrame,
        bcastState: Boolean,
    ): DataFrame =
      if (useSpmv)
        joined(a, st, bcastState)
          .as[(Double, Array[Long], Array[Double], Double)]
          .mapPartitions { it =>
            val m = new LongDoubleMap(1 << 12)
            it.foreach { case (rank, dsts, ws, uw) =>
              var i = 0
              if (ws.length == 0) {
                val c = rank * uw
                while (i < dsts.length) { m.add(dsts(i), c); i += 1 }
              } else {
                while (i < dsts.length) { m.add(dsts(i), rank * ws(i)); i += 1 }
              }
            }
            m.iterator
          }
          .toDF("vid", "m")
      else
        // allocation-free alternative: posexplode + the built-in partial
        // HashAggregate stay entirely inside whole-stage codegen on
        // UnsafeRows — no per-row tuples/arrays on the JVM heap, so the
        // GC pressure that caps multi-core scaling disappears; the
        // map-side combine is Spark's own partial aggregation
        joined(a, st, bcastState)
          .select(
            col("rank"),
            col("weights"),
            col("uweight"),
            posexplode(col("dsts")).as(Seq("pos", "vid")),
          )
          .select(
            col("vid"),
            (col("rank") * when(
              size(col("weights")) > 0,
              element_at(col("weights"), col("pos") + 1),
            ).otherwise(col("uweight"))).as("m"),
          )

    while (iter < cfg.maxIter && delta > cfg.tol) {
      val it0 = System.nanoTime()
      val contribs = hubAdj match {
        case Some(ha) =>
          val h = hubSrcs.get
          val hubState =
            state.join(broadcast(h), state("vid") === h("src"), "left_semi")
          scatter(adj, state, bcastState = false)
            .union(scatter(ha, hubState, bcastState = true))
        case None => scatter(adj, state, bcastState = false)
      }
      val msgs = contribs.toDF("vid", "m")
        .groupBy("vid").agg(sum("m").as("msg"))
      val next =
        if (literalDm) {
          val newRank = lit(teleport) +
            lit(d) * (coalesce(col("msg"), lit(0.0)) + lit(dm) / n)
          state.join(msgs, Seq("vid"), "left_outer")
            .select(
              col("vid"),
              col("dangling"),
              newRank.as("rank"),
              abs(newRank - col("rank")).as("delta"),
            )
        } else {
          // small graphs: dangling mass rides the SAME job as a broadcast
          // one-row aggregate — one action per superstep, no extra job
          val dmDf = state.where(col("dangling"))
            .agg(coalesce(sum("rank"), lit(0.0)).as("dmv"))
          val newRank = lit(teleport) +
            lit(d) * (coalesce(col("msg"), lit(0.0)) + col("dmv") / n)
          state.join(msgs, Seq("vid"), "left_outer")
            .join(broadcast(dmDf)) // 1-row cross join
            .select(
              col("vid"),
              col("dangling"),
              newRank.as("rank"),
              abs(newRank - col("rank")).as("delta"),
            )
        }
      val cut = Superstep.cut(next, n.toLong) // the superstep's main action
      iter += 1
      val atMax = iter >= cfg.maxIter
      val wantSnapshot =
        store.isDefined && (iter % cfg.checkpointEvery == 0 || atMax)
      // the post-checkpoint aggregate: ALWAYS in literal-dm mode (the next
      // superstep needs the dangling sum); in broadcast-dm mode only when
      // someone needs the delta (tol > 0, a snapshot, or the end) — a
      // fixed-iteration (tol <= 0) small-graph run stays ONE action per
      // superstep
      if (literalDm || cfg.tol > 0 || wantSnapshot || atMax) {
        val r = cut.agg(
            max("delta"),
            sum(when(col("dangling"), col("rank")).otherwise(0.0)),
          ).head()
        delta = r.getDouble(0)
        dm = if (r.isNullAt(1)) 0.0 else r.getDouble(1)
      }
      val secs = (System.nanoTime() - it0) / 1e9
      perIter += IterMetric(iter, secs, delta, dm)
      if (debug)
        println(f"[pagerank] iter $iter%3d ${secs}%6.2fs delta=$delta%.3e")
      state = cut.drop("delta")
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
    adjAll.unpersist(false)
    hubAdj.foreach(_.unpersist(false))
    hubSrcs.foreach(_.unpersist(false))
    PrResult(ranks, iter - startIter, edgeCnt, wall, perIter.result())
  }
}

package graft.algos

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

final case class HitsResult(
    scores: DataFrame, // (vid, hub, auth) — L1-normalized at output
    iterations: Int,
    edgeCount: Long,
    wallSeconds: Double,
)

/** HITS hubs-and-authorities (Kleinberg 1999, "Authoritative sources in a
  * hyperlinked environment", JACM 46(5)) over the DIRECTED edge table —
  * the co-occurrence builder's canonical `src < dst` orientation, which
  * makes hub and authority genuinely distinct roles (on a symmetrized
  * graph both collapse into eigenvector centrality, already covered by
  * [[Eigen]]).
  *
  * Semantics (mirrored verbatim by the q_hits_top20 DuckDB oracle):
  *   a_0(v)  = 1.0
  *   h_i(u)  = Σ_{u→v} a_{i-1}(v) / Ta_{i-1},   Ta = Σ_v a(v)
  *   a_i(v)  = Σ_{u→v} h_i(u)     / Th_i,       Th = Σ_u h(u)
  *   out     = (h_k / Th_k, a_k / Ta_k)
  * for a FIXED iteration count — the same fixed-k contract as [[Eigen]]
  * (power iteration on E·Eᵀ / Eᵀ·E has no universal convergence
  * guarantee, and a fixed-k spec is the only cross-engine-deterministic
  * one). The L1 normalizer divides INSIDE the scatter term so both
  * engines perform the identical IEEE division per edge (scatter weight
  * is uniformly 1.0, so (1.0·x)/T == x/T bit-exactly); the remaining
  * reduction-order ulps sit far below the e7 output grid, exactly as in
  * the PageRank and eigenvector oracles.
  *
  * Execution shape: the certified superstep contract twice per round —
  * one exchange-free CSR ⋈ state join + ONE message-aggregation shuffle
  * per half-step. The hub half-step scatters along the REVERSED
  * adjacency (h gathers from out-neighbors: messages flow dst→src), the
  * authority half-step along the forward adjacency; both CSRs are built
  * once and persisted columnar. Each half-step's normalizer is folded
  * into its lineage cut via [[Superstep.cutAndAgg]] — two jobs per
  * round, the minimum for two data-dependent global scalars.
  *
  * Like [[Eigen]] and [[Ppr]], this is its own lean loop over the shared
  * Csr/Superstep layers rather than a mode threaded through the
  * scaling-certified [[PageRank.run]] (BENCH/BASELINE.md gate rule 4
  * pins that file).
  */
object Hits {

  private val debug = sys.env.contains("GRAFT_DEBUG")

  def run(
      edges: Dataset[Edge],
      iterations: Int = 8,
  ): HitsResult = Superstep.withAqeOff(edges.sparkSession) {
    val spark = edges.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // persist the caller's edge pipeline once: the two CSR builds and the
    // vertex set each traverse it (the sf0.1 co-occurrence build re-runs
    // 3x per call otherwise — same lesson as Eigen/Ppr)
    val base = edges.persist(StorageLevel.MEMORY_AND_DISK)
    val fwd = Csr.build(base, p, Csr.WeightMode.One)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rev = Csr.build(
      base.select(
        col("dst").as("src"), col("src").as("dst"), col("weight"),
      ).as[Edge],
      p, Csr.WeightMode.One,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    val edgeCnt = Csr.edgeCount(fwd)
    if (edgeCnt == 0) {
      fwd.unpersist(false); rev.unpersist(false); base.unpersist(false)
      return HitsResult(
        spark.emptyDataset[ScoreState].toDF()
          .select(col("vid"), col("score").as("hub"), col("score").as("auth")),
        0, 0L, 0.0)
    }

    val verts = Superstep.vertices(base)
    val nVerts = verts.count()

    // a0 = 1.0 everywhere → Ta0 = n exactly (same literal on both engines)
    var auth: DataFrame =
      Superstep.cut(verts.withColumn("score", lit(1.0)), nVerts)
    var aTot: Double = nVerts.toDouble
    var hub: DataFrame = auth // placeholder until round 1 assigns it
    var hTot: Double = 0.0

    def gather(adj: Dataset[AdjBlock], state: DataFrame, tot: Double) = {
      val msgs = Superstep
        .scatter(adj, state.select(col("vid"), col("score")))
        .select(col("vid"), (col("w") * col("score") / lit(tot)).as("m"))
        .groupBy("vid").agg(sum("m").as("msg"))
      verts
        .join(msgs, Seq("vid"), "left_outer")
        .select(col("vid"), coalesce(col("msg"), lit(0.0)).as("score"))
    }

    var iter = 0
    val t0 = System.nanoTime()
    while (iter < iterations) {
      // hub half-step: h(u) = Σ_{u→v} a(v)/Ta — reversed adjacency
      val (hCut, hRow) =
        Superstep.cutAndAgg(gather(rev, auth, aTot), nVerts, Seq(sum("score")))
      hub = hCut
      hTot = hRow.getDouble(0)
      // authority half-step: a(v) = Σ_{u→v} h(u)/Th — forward adjacency
      val (aCut, aRow) =
        Superstep.cutAndAgg(gather(fwd, hub, hTot), nVerts, Seq(sum("score")))
      auth = aCut
      aTot = aRow.getDouble(0)
      iter += 1
      if (debug) Console.err.println(
        f"[hits] iter=$iter hTot=$hTot%.6f aTot=$aTot%.6f")
    }
    val wall = (System.nanoTime() - t0) / 1e9

    val out = hub.select(col("vid"), (col("score") / lit(hTot)).as("hub"))
      .join(
        auth.select(col("vid"), (col("score") / lit(aTot)).as("auth")),
        Seq("vid"))
    fwd.unpersist(false); rev.unpersist(false); base.unpersist(false)
    HitsResult(out, iter, edgeCnt, wall)
  }
}

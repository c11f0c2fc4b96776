package graft.algos

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** One peeling round's audit row: how many edges dropped, how many
  * survived, and which support-maintenance path ran ("incremental" /
  * "full" / "fixpoint"). Driver-side metadata only — never a Spark plan.
  */
final case class KTrussRound(dropped: Long, alive: Long, path: String)

final case class KTrussResult(
    edges: DataFrame,
    iterations: Int,
    rounds: Seq[KTrussRound] = Nil,
)

/** K-truss decomposition (Cohen 2008): the maximal subgraph in which
  * every edge participates in at least k−2 triangles WITHIN the
  * subgraph — the edge-analogue of k-core, and the standard "cohesive
  * community skeleton" filter for link graphs.
  *
  * Synchronous peeling with INCREMENTAL support maintenance (the round-4
  * verdict's plan-audit item): the full triangle pass runs ONCE to seed
  * per-edge supports; every subsequent round subtracts exactly the
  * triangles DESTROYED by that round's dropped edges instead of
  * recounting the surviving subgraph. A destroyed triangle is any
  * round-start triangle containing ≥1 dropped edge; each such triangle
  * decrements all three of its edges (dropped ones are gone anyway), and
  * a triangle losing several edges in one round is deduplicated on its
  * canonical vertex triple before the decrement, so supports track the
  * alive graph EXACTLY — the surviving edge sequence is identical to
  * full recompute (the q_ktruss oracle and the plain-Scala peeling
  * oracle are unchanged), only the work changes.
  *
  * Destroyed-triangle enumeration costs O(Σ_{(a,b)∈D} deg(a)) — dropped
  * edges joined map-side against the round-start edge set (the dropped
  * side is the small one after the first peel; no adjacency arrays, no
  * re-orientation, no collect_list rebuild). When a round drops a LARGE
  * fraction (8·|D| > |E|, typical only for the first peel of a sparse
  * graph at high k), the exact-count-gated fallback recomputes supports
  * with the full pass instead — both paths compute the same exact
  * supports, so the gate is a pure cost decision and cannot change
  * results. Deterministic throughout (BASELINE.json:14).
  *
  * The seed pass reuses the certified triangle scheme ([[Triangles]]):
  * degree-ordered orientation (oriented out-degree is O(√|E|) even for
  * hubs), sorted-adjacency intersection, supports exploding straight out
  * of the intersection inside one codegen stage.
  */
object KTruss {

  /** Max dropped-edge rows to ship as a broadcast build side: 4M rows of
    * two longs ≈ 64 MB serialized — comfortably under executor broadcast
    * budgets; beyond it the destroyed-triangle joins shuffle instead.
    */
  private val broadcastCap = 4L << 20

  /** @param fullRecountFactor cost gate between the two (result-identical)
    *   support-maintenance paths: a round runs the FULL recount when its
    *   drop count d exceeds m / fullRecountFactor (m = round-start edges),
    *   incremental otherwise. 8 is the measured crossover on the testdata
    *   graphs; pass 1 to force incremental always, Long.MaxValue to force
    *   full always (both used by the equivalence specs and AlgoProbe).
    */
  def run(
      edges: Dataset[Edge],
      k: Int,
      maxIter: Int = 64,
      fullRecountFactor: Long = 8L,
  ): KTrussResult = Superstep.withAqeOff(edges.sparkSession) {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(fullRecountFactor >= 1, "fullRecountFactor must be >= 1")
    val spark = edges.sparkSession
    val minSup = (k - 2).toLong
    val debug = sys.env.get("GRAFT_DEBUG").contains("1")

    // canonical simple edge set, materialized with its count in one job
    val (base, bRow) = Superstep.cutAndAgg(
      edges.toDF()
        .select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"),
        )
        .where(col("a") =!= col("b"))
        .distinct(),
      0L, Seq(count(lit(1))))
    // peeling only shrinks the edge set, so |base| sizes every round's
    // shuffles (see Tuning's Scaladoc)
    val pEff = Tuning.adaptivePartitions(spark, bRow.getLong(0))
    Tuning.withShufflePartitions(spark, pEff) {
    val p = pEff
    // seed: one full support pass over the whole graph
    val tSeed = System.nanoTime()
    var cur: DataFrame = withSupports(base, p)
    var m = cur.count()
    if (debug)
      println(f"[ktruss] seed m=$m wall=${(System.nanoTime() - tSeed) / 1e9}%.2fs")
    var iter = 0
    var converged = m == 0
    val trace = Seq.newBuilder[KTrussRound]
    while (!converged && iter < maxIter) {
      val tRound = System.nanoTime()
      val dropped = cur.where(col("sup") < minSup).select(col("a"), col("b"))
      val alive = cur.where(col("sup") >= minSup)
      val dCut = Superstep.cut(dropped)
      val d = dCut.count()
      iter += 1
      if (d == 0) {
        converged = true
        trace += KTrussRound(0L, m, "fixpoint")
      } else if (d > m / fullRecountFactor) {
        // count-gated fallback: this round rewrites most of the graph —
        // a full recount over the survivors is cheaper than enumerating
        // nearly every triangle as "destroyed"
        if (debug)
          println(s"[ktruss] iter=$iter dropped=$d of $m -> FULL recount")
        cur = withSupports(alive.select(col("a"), col("b")), p)
        trace += KTrussRound(d, m - d, "full")
      } else {
        if (debug)
          println(s"[ktruss] iter=$iter dropped=$d of $m -> incremental")
        // round-start edges, both directions (cur still includes the
        // dropped rows: destroyed triangles existed BEFORE the removal)
        val symCur = cur.select(col("a").as("x"), col("b").as("w"))
          .unionByName(cur.select(col("b").as("x"), col("a").as("w")))
        // w ∈ N(a); triangle iff (b,w) is also a round-start edge. The
        // dropped side is hinted broadcast only below an ABSOLUTE row
        // cap — the relative gate above bounds d ≤ m/factor, which at
        // 10^12 edges is still far past executor memory, so a huge-but-
        // subcritical drop round falls back to a shuffle join instead
        // of a forced driver-side OOM. d is already counted, so the
        // decision is free and deterministic.
        val dSide = if (d <= broadcastCap) broadcast(dCut) else dCut
        val cand = Superstep.cut(
          dSide
            .join(symCur, col("a") === col("x"))
            .where(col("w") =!= col("b"))
            .select(col("a"), col("b"), col("w"))
        )
        // candidate count is exact and already materialized (the cut is
        // eager), so the next two broadcast decisions are deterministic
        // pure-cost choices too: when the destroyed-triangle candidate
        // set is small, BOTH joins against the surviving graph run
        // broadcast-hash — the round streams `cur`/`alive` map-side and
        // never shuffles the surviving edge set.
        val nCand = cand.count()
        val candSide =
          if (nCand <= broadcastCap) broadcast(cand) else cand
        val tri = candSide
          .join(
            cur.select(col("a").as("ea"), col("b").as("eb")),
            least(col("b"), col("w")) === col("ea") &&
              greatest(col("b"), col("w")) === col("eb"),
          )
          .select(array_sort(array(col("a"), col("b"), col("w"))).as("t"))
          .distinct()
        val dec = tri
          .select(
            explode(
              array(
                struct(
                  element_at(col("t"), 1).as("pa"),
                  element_at(col("t"), 2).as("pb")),
                struct(
                  element_at(col("t"), 1).as("pa"),
                  element_at(col("t"), 3).as("pb")),
                struct(
                  element_at(col("t"), 2).as("pa"),
                  element_at(col("t"), 3).as("pb")),
              )
            ).as("e")
          )
          .groupBy(col("e.pa").as("a"), col("e.pb").as("b"))
          .agg(count(lit(1)).as("dc"))
        // |dec| <= 3·|tri| <= 3·|cand|, so the same cand-count decision
        // covers the decrement side (3 longs/row vs cand's 3)
        val decSide =
          if (nCand <= broadcastCap) broadcast(dec) else dec
        cur = Superstep.cut(
          alive
            .join(decSide, Seq("a", "b"), "left_outer")
            .select(
              col("a"),
              col("b"),
              (col("sup") - coalesce(col("dc"), lit(0L))).as("sup"),
            )
        )
        trace += KTrussRound(d, m - d, "incremental")
      }
      if (debug)
        println(f"[ktruss] iter=$iter roundWall=${(System.nanoTime() - tRound) / 1e9}%.2fs")
      // both paths keep exactly the alive rows, so the new edge count is
      // m − d by construction — no extra count action per round
      val m2 = if (converged) m else m - d
      converged = converged || m2 == 0
      m = m2
    }
    KTrussResult(
      cur.where(col("sup") >= minSup)
        .select(col("a").as("src"), col("b").as("dst")),
      iter,
      trace.result(),
    )
    } // withShufflePartitions
  }

  /** Full per-edge support over `es` (canonical (a,b) rows): the seeded
    * triangle pass — degree-ordered orientation, sorted-adjacency
    * intersection, supports exploded in-pass; edges in no triangle get
    * sup 0 via the final left join.
    */
  private def withSupports(es: DataFrame, p: Int): DataFrame = {
    val deg = es.select(col("a").as("vid"))
      .unionByName(es.select(col("b").as("vid")))
      .groupBy("vid").agg(count(lit(1)).as("deg"))
    val lower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = es
      .join(deg.select(col("vid").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("vid").as("b"), col("deg").as("db")), "b")
      .select(
        when(lower, col("a")).otherwise(col("b")).as("u"),
        when(lower, col("b")).otherwise(col("a")).as("v"),
      )
      .repartition(p, col("u"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // supports explode out of the intersection pass as canonical pair
    // rows — adjacency order is by (deg, vid), so least/greatest
    // re-canonicalizes each credited edge
    val sup = oriented
      .join(adj.select(col("u"), col("nbrs").as("nu")), Seq("u"))
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv")), Seq("v"))
      .select(
        col("u"), col("v"),
        array_intersect(col("nu"), col("nv")).as("ws"),
      )
      .where(size(col("ws")) > 0)
      .select(
        explode(
          concat(
            array(struct(
              least(col("u"), col("v")).as("pa"),
              greatest(col("u"), col("v")).as("pb"),
              size(col("ws")).cast("long").as("c"),
            )),
            transform(col("ws"), w => struct(
              least(col("u"), w).as("pa"),
              greatest(col("u"), w).as("pb"),
              lit(1L).as("c"),
            )),
            transform(col("ws"), w => struct(
              least(col("v"), w).as("pa"),
              greatest(col("v"), w).as("pb"),
              lit(1L).as("c"),
            )),
          )
        ).as("t")
      )
      .select(col("t.pa").as("a"), col("t.pb").as("b"), col("t.c").as("c"))
      .groupBy("a", "b").agg(sum("c").as("sup"))
    // cut EAGERLY (localCheckpoint materializes) before dropping the
    // builder caches — unpersisting first would recompute `oriented`
    // four times through the lazy plan
    val out = Superstep.cut(
      es
        .join(sup, Seq("a", "b"), "left_outer")
        .select(
          col("a"),
          col("b"),
          coalesce(col("sup"), lit(0L)).as("sup"),
        )
    )
    oriented.unpersist(false)
    adj.unpersist(false)
    out
  }
}

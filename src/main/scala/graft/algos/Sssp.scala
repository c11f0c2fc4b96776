package graft.algos

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

final case class SsspResult(dists: DataFrame, iterations: Int)

/** Multi-source single-source-shortest-path (Bellman-Ford family): exact
  * minimum total edge WEIGHT from a seed set in the undirected graph — the
  * weighted companion to [[Bfs]] (B family; "cheapest co-occurrence path
  * into the flagged set" over the link graph).
  *
  * Delta-style level-synchronous relaxation: per round only the vertices
  * whose distance IMPROVED last round scatter `dist + w` to their
  * neighbors, the one shuffle takes the per-vertex min candidate, and a
  * vertex re-enters the frontier only when the candidate beats its settled
  * distance. Work per round is proportional to the improved set's
  * out-edges, not |E| — on real graphs the improved set collapses after a
  * few rounds, which is what makes Bellman-Ford viable at 10^12 edges
  * (Dijkstra's priority queue has no distributed analog; delta-stepping's
  * bucket trick is this same "only improved vertices re-scatter" idea).
  * Converges when no distance improves; vertices unreachable from every
  * seed are NOT in the output.
  *
  * Determinism: every reported distance is the fold-left sum of edge
  * weights along some path (relaxation appends one weight at a time on the
  * right), and the min over paths compares those IEEE doubles exactly —
  * both identical in any engine, so the result is exact-match comparable
  * (BASELINE.json:14). With integral co-occurrence weights the sums are
  * exact integers in a double.
  */
object Sssp {

  /** @param seeds one column `vid`; seeds absent from the graph are
    *              ignored. @return (vid, dist) for every REACHED vertex,
    *              dist = min total weight over paths from the seed set.
    */
  def run(
      edges: Dataset[Edge],
      seeds: DataFrame,
      maxIter: Int = 200,
      distinctCanonical: Boolean = false,
  ): SsspResult = Superstep.withAqeOff(edges.sparkSession) {
    val spark = edges.sparkSession
    import spark.implicits._

    // persisted: the CSR build, the vertex set, and the init-state cut
    // all traverse the symmetrized base (see Eigen for the measurement);
    // distinctCanonical callers take the shuffle-free symmetrize
    val simple = edges.filter(col("src") =!= col("dst"))
    val sym =
      (if (distinctCanonical) EdgeBuilder.symmetrizeDistinct(simple)
       else EdgeBuilder.symmetrize(simple))
        .persist(StorageLevel.MEMORY_AND_DISK)
    val symCnt = sym.count() // sizes the adaptive partitions
    val pEff = Tuning.adaptivePartitions(spark, symCnt)
    Tuning.withShufflePartitions(spark, pEff) {
    val p = pEff
    val adj = Csr.buildCut(sym, p, Csr.WeightMode.Raw, approxEntries = symCnt)

    // vertex universe from the packed blocks: exchange-free, ~|V| rows
    // instead of a 2|E| union+distinct (see Superstep.verticesFromAdj)
    val verts = Superstep.verticesFromAdj(adj)
    // (vid, dist, improved) — dist null until reached; seeds start at 0
    // and form the first frontier
    var state: DataFrame = verts
      .join(
        seeds.select(col("vid")).distinct().withColumn("isSeed", lit(true)),
        Seq("vid"),
        "left_outer",
      )
      .select(
        col("vid"),
        when(col("isSeed"), lit(0.0)).otherwise(lit(null).cast("double"))
          .as("dist"),
        coalesce(col("isSeed"), lit(false)).as("improved"),
      )
    val nVerts = verts.count()
    state = Superstep.cut(state, nVerts)
    var frontier = state.where(col("improved")).count()
    var iter = 0
    while (frontier > 0 && iter < maxIter) {
      iter += 1
      // improved vertices scatter dist+w; one shuffle takes the min
      // candidate per touched vertex (map-side partial min combine)
      val cand = Superstep
        .scatter(adj, state.where(col("improved")).select(col("vid"), col("dist")))
        .groupBy("vid").agg(min(col("dist") + col("w")).as("cand"))
      val next = state.join(cand, Seq("vid"), "left_outer")
        .select(
          col("vid"),
          when(
            col("cand") < coalesce(col("dist"), lit(Double.MaxValue)),
            col("cand"),
          ).otherwise(col("dist")).as("dist"),
          (col("cand").isNotNull &&
            col("cand") < coalesce(col("dist"), lit(Double.MaxValue)))
            .as("improved"),
        )
      val (cut, r) = Superstep.cutAndAgg(
        next,
        nVerts,
        Seq(sum(when(col("improved"), 1L).otherwise(0L))),
      )
      state = cut
      frontier = if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    val dists = state.where(col("dist").isNotNull).select(col("vid"), col("dist"))
    adj.unpersist(false)
    sym.unpersist(false)
    SsspResult(dists, iter)
    } // withShufflePartitions
  }
}

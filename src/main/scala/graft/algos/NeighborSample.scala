package graft.algos

import graft.functions.Hash64
import graft.Edge
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic fixed-fanout neighbor sampling — the minibatch
  * subgraph-construction op for GNN training (GraphSAGE, Hamilton et
  * al. NeurIPS 2017): per seed, keep `fanouts(0)` of the seed's
  * neighbors at hop 1, then `fanouts(1)` neighbors of each sampled
  * vertex at hop 2, and so on. The union of sampled blocks is the
  * message-flow graph a trainer consumes.
  *
  * "Sampling" here is hash-ranked, not RNG-ranked, for the same reason
  * as [[Walks]]: rank the (capped) neighbors of `src` by a hash of
  * (hop, seed, src, dst) and keep the smallest `fanouts(hop-1)`. That
  * keeps the pick distributionally uniform per (seed, src) — different
  * seeds sample independently because the seed is in the hash operand —
  * while making the subgraph reproducible, resumable, and cross-engine
  * checkable through the pluggable [[Hash64]] contract (the
  * q_neighbor_sample DuckDB oracle replays every hop bit-identically in
  * portable mode).
  *
  * Scale shape: the adjacency is capped at `maxNbrs` smallest-vid
  * neighbors per vertex BEFORE any per-seed work (WindowGroupLimit
  * pushes the row_number bound into the sort — no task materializes an
  * unbounded hub list), and each hop is one equi-join of the frontier
  * against the capped adjacency followed by one windowed top-k on
  * (seed, src) — also rank-limit-pushed, so per-task state is bounded
  * by the fanout, not the candidate count. Per-seed output is bounded
  * by prod(fanouts); the frontier for hop t+1 is the DISTINCT sampled
  * (seed, dst) set, so repeated vertices collapse instead of forking.
  */
object NeighborSample {

  /** @param seeds one column `vid`; sampling roots. Seeds absent from
    *              the graph produce no rows.
    * @param fanouts per-hop sample sizes, hop 1 first (GraphSAGE S_1,
    *                S_2, ...).
    * @return (seed, hop, src, dst) — the sampled message-flow edges,
    *         hop 1 rows have src == seed.
    */
  def run(
      edges: Dataset[Edge],
      seeds: DataFrame,
      fanouts: Seq[Int],
      maxNbrs: Int = 64,
      hash: Hash64 = Hash64.Xx,
  ): DataFrame = {
    require(
      fanouts.nonEmpty && fanouts.forall(_ >= 1),
      s"fanouts must be non-empty positives, got $fanouts",
    )
    val und = edges.toDF()
      .select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
      )
      .where(col("a") =!= col("b"))
      .distinct()
    val sym = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    // capped adjacency as ROWS (not arrays): each hop re-joins it, and
    // identical subplans share one exchange via ReusedExchange
    val nb = sym
      .withColumn(
        "rn",
        row_number().over(Window.partitionBy(col("src")).orderBy(col("dst"))),
      )
      .where(col("rn") <= maxNbrs)
      .select(col("src"), col("dst"))
    var frontier = seeds.select(col("vid").cast("long").as("seed"))
      .distinct()
      .select(col("seed"), col("seed").as("cur"))
    var out: DataFrame = null
    fanouts.zipWithIndex.foreach { case (f, i) =>
      val hop = i + 1
      // alias both sides: hop >= 2 frontiers carry nb's lineage, so
      // unqualified refs would be ambiguous-self-join errors
      val cand = frontier.alias("fr")
        .join(nb.alias("nb"), col("fr.cur") === col("nb.src"))
        .select(
          col("fr.seed").as("seed"),
          col("nb.src").as("src"),
          col("nb.dst").as("dst"),
        )
      val h = hash.one(
        concat_ws(",", lit(hop), col("seed"), col("src"), col("dst")))
      val w = Window.partitionBy(col("seed"), col("src"))
        .orderBy(h.asc, col("dst").asc)
      val samp = cand.withColumn("rn", row_number().over(w))
        .where(col("rn") <= f)
        .select(col("seed"), lit(hop).as("hop"), col("src"), col("dst"))
      out = if (out == null) samp else out.unionByName(samp)
      frontier = samp.select(col("seed"), col("dst").as("cur")).distinct()
    }
    out
  }
}

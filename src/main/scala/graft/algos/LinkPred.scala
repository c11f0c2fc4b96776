package graft.algos

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Link prediction by the resource-allocation index (Zhou, Lü, Zhang,
  * "Predicting missing links via local information", EPJ B 2009 — the
  * neighbor-weighted relative of common-neighbors/Adamic-Adar):
  *
  *   cn(u,v) = |N(u) ∩ N(v)|
  *   ra(u,v) = Σ_{w ∈ N(u) ∩ N(v)} 1/deg(w)
  *
  * over the simple undirected graph, reported for NON-adjacent pairs only
  * (the "which edge is missing" question — recommending collaborators,
  * predicting future co-occurrence). RA is chosen over Adamic-Adar's
  * 1/ln(deg) deliberately: 1.0/deg is a single correctly-rounded IEEE
  * division that DuckDB reproduces bit-for-bit, while ln() is not exactly
  * specified across runtimes — RA keeps the cross-engine hash contract
  * that every query in this repo carries (same reasoning as the e7
  * quantization notes on the rank queries).
  *
  * Scale shape: the wedge generation is a self-join of the adjacency on
  * the CENTER vertex w, so the work is Σ_w deg(w)² — quadratic in hub
  * degree. `maxDeg` caps it the same way the edge builder's `maxGroup`
  * caps co-occurrence groups: centers with deg(w) > maxDeg are excluded
  * ENTIRELY (from cn and ra both), bounding the work at
  * Σ_w min(deg(w), maxDeg)² with a semantics the oracle mirrors exactly.
  * This is also the standard modeling stance: a hub shared by everyone
  * carries ~zero evidence (its RA term is < 1/maxDeg), so dropping it
  * changes scores by at most |pairs|/maxDeg while removing the one
  * unbounded join key. Shuffles: one for degrees, one for the wedge
  * self-join (both sides hash-partitioned by w), one for the (u,v) score
  * aggregation with map-side combine — no driver-side loops, no
  * collect.
  */
object LinkPred {

  /** @return (src, dst, cn, ra) with src < dst, for non-adjacent pairs
    *         having ≥ 1 counted common neighbor.
    */
  def resourceAllocation(
      edges: Dataset[Edge],
      maxDeg: Int = 1024,
      distinctCanonical: Boolean = false,
  ): DataFrame = {
    // canonical simple edges (co-occurrence tables are already canonical
    // — distinctCanonical callers skip this full-|E| exchange; stays
    // correct for arbitrary directed input without the flag)
    // materialized ONCE (r6): und feeds the wedge chain AND the final
    // non-adjacency anti-join — without the cut each reference re-ran
    // the caller's whole edge pipeline (the co-occurrence build) through
    // the lazy plan
    val und = Superstep.cut(
      if (distinctCanonical)
        edges.toDF().select(col("src").as("a"), col("dst").as("b"))
      else edges.toDF()
        .select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"),
        )
        .where(col("a") =!= col("b"))
        .distinct())
    val sym = und.select(col("a").as("w"), col("b").as("u"))
      .unionByName(und.select(col("b").as("w"), col("a").as("u")))
    val deg = sym.groupBy("w").agg(count(lit(1)).as("deg"))
    // materialized too: both sides of the wedge self-join consume it
    // (each would otherwise redo the sym+deg aggregate chain)
    val capped = Superstep.cut(sym.join(deg, "w").where(col("deg") <= maxDeg))
    val wedges = capped.select(col("w"), col("u"), col("deg"))
      .join(capped.select(col("w"), col("u").as("v")), Seq("w"))
      .where(col("u") < col("v"))
    val scores = wedges
      .groupBy("u", "v")
      .agg(
        count(lit(1)).as("cn"),
        sum(lit(1.0) / col("deg")).as("ra"),
      )
    scores
      .join(
        und,
        scores("u") === und("a") && scores("v") === und("b"),
        "left_anti",
      )
      .select(col("u").as("src"), col("v").as("dst"), col("cn"), col("ra"))
  }
}

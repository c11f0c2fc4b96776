package graft.algos

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

final case class StressResult(
    scores: DataFrame,
    pairs: Long,
    rounds: Int,
)

/** Sampled STRESS centrality (Shimbel 1953; the shortest-path-COUNTING
  * member of Brandes 2008's betweenness variants), T-truncated:
  *
  *   stress_T(v) = Σ_{s ∈ seeds, s ≠ v} σ_s(v) · γ_s(v)
  *
  * the number of shortest paths of length ≤ T from a sampled seed that
  * pass through v as an INTERIOR vertex. Unlike betweenness, whose
  * backward dependency δ(v) = Σ (σ_v/σ_w)(1+δ(w)) is a float ratio,
  * stress factors into two INTEGER surfaces:
  *
  *   forward   σ_s(v) = # shortest s→v paths  (σ finalizes in the round
  *             v is first reached — every predecessor sits exactly one
  *             level up in level-synchronous BFS)
  *   backward  γ_s(v) = Σ_{w: v~w, d(w)=d(v)+1} (1 + γ_s(w))
  *             = # shortest-path tails leaving v downhill
  *
  * so the whole query crosses engines exactly by commutative BIGINT
  * adds — the Katz/HyperBall integer-surface contract — and the q_stress
  * DuckDB oracle replays both sweeps with T unrolled CTEs each. The
  * truncation (paths longer than T ignored, γ = 0 at the horizon) is the
  * deterministic fixed-work contract, and sampling seeds instead of all
  * sources is the standard scale move (Bader & Madduri / Brandes & Pich
  * pivot sampling): at 10^12 edges the cost is K truncated BFS balls,
  * not |V| full sweeps.
  *
  * Execution shape: per round ONE frontier scatter (join on the edge
  * table, hash-partitioned by src) + ONE (seed, vid)-keyed fold; state
  * is the reached pair set, lineage-cut every round. Work per round is
  * proportional to the frontier's out-edges — per-seed balls on the
  * hub-capped weight≥2 subgraph stay small, and pairs partition by
  * (seed, vid) hash so no single seed's ball serializes.
  */
object Stress {

  /** @param seeds one column `vid`; @param rounds the truncation T. */
  def run(
      edges: Dataset[Edge],
      seeds: DataFrame,
      rounds: Int = 4,
      distinctCanonical: Boolean = false,
  ): StressResult = Superstep.withAqeOff(edges.sparkSession) {
    val spark = edges.sparkSession
    // distinctCanonical callers take the shuffle-free symmetrize
    val simple = edges.filter(col("src") =!= col("dst"))
    val sym =
      (if (distinctCanonical) EdgeBuilder.symmetrizeDistinct(simple)
       else EdgeBuilder.symmetrize(simple))
        .select(col("src"), col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    val symCnt = sym.count()
    val pEff = Tuning.adaptivePartitions(spark, symCnt)
    Tuning.withShufflePartitions(spark, pEff) {

    // forward: (seed, vid, dist, sigma); seeds start the frontier
    var state: DataFrame = Superstep.cut(
      seeds.select(col("vid")).distinct()
        .select(
          col("vid").as("seed"),
          col("vid"),
          lit(0).as("dist"),
          lit(1L).as("sigma"),
        ))
    var t = 0
    while (t < rounds) {
      val frontier = state.where(col("dist") === t)
        .select(col("seed"), col("vid"), col("sigma"))
      val msgs = frontier
        .join(sym, frontier("vid") === sym("src"))
        .select(col("seed"), col("dst").as("vid"), col("sigma"))
        .groupBy("seed", "vid").agg(sum("sigma").as("nsigma"))
      t += 1
      // σ finalizes on first touch: only pairs not yet reached join in
      val fresh = msgs.join(
        state.select(col("seed"), col("vid"), lit(true).as("seen")),
        Seq("seed", "vid"),
        "left_outer",
      ).where(col("seen").isNull)
        .select(
          col("seed"), col("vid"),
          lit(t).as("dist"), col("nsigma").as("sigma"),
        )
      state = Superstep.cut(state.unionByName(fresh))
    }

    // backward: γ = 0 at the truncation horizon, then per level down:
    // γ(v) = Σ over downhill edges (1 + γ(w)); carried as a column
    // updated level-by-level (null until the pair's level is swept)
    var g: DataFrame = Superstep.cut(
      state.withColumn(
        "gamma",
        when(col("dist") === rounds, lit(0L)).otherwise(lit(null).cast("long")),
      ))
    var bt = rounds - 1
    while (bt >= 0) {
      val down = g.where(col("dist") === bt + 1)
        .select(col("seed"), col("vid"), col("gamma"))
      val gm = down
        .join(sym, down("vid") === sym("dst"))
        .select(col("seed"), col("src").as("vid"), (col("gamma") + 1L).as("gt"))
        .groupBy("seed", "vid").agg(sum("gt").as("gsum"))
      val next = g.join(gm, Seq("seed", "vid"), "left_outer")
        .select(
          col("seed"), col("vid"), col("dist"), col("sigma"),
          when(col("dist") === bt, coalesce(col("gsum"), lit(0L)))
            .otherwise(col("gamma")).as("gamma"),
        )
      g = Superstep.cut(next)
      bt -= 1
    }

    val scores = g.where(col("vid") =!= col("seed"))
      .groupBy("vid")
      .agg(sum(col("sigma") * col("gamma")).as("stress"))
    val pairs = g.count()
    sym.unpersist(false)
    StressResult(scores, pairs, rounds)
    } // withShufflePartitions
  }
}

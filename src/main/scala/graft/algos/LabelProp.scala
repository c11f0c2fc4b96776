package graft.algos

import graft._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (B3, BASELINE.json:6,14).
  *
  * Each superstep, every vertex adopts the label with the highest total
  * incident edge weight among its neighbors' CURRENT labels; ties break to
  * the SMALLEST label. Runs a fixed number of synchronous iterations (LP
  * has no convergence guarantee). Synchronous update + deterministic
  * tie-break is what makes the exact-match contract achievable — the
  * asynchronous variant is schedule-dependent (SURVEY §2.B B3).
  *
  * Exactness note: label "frequencies" are sums of edge weights. Our edge
  * weights are co-occurrence COUNTS (integer-valued doubles), so the sums
  * are exact regardless of reduction order; arbitrary fractional weights
  * would reintroduce float-order nondeterminism, in which case use
  * weighted=false.
  *
  * The argmax-with-tie-break needs no UDAF: max over struct(cnt, -label)
  * picks the max count and, within equal counts, the max negated label =
  * the smallest label (SURVEY §2.A G7).
  */
object LabelProp {

  def run(
      edges: Dataset[Edge],
      cfg: LpConfig = LpConfig(),
  ): Dataset[LabelState] = Superstep.withAqeOff(edges.sparkSession) {
    val spark = edges.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = if (cfg.symmetrize) EdgeBuilder.symmetrize(edges) else edges
    val mode =
      if (cfg.weighted) Csr.WeightMode.Raw else Csr.WeightMode.One
    val adj = Csr.build(base, p, mode)
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()

    // lineage truncated every superstep — see PageRank for the rationale
    var state = Superstep.vertices(base)
      .select(col("vid"), col("vid").as("label"))
      .localCheckpoint(true)
    var iter = 0
    while (iter < cfg.iterations) {
      val counts = Superstep.scatter(adj, state)
        .groupBy("vid", "label")
        .agg(sum("w").as("cnt"))
      val winners = counts
        .groupBy("vid")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("vid"), (-col("m.nl")).as("newLabel"))
      state = state.join(winners, Seq("vid"), "left_outer")
        .select(
          col("vid"),
          coalesce(col("newLabel"), col("label")).as("label"),
        )
        .localCheckpoint(true)
      iter += 1
    }
    state.select(col("vid"), col("label")).as[LabelState]
  }
}

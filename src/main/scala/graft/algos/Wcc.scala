package graft.algos

import graft._
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Weakly-connected components by minimum-label propagation (B2,
  * BASELINE.json:6,14).
  *
  * Component id = the minimum vertex id reachable in the undirected graph.
  * Min is commutative/associative/idempotent, so the result is independent
  * of partitioning and reduction order — which is what makes the EXACT
  * match contract achievable (SURVEY §7.4.2). Converges in O(diameter)
  * supersteps; each superstep is the standard exchange-free adj⋈state join
  * plus one min-aggregation shuffle. For pathological diameters at the
  * 10^12 design scale the documented upgrade is the two-phase
  * large-star/small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond"), which this API can swap in without changing
  * the contract.
  */
object Wcc {

  def run(
      edges: Dataset[Edge],
      maxIter: Int = 200,
  ): Dataset[CompState] = Superstep.withAqeOff(edges.sparkSession) {
    val spark = edges.sparkSession
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sym = EdgeBuilder.symmetrize(edges)
    val adj = Csr.build(sym, p, Csr.WeightMode.One)
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()

    // lineage truncated every superstep — see PageRank for the rationale
    var state = Superstep.vertices(sym)
      .select(col("vid"), col("vid").as("comp"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (iter < maxIter && changed > 0) {
      val msgs = Superstep.scatter(adj, state)
        .groupBy("vid").agg(min("comp").as("mc"))
      val next = state.join(msgs, Seq("vid"), "left_outer")
        .select(
          col("vid"),
          least(col("comp"), coalesce(col("mc"), col("comp"))).as("comp"),
          (coalesce(col("mc"), col("comp")) < col("comp")).as("changed"),
        )
        .localCheckpoint(true)
      changed = next
        .agg(sum(when(col("changed"), 1L).otherwise(0L))).head().getLong(0)
      state = next.drop("changed")
      iter += 1
    }
    val out = state.select(col("vid"), col("comp")).as[CompState]
    adj.unpersist(false)
    out
  }
}

package graft

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Shared superstep plumbing for the iterative algorithms (SURVEY §2.B E4).
  *
  * The core move: `adj ⋈ state` is exchange-free (both sides hash-
  * partitioned by the vertex key with the same partition count), the CSR
  * arrays are exploded inside whole-stage codegen, and the ONLY shuffle of
  * a superstep is the downstream message aggregation — whose partial
  * (map-side) HashAggregate is Spark's built-in shuffle-reduced combine.
  */
object Superstep {

  /** Distinct vertex ids of an edge table, hash-partitioned by vid. */
  def vertices(edges: Dataset[Edge]): DataFrame =
    edges.select(col("src").as("vid"))
      .unionByName(edges.select(col("dst").as("vid")))
      .distinct()

  /** Scatter: join per-vertex state into the adjacency and emit one row
    * per out-edge: (vid = destination, w = scatter weight, plus every
    * state column except the join key). The caller aggregates.
    */
  def scatter(adj: Dataset[AdjBlock], state: DataFrame): DataFrame = {
    val stateCols =
      state.columns.filter(_ != "vid").map(c => col(c)).toSeq
    state.join(adj, state("vid") === adj("src"))
      .select(
        explode(arrays_zip(col("dsts"), col("weights"))).as("e") +:
          stateCols: _*
      )
      .select(
        col("e.dsts").as("vid") +: col("e.weights").as("w") +: stateCols: _*
      )
  }
}

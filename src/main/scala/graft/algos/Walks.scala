package graft.algos

import graft._
import graft.functions.Hash64
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus over the co-occurrence graph — the
  * input-generation op for graph-embedding training (DeepWalk, Perozzi
  * et al. KDD 2014 / node2vec's p=q=1 case): one fixed-length walk per
  * seed, each step choosing a neighbor by a HASH of
  * (walkId, step, currentVertex) instead of an RNG.
  *
  * Hash-indexed stepping is what makes a "random" walk reproducible,
  * resumable, and cross-engine checkable (BASELINE.json:14's
  * determinism stance): the q_walks DuckDB oracle replays every step
  * bit-identically in portable-hash mode, the same pluggable [[Hash64]]
  * contract every sketch operator uses. Distributionally the pick is
  * uniform over the (capped) sorted neighbor list.
  *
  * Scale shape: the adjacency for walks is the first `maxNbrs`
  * smallest-vid neighbors per vertex — the rank filter runs BEFORE the
  * array is collected (WindowGroupLimit pushes the row_number bound into
  * the sort), so no task ever materializes an unbounded hub list (the
  * same boundedness stance as the edge builder's maxGroup and the
  * link-prediction cap; the cap is part of the operator's semantics and
  * the oracle mirrors it). Each step is one equi-join of the walk
  * frontier against the hash-partitioned neighbor table; `steps` is
  * small (4-16), so the chain stays one codegen-friendly plan with a
  * single action at the end.
  */
object Walks {

  /** @param seeds one column `vid`; walks start there (walkId = seed).
    *              Seeds absent from the graph produce no rows.
    * @return (wid, step, vid) — step 0 is the seed itself.
    */
  def run(
      edges: Dataset[Edge],
      seeds: DataFrame,
      steps: Int,
      maxNbrs: Int = 64,
      hash: Hash64 = Hash64.Xx,
  ): DataFrame = {
    require(steps >= 1, s"steps must be >= 1, got $steps")
    val und = edges.toDF()
      .select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
      )
      .where(col("a") =!= col("b"))
      .distinct()
    val sym = und.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(und.select(col("b").as("src"), col("a").as("dst")))
    val nb = sym
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("src")).orderBy(col("dst"))
        ),
      )
      .where(col("rn") <= maxNbrs)
      .groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    var st = seeds.select(col("vid").as("wid"))
      .distinct()
      .join(nb.select(col("src").as("wid")), Seq("wid"), "left_semi")
      .select(col("wid"), col("wid").as("cur"), array(col("wid")).as("path"))
    for (t <- 1 to steps) {
      val h = hash.one(concat_ws(",", col("wid"), lit(t), col("cur")))
      val nxt = element_at(
        col("nbrs"),
        (pmod(h, size(col("nbrs")).cast("long")) + 1).cast("int"),
      )
      st = st.join(nb, st("cur") === nb("src"))
        .select(
          col("wid"),
          nxt.as("cur"),
          concat(col("path"), array(nxt)).as("path"),
        )
    }
    st.select(col("wid"), posexplode(col("path")).as(Seq("step", "vid")))
  }
}

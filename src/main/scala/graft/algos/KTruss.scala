package graft.algos

import graft._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

final case class KTrussResult(edges: DataFrame, iterations: Int)

/** K-truss decomposition (Cohen 2008): the maximal subgraph in which
  * every edge participates in at least k−2 triangles WITHIN the
  * subgraph — the edge-analogue of k-core, and the standard "cohesive
  * community skeleton" filter for link graphs.
  *
  * Computed by synchronous peeling: each round recomputes per-edge
  * support (triangle count) over the CURRENT edge set and drops every
  * edge below k−2, until a fixpoint. Synchronous removal is order-free,
  * so the surviving edge set is exact-match deterministic
  * (BASELINE.json:14) and a fixpoint round is stable — the q_ktruss
  * DuckDB oracle unrolls rounds PAST convergence harmlessly, exactly
  * like the k-core oracle (measured fixpoint: 2 rounds on every sf
  * corpus; the oracle unrolls 8).
  *
  * Per-round support computation reuses the certified triangle scheme
  * ([[Triangles]]): degree-ordered orientation (the skew kill switch —
  * oriented out-degree is O(√|E|) even for hubs), sorted-adjacency
  * intersection, and the supports explode straight out of the
  * intersection pass into canonical (a,b,c) pair rows inside one codegen
  * stage — edge (u,v) gets |adj(u)∩adj(v)|, and each witness w credits
  * (u,w) and (v,w) once. Orientation must be rebuilt each round because
  * peeling changes degrees. Cost per round = one triangle pass over the
  * surviving subgraph; rounds are bounded by `maxIter`.
  */
object KTruss {

  def run(
      edges: Dataset[Edge],
      k: Int,
      maxIter: Int = 64,
  ): KTrussResult = Superstep.withAqeOff(edges.sparkSession) {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    val spark = edges.sparkSession
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val minSup = (k - 2).toLong

    var cur: DataFrame = Superstep.cut(
      edges.toDF()
        .select(
          least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"),
        )
        .where(col("a") =!= col("b"))
        .distinct()
    )
    var m = cur.count()
    var iter = 0
    var converged = m == 0
    while (!converged && iter < maxIter) {
      val deg = cur.select(col("a").as("vid"))
        .unionByName(cur.select(col("b").as("vid")))
        .groupBy("vid").agg(count(lit(1)).as("deg"))
      val lower = col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b"))
      val oriented = cur
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
      val next = cur.join(sup, Seq("a", "b"))
        .where(col("sup") >= minSup)
        .select(col("a"), col("b"))
      val cutNext = Superstep.cut(next)
      val m2 = cutNext.count()
      oriented.unpersist(false)
      adj.unpersist(false)
      cur = cutNext
      iter += 1
      converged = m2 == m || m2 == 0
      m = m2
    }
    KTrussResult(cur.select(col("a").as("src"), col("b").as("dst")), iter)
  }
}

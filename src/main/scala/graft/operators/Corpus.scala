package graft.operators

import graft.functions.{Hash64, Text}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-data operators: deterministic sampling and
  * term-weight statistics. Like the rest of the layer, built-in
  * expressions only, deterministic outputs, DuckDB-mirrorable.
  */
object Corpus {

  /** Deterministic stratified sample: the `n` rows with the smallest
    * (hash(id), id) per stratum — a reproducible pseudo-random sample
    * with an exact per-stratum quota (the training-data "n docs per
    * source/language" op), stable across runs, partitionings, and
    * engines (no RNG state).
    *
    * Scale shape: `row_number() <= n` over the stratum window triggers
    * Spark's rank-limit pushdown (WindowGroupLimit): each map task
    * pre-selects its own top-n per stratum BEFORE the shuffle, so a
    * hot stratum ships O(tasks·n) rows to the window sort, never its
    * full membership. Plan-pinned in PlanShapeSpec.
    */
  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int,
      hash: Hash64 = Hash64.Xx,
  ): DataFrame = {
    require(n >= 1, "n >= 1")
    val w = Window.partitionBy(strataCol)
      .orderBy(hash.one(col(idCol)), col(idCol))
    df.select(col("*"), row_number().over(w).as("__rk"))
      .where(col("__rk") <= n)
      .drop("__rk")
  }

  /** Per-document top-k TF-IDF terms: tf = term count in the doc,
    * idf = ln(N / df) with df = number of docs containing the term,
    * score = round(tf·idf, 6) (the cross-engine rounding convention),
    * ties broken by term. Returns (id, term, tf, score, rk), rk 1..k.
    *
    * Scale shape: the (doc, term) tf aggregate and the per-term df
    * aggregate both partial-aggregate map-side (a corpus-hot term
    * collapses before the wire); N rides as a broadcast one-row
    * aggregate (no driver action); the final top-k window takes the
    * same WindowGroupLimit pushdown as [[stratifiedSample]].
    */
  def tfidfTopTerms(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
  ): DataFrame = {
    require(k >= 1, "k >= 1")
    val tf = docs
      .select(
        col(idCol).as("id"),
        explode(Text.tokens(lower(col(textCol)))).as("term"),
      )
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df_cnt"))
    val nDf = docs.agg(count(lit(1)).cast("double").as("n"))
    val scored = tf
      .join(dfreq, "term")
      .join(broadcast(nDf)) // 1-row cross join, same pattern as PageRank dm
      .select(
        col("id"),
        col("term"),
        col("tf"),
        round(col("tf") * log(col("n") / col("df_cnt")), 6).as("score"),
      )
    val w = Window.partitionBy("id").orderBy(col("score").desc, col("term"))
    scored
      .select(col("*"), row_number().over(w).cast("long").as("rk"))
      .where(col("rk") <= k)
  }
}

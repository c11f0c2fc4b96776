package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators Spark lacks as built-ins (SURVEY §2.A J10).
  *
  * Composed from existing operators per the preference order (no custom
  * SparkPlan needed): the as-of join is the classic union-and-window
  * formulation — one shuffle over |L|+|R| rows keyed by the join key, no
  * range-explosion, no per-row lookup joins.
  */
object Relational {

  /** As-of join: for every left row, attach the single right row with the
    * same key and the greatest `rightTs` <= `leftTs` (or nulls if none) —
    * e.g. "the user's most recent order at or before this event".
    *
    * Mechanics: tag and union both sides, then one window pass per key
    * ordered by (ts, side) where right rows sort BEFORE left rows at
    * equal ts (<= semantics); `last(right payload, ignoreNulls)` over the
    * unbounded-preceding frame carries the newest right row into each
    * left row. ONE shuffle total (the window partitioning), linear state
    * per key — the scalable shape for this operator. LIMIT: the window
    * partitions by the RAW key, so one hot key's entire history sorts in
    * a single task; when that matters, use [[asofJoinBucketed]] (same
    * semantics, spec-proven equal, per-task state bounded by a coarse
    * time-bucket width at the cost of one extra carry-in pass).
    *
    * Determinism requires (rightKey, rightTs) UNIQUE on the right side
    * (otherwise "the" matching row is ambiguous); pre-dedupe with
    * [[latestPerKeyTs]].
    *
    * Output: every left column, then every right column (null when no
    * match). Column names must not collide across sides.
    */
  /** Shared tagging core for both as-of variants: (rightTagged,
    * leftTagged) with columns (__k, __t, [__b], __side, __r, __l) —
    * right rows carry __side 0 so they sort BEFORE left rows at equal
    * ts (<= semantics).
    */
  private def tagSides(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTs: String,
      rightKey: String,
      rightTs: String,
      bucket: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column],
  ): (DataFrame, DataFrame) = {
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: $overlap")
    def nullStruct(of: DataFrame) =
      lit(null).cast(org.apache.spark.sql.types.StructType(of.schema.fields))
    def side(df: DataFrame, key: String, ts: String, isLeft: Boolean,
        other: DataFrame) =
      df.select(
        Seq(col(key).as("__k"), col(ts).as("__t")) ++
          bucket.map(b => b(col(ts)).as("__b")).toSeq ++
          Seq(
            lit(if (isLeft) 1 else 0).as("__side"),
            (if (isLeft) nullStruct(other)
             else struct(df.columns.map(col): _*)).as("__r"),
            (if (isLeft) struct(df.columns.map(col): _*)
             else nullStruct(other)).as("__l"),
          ): _*
      )
    (
      side(right, rightKey, rightTs, isLeft = false, left),
      side(left, leftKey, leftTs, isLeft = true, right),
    )
  }

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTs: String,
      rightKey: String,
      rightTs: String,
  ): DataFrame = {
    val (rightTagged, leftTagged) =
      tagSides(left, right, leftKey, leftTs, rightKey, rightTs, None)
    val w = Window
      .partitionBy("__k")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    val rightCols = right.columns.map(c => col(s"__m.$c").as(c))
    rightTagged
      .unionByName(leftTagged)
      .select(
        col("__side"),
        col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__m"),
      )
      .where(col("__side") === 1)
      .select(leftCols ++ rightCols: _*)
  }

  /** Hot-key-safe as-of join: identical semantics to [[asofJoin]], but the
    * window partitions by (key, COARSE TIME BUCKET) instead of the raw
    * key, so one viral key's entire history never serializes into a
    * single task — the per-task state is bounded by the bucket width, and
    * a hot key splits across as many tasks as it spans buckets.
    *
    * Mechanics (two passes instead of one):
    *   1. the [[asofJoin]] union-and-window pass, partitioned by
    *      (key, bucket(ts)) — matches rights within the left row's own
    *      bucket;
    *   2. a carry-in pass for left rows whose bucket has no earlier right
    *      row: per (key, bucket), the latest right row (`max(struct(ts,
    *      payload))` — map-side combinable, no window over the raw key),
    *      then a window over each key's BUCKETS (one row per bucket —
    *      bounded by the time range, not the row count) carries the
    *      newest right row of any earlier bucket forward; a final
    *      (key, bucket) equi-join + coalesce picks within-bucket match
    *      first, carry-in otherwise.
    *
    * `bucket` must be a monotone non-decreasing, orderable function of
    * the timestamp applied identically to both sides (e.g.
    * `date_trunc("month", _)` or integer division for long ts). Same
    * determinism contract as [[asofJoin]]: (rightKey, rightTs) unique.
    */
  def asofJoinBucketed(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTs: String,
      rightKey: String,
      rightTs: String,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
  ): DataFrame = {
    val (rightTagged, leftTagged) =
      tagSides(left, right, leftKey, leftTs, rightKey, rightTs, Some(bucket))
    val w = Window
      .partitionBy("__k", "__b")
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = rightTagged
      .unionByName(leftTagged)
      .select(
        col("__k"),
        col("__b"),
        col("__side"),
        col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__m"),
      )
      .where(col("__side") === 1)
    // carry-in: newest right row of any EARLIER bucket, per (key, bucket).
    // One row per (key, bucket) — the window below is over a key's bucket
    // COUNT (bounded by time range / bucket width), never its row count.
    val rb = rightTagged
      .groupBy(col("__k"), col("__b"))
      .agg(max(struct(col("__t"), col("__r"))).as("__mx"))
    val allKB = leftTagged.select(col("__k"), col("__b"))
      .unionByName(rightTagged.select(col("__k"), col("__b")))
      .distinct()
      .join(rb, Seq("__k", "__b"), "left_outer")
    val wB = Window
      .partitionBy("__k")
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allKB.select(
      col("__k"),
      col("__b"),
      last(col("__mx"), ignoreNulls = true).over(wB).as("__c"),
    )
    val leftCols = left.columns.map(c => col(s"__l.$c").as(c))
    // coalesce the STRUCTS, not the fields: a within-bucket match whose
    // payload field is legitimately NULL must not fall through to the
    // carry-in row's value for that one field (chimera row mixing two
    // right rows); __m is NULL exactly when no within-bucket right
    // precedes the left row, which is the only case carry-in may fill
    val best = coalesce(col("__m"), col("__c.__r"))
    val rightCols = right.columns.map(c => best.getField(c).as(c))
    within
      .join(carry, Seq("__k", "__b"), "left_outer")
      .select(leftCols ++ rightCols: _*)
  }

  /** Deterministic (key, ts) dedup helper for the as-of right side: keeps
    * the row with the greatest `tieCol` per (key, ts).
    */
  def latestPerKeyTs(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
  ): DataFrame = {
    val w = Window.partitionBy(keyCol, tsCol).orderBy(col(tieCol).desc)
    df.select(col("*"), row_number().over(w).as("__rn"))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}

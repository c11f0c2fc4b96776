package org.apache.spark.sql.graftinternal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Minimal private[sql] bridge (the standard Spark-connector pattern of a
  * shim under `org.apache.spark.sql`): re-DECLARE physical layout facts
  * Catalyst cannot infer, using the same `LogicalRDD` mechanism that
  * `Dataset.localCheckpoint` itself uses to preserve partitioning and
  * ordering across a lineage cut.
  */
object Internals {

  /** Wrap `df`'s physical RDD in a scan that declares
    * `HashPartitioning(hashCol, n)` and `[sortCols ASC]` WITHOUT moving
    * any data.
    *
    * ONLY correct when the rows are already factually laid out that way —
    * e.g. after `repartition(n, col) → sortWithinPartitions → a
    * partition-local mapPartitions` whose output stays in place: the
    * narrow transform erases the catalyst metadata but not the physical
    * placement, and without this shim the only way to get the metadata
    * back is a SECOND full shuffle+sort of the transformed data
    * (`repartition` again), which at the design scale re-shuffles the
    * entire packed adjacency for nothing.
    */
  def assumeHashPartitioned(
      df: DataFrame,
      hashCol: String,
      n: Int,
      sortCols: Seq[String],
  ): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val attrs = df.queryExecution.analyzed.output
    def attr(name: String) = attrs
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"no column $name in ${attrs.map(_.name)}"))
    val partitioning = HashPartitioning(Seq(attr(hashCol)), n)
    val ordering = sortCols.map(c => SortOrder(attr(c), Ascending))
    val rdd0 = df.queryExecution.toRdd
    // cheap sanity guard: a caller whose upstream does NOT actually have
    // n partitions would silently produce wrong exchange-free joins; the
    // partition count is free to check (driver-side metadata only).
    // Exception: an EMPTY upstream (Catalyst's empty-relation propagation
    // collapses it to 0/1 partitions) — no rows, no layout to violate,
    // but the declared n-partition layout must still be PHYSICALLY true:
    // a downstream exchange-free zip join would throw on unequal
    // partition counts. Substitute an n-partition empty RDD. The isEmpty
    // job only runs on the mismatch path and costs ~nothing there. Full
    // per-row hash validation stays opt-in via the debug property (it
    // forces an extra pass over the data).
    val rdd =
      if (rdd0.getNumPartitions == n) rdd0
      else {
        require(rdd0.isEmpty(),
          s"assumeHashPartitioned($hashCol, $n): upstream has " +
            s"${rdd0.getNumPartitions} partitions — the declared layout " +
            "is false")
        spark.sparkContext.parallelize(
          Seq.empty[org.apache.spark.sql.catalyst.InternalRow], n)
      }
    if (sys.props.get("graft.internals.verifyLayout").contains("true")) {
      val hashIdx = attrs.indexWhere(_.name == hashCol)
      val bad = rdd.mapPartitionsWithIndex { (pid, rows) =>
        // allocation-free per row: the same murmur3(long, seed=42) + pmod
        // that HashPartitioning's partitionIdExpression computes
        val mismatched = rows.exists { r =>
          val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
            .hashLong(r.getLong(hashIdx), 42)
          ((h % n) + n) % n != pid
        }
        if (mismatched) Iterator.single(pid) else Iterator.empty
      }.take(1)
      require(bad.isEmpty,
        s"assumeHashPartitioned($hashCol, $n): rows in partition " +
          s"${bad.headOption.getOrElse(-1)} violate the declared hash layout")
    }
    Dataset.ofRows(
      spark,
      LogicalRDD(attrs, rdd, partitioning, ordering,
        isStreaming = false)(spark),
    )
  }
}

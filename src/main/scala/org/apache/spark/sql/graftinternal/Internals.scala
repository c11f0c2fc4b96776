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
    Dataset.ofRows(
      spark,
      LogicalRDD(attrs, df.queryExecution.toRdd, partitioning, ordering,
        isStreaming = false)(spark),
    )
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Scale-adaptive parallelism for the AQE-off superstep kernels (guide
  * §2.2/§2.5: partition counts must follow DATA SIZE, not a constant
  * tuned for either local mode or one cluster).
  *
  * The iterative kernels run with AQE disabled (the lineage-cut
  * partitioning contract — see [[Superstep.withAqeOff]]), so they never
  * benefit from AQE's small-partition coalescing: every message exchange
  * pays `spark.sql.shuffle.partitions` tasks even when the active state
  * is a few hundred rows (the SCC peeling endgame, the %16 condensation
  * slice, the weight>=2 subgraphs). This helper is the manual analogue
  * of AQE coalescing for those loops: partitions are DERIVED from the
  * measured input size (rows / `spark.graft.rowsPerPartition`, default
  * 64k) and CAPPED by the session's `spark.sql.shuffle.partitions`.
  *
  * Production behaviour at 10^12-edge scale: rows/64k far exceeds any
  * sane conf value, so the cap binds and the kernels run at exactly the
  * operator-chosen parallelism — the adaptation can only kick in when a
  * state is small enough that full-width shuffles are pure scheduling
  * overhead, which is precisely the regime (active-set endgames) where
  * fewer, fuller partitions win at any scale. Both knobs stay conf-
  * driven; nothing is tuned to the local core count.
  */
object Tuning {

  val RowsPerPartitionKey = "spark.graft.rowsPerPartition"
  val DefaultRowsPerPartition = 64L * 1024

  /** Partition count for a loop whose per-round state/message volume is
    * ~`rows`: ceil(rows/target) clamped to [1, conf shuffle partitions].
    */
  def adaptivePartitions(spark: SparkSession, rows: Long): Int = {
    val confP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val target = spark.conf.getOption(RowsPerPartitionKey)
      .map(_.toLong).getOrElse(DefaultRowsPerPartition)
    val derived = math.max(1L, (rows + target - 1) / math.max(1L, target))
    math.max(1, math.min(confP.toLong, derived).toInt)
  }

  /** Run `body` with `spark.sql.shuffle.partitions` set to `p`,
    * restoring the previous value afterwards — the same save/restore
    * device as [[Superstep.withAqeOff]]. Safe to nest.
    */
  def withShufflePartitions[T](spark: SparkSession, p: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, p.toString)
    try body
    finally spark.conf.set(key, prev)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N-vs-4N scaling evidence for the TRAINING-DATA layer (companion to
  * [[ScalingBench]], which covers the graph layer's PageRank path).
  *
  * Workload: [[Synth.docTable]] (deterministic corpus, 10% planted
  * near-dups) → [[graft.operators.Dedup.nearDupClusters]] — the full
  * production dedup: shingles → minhash signatures → banded candidate
  * join → exact-Jaccard verify → components → survivor selection. This
  * is hash/CPU-heavy where PageRank is bandwidth-heavy, so it probes the
  * OTHER scaling regime of the host.
  *
  * Protocol mirrors ScalingBench: one JVM per parallelism level, caller
  * confines with `taskset -c 0-(N-1)`, shuffle partitions PINNED across
  * levels (32) so both levels run the identical plan, fixed input.
  *
  * Usage: runMain graft.DedupScaleBench <cores> [nDocs] [tokensPerDoc]
  * Prints one JSON line:
  *   {"bench":"dedup_scaling","cores":N,"docs":D,"dropped":K,
  *    "seconds":S,"docs_per_sec":T,"gc_sec":G,"cpu_sec":C}
  */
object DedupScaleBench {
  def main(rawArgs: Array[String]): Unit = {
    val args = rawArgs.filter(_.nonEmpty)
    val cores = args(0).toInt
    val nDocs = if (args.length > 1) args(1).toLong else 30000L
    val tokens = if (args.length > 2) args(2).toInt else 40
    val partitions = sys.env.getOrElse("GRAFT_PARTITIONS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", partitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "48g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Superstep.cut(Synth.docTable(spark, nDocs, tokens))
    docs.count() // corpus materialized OUTSIDE the timed window

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gc0 = gcMs
    val cpu0 = osBean.getProcessCpuTime
    val t0 = System.nanoTime()
    val dropped = operators.Dedup
      .nearDupClusters(docs, "doc_id", "text", threshold = 0.5)
      .where(!col("is_survivor"))
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    val gcSec = (gcMs - gc0) / 1e3
    val cpuSec = (osBean.getProcessCpuTime - cpu0) / 1e9
    // planted dups = nDocs/10; LSH recall at J~0.74 with r=3/b=10 is
    // ~0.99, so a collapse here means the pipeline broke, not noise
    require(dropped > nDocs / 20,
      s"implausibly few dropped docs ($dropped of $nDocs)")
    println(
      s"""{"bench":"dedup_scaling","cores":$cores,"docs":$nDocs,""" +
        s""""tokens_per_doc":$tokens,"partitions":$partitions,""" +
        s""""dropped":$dropped,"seconds":$secs,""" +
        s""""docs_per_sec":${nDocs / secs},"gc_sec":$gcSec,""" +
        s""""cpu_sec":$cpuSec}""")
    spark.stop()
  }
}

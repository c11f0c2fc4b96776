package graft

import graft.algos.Louvain
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev tool: per-piece timing of one Louvain move round on the driver
  * testdata graph — pinpoints which stage of the round dominates (the
  * round walls alone showed q_louvain as the most expensive driver
  * query). Usage: runMain graft.LouvainProbe [sfDir]
  */
object LouvainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val p = cpus.toInt

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[louvainprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      out
    }

    Superstep.withAqeOff(spark) {
      val edges = EdgeBuilder
        .cooccurrence(
          spark.read.parquet(s"$sfDir/lineitem.parquet"),
          "l_orderkey",
          "l_partkey",
        )
        .select(col("src"), col("dst"), col("weight").cast("double"))
        .as[Edge]
      val base = EdgeBuilder.symmetrize(edges)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val adj = Csr.build(base, p, Csr.WeightMode.One)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val adjCount = timed("csr-build+count")(adj.count())
      val m = base.count() / 2
      val degDf = Superstep.cut(
        base.toDF().groupBy(col("src")).agg(count(lit(1)).as("deg"))
          .select(col("src").as("vid"), col("deg"))
      )
      val twoM = lit(2L * m).cast("decimal(38,0)")
      val state0 = Superstep.cut(Superstep.vertices(base), adjCount)
        .select(col("vid"), col("vid").as("comm"))
      println(s"[louvainprobe] verts=${state0.count()} symEdges=${base.count()}")

      // piece-by-piece, each cut to force execution of JUST that piece
      val scat = timed("scatter+preReduce (kTab input)") {
        val partials = Superstep.scatter(adj, state0)
          .select(col("vid"), col("comm"), col("w"))
          .as[(Long, Long, Double)]
          .mapPartitions { it =>
            val mm = new LongLongDoubleMap(1 << 12)
            it.foreach { case (v, c, w) => mm.add(v, c, w) }
            mm.iterator
          }
          .toDF("vid", "nc", "kw")
        val c = Superstep.cut(partials, adjCount)
        println(s"[louvainprobe]   partial rows=${c.count()}")
        c
      }
      val kTab = timed("kTab repartition+sum") {
        val k = Superstep.cut(
          scat.repartition(p, col("vid"))
            .groupBy("vid", "nc").agg(sum("kw").cast("long").as("k")))
        println(s"[louvainprobe]   kTab rows=${k.count()}")
        k
      }
      val ctot = timed("ctot") {
        val c = Superstep.cut(
          state0.join(degDf, "vid")
            .groupBy("comm").agg(sum("deg").as("tot"), count(lit(1)).as("csz"))
            .select(col("comm").as("nc"), col("tot"), col("csz")))
        c.count(); c
      }
      val kAll = timed("kAll union+groupBy") {
        val k = Superstep.cut(
          kTab.unionByName(
            state0.select(col("vid"), col("comm").as("nc"), lit(0L).as("k")))
            .repartition(p, col("vid"))
            .groupBy("vid", "nc").agg(max("k").as("k")))
        k.count(); k
      }
      val cand = timed("cand joins+decimal gain") {
        val c = Superstep.cut(
          kAll.join(state0, "vid").join(degDf, "vid")
            .join(broadcast(ctot), "nc")
            .select(
              col("vid"), col("nc"), col("comm"), col("csz"),
              (twoM * col("k")
                - col("deg").cast("decimal(38,0)")
                  * (col("tot") - when(col("nc") === col("comm"), col("deg"))
                    .otherwise(lit(0L)))).as("gain")))
        println(s"[louvainprobe]   cand rows=${c.count()}")
        c
      }
      timed("stay+argmax+next state") {
        val stay = cand.where(col("nc") === col("comm"))
          .select(col("vid"), col("gain").as("stay"), col("csz").as("ownsz"))
        val best = cand.join(stay, "vid")
          .where(col("nc") === col("comm")
            || !(col("csz") === 1L && col("ownsz") === 1L
              && col("nc") > col("comm")))
          .groupBy("vid")
          .agg(max(struct(col("gain"), (-col("nc")).as("nn"))).as("b"))
          .select(col("vid"), (-col("b.nn")).as("bnc"), col("b.gain").as("bgain"))
        val parity = ((col("vid") % 2) + 2) % 2
        val next = state0.join(stay, Seq("vid")).join(best, Seq("vid"))
          .select(col("vid"),
            when(parity === lit(1), col("bnc")).otherwise(col("comm"))
              .as("comm"))
        Superstep.cut(next, adjCount).count()
      }
      // and the real thing, twice, for reference
      timed("moveRound r=1 (full)") {
        Superstep.cut(
          Louvain.moveRound(adj, state0, degDf, twoM, p, 1), adjCount).count()
      }
    }
    spark.stop()
  }
}

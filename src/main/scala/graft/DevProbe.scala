package graft

import org.apache.spark.sql.SparkSession
import graft.algos.PageRank

/** Dev-only profiling probe for superstep overhead (not part of the API). */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val mode = if (args.nonEmpty) args(0) else "default"
    val b = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    val b2 = mode match {
      case "noaqe" => b.config("spark.sql.adaptive.enabled", "false")
      case "nocodegen" => b.config("spark.sql.codegen.wholeStage", "false")
      case "both" => b
          .config("spark.sql.adaptive.enabled", "false")
          .config("spark.sql.codegen.wholeStage", "false")
      case _ => b
    }
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val r = new scala.util.Random(42)
    val g = (1 to 4000)
      .map(_ => ((math.pow(r.nextDouble(), 2.5) * 1000).toLong,
        (math.pow(r.nextDouble(), 2.5) * 1000).toLong))
      .filter { case (a, c) => a != c }.distinct
      .map { case (a, c) => Edge(a, c, 1.0) }
    val ds = spark.createDataset(g)
    val t0 = System.nanoTime()
    val res = PageRank.run(ds, PrConfig(tol = 0.0, maxIter = 25))
    res.ranks.count()
    val total = (System.nanoTime() - t0) / 1e9
    println(s"MODE=$mode total=${"%.1f".format(total)}s iters=${res.iterations}")
    res.perIter.foreach(m =>
      println(f"  iter ${m.iter}%2d  ${m.seconds}%6.2fs  delta=${m.delta}%.3e"))
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Iteration snapshot carrying per-partition lineage + metrics. */
final case class Snapshot(
    runId: String,
    iteration: Int,
    path: String,
    files: Seq[(String, Long)], // per-partition parquet files + sizes
    metrics: Map[String, Double],
)

/** Resumable-run checkpoint store (BASELINE.json:6,14: "resumable from
  * Iceberg-snapshot checkpoints carrying per-partition lineage and
  * iteration metrics").
  *
  * No Iceberg runtime jar exists in this offline sandbox (SURVEY §0), so
  * the store is a trait with a Parquet+manifest implementation that carries
  * exactly what an Iceberg snapshot would: snapshot id (runId+iteration),
  * the per-partition data-file list with sizes (lineage), and iteration
  * metrics. A real Iceberg catalog slots in behind the same trait outside
  * the sandbox (SURVEY §7.4.5).
  *
  * Atomicity: state parquet is written to a temp dir and renamed into
  * place; the manifest is written LAST, also via rename — a snapshot
  * without a manifest is invisible to [[latest]], so readers never observe
  * partial writes (the `_SUCCESS`-style commit of SURVEY §2.A S5).
  */
trait SnapshotStore {
  def write(iteration: Int, state: DataFrame, metrics: Map[String, Double])
      : Snapshot
  def latest(spark: SparkSession): Option[(Snapshot, DataFrame)]
}

final class ParquetSnapshotStore(root: String, runId: String)
    extends SnapshotStore {
  private val mapper = new ObjectMapper()

  private def fs(spark: SparkSession) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataDirFor(base: Path, iteration: Int, attempt: Int): Path =
    new Path(
      base,
      if (attempt == 0) s"iter-$iteration" else s"iter-$iteration-a$attempt",
    )

  override def write(
      iteration: Int,
      state: DataFrame,
      metrics: Map[String, Double],
  ): Snapshot = {
    val spark = state.sparkSession
    val f = fs(spark)
    val base = new Path(s"$root/$runId")
    // each attempt writes a UNIQUE data dir: an existing manifest for this
    // iteration keeps pointing at intact data until the new manifest is
    // renamed in (the manifest swap is the only commit point) — a crash
    // anywhere in this method never leaves latest() referencing missing
    // or partial data. Superseded attempt dirs are deleted only AFTER the
    // manifest commit.
    val attempt = Iterator.from(0)
      .find(a => !f.exists(dataDirFor(base, iteration, a)))
      .get
    val dataDir = dataDirFor(base, iteration, attempt)
    val tmp = new Path(base, s".tmp-${dataDir.getName}")
    state.write.mode("overwrite").parquet(tmp.toString)
    require(f.rename(tmp, dataDir), s"rename failed: $tmp -> $dataDir")
    val files = f
      .listStatus(dataDir)
      .filter(s => s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1)
      .toSeq
    val snap = Snapshot(runId, iteration, dataDir.toString, files, metrics)
    val manifest = new java.util.LinkedHashMap[String, Object]()
    manifest.put("runId", runId)
    manifest.put("iteration", Integer.valueOf(iteration))
    manifest.put("path", dataDir.toString)
    val fm = new java.util.LinkedHashMap[String, Object]()
    files.foreach { case (n, sz) => fm.put(n, java.lang.Long.valueOf(sz)) }
    manifest.put("files", fm)
    val mm = new java.util.LinkedHashMap[String, Object]()
    metrics.foreach { case (k, v) =>
      mm.put(k, java.lang.Double.valueOf(v))
    }
    manifest.put("metrics", mm)
    val mTmp = new Path(base, s".tmp-manifest-$iteration.json")
    val out = f.create(mTmp, true)
    out.write(mapper.writeValueAsBytes(manifest))
    out.close()
    val mFinal = new Path(base, f"manifest-$iteration%08d.json")
    if (f.exists(mFinal)) f.delete(mFinal, false)
    require(f.rename(mTmp, mFinal), s"rename failed: $mTmp -> $mFinal")
    // committed — every other attempt dir of this iteration is now
    // unreferenced (not just lower-numbered ones: a crash-resume sequence
    // like write(a0), write(a1), crash, write(a0) would otherwise leave a
    // stale higher-numbered dir leaking disk until the next write)
    val keep = dataDir.getName
    f.listStatus(base)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        n != keep &&
        (n == s"iter-$iteration" || n.startsWith(s"iter-$iteration-a"))
      }
      .foreach(p => f.delete(p, true))
    snap
  }

  override def latest(spark: SparkSession): Option[(Snapshot, DataFrame)] = {
    val f = fs(spark)
    val base = new Path(s"$root/$runId")
    if (!f.exists(base)) return None
    val manifests = f
      .listStatus(base)
      .map(_.getPath)
      .filter(p =>
        p.getName.startsWith("manifest-") && p.getName.endsWith(".json")
      )
      .sortBy(_.getName)
    manifests.lastOption.map { p =>
      val in = f.open(p)
      val bytes =
        try org.apache.commons.io.IOUtils.toByteArray(in)
        finally in.close()
      val m = mapper
        .readValue(bytes, classOf[java.util.LinkedHashMap[String, Object]])
      val files = m
        .get("files")
        .asInstanceOf[java.util.LinkedHashMap[String, Object]]
        .asScala
        .map { case (k, v) => (k, v.toString.toLong) }
        .toSeq
      val metrics = m
        .get("metrics")
        .asInstanceOf[java.util.LinkedHashMap[String, Object]]
        .asScala
        .map { case (k, v) => (k, v.toString.toDouble) }
        .toMap
      val snap = Snapshot(
        m.get("runId").toString,
        m.get("iteration").toString.toInt,
        m.get("path").toString,
        files,
        metrics,
      )
      (snap, spark.read.parquet(snap.path))
    }
  }
}

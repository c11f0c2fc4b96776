package graft

import graft.streaming.Streams
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming duals equal their batch counterparts over the same rows
  * (SURVEY §2.A A10). Drives the real streaming engine end to end:
  * parquet file source → watermarked stateful operator → AvailableNow
  * trigger → memory sink.
  */
class StreamingSpec extends GraftSuite {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  /** (event_id, ts, event_type, value) with duplicate ids + out-of-order
    * arrivals inside the watermark horizon.
    */
  private val rows: Seq[(Long, Timestamp, String, Double)] = Seq(
    (1L, ts(0), "click", 1.0),
    (2L, ts(5), "view", 2.0),
    (1L, ts(7), "click", 1.0), // duplicate id, later ts
    (3L, ts(62), "click", 3.0), // next hour window
    (2L, ts(64), "view", 2.0), // duplicate id, next hour
    (4L, ts(3), "view", 4.5), // out-of-order (early ts, late arrival)
  )

  private def streamFrom(dir: String): DataFrame = {
    val batch = rows.toDF("event_id", "ts", "event_type", "value")
    batch.write.mode("overwrite").parquet(dir)
    spark.readStream.schema(batch.schema).parquet(dir)
  }

  private def runToTable(df: DataFrame, name: String, mode: String): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("streaming windowed counts == batch groupBy over the same rows") {
    val dir = Files.createTempDirectory("graft-stream-agg").toString
    val out = Streams.windowedCounts(
      streamFrom(dir), "ts", "event_type", "value")
    runToTable(out, "win_counts", "complete")
    val got = spark.table("win_counts")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val want = rows.toDF("event_id", "ts", "event_type", "value")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == want, s"got $got want $want")
  }

  test("streaming session windows == batch sessionization, gap semantics") {
    val dir = Files.createTempDirectory("graft-stream-sess").toString
    val out = Streams.sessionCounts(
      streamFrom(dir).withWatermark("ts", "2 hours"),
      "ts", "event_type", "value", gap = "10 minutes")
    runToTable(out, "sess_counts", "complete")
    def toMapped(df: DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4)))
      .toMap
    val got = toMapped(spark.table("sess_counts"))
    val want = toMapped(Streams.sessionCounts(
      rows.toDF("event_id", "ts", "event_type", "value"),
      "ts", "event_type", "value", gap = "10 minutes"))
    assert(got == want, s"got $got want $want")
    // gap semantics, by hand: clicks at minutes {0,7} chain into one
    // session ending 7+gap; the minute-62 click and the view pairs
    // {3,5} / {64} form the other three
    assert(got == Map(
      (ts(0), ts(17), "click") -> ((2L, 2.0)),
      (ts(62), ts(72), "click") -> ((1L, 3.0)),
      (ts(3), ts(15), "view") -> ((2L, 6.5)),
      (ts(64), ts(74), "view") -> ((1L, 2.0)),
    ), s"got $got")
  }

  test("streaming agg state survives a restart (checkpoint resume)") {
    // two separate AvailableNow runs over the SAME checkpoint: run 2 only
    // reads the files added after run 1 and must restore run 1's window
    // state — the streaming analogue of the engine's snapshot resume
    val dir = Files.createTempDirectory("graft-stream-resume").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val (first, second) = rows.splitAt(3)
    def append(batch: Seq[(Long, Timestamp, String, Double)]): Unit =
      batch.toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(dir)
    append(first)
    val schema = rows.toDF("event_id", "ts", "event_type", "value").schema
    def runOnce(name: String): Unit = {
      val q = Streams.windowedCounts(
          spark.readStream.schema(schema).parquet(dir),
          "ts", "event_type", "value")
        .writeStream
        .format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce("resume1")
    append(second)
    runOnce("resume2")
    val got = spark.table("resume2")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val want = rows.toDF("event_id", "ts", "event_type", "value")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sv"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == want, s"resumed run lost state: got $got want $want")
  }

  test("stream-stream interval join == batch join, bound enforced") {
    // impressions and their clicks: ad 1 clicked twice inside the 10-min
    // bound + once outside; ad 2 clicked before the impression (never
    // matches); ad 3 never clicked; click 9 is out-of-order in arrival
    val imps = Seq(
      (1L, ts(0), 10.0),
      (2L, ts(20), 20.0),
      (3L, ts(40), 30.0),
    )
    val clicks = Seq(
      (1L, ts(4), 1.0),
      (1L, ts(9), 2.0), // in bound
      (1L, ts(15), 3.0), // outside the 10-min bound
      (2L, ts(12), 4.0), // before its impression
    )
    val ldir = Files.createTempDirectory("graft-ss-left").toString
    val rdir = Files.createTempDirectory("graft-ss-right").toString
    val lb = imps.toDF("ad_id", "ts", "cost")
    val rb = clicks.toDF("ad_id", "ts", "click_value")
    lb.write.mode("overwrite").parquet(ldir)
    rb.write.mode("overwrite").parquet(rdir)
    val out = Streams.intervalJoin(
      spark.readStream.schema(lb.schema).parquet(ldir),
      spark.readStream.schema(rb.schema).parquet(rdir),
      "ad_id", "ts",
      watermark = "1 hour", bound = "10 minutes")
    runToTable(out, "ss_join", "append")
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        r.getTimestamp(3), r.getDouble(4)))
      .toSet
    val got = key(spark.table("ss_join"))
    val want = key(Streams.intervalJoin(
      lb, rb, "ad_id", "ts", watermark = "1 hour", bound = "10 minutes"))
    assert(got == want, s"got $got want $want")
    // by hand: only ad 1's two in-bound clicks survive
    assert(got.map(t => (t._1, t._5)) == Set((1L, 1.0), (1L, 2.0)), s"got $got")
  }

  test("left-outer interval join == batch left join, never-matched emitted") {
    // same attribution rows as the inner test, PLUS: the outer form must
    // emit ad 2 (clicked only before the impression) and ad 3 (never
    // clicked) with NULL click columns once the watermark passes
    // left.ts + bound. A far-future sentinel on BOTH sides advances the
    // watermark past every flush point (watermark = min over sources of
    // max(ts) − horizon; without it, AvailableNow ends with the watermark
    // still before ts(50) and the unmatched rows stay buffered); left
    // maxFilesPerTrigger=1 forces multiple microbatches so a batch RUNS
    // after the advance.
    val imps = Seq(
      (1L, ts(0), 10.0),
      (2L, ts(20), 20.0),
      (3L, ts(40), 30.0),
      (999L, ts(300), 0.0),
    )
    val clicks = Seq(
      (1L, ts(4), 1.0),
      (1L, ts(9), 2.0),
      (1L, ts(15), 3.0), // outside the 10-min bound
      (2L, ts(12), 4.0), // before its impression — never matches
      (999L, ts(300), 9.0),
    )
    val ldir = Files.createTempDirectory("graft-sslo-left").toString
    val rdir = Files.createTempDirectory("graft-sslo-right").toString
    val lb = imps.toDF("ad_id", "ts", "cost")
    val rb = clicks.toDF("ad_id", "ts", "click_value")
    // the sentinel must be the LAST left file the source reads: the file
    // source orders by modification time, and same-mtime files from one
    // write land in arbitrary order — a sentinel file read FIRST jumps
    // the watermark and late-drops every real left row (observed flake).
    // Write it as a separate, strictly-later append.
    lb.where(col("ad_id") =!= 999L)
      .repartition(3).write.mode("overwrite").parquet(ldir)
    Thread.sleep(1000)
    lb.where(col("ad_id") === 999L)
      .coalesce(1).write.mode("append").parquet(ldir)
    rb.write.mode("overwrite").parquet(rdir)
    val out = Streams.intervalJoinLeftOuter(
      spark.readStream.schema(lb.schema)
        .option("maxFilesPerTrigger", "1").parquet(ldir),
      spark.readStream.schema(rb.schema).parquet(rdir),
      "ad_id", "ts",
      watermark = "1 hour", bound = "10 minutes")
    runToTable(out, "sslo_join", "append")
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        Option(r.getTimestamp(3)), Option(r.get(4))))
      .toSet
    val got = key(spark.table("sslo_join"))
    val want = key(Streams.intervalJoinLeftOuter(
      lb, rb, "ad_id", "ts", watermark = "1 hour", bound = "10 minutes"))
    assert(got == want, s"got $got want $want")
    // by hand: ad 1 keeps its two in-bound clicks; ads 2 and 3 appear
    // exactly once each, with NULL click columns
    assert(got.count(_._1 == 1L) == 2)
    Seq(2L, 3L).foreach { ad =>
      val rows = got.filter(_._1 == ad)
      assert(rows.size == 1 && rows.head._4.isEmpty && rows.head._5.isEmpty,
        s"ad $ad: $rows")
    }
  }

  test("streaming as-of join == batch asofJoin, carry-in and never-matched") {
    // trades matched to the latest quote at-or-before them. Covers: a
    // quote BETWEEN two trades (carry-in), an equal-timestamp quote
    // (matches, like the batch window's right-before-left order), a key
    // with no quotes at all, and a key whose only quote is AFTER its
    // trade (both → NULL). The far-future sentinel on both sides
    // advances the watermark past every trade (emission needs
    // watermark > left.ts); left maxFilesPerTrigger=1 forces multiple
    // microbatches so carry-in state crosses batch boundaries.
    val quotes = Seq(
      (1L, ts(2), "q2"),
      (1L, ts(8), "q8"),
      (3L, ts(10), "q10"), // after key 3's only trade — never matches
      (999L, ts(300), "qs"),
    )
    val trades = Seq(
      (1L, ts(5), "t5"), // -> q2
      (1L, ts(8), "t8"), // equal ts -> q8
      (1L, ts(20), "t20"), // -> q8 via carry-in
      (2L, ts(3), "t3"), // no quotes for key 2 -> NULL
      (3L, ts(4), "t4"), // quote exists but only later -> NULL
      (999L, ts(300), "ts"),
    )
    val ldir = Files.createTempDirectory("graft-asof-left").toString
    val rdir = Files.createTempDirectory("graft-asof-right").toString
    val lb = trades.toDF("key", "ts", "payload")
    val rb = quotes.toDF("key", "ts", "payload")
    // sentinel as a strictly-later file (same mtime-ordering flake fix
    // as the left-outer interval test): both sides feed ONE union
    // watermark here, so the right sentinel is dropped too — only the
    // left one may advance the watermark, and only after every real row
    lb.where(col("key") =!= 999L)
      .repartition(3).write.mode("overwrite").parquet(ldir)
    rb.where(col("key") =!= 999L).write.mode("overwrite").parquet(rdir)
    Thread.sleep(1000)
    lb.where(col("key") === 999L)
      .coalesce(1).write.mode("append").parquet(ldir)
    val out = Streams.asofJoinStream(
      spark.readStream.schema(lb.schema)
        .option("maxFilesPerTrigger", "1").parquet(ldir),
      spark.readStream.schema(rb.schema).parquet(rdir),
      "key", "ts", "payload",
      watermark = "1 hour")
    runToTable(out, "asof_stream", "append")
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2),
        Option(r.getTimestamp(3)), Option(r.get(4)).map(_.toString)))
      .toSet
    val got = key(spark.table("asof_stream"))
    // batch oracle: Relational.asofJoin over the same rows (sentinel
    // lefts excluded on both sides — the stream's watermark never
    // passes them, by design)
    val want = key(
      graft.operators.Relational.asofJoin(
        lb, rb.toDF("rkey", "r_ts", "r_payload"),
        "key", "ts", "rkey", "r_ts",
      ).select(
        col("key"), col("ts"), col("payload"),
        col("r_ts"), col("r_payload"),
      ).where(col("key") =!= 999L))
    assert(!got.exists(_._1 == 999L), s"sentinel leaked: $got")
    assert(got == want, s"got $got want $want")
    // by hand: the three key-1 trades match q2 / q8 / q8; keys 2, 3 NULL
    assert(got.find(_._3 == "t5").get._5.contains("q2"))
    assert(got.find(_._3 == "t8").get._5.contains("q8"))
    assert(got.find(_._3 == "t20").get._5.contains("q8"))
    Seq("t3", "t4").foreach { p =>
      val row = got.find(_._3 == p).get
      assert(row._4.isEmpty && row._5.isEmpty, s"$p: $row")
    }
  }

  test("streaming dedup drops in-horizon duplicate ids, keeps first") {
    val dir = Files.createTempDirectory("graft-stream-dedup").toString
    val out = Streams.dedupByKey(
      streamFrom(dir), "ts", "3 hours", Seq("event_id"))
    runToTable(out, "dedup_out", "append")
    val got = spark.table("dedup_out")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L, 4L), s"got $got")
    assert(spark.table("dedup_out").count() == 4)
  }
}

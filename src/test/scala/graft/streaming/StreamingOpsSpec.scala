package graft.streaming

import graft.SparkTestHarness
import graft.gen.SyntheticRepoFiles
import graft.mine.MineJob
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

final case class Doc(doc_id: Long, ts: java.sql.Timestamp, text: String)

class StreamingOpsSpec extends AnyFunSuite {

  lazy val spark = SparkTestHarness.spark
  import spark.implicits._
  implicit lazy val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streaming mine agrees with batch mine on the same manifests") {
    val cfg = SyntheticRepoFiles.Config(packagesPerEco = 10)
    val files = SyntheticRepoFiles.generateLocal(cfg)

    val stream = MemoryStream[graft.model.RepoFile]
    val out = StreamingOps.mineStream(spark, stream.toDS())
      .writeStream.format("memory").queryName("mined_artifacts").outputMode("append").start()
    stream.addData(files)
    out.processAllAvailable()
    out.stop()

    val streamed = spark.table("mined_artifacts").collect().map(_.getString(0)).toSet
    val batch = MineJob.run(spark, spark.createDataset(files)).artifacts.collect().map(_.id).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("watermarked windowed event counts") {
    def ev(id: Long, minute: Int, typ: String, v: Double) =
      Event(id, java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00"), 1L, typ, v, "{}")
    val stream = MemoryStream[Event]
    val out = StreamingOps.windowedEventCounts(stream.toDS().toDF())
      .writeStream.format("memory").queryName("win_counts").outputMode("append").start()
    // two events in hour 10, one in hour 11; a late watermark-advancing event in hour 13
    stream.addData(ev(1, 0, "click", 1.0), ev(2, 30, "click", 2.0), ev(3, 70, "view", 3.0))
    out.processAllAvailable()
    stream.addData(ev(4, 200, "view", 4.0)) // advances watermark past hours 10-11
    out.processAllAvailable()
    out.stop()
    val rows = spark.table("win_counts").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
    assert(rows.contains(("2024-01-01 11:00:00.0", "view", 1L, 3.0)))
  }

  test("streaming exact dedup suppresses re-arrivals within the watermark") {
    def doc(id: Long, minute: Int, text: String) =
      Doc(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:${minute}%02d:00"), text)
    val stream = MemoryStream[Doc]
    val out = StreamingOps.dedupStream(stream.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_docs").outputMode("append").start()
    // same content arrives three times across two batches within the watermark
    stream.addData(doc(1, 0, "alpha"), doc(2, 1, "alpha"), doc(3, 2, "beta"))
    out.processAllAvailable()
    stream.addData(doc(4, 3, "alpha"), doc(5, 4, "gamma"))
    out.processAllAvailable()
    out.stop()
    val texts = spark.table("dedup_docs").collect().map(r => r.getAs[String]("text"))
    assert(texts.sorted.toSeq == Seq("alpha", "beta", "gamma"),
      s"each content emitted exactly once; got ${texts.mkString(", ")}")
    ()
  }

  test("streaming near-dup dedup suppresses same-signature arrivals") {
    // long shared prefix + one changed rare token: the bit-vote signature is
    // identical (asserted), so the near-dup is suppressed at ingest
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val a = base + "alpha ending tokens here"
    val b = base + "alpha ending tokens there" // near-dup of a
    val c = "completely different content about spark partitions and shuffles"
    assert(graft.ops.Dedup.simhash(a) == graft.ops.Dedup.simhash(b))
    assert(graft.ops.Dedup.simhash(a) != graft.ops.Dedup.simhash(c))
    def doc(id: Long, minute: Int, text: String) =
      Doc(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:${minute}%02d:00"), text)
    val stream = MemoryStream[Doc]
    val out = StreamingOps.nearDedupStream(stream.toDS().toDF())
      .writeStream.format("memory").queryName("neardedup_docs").outputMode("append").start()
    stream.addData(doc(1, 0, a), doc(2, 1, c))
    out.processAllAvailable()
    stream.addData(doc(3, 2, b)) // near-dup arrives later, same signature
    out.processAllAvailable()
    out.stop()
    val ids = spark.table("neardedup_docs").collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
    assert(ids == Seq(1L, 2L), s"near-dup doc 3 must be suppressed; got $ids")
    ()
  }

  test("streaming quality filter gates ingest with the exact batch rules") {
    def doc(id: Long, minute: Int, text: String) =
      Doc(id, java.sql.Timestamp.valueOf(f"2024-01-01 10:${minute}%02d:00"), text)
    val keepText = (1 to 24).map(i => s"w$i").mkString(" ")
    val stream = MemoryStream[Doc]
    val out = StreamingOps.qualityFilterStream(stream.toDS().toDF(), "doc_id", "text")
      .writeStream.format("memory").queryName("quality_stream").outputMode("append").start()
    stream.addData(doc(1, 0, keepText), doc(2, 1, "dup dup dup dup"),
      doc(3, 2, Seq.fill(12)("ha ho").mkString(" ")))
    out.processAllAvailable()
    out.stop()
    val got = spark.table("quality_stream").collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("reason"), r.getAs[Boolean]("keep"))).toMap
    assert(got == Map(1L -> ("keep", true), 2L -> ("too_short", false), 3L -> ("dup_words", false)))
    // stream/batch parity: identical rows from the batch operator
    val batch = graft.ops.TextOps.qualityFilter(
      Seq((1L, keepText), (2L, "dup dup dup dup"), (3L, Seq.fill(12)("ha ho").mkString(" ")))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(4), r.getBoolean(5))).toMap
    assert(batch == got)
    ()
  }

  test("stateful sessionization closes sessions after the gap") {
    def ev(id: Long, minute: Int) =
      Event(id, java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00"), 7L, "e", 1.0, "{}")
    val stream = MemoryStream[Event]
    val out = StreamingOps.sessionize(spark, stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    // session 1: minutes 0,10,20; then a 2h gap; session 2: minute 140
    stream.addData(ev(1, 0), ev(2, 10), ev(3, 20))
    out.processAllAvailable()
    stream.addData(ev(4, 140))  // arrives in a later batch -> closes session 1 inline
    out.processAllAvailable()
    stream.addData(ev(5, 600))  // advances watermark far -> times out session 2
    out.processAllAvailable()
    out.stop()
    val sessions = spark.table("sessions").collect()
      .map(r => (r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3)))
    assert(sessions.contains(("2024-01-01 10:00:00.0", "2024-01-01 10:20:00.0", 3L)),
      s"got ${sessions.mkString(", ")}")
  }
}

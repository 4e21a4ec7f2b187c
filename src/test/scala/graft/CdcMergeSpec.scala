package graft

import graft.streaming.{CdcEvent, CdcMergeStream, CdcRow}
import java.nio.file.Files

/** Restart recovery for the CDC merge — the materialized-view shape's
  * own crash contract, beyond the stream≡batch gate in CORRECTNESS:
  * state (the live snapshot) must survive a restart, late changes must
  * lose last-writer-wins against recovered state, and the flush must
  * emit each live row exactly once.
  */
class CdcMergeSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, op: String, fp: String, e: Long) =
    CdcEvent(id, op, fp, new java.sql.Timestamp(e * 1000))

  test("crash recovery: snapshot state survives, LWW vs recovered state, exactly-once flush") {
    val dir = Files.createTempDirectory("cdcrec")
    val in = s"$dir/in"; val outP = s"$dir/out"; val cp = s"$dir/cp"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val t0 = 1706572800L
    val t1 = t0 + 3600L
    val flushAt = t0 + 7200L
    def feed(evs: CdcEvent*): Unit =
      evs.toDS().repartition(1).write.mode("append").parquet(in)
    // 2-hour watermark DELAY, not the gate's 0 seconds: with 0 the
    // post-crash stale change (t0-100 < the recovered watermark t0)
    // would be dropped by the stateful operator's late-row filter
    // before ever reaching the LWW fold — the outcome assertion would
    // pass without exercising recovered-state LWW at all. The delay
    // keeps the watermark below the stale timestamp so the row
    // genuinely reaches update() and must lose against RECOVERED state
    // (doc 4 below proves it reached update()).
    def startQ() = spark.readStream
      .schema("doc_id LONG, op STRING, fp STRING, ts TIMESTAMP")
      .parquet(in).as[CdcEvent]
      .transform((ds: org.apache.spark.sql.Dataset[CdcEvent]) =>
        CdcMergeStream.merged(ds, flushAt, watermark = "2 hours"))
      .writeStream.format("parquet").option("path", outP)
      .option("checkpointLocation", cp).outputMode("append").start()

    // run 1: the base snapshot only — nothing can flush yet (every
    // timeout sits at flushAt, far above the watermark)
    feed(ev(1, "upsert", "a1", t0), ev(2, "upsert", "b1", t0),
      ev(3, "upsert", "c1", t0))
    val q1 = startQ()
    q1.processAllAvailable()
    q1.stop() // "crash" between micro-batches
    assert(!Files.exists(java.nio.file.Paths.get(outP)) ||
      spark.read.parquet(outP).isEmpty)

    // run 2, same checkpoint: doc 1 revised, doc 2 deleted, doc 3's
    // STALE pre-base change arrives late (t0-100 < recovered state's
    // t0, so LWW must drop it against state restored from the store).
    // Doc 4 is the filter-vs-LWW witness: a NEW key at the SAME stale
    // timestamp. If t0-100 rows were being dropped by the late filter
    // (as they would be under the gate's 0-second watermark), doc 4
    // would be absent from the output; its presence proves the stale
    // rows reached update(), so doc 3 surviving as c1 is the recovered
    // state WINNING the fold, not the filter hiding the contest. The
    // far-future row pushes the watermark past flushAt.
    feed(ev(1, "upsert", "a2", t1), ev(2, "delete", "", t1),
      ev(3, "upsert", "c0", t0 - 100),
      ev(4, "upsert", "d0", t0 - 100),
      ev(-1, "upsert", "", t0 + 200000))
    val q2 = startQ()
    q2.processAllAvailable()
    q2.stop()

    val all = spark.read.parquet(outP).as[CdcRow].collect().toSeq
      .filter(_.doc_id >= 0)
    // exactly-once and last-writer-wins over the restart: doc 1 at its
    // revision, doc 2 gone, doc 3 at the PRE-crash state (late change
    // lost AGAINST RECOVERED STATE — doc 4's presence at the same
    // stale timestamp proves the contest happened), doc 4 created from
    // the stale row — and each exactly once
    assert(all.sortBy(_.doc_id) ==
      Seq(CdcRow(1, "a2", t1), CdcRow(3, "c1", t0),
        CdcRow(4, "d0", t0 - 100)), all.toString)
  }
}

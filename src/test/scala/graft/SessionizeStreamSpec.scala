package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{ClosedSession, SessionEvent, SessionizeStream}
import java.nio.file.Files

class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(user: Long, e: Long, et: String = "view") =
    SessionEvent(user, et, new java.sql.Timestamp(e * 1000))

  test("sessions close on in-batch gaps and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val out = SessionizeStream.sessions(mem.toDS(), gapSec = 1800)
    val dir = Files.createTempDirectory("sess").toString
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").option("checkpointLocation", s"$dir/cp").start()

    val t0 = 1706572800L // 2024-01-30 00:00:00Z
    // user 7: two events 60s apart, then one past the gap in the SAME
    // batch — the first session must close without any watermark help
    mem.addData(ev(7, t0), ev(7, t0 + 60, "purchase"), ev(7, t0 + 5000))
    q.processAllAvailable()
    val afterBatch1 = spark.table("sessions").as[ClosedSession].collect()
    assert(afterBatch1.toSeq == Seq(ClosedSession(7, t0, 2, 60, 2)))

    // a different user far in the future advances the watermark past
    // user 7's open-session timeout (t0+5000+1800)
    mem.addData(ev(8, t0 + 20000))
    q.processAllAvailable()
    // the timeout fires on the trigger AFTER the watermark moved
    mem.addData(ev(8, t0 + 20010))
    q.processAllAvailable()
    q.stop()

    val all = spark.table("sessions").as[ClosedSession].collect().toSet
    assert(all.contains(ClosedSession(7, t0, 2, 60, 2)))
    assert(all.contains(ClosedSession(7, t0 + 5000, 1, 0, 1)),
      s"watermark-closed session missing: $all")
    // user 8's session is still open (no timeout passed) — not emitted
    assert(!all.exists(_.user_id == 8))
  }
}

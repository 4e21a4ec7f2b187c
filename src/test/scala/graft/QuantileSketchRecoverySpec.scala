package graft

import java.nio.file.Files
import graft.streaming.{QsEvent, QsKey, QsRow, QuantileSketchStream}

/** Restart recovery for the streaming quantile sketch — the
  * mergeable-state shape's own crash contract, beyond the stream≡batch
  * gate in CORRECTNESS: the partial bottom-k sample held as state must
  * survive a restart (state-store recovery), the post-crash batch must
  * merge INTO the recovered sample (not a fresh one), and the timeout
  * flush must emit each group's quantile rows exactly once — together,
  * the union the final sample covers is every pre- and post-crash row.
  */
class QuantileSketchRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def md5(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("crash recovery: partial sample survives, merges post-crash rows, flushes once") {
    val dir = Files.createTempDirectory("qsrec")
    val in = s"$dir/in"; val outP = s"$dir/out"; val cp = s"$dir/cp"
    Files.createDirectories(java.nio.file.Paths.get(in))
    val t0 = 1706572800L
    val flushAt = t0 + 7200L
    val day = java.sql.Date.valueOf("2024-01-29")
    def ev(series: String, i: Int, value: Double, e: Long) =
      QsEvent(series, day, value, md5(s"$series#$i"),
        new java.sql.Timestamp(e * 1000))
    def feed(evs: QsEvent*): Unit =
      evs.toDS().repartition(1).write.mode("append").parquet(in)
    def startQ() = spark.readStream
      .schema("series STRING, day DATE, value DOUBLE, r STRING, ts TIMESTAMP")
      .parquet(in).as[QsEvent](QuantileSketchStream.evEnc)
      .transform((ds: org.apache.spark.sql.Dataset[QsEvent]) =>
        QuantileSketchStream.sketched(ds, flushAt))
      .writeStream.format("parquet").option("path", outP)
      .option("checkpointLocation", cp).outputMode("append").start()

    // run 1: the first half of each group's rows — nothing can flush
    // (every timeout sits at flushAt, far above the watermark)
    val half1 = (0 until 40).map(i => ev("a", i, (i * 31 % 17) * 1.0, t0)) ++
      (0 until 25).map(i => ev("b", i, (i * 13 % 11) * 2.0, t0))
    feed(half1: _*)
    val q1 = startQ()
    q1.processAllAvailable()
    q1.stop() // "crash" between micro-batches
    assert(!Files.exists(java.nio.file.Paths.get(outP)) ||
      spark.read.parquet(outP).isEmpty)

    // run 2, same checkpoint: the second half merges into RECOVERED
    // state; the far-future sentinel pushes the watermark past flushAt.
    // Post-crash rows carry a LATER event time (t0+3600): the restart
    // recovers the committed watermark (t0), and rows at the recovered
    // boundary are filtered as late on this path (observed — within a
    // single run the boundary rows pass, which the oracle-shared gate
    // proves). Rows arriving after a restart legitimately carry
    // post-restart event times, so the later stamp is the honest shape.
    val t1 = t0 + 3600L
    val half2 = (40 until 70).map(i => ev("a", i, (i * 31 % 17) * 1.0, t1)) ++
      (25 until 60).map(i => ev("b", i, (i * 13 % 11) * 2.0, t1)) :+
      ev("zz", 0, 0.0, t0 + 200000)
    feed(half2: _*)
    val q2 = startQ()
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outP).as[QsRow](QuantileSketchStream.outEnc)
      .collect().toSeq.filter(_.series != "zz")
    // expected: the batch rule over the FULL union per group — state
    // recovery + merge must make the crash invisible
    val expected = Seq(
      "a" -> (0 until 70).map(i => (md5(s"a#$i"), (i * 31 % 17) * 1.0)),
      "b" -> (0 until 60).map(i => (md5(s"b#$i"), (i * 13 % 11) * 2.0)))
      .flatMap { case (s, hexed) =>
        QuantileSketchStream.quantiles(QsKey(s, day),
          hexed.toList.sortBy(_._1).take(QuantileSketchStream.Cap)
            .map { case (r, v) => QuantileSketchStream.fromHex(r, v) })
      }
    assert(got.toSet == expected.toSet,
      s"only-got=${(got.toSet -- expected.toSet).take(3)} " +
        s"only-expected=${(expected.toSet -- got.toSet).take(3)}")
    assert(got.size == expected.size, "duplicate emission across restart")
  }
}

package graft

import graft.streaming.{QsKey, QsSample, QuantileSketchStream}

/** Gates for the eleventh stream≡batch gate's state algebra and its
  * end-to-end equivalence:
  *
  *  - the bottom-k MERGE LAW where the cap actually binds (the sf
  *    fixtures' groups are all under 1024 rows, so the oracle-shared
  *    bench gate alone would never exercise truncation): folding any
  *    partition of a >Cap sample through the state merge must reach
  *    exactly bottom-Cap of the union, regardless of split;
  *  - the flush-time rank rule equals the batch twin's
  *    `max(1, ceil(p·n/100))` over (value, rank) order;
  *  - the full streaming gate at sf0.001 row-matches the BATCH query
  *    (same corpus, same sample, same ranks) — the stream≡batch
  *    equivalence in CI, not just in the driver's oracle run.
  */
class QuantileSketchStreamSpec extends SparkSpec {

  private def md5(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("bottom-k merge law holds where the cap binds, for any batch split") {
    // build from hex strings and compute the EXPECTED bottom-k by the
    // md5-STRING order the batch twin ranks by — the packed-long state
    // must reproduce it exactly (the unsigned-order equivalence)
    val hexed = (0 until 3000).map(i => (md5(i.toString), i * 1.5)).toList
    val all = hexed.map { case (r, v) => QuantileSketchStream.fromHex(r, v) }
    val expected = hexed.sortBy(_._1).take(QuantileSketchStream.Cap)
      .map { case (r, v) => QuantileSketchStream.fromHex(r, v) }
    for (splits <- Seq(Seq(3000), Seq(1000, 2000), Seq(1, 1499, 1500), Seq.fill(30)(100))) {
      var state = List.empty[QsSample]
      var off = 0
      splits.foreach { n =>
        state = QuantileSketchStream.merge(state, all.slice(off, off + n).iterator)
        off += n
      }
      assert(off == 3000)
      assert(state == expected,
        s"merge over splits $splits diverged from bottom-Cap of the union")
    }
  }

  test("flush rank rule equals the batch twin's ceil-rank rule") {
    val key = QsKey("s", java.sql.Date.valueOf("2024-01-01"))
    val hexed = (0 until 777).map(i => (md5(s"x$i"), (i * 37 % 101) * 1.0)).toList
    val sample = hexed.map { case (r, v) => QuantileSketchStream.fromHex(r, v) }
    val rows = QuantileSketchStream.quantiles(key, sample).toList
    // reference rule computed over the (value, md5-STRING) order
    val sorted = hexed.sortBy { case (r, v) => (v, r) }
    val n = sorted.size
    for (p <- Seq(50, 95, 99)) {
      val idx = math.max(1, math.ceil(p * n / 100.0).toLong).toInt
      val expect = sorted(idx - 1)._2
      assert(rows.find(_.p == p).get.est_value == expect)
    }
  }

  test("streaming gate row-matches the batch query at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.ExtQueries.quantileSketchGrouped(spark, sf)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getInt(2),
        r.getDouble(3))).toSet
    val stream = graft.queries.AnalyticsQueries.quantileSketchStream(spark, sf)
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getInt(2),
        r.getDouble(3))).toSet
    assert(stream == batch,
      s"stream/batch divergence: only-stream=${(stream -- batch).take(3)} " +
        s"only-batch=${(batch -- stream).take(3)}")
    assert(batch.nonEmpty)
    graft.ext.CacheScope.drain()
  }
}

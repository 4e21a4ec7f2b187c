package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.time.TimeResolver
import java.time.Instant

/** Property tests (SURVEY §5.3): time-expression invariants, the
  * always-midnight rule for day anchors, fixed-point quantization, and
  * the lexicographic-min == numeric-min fact MinHash relies on.
  * (Raw ScalaCheck — the scalatest bridge isn't among the pinned deps.)
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val instants: Gen[Instant] =
    Gen.choose(0L, 4102444800L).map(Instant.ofEpochSecond) // 1970..2100

  test("time invariants hold for arbitrary now") {
    check("ordering")(Prop.forAll(instants) { now =>
      val r = TimeResolver(now)
      val y = r.resolve("yesterday"); val ye = r.resolve("yesterday_end")
      val t = r.resolve("today"); val te = r.resolve("today_end")
      y.isBefore(ye) && ye.isBefore(t) && !t.isAfter(now) && now.isBefore(te.plusSeconds(1))
    })
    // floorMod: anchors resolved from an early-1970 now land before the
    // epoch, where plain % goes negative
    check("midnight anchors")(Prop.forAll(instants) { now =>
      val r = TimeResolver(now)
      Seq("today", "yesterday", "last_week", "last_month", "last_quarter", "last_year")
        .forall(e => Math.floorMod(r.resolve(e).getEpochSecond, 86400L) == 0)
    })
    check("end-of-day anchors")(Prop.forAll(instants) { now =>
      val r = TimeResolver(now)
      Seq("today_end", "yesterday_end", "last_week_end", "last_month_end")
        .forall(e => Math.floorMod(r.resolve(e).getEpochSecond, 86400L) == 86399)
    })
  }

  test("duration offsets are exact and sign-symmetric") {
    val units = Gen.oneOf("s" -> 1L, "m" -> 60L, "h" -> 3600L,
      "d" -> 86400L, "w" -> 604800L)
    check("offsets")(Prop.forAll(instants, Gen.choose(1, 10000), units) {
      case (now, n, (suffix, secs)) =>
        val r = TimeResolver(now)
        r.resolve(s"-$n$suffix") == now.minusSeconds(n.toLong * secs) &&
          r.resolve(s"+$n$suffix") == now.plusSeconds(n.toLong * secs)
    })
  }

  test("fixed-point quantization is deterministic, monotone, bounded") {
    def q(x: Float): Long = math.floor(x.toDouble * 1000000d + 0.5d).toLong
    check("quantize")(Prop.forAll(Gen.choose(-1.0f, 1.0f), Gen.choose(-1.0f, 1.0f)) {
      (a, b) =>
        q(a) == q(a) &&
          (a > b || q(a) <= q(b)) &&
          math.abs(q(a) - a.toDouble * 1e6) <= 0.5 + 1e-6
    })
  }

  test("lexicographic min over fixed-width lowercase hex == numeric min") {
    val longs: Gen[Long] = Gen.choose(Long.MinValue, Long.MaxValue)
    check("hexmin")(Prop.forAll(longs, longs) { (a, b) =>
      val (ha, hb) = (f"$a%016x", f"$b%016x")
      val numMin = if (java.lang.Long.compareUnsigned(a, b) <= 0) ha else hb
      val lexMin = if (ha <= hb) ha else hb
      numMin == lexMin
    })
  }

  test("packed two-long unsigned rank order == 32-char md5 hex order") {
    // the QsSample state encoding (QuantileSketchStream.fromHex packs
    // the 128-bit md5 into rHi/rLo, rankOrd compares both unsigned):
    // its order must equal the lexicographic order of the 32-char hex
    // string the batch twin ranks by, or stream and batch pick
    // different bottom-k samples
    val longs: Gen[Long] = Gen.choose(Long.MinValue, Long.MaxValue)
    check("packedrank")(Prop.forAll(longs, longs, longs, longs) {
      (aHi, aLo, bHi, bLo) =>
        val (ha, hb) = (f"$aHi%016x$aLo%016x", f"$bHi%016x$bLo%016x")
        val sa = graft.streaming.QuantileSketchStream.fromHex(ha, 1.0)
        val sb = graft.streaming.QuantileSketchStream.fromHex(hb, 2.0)
        val packed = graft.streaming.QuantileSketchStream.rankOrd.compare(sa, sb)
        Integer.signum(packed) == Integer.signum(ha.compareTo(hb))
    })
  }

  test("cron nextAfter always lands on a due second strictly after t") {
    val crons = Gen.oneOf("0 0 1 * * *", "*/30 * * * * *",
      "0 5,35 8-10 * * 1-5", "15 */10 * * * *")
    check("cron")(Prop.forAll(instants, crons) { (t, c) =>
      val s = graft.ops.CronSchedule.parse(c)
      s.nextAfter(t).forall(nxt => s.isDue(nxt) && nxt.isAfter(t))
    })
  }
}

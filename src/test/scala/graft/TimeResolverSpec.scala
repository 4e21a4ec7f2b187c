package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.time.TimeResolver
import java.time.Instant

/** F1-F11 against hand-computed instants; now pinned to 2024-01-31
  * (a Wednesday), matching the query pack's [[graft.queries.Pinned]].
  */
class TimeResolverSpec extends AnyFunSuite {
  private val now = Instant.parse("2024-01-31T10:30:00Z")
  private val r = TimeResolver(now)
  private def i(s: String) = Instant.parse(s)

  test("F1 now / empty") {
    assert(r.resolve("") == now)
    assert(r.resolve("now") == now)
  }
  test("F2 today / today_end") {
    assert(r.resolve("today") == i("2024-01-31T00:00:00Z"))
    assert(r.resolve("today_end") == i("2024-01-31T23:59:59Z"))
  }
  test("F3 yesterday / yesterday_end") {
    assert(r.resolve("yesterday") == i("2024-01-30T00:00:00Z"))
    assert(r.resolve("yesterday_end") == i("2024-01-30T23:59:59Z"))
  }
  test("F4 last_week Monday-start") {
    assert(r.resolve("last_week") == i("2024-01-22T00:00:00Z"))
    assert(r.resolve("last_week_end") == i("2024-01-28T23:59:59Z"))
  }
  test("F5 last_month") {
    assert(r.resolve("last_month") == i("2023-12-01T00:00:00Z"))
    assert(r.resolve("last_month_end") == i("2023-12-31T23:59:59Z"))
  }
  test("F6 last_quarter") {
    assert(r.resolve("last_quarter") == i("2023-10-01T00:00:00Z"))
  }
  test("F7 last_year") {
    assert(r.resolve("last_year") == i("2023-01-01T00:00:00Z"))
  }
  test("F8 anchored day@time") {
    assert(r.resolve("yesterday@08:30") == i("2024-01-30T08:30:00Z"))
    assert(r.resolve("today@23:59:59") == i("2024-01-31T23:59:59Z"))
    intercept[IllegalArgumentException](r.resolve("yesterday@25:00"))
  }
  test("F9/F10 offsets incl. documented superset (w, compound)") {
    assert(r.resolve("-1h30m") == now.minusSeconds(5400))
    assert(r.resolve("+15s") == now.plusSeconds(15))
    assert(r.resolve("-1d") == now.minusSeconds(86400))
    assert(r.resolve("-2w") == now.minusSeconds(14 * 86400))
    assert(r.resolve("-1d12h") == now.minusSeconds(129600))
  }
  test("F11 range validation rejects start > end") {
    intercept[IllegalArgumentException](r.resolveRange("now", "-1h"))
    val (s, e) = r.resolveRange("-1h", "now")
    assert(s.isBefore(e))
  }
  test("ordering invariant: yesterday < yesterday_end < today <= now") {
    val y = r.resolve("yesterday"); val ye = r.resolve("yesterday_end")
    val t = r.resolve("today")
    assert(y.isBefore(ye) && ye.isBefore(t) && !t.isAfter(now))
  }
  test("unparseable expressions error like the reference") {
    intercept[IllegalArgumentException](r.resolve("fortnight_ago"))
    intercept[IllegalArgumentException](TimeResolver.parseDuration("1x"))
  }
  test("step parsing") {
    assert(TimeResolver.parseStepSeconds("1m") == 60)
    assert(TimeResolver.parseStepSeconds("30s") == 30)
    assert(TimeResolver.parseStepSeconds("60") == 60)
    assert(TimeResolver.parseStepSeconds("1.5h") == 5400)
  }
}

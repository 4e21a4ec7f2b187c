package graft.time

import java.time._
import java.time.temporal.ChronoUnit

/** The reference's relative-time mini-language, re-expressed in pure Scala
  * (reference: internal/timeparser/parser.go:19-247; SURVEY.md §2.7 F1-F11).
  *
  * All arithmetic is UTC and relative to an *injected* `now` — never the wall
  * clock. The reference's production incident (its REPAIR.md) was exactly a
  * time-expression pinned to a stale date; injecting `now` makes every
  * resolution reproducible and testable, and is what lets the repair tool
  * fake historical "now"s (reference: cmd/repair/main.go:530-534).
  *
  * Supported expressions:
  *  - `""` / `now`                                  (F1)
  *  - `today` / `today_end`                         (F2)
  *  - `yesterday` / `yesterday_end`                 (F3)
  *  - `last_week` / `last_week_end`  (Monday start) (F4)
  *  - `last_month` / `last_month_end`               (F5)
  *  - `last_quarter`                                (F6)
  *  - `last_year`                                   (F7)
  *  - `today@HH:MM[:SS]` / `yesterday@HH:MM[:SS]`   (F8)
  *  - `±<duration>` offsets from now, where duration is a compound of
  *    `w d h m s ms` units (`-1h30m`, `+15s`, `-2w`, `-1d12h`). This is the
  *    documented superset: the reference's regex path only accepts a single
  *    `Nd/h/m/s` unit (parser.go:208-247) while its docs advertise `w` and
  *    compounds — we implement the docs (SURVEY §2.7 F10). `d` = exactly 24h.
  *
  * End-of-day is `start_of_day + 1 day - 1 second`, matching the second
  * precision the reference actually stores (executor.go:280; SURVEY §2.7 F2).
  */
final class TimeResolver(val now: Instant) {
  private val utc = ZoneOffset.UTC
  private def zdt: ZonedDateTime = now.atZone(utc)
  private def startOfDay(d: ZonedDateTime): ZonedDateTime = d.truncatedTo(ChronoUnit.DAYS)
  private def endOfDay(d: ZonedDateTime): ZonedDateTime =
    startOfDay(d).plusDays(1).minusSeconds(1)

  /** F1-F10: resolve one expression to an Instant. Throws
    * IllegalArgumentException on an unparseable expression (the reference
    * returns a Go error; parser.go:105-111).
    */
  def resolve(expr: String): Instant = {
    val e = expr.trim
    e match {
      case "" | "now"      => now
      case "today"         => startOfDay(zdt).toInstant
      case "today_end"     => endOfDay(zdt).toInstant
      case "yesterday"     => startOfDay(zdt.minusDays(1)).toInstant
      case "yesterday_end" => endOfDay(zdt.minusDays(1)).toInstant
      case "last_week" =>
        // previous Monday 00:00 (weeks start Monday: parser.go:81-84,
        // docs/user-guide.md:144-145; java.time ISO weeks also start Monday)
        startOfDay(zdt.`with`(DayOfWeek.MONDAY).minusWeeks(1)).toInstant
      case "last_week_end" =>
        endOfDay(zdt.`with`(DayOfWeek.MONDAY).minusWeeks(1).plusDays(6)).toInstant
      case "last_month" =>
        startOfDay(zdt.withDayOfMonth(1).minusMonths(1)).toInstant
      case "last_month_end" =>
        endOfDay(zdt.withDayOfMonth(1).minusDays(1)).toInstant
      case "last_quarter" =>
        val qStartMonth = ((zdt.getMonthValue - 1) / 3) * 3 + 1
        startOfDay(zdt.withDayOfMonth(1).withMonth(qStartMonth).minusMonths(3)).toInstant
      case "last_year" =>
        startOfDay(zdt.withDayOfYear(1).minusYears(1)).toInstant
      case Anchored(day, h, m, s) =>
        val base = if (day == "today") zdt else zdt.minusDays(1)
        startOfDay(base).plusHours(h.toLong).plusMinutes(m.toLong).plusSeconds(s.toLong).toInstant
      case _ if e.startsWith("+") || e.startsWith("-") =>
        val d = TimeResolver.parseDuration(e.substring(1))
        if (e.startsWith("-")) now.minus(d) else now.plus(d)
      case _ =>
        throw new IllegalArgumentException(s"unsupported time expression: '$expr'")
    }
  }

  private object Anchored {
    private val re = "^(today|yesterday)@(\\d{1,2}):(\\d{2})(?::(\\d{2}))?$".r
    def unapply(s: String): Option[(String, Int, Int, Int)] = s match {
      case re(day, h, m, sec) =>
        val hh = h.toInt; val mm = m.toInt
        val ss = Option(sec).map(_.toInt).getOrElse(0)
        if (hh > 23 || mm > 59 || ss > 59) None else Some((day, hh, mm, ss))
      case _ => None
    }
  }

  /** F11: resolve a (start, end) pair; error when start > end
    * (reference: parser.go:50-55).
    */
  def resolveRange(startExpr: String, endExpr: String): (Instant, Instant) = {
    val s = resolve(startExpr)
    val e = resolve(endExpr)
    require(!s.isAfter(e), s"invalid time range: start $s is after end $e")
    (s, e)
  }
}

object TimeResolver {
  def apply(now: Instant): TimeResolver = new TimeResolver(now)

  private val unitNanos: Map[String, Long] = Map(
    "w" -> 7L * 24 * 3600 * 1000000000L,
    "d" -> 24L * 3600 * 1000000000L, // exactly 24h (parser.go:232)
    "h" -> 3600L * 1000000000L,
    "m" -> 60L * 1000000000L,
    "s" -> 1000000000L,
    "ms" -> 1000000L)

  private val segment = "(\\d+(?:\\.\\d+)?)(ms|w|d|h|m|s)".r

  /** Parse a compound duration like `1h30m`, `2w`, `1d12h`, `90s`, `1.5h`.
    * Also accepts a bare integer as seconds (step-string convenience,
    * reference: client.go:184-191).
    */
  def parseDuration(s: String): Duration = {
    val t = s.trim
    require(t.nonEmpty, "empty duration")
    if (t.forall(_.isDigit)) return Duration.ofSeconds(t.toLong)
    val matches = segment.findAllMatchIn(t).toList
    val consumed = matches.map(_.matched).mkString
    require(consumed == t, s"unparseable duration: '$s'")
    val nanos = matches.map { m =>
      (m.group(1).toDouble * unitNanos(m.group(2))).toLong
    }.sum
    Duration.ofNanos(nanos)
  }

  /** Resolve a step expression to whole seconds (min 1s). */
  def parseStepSeconds(s: String): Long =
    math.max(1L, parseDuration(s).getSeconds)
}

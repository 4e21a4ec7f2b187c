package graft.ops

import java.time.{Instant, ZoneOffset, ZonedDateTime}

/** 6-field cron (seconds first), the schedule format of the reference's
  * query registry (reference: cmd/server/main.go:114-155; format docs in
  * its docs/user-guide.md:203-217; flagship `0 0 1 * * *` =
  * scripts/migrate.sql:107). Supports wildcard, step (asterisk-slash-n),
  * single values, ranges and comma lists — the subset the reference's
  * configs actually use, plus ranges for completeness. All evaluation is
  * UTC.
  */
final case class CronSchedule(
    sec: Set[Int], min: Set[Int], hour: Set[Int],
    dom: Set[Int], month: Set[Int], dow: Set[Int]) {

  /** Does this schedule fire at `t` (whole-second resolution)? */
  def isDue(t: Instant): Boolean = {
    val z = t.atZone(ZoneOffset.UTC)
    sec(z.getSecond) && min(z.getMinute) && hour(z.getHour) &&
      dom(z.getDayOfMonth) && month(z.getMonthValue) &&
      dow(z.getDayOfWeek.getValue % 7) // cron: 0=Sunday
  }

  /** Next firing strictly after `t` (linear scan per second is fine for
    * scheduling granularity; bounded to 366 days).
    */
  def nextAfter(t: Instant): Option[Instant] = {
    var cur = t.plusSeconds(1).`with`(java.time.temporal.ChronoField.NANO_OF_SECOND, 0)
    val limit = t.plusSeconds(366L * 86400)
    // jump minute-wise when the second set is small, else second-wise
    while (cur.isBefore(limit)) {
      if (isDue(cur)) return Some(cur)
      cur = cur.plusSeconds(1)
    }
    None
  }
}

object CronSchedule {

  private def field(spec: String, lo: Int, hi: Int): Set[Int] = {
    def rng(s: String): Seq[Int] = s match {
      case "*" => lo to hi
      case x if x.startsWith("*/") => (lo to hi).filter(v => (v - lo) % x.drop(2).toInt == 0)
      case x if x.contains("-") =>
        val Array(a, b) = x.split("-", 2); a.toInt to b.toInt
      case x => Seq(x.toInt)
    }
    val vs = spec.split(",").toSeq.flatMap(rng)
    require(vs.forall(v => v >= lo && v <= hi), s"cron field out of range: $spec")
    vs.toSet
  }

  def parse(expr: String): CronSchedule = {
    val parts = expr.trim.split("\\s+")
    require(parts.length == 6, s"expected 6 cron fields (seconds first): '$expr'")
    CronSchedule(
      field(parts(0), 0, 59), field(parts(1), 0, 59), field(parts(2), 0, 23),
      field(parts(3), 1, 31), field(parts(4), 1, 12), field(parts(5), 0, 6))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.promql.PromParser
import graft.promql.PromParser._

/** Property check: render(ast) — fully parenthesized, so the text
  * exercises every production rather than the precedence table — parses
  * back to exactly the same AST, for seeded random trees over the whole
  * supported surface. The precedence table itself is pinned by the
  * explicit cases in PromParserSpec; this guards the productions (every
  * function head, matcher form, modifier, and clause order) against
  * regressions when the grammar grows.
  */
class PromParserPropertySpec extends AnyFunSuite {

  private def renderScalar(v: Double): String =
    if (v == v.toLong.toDouble) v.toLong.toString else v.toString

  private def renderSel(s: Selector): String = {
    val ms = s.eq.map { case (l, v) => s"""$l="$v"""" } ++
      s.ne.map { case (l, v) => s"""$l!="$v"""" } ++
      s.re.map { case (l, v) => s"""$l=~"$v"""" } ++
      s.nre.map { case (l, v) => s"""$l!~"$v"""" }
    val base = if (ms.isEmpty) s.name else s.name + ms.mkString("{", ", ", "}")
    base
  }

  private def mods(s: Selector): String = {
    val off = if (s.offsetSec != 0) s" offset ${s.offsetSec}s" else ""
    val at = s.atSec.map(t => s" @ $t").getOrElse("")
    off + at
  }

  private def clause(by: Seq[String], without: Seq[String]): String =
    if (by.nonEmpty) s" by (${by.mkString(", ")}) "
    else if (without.nonEmpty) s" without (${without.mkString(", ")}) "
    else ""

  private def render(e: Expr): String = e match {
    case s: Selector => renderSel(s) + mods(s)
    case BoolCmp(i, op, v) => s"(${render(i)}) $op bool ${renderScalar(v)}"
    case FilterCmp(i, op, v) => s"(${render(i)}) $op ${renderScalar(v)}"
    case VecCmp(op, l, r, b, on, ig) =>
      val bs = if (b) "bool " else ""
      val m = on.map(ls => s"on(${ls.mkString(", ")}) ")
        .orElse(ig.map(ls => s"ignoring(${ls.mkString(", ")}) "))
        .getOrElse("")
      s"(${render(l)}) $op $bs$m(${render(r)})"
    case Arith(i, op, v) => s"(${render(i)}) $op ${renderScalar(v)}"
    case VecBin(op, l, r, on, ig, gs, gl) =>
      val m = on.map(ls => s"on(${ls.mkString(", ")}) ")
        .orElse(ig.map(ls => s"ignoring(${ls.mkString(", ")}) "))
        .getOrElse("")
      // an explicit (possibly empty) label list: a bare `group_left`
      // followed by the parenthesized RHS would otherwise claim the
      // paren as its label list — the same grammar quirk Prometheus has
      val g = gs.map(s => s"group_$s(${gl.mkString(", ")}) ").getOrElse("")
      s"(${render(l)}) $op $m$g(${render(r)})"
    case SetOp(op, l, r, on, ig) =>
      val m = on.map(ls => s"on(${ls.mkString(", ")}) ")
        .orElse(ig.map(ls => s"ignoring(${ls.mkString(", ")}) "))
        .getOrElse("")
      s"(${render(l)}) $op $m(${render(r)})"
    case Agg(fn, i, by, wo) => s"$fn${clause(by, wo)}(${render(i)})"
    case TopK(fn, k, i, by, wo) => s"$fn${clause(by, wo)}($k, ${render(i)})"
    case OverTime(fn, sel, w) =>
      s"${fn}_over_time(${renderSel(sel)}[${w}s]${mods(sel)})"
    case OverTimeSubquery(fn, i, w, st) =>
      s"${fn}_over_time((${render(i)})[${w}s:${st}s])"
    case RateSubquery(kind, i, w, st) =>
      s"$kind((${render(i)})[${w}s:${st}s])"
    case Rate(kind, sel, w) =>
      s"$kind(${renderSel(sel)}[${w}s]${mods(sel)})"
    case QuantileOverTime(q, sel, w) =>
      s"quantile_over_time(${renderScalar(q)}, ${renderSel(sel)}[${w}s]${mods(sel)})"
    case HistQuantile(q, i) =>
      s"histogram_quantile(${renderScalar(q)}, (${render(i)}))"
    case UnaryFn(fn, i) => s"$fn((${render(i)}))"
    case Clamp(i, Some(lo), Some(hi)) =>
      s"clamp((${render(i)}), ${renderScalar(lo)}, ${renderScalar(hi)})"
    case Clamp(i, Some(lo), None) =>
      s"clamp_min((${render(i)}), ${renderScalar(lo)})"
    case Clamp(i, None, Some(hi)) =>
      s"clamp_max((${render(i)}), ${renderScalar(hi)})"
    case RoundFn(i, to) => s"round((${render(i)}), ${renderScalar(to)})"
    case AggQuantile(q, i, by, wo) =>
      s"quantile${clause(by, wo)}(${renderScalar(q)}, ${render(i)})"
    case CountValues(lbl, i, by, wo) =>
      s"""count_values${clause(by, wo)}("$lbl", ${render(i)})"""
    case ScalarFn(i) => s"scalar((${render(i)}))"
    case VectorLit(v) => s"vector(${renderScalar(v)})"
    case TimeFn() => "time()"
    case TimestampFn(sel) => s"timestamp(${renderSel(sel)})"
    case Absent(sel) => s"absent(${renderSel(sel)})"
    case AbsentOT(sel, w) => s"absent_over_time(${renderSel(sel)}[${w}s])"
    case HoltWinters(sel, w, sf, tf) =>
      s"holt_winters(${renderSel(sel)}[${w}s], $sf, $tf)"
    case Deriv(sel, w, None) => s"deriv(${renderSel(sel)}[${w}s]${mods(sel)})"
    case Deriv(sel, w, Some(t)) =>
      s"predict_linear(${renderSel(sel)}[${w}s]${mods(sel)}, ${renderScalar(t)})"
    case LabelJoin(i, dst, sep, srcs) =>
      s"""label_join((${render(i)}), "$dst", "$sep", ${srcs.map(s => s""""$s"""").mkString(", ")})"""
    case LabelReplace(i, dst, rep, src, re) =>
      s"""label_replace((${render(i)}), "$dst", "$rep", "$src", "$re")"""
    case LimitAgg(fn, p, i, by, wo) =>
      s"$fn${clause(by, wo)}(${renderScalar(p)}, ${render(i)})"
    case MadOverTime(sel, w) =>
      s"mad_over_time(${renderSel(sel)}[${w}s]${mods(sel)})"
    case QuantileSubquery(q, i, w, st) =>
      s"quantile_over_time(${renderScalar(q)}, (${render(i)})[${w}s:${st}s])"
    case MadSubquery(i, w, st) =>
      s"mad_over_time((${render(i)})[${w}s:${st}s])"
    case HoltWintersSubquery(i, w, st, sf, tf) =>
      s"holt_winters((${render(i)})[${w}s:${st}s], $sf, $tf)"
    case DerivSubquery(i, w, st, None) =>
      s"deriv((${render(i)})[${w}s:${st}s])"
    case DerivSubquery(i, w, st, Some(t)) =>
      s"predict_linear((${render(i)})[${w}s:${st}s], ${renderScalar(t)})"
    case other => fail(s"renderer missing case: $other")
  }

  private final class Rand(seed: Long) {
    private val r = new scala.util.Random(seed)
    def int(n: Int): Int = r.nextInt(n)
    def oneOf[T](xs: Seq[T]): T = xs(r.nextInt(xs.size))
    def bool: Boolean = r.nextBoolean()
  }

  private val metricNames = Seq("m_a", "up_x", "req_total", "gauge1")
  private val labelNames = Seq("la", "lb", "lc", "user_id")
  private val scalars = Seq(0.0, 1.0, 0.5, 42.0, 999999.0, 2.25)
  private val qs = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
  private val aggFns =
    Seq("sum", "avg", "min", "max", "count", "stddev", "stdvar", "group")
  private val cmps = Seq("==", "!=", ">", ">=", "<", "<=")

  private val regexes = Seq("v.*", "v1|v2", "[ab]+c?", "w[0-9]*z")

  private def genSel(r: Rand, withMods: Boolean): Selector = {
    val eq = (0 until r.int(3)).map(i => labelNames(i) -> s"v${r.int(5)}")
    val ne = (0 until r.int(2)).map(i => labelNames(2 + i) -> s"w${r.int(3)}")
    val off = if (withMods && r.int(4) == 0)
      (if (r.int(4) == 0) -60L else 60L) * (1 + r.int(5)) else 0L
    val at = if (withMods && r.int(4) == 0) Some(1000L + r.int(100)) else None
    val re = (0 until r.int(2)).map(i => labelNames(i) -> r.oneOf(regexes))
    val nre = (0 until r.int(2)).map(i => labelNames(3 - i) -> r.oneOf(regexes))
    Selector(r.oneOf(metricNames), eq, ne, off, at, re, nre)
  }

  private def genLabels(r: Rand): (Seq[String], Seq[String]) = r.int(3) match {
    case 0 => (Seq.empty, Seq.empty)
    case 1 => (labelNames.take(1 + r.int(2)), Seq.empty)
    case _ => (Seq.empty, labelNames.take(1 + r.int(2)))
  }

  private def gen(r: Rand, depth: Int): Expr =
    if (depth <= 0) genSel(r, withMods = true)
    else r.int(24) match {
      case 0 => genSel(r, withMods = true)
      case 1 => BoolCmp(gen(r, depth - 1), r.oneOf(cmps), r.oneOf(scalars))
      case 2 => FilterCmp(gen(r, depth - 1), r.oneOf(cmps), r.oneOf(scalars))
      case 3 =>
        val (on, ig) = r.int(4) match {
          case 0 => (Some(labelNames.take(1 + r.int(2))), None)
          case 1 => (None, Some(labelNames.take(1 + r.int(2))))
          case _ => (None, None)
        }
        VecCmp(r.oneOf(cmps), gen(r, depth - 1), gen(r, depth - 1), r.bool,
          on, ig)
      case 4 => Arith(gen(r, depth - 1),
        r.oneOf(Seq("*", "/", "+", "-", "%", "^", "atan2")),
        r.oneOf(scalars))
      case 5 =>
        val (on, ig) = r.int(3) match {
          case 0 => (None, None)
          case 1 => (Some(labelNames.take(1 + r.int(2))), None)
          case _ => (None, Some(labelNames.take(1 + r.int(2))))
        }
        val gs = if ((on.nonEmpty || ig.nonEmpty) && r.int(3) == 0)
          Some(r.oneOf(Seq("left", "right"))) else None
        val gl = if (gs.nonEmpty && r.int(2) == 0)
          labelNames.drop(2).take(1 + r.int(2)) else Nil
        VecBin(r.oneOf(Seq("*", "/", "+", "-", "%", "^", "atan2")),
          gen(r, depth - 1), gen(r, depth - 1), on, ig, gs, gl)
      case 6 =>
        val (on, ig) = r.int(3) match {
          case 0 => (None, None)
          case 1 => (Some(labelNames.take(1 + r.int(2))), None)
          case _ => (None, Some(labelNames.take(1 + r.int(2))))
        }
        SetOp(r.oneOf(Seq("and", "or", "unless")),
          gen(r, depth - 1), gen(r, depth - 1), on, ig)
      case 7 =>
        val (by, wo) = genLabels(r)
        Agg(r.oneOf(aggFns), gen(r, depth - 1), by, wo)
      case 8 =>
        val (by, wo) = genLabels(r)
        TopK(r.oneOf(Seq("topk", "bottomk")), 1 + r.int(9),
          gen(r, depth - 1), by, wo)
      case 9 => OverTime(
        r.oneOf(Seq("sum", "avg", "min", "max", "count", "last",
          "stddev", "stdvar", "present")),
        genSel(r, withMods = true), 60L * (1 + r.int(10)))
      case 10 => r.int(4) match {
        case 0 => OverTimeSubquery(
          r.oneOf(Seq("sum", "avg", "min", "max", "count", "last")),
          gen(r, depth - 1), 3600L, 60L)
        case 1 => RateSubquery(
          r.oneOf(Seq("rate", "increase", "delta", "resets", "changes")),
          gen(r, depth - 1), 3600L, 60L)
        case 2 => QuantileSubquery(r.oneOf(qs), gen(r, depth - 1), 3600L, 60L)
        case _ => r.int(3) match {
          case 0 => MadSubquery(gen(r, depth - 1), 3600L, 60L)
          case 1 => HoltWintersSubquery(gen(r, depth - 1), 3600L, 60L, 0.3, 0.5)
          case _ => DerivSubquery(gen(r, depth - 1), 3600L, 60L,
            if (r.bool) Some(600.0) else None)
        }
      }
      case 11 => Rate(
        r.oneOf(Seq("rate", "increase", "delta", "irate", "idelta",
          "resets", "changes")),
        genSel(r, withMods = true), 60L * (1 + r.int(10)))
      case 12 => QuantileOverTime(r.oneOf(qs), genSel(r, withMods = true),
        60L * (1 + r.int(10)))
      case 13 => HistQuantile(r.oneOf(qs), gen(r, depth - 1))
      case 14 => UnaryFn(
        r.oneOf(Seq("abs", "ceil", "floor", "sqrt", "exp", "ln", "log2",
          "log10", "sgn", "hour", "minute", "day_of_week", "day_of_month",
          "month", "year", "sin", "cos", "tan", "asin", "acos", "atan",
          "sinh", "cosh", "tanh", "deg", "rad")), gen(r, depth - 1))
      case 15 => r.int(3) match {
        case 0 => Clamp(gen(r, depth - 1), Some(r.oneOf(scalars)),
          Some(r.oneOf(scalars)))
        case 1 => Clamp(gen(r, depth - 1), Some(r.oneOf(scalars)), None)
        case _ => Clamp(gen(r, depth - 1), None, Some(r.oneOf(scalars)))
      }
      case 16 => RoundFn(gen(r, depth - 1), r.oneOf(Seq(1.0, 0.5, 2.0)))
      case 17 =>
        val (by, wo) = genLabels(r)
        AggQuantile(r.oneOf(qs), gen(r, depth - 1), by, wo)
      case 18 =>
        val (by, wo) = genLabels(r)
        CountValues("vl", gen(r, depth - 1), by, wo)
      case 19 => ScalarFn(gen(r, depth - 1))
      case 20 => r.int(6) match {
        case 0 => VectorLit(r.oneOf(scalars))
        case 1 => TimeFn()
        case 2 => TimestampFn(genSel(r, withMods = false))
        case 3 => AbsentOT(genSel(r, withMods = false), 60L * (1 + r.int(10)))
        case 4 => HoltWinters(genSel(r, withMods = false),
          60L * (1 + r.int(10)), 0.3, 0.5)
        case _ => Absent(genSel(r, withMods = false))
      }
      case 21 => r.int(2) match {
        case 0 => Deriv(genSel(r, withMods = true), 60L * (1 + r.int(10)),
          if (r.bool) Some(600.0) else None)
        case _ => LabelJoin(gen(r, depth - 1), "dst", "-",
          labelNames.take(1 + r.int(2)))
      }
      case 22 =>
        val (by, wo) = genLabels(r)
        if (r.bool) LimitAgg("limitk", 1 + r.int(9), gen(r, depth - 1), by, wo)
        else LimitAgg("limit_ratio",
          r.oneOf(Seq(0.25, 0.5, -0.5, 1.0, -1.0)), gen(r, depth - 1), by, wo)
      case 23 => MadOverTime(genSel(r, withMods = true), 60L * (1 + r.int(10)))
    }

  test("parse(render(ast)) == ast for 600 seeded random trees") {
    val r = new Rand(20260812L)
    for (i <- 0 until 600) {
      val ast = gen(r, depth = 1 + r.int(3))
      val text = render(ast)
      val back =
        try PromParser.parse(text)
        catch {
          case e: Throwable =>
            fail(s"[$i] failed to parse rendered text:\n  $text\n  ast=$ast\n  ${e.getMessage}")
        }
      assert(back == ast, s"[$i] round-trip mismatch:\n  $text")
    }
  }
}

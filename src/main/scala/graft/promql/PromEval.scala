package graft.promql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import PromParser._

/** Evaluator: compiles a parsed PromQL expression (the reference's shipped
  * surface) into the [[PromOps]] DataFrame pipeline. Instant evaluation
  * returns one row per output series: (skey, value).
  *
  * Subquery evaluation reuses the sample→grid-point expansion, so the
  * flagship's `[24h:1m]` grid stays linear in sample count end-to-end —
  * parsing the query text costs nothing at execution time; the plan is
  * identical to the hand-built pipeline.
  */
object PromEval {

  /** Evaluate `expr` as an instant query at `atEpochSec`. */
  def evalInstant(metrics: DataFrame, expr: Expr, atEpochSec: Long,
      lookbackSec: Long = PromOps.DefaultLookbackSec): DataFrame = expr match {
    case s: Selector =>
      applyMatchers(
        PromOps.instantVector(matcherFilter(metrics, s), s.name, atEpochSec, lookbackSec))
    case BoolCmp(inner, op, v) =>
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("value", PromOps.boolCmp(col("value"), op, v))
    case Arith(inner, op, v) =>
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("value", arith(col("value"), op, v))
    case Agg(fn, inner, by, without) =>
      regroup(evalInstant(metrics, inner, atEpochSec, lookbackSec), fn, by, without, Nil)
    case OverTime(fn, sel, w) =>
      val rs = PromOps.rangeSelector(matcherFilter(metrics, sel), sel.name, atEpochSec, w)
      rs.groupBy(col("skey")).agg(overTimeAgg(fn, col("e")).as("value"))
    case Rate(kind, sel, w) =>
      PromOps.rateOverRange(matcherFilter(metrics, sel), sel.name,
        atEpochSec, w, kind)
    case OverTimeSubquery(fn, inner, w, step) =>
      val g0 = ((atEpochSec - w) / step + 1) * step // first aligned point > t-w
      val g1 = (atEpochSec / step) * step
      evalGrid(metrics, inner, g0, g1, step, lookbackSec)
        .groupBy(col("skey")).agg(overTimeAgg(fn, col("g")).as("value"))
    case other =>
      throw new IllegalArgumentException(s"unsupported instant expr: $other")
  }

  /** Evaluate `expr` at every aligned grid point in [g0, g1] (step-aligned):
    * (skey, g, value).
    */
  def evalGrid(metrics: DataFrame, expr: Expr, g0: Long, g1: Long,
      stepSec: Long, lookbackSec: Long): DataFrame = expr match {
    case s: Selector =>
      PromOps.rangeEval(matcherFilter(metrics, s), s.name, g0, g1, stepSec, lookbackSec)
    case BoolCmp(inner, op, v) =>
      evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .withColumn("value", PromOps.boolCmp(col("value"), op, v))
    case Arith(inner, op, v) =>
      evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .withColumn("value", arith(col("value"), op, v))
    case Agg(fn, inner, by, without) =>
      regroup(evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec),
        fn, by, without, Seq("g"))
    case other =>
      throw new IllegalArgumentException(s"unsupported grid expr: $other")
  }

  /** Label matchers: equality filters push into the scan; the result keeps
    * only matching series.
    */
  private def matcherFilter(metrics: DataFrame, s: Selector): DataFrame = {
    val withEq = s.eq.foldLeft(metrics) { case (df, (l, v)) =>
      df.filter(col("labels").getItem(l) === v)
    }
    s.ne.foldLeft(withEq) { case (df, (l, v)) =>
      df.filter(col("labels").getItem(l).isNull || col("labels").getItem(l) =!= v)
    }
  }

  private def applyMatchers(iv: DataFrame): DataFrame =
    iv.select(col("skey"), col("value"))

  private def arith(value: Column, op: String, v: Double): Column = op match {
    case "*" => value * v
    case "/" => value / v
    case "+" => value + v
    case "-" => value - v
  }

  private def aggColumn(fn: String): Column = fn match {
    case "sum" => sum(col("value"))
    case "max" => max(col("value"))
    case "min" => min(col("value"))
    case "avg" => avg(col("value"))
    case "count" => count(lit(1)).cast("double")
    case other => throw new IllegalArgumentException(s"unsupported agg fn: $other")
  }

  private def overTimeAgg(fn: String, timeCol: Column): Column = fn match {
    case "last" => max(struct(timeCol, col("value"))).getField("value")
    case other => aggColumn(other)
  }

  private def regroup(df: DataFrame, fn: String, by: Seq[String],
      without: Seq[String], extraKeys: Seq[String]): DataFrame =
    (by, without) match {
      case (Nil, Nil) =>
        // aggregate everything into a single (label-less) series
        PromOps.aggBy(df, Nil, aggColumn(fn), extraKeys)
      case (b, Nil) => PromOps.aggBy(df, b, aggColumn(fn), extraKeys)
      case (Nil, w) => PromOps.aggWithout(df, w, aggColumn(fn), extraKeys)
      case _ => throw new IllegalArgumentException("both by and without given")
    }
}

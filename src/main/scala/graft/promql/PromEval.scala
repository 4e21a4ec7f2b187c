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

  /** Rewrite every [[Selector]] in `expr` through `f` — structural
    * recursion over the case-class tree by primary-constructor
    * reflection, the same mechanism Catalyst's `TreeNode.makeCopy`
    * uses. Driver-side, parse-time only; never touches a plan.
    */
  private def mapSelectors(expr: Expr)(f: Selector => Selector,
      g: TimeShift => TimeShift = identity): Expr = {
    def go(x: Any): Any = x match {
      case s: Selector => f(s)
      case ts: TimeShift => // rewrite the carrier, then recurse inside
        val applied = g(ts)
        applied.copy(inner = go(applied.inner).asInstanceOf[Expr])
      case o: Option[_] => o.map(go)
      case xs: Seq[_] => xs.map(go)
      case p: Product if p.isInstanceOf[Expr] =>
        val args = p.productIterator.map(go)
          .map(_.asInstanceOf[AnyRef]).toArray
        p.getClass.getConstructors.head.newInstance(args: _*)
      case other => other
    }
    go(expr).asInstanceOf[Expr]
  }

  /** Prometheus's `@ start()` / `@ end()` preprocessing: resolve every
    * edge-pinned selector to a literal `@` timestamp given the QUERY's
    * evaluation bounds. Runs once at each public entry point — instant
    * evaluation passes start = end = the eval time, grid evaluation its
    * range bounds — so selectors inside subqueries pin to the outer
    * query's bounds, never to the subquery's derived grid (which is how
    * Prometheus itself scopes the modifier). Idempotent: a resolved
    * tree has no `atEdge` left and recursion rewrites nothing.
    */
  def resolveAtEdges(expr: Expr, startSec: Long, endSec: Long): Expr =
    mapSelectors(expr)(
      s => s.atEdge match {
        case Some(AtStart) => s.copy(atSec = Some(startSec), atEdge = None)
        case Some(AtEnd) => s.copy(atSec = Some(endSec), atEdge = None)
        case None => s
      },
      ts => ts.atEdge match {
        case Some(AtStart) => ts.copy(atSec = Some(startSec), atEdge = None)
        case Some(AtEnd) => ts.copy(atSec = Some(endSec), atEdge = None)
        case None => ts
      })

  private def hasAtEdge(x: Any): Boolean = x match {
    case s: Selector => s.atEdge.nonEmpty
    case ts: TimeShift => ts.atEdge.nonEmpty || hasAtEdge(ts.inner)
    case o: Option[_] => o.exists(hasAtEdge)
    case xs: Seq[_] => xs.exists(hasAtEdge)
    case p: Product if p.isInstanceOf[Expr] =>
      p.productIterator.exists(hasAtEdge)
    case _ => false
  }

  /** Evaluate `expr` as an instant query at `atEpochSec`. */
  def evalInstant(metrics: DataFrame, expr0: Expr, atEpochSec: Long,
      lookbackSec: Long = PromOps.DefaultLookbackSec): DataFrame = {
    // instant query: start() = end() = the evaluation time
    val expr =
      if (hasAtEdge(expr0)) resolveAtEdges(expr0, atEpochSec, atEpochSec)
      else expr0
    evalInstantResolved(metrics, expr, atEpochSec, lookbackSec)
  }

  private def evalInstantResolved(metrics: DataFrame, expr: Expr,
      atEpochSec: Long, lookbackSec: Long): DataFrame = expr match {
    case TimeShift(inner, off, at, _) =>
      // subquery offset/@: rebase the subtree's evaluation instant —
      // `@` replaces it, offset then applies relative to it
      evalInstant(metrics, inner, at.getOrElse(atEpochSec) - off, lookbackSec)
    case s: Selector =>
      applyMatchers(
        PromOps.instantVector(matcherFilter(metrics, s), s.name,
          s.evalAt(atEpochSec), lookbackSec))
    case BoolCmp(inner, op, v) =>
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("value", PromOps.boolCmp(col("value"), op, v))
    case FilterCmp(inner, op, v) =>
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .filter(PromOps.boolCmp(col("value"), op, v) === 1.0)
    case Arith(inner, op, v) =>
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("value", arith(col("value"), op, v))
    case Agg(fn, inner, by, without) =>
      regroup(evalInstant(metrics, inner, atEpochSec, lookbackSec), fn, by, without, Nil)
    case OverTime(fn, sel, w) =>
      val rs = PromOps.rangeSelector(matcherFilter(metrics, sel), sel.name,
        sel.evalAt(atEpochSec), w)
      rs.groupBy(col("skey")).agg(overTimeAgg(fn, col("e")).as("value"))
    case Rate(kind, sel, w) if kind == "resets" || kind == "changes" =>
      PromOps.resetsOverRange(matcherFilter(metrics, sel), sel.name,
        sel.evalAt(atEpochSec), w, kind)
    case Rate(kind, sel, w) =>
      PromOps.rateOverRange(matcherFilter(metrics, sel), sel.name,
        sel.evalAt(atEpochSec), w, kind)
    case OverTimeSubquery(fn, inner, w, step) =>
      val g0 = ((atEpochSec - w) / step + 1) * step // first aligned point > t-w
      val g1 = (atEpochSec / step) * step
      evalGrid(metrics, inner, g0, g1, step, lookbackSec)
        .groupBy(col("skey")).agg(overTimeAgg(fn, col("g")).as("value"))
    case RateSubquery(kind, inner, w, step) =>
      // the inner expression's grid values play the samples; the same
      // reset-aware machinery then runs per series over (g, value)
      val g0 = ((atEpochSec - w) / step + 1) * step
      val g1 = (atEpochSec / step) * step
      val samples = evalGrid(metrics, inner, g0, g1, step, lookbackSec)
        .select(col("skey"), col("g").as("e"), col("value"))
      if (kind == "resets" || kind == "changes")
        PromOps.resetsFromSamples(samples, kind)
      else PromOps.rateFromSamples(samples, kind,
        lit(atEpochSec - w), lit(atEpochSec), w)
    case VecBin(op, l, r, on, ignoring, groupSide, _)
        if scalarish(l) != scalarish(r) =>
      // vector op scalar-expression: the scalar side is ONE row by
      // construction, so the pairing is an explicit broadcast cross
      // join — every left series sees the same scalar, no shuffle.
      // Prometheus rejects matching modifiers on scalar operands; so do
      // we, loudly, rather than silently dropping them (ADVICE r5).
      require(on.isEmpty && ignoring.isEmpty && groupSide.isEmpty,
        "on/ignoring/group_* are invalid with a scalar-typed operand")
      val (vec, sc, scalarOnLeft) =
        if (scalarish(l)) (r, l, true) else (l, r, false)
      val vf = evalInstant(metrics, vec, atEpochSec, lookbackSec)
      PromParser.constFold(sc) match {
        case Some(v) => // literal-only scalar side: plain column math
          val value =
            if (scalarOnLeft) arith2(lit(v), op, col("value"))
            else arith2(col("value"), op, lit(v))
          vf.select(col("skey"), value.as("value"))
        case None =>
          val sf = broadcast(evalInstant(metrics, sc, atEpochSec, lookbackSec)
            .select(col("value").as("scv")))
          val value =
            if (scalarOnLeft) arith2(col("scv"), op, col("value"))
            else arith2(col("value"), op, col("scv"))
          vf.crossJoin(sf).select(col("skey"), value.as("value"))
      }
    case VecBin(op, l, r, on, ignoring, groupSide, groupLabels) =>
      vecBin(evalInstant(metrics, l, atEpochSec, lookbackSec),
        evalInstant(metrics, r, atEpochSec, lookbackSec), op, on, ignoring,
        groupSide, groupLabels,
        leftProvenUnique = uniqueUnder(l, on, ignoring),
        rightProvenUnique = uniqueUnder(r, on, ignoring))
    case VecCmp(op, l, r, isBool, on, ignoring)
        if scalarish(l) != scalarish(r) =>
      // vector-scalar comparison: filters the vector (or scores it with
      // bool) against the scalar side's single broadcast value — the
      // Prometheus semantics the equi-join form would silently miss,
      // since the scalar side's key is '{}' (ADVICE r5, medium)
      require(on.isEmpty && ignoring.isEmpty,
        "on/ignoring are invalid with a scalar-typed comparison operand")
      val scalarOnLeft = scalarish(l)
      val (vec, sc) = if (scalarOnLeft) (r, l) else (l, r)
      val vf = evalInstant(metrics, vec, atEpochSec, lookbackSec)
      val sf = broadcast(evalInstant(metrics, sc, atEpochSec, lookbackSec)
        .select(col("value").as("scv")))
      val pred =
        if (scalarOnLeft) PromOps.cmpCol(col("scv"), op, col("value"))
        else PromOps.cmpCol(col("value"), op, col("scv"))
      val joined = vf.crossJoin(sf)
      if (isBool) joined.select(col("skey"), pred.as("value"))
      else joined.filter(pred === 1.0).select(col("skey"), col("value"))
    case VecCmp(op, l, r, isBool, on, ignoring) =>
      vecCmp(evalInstant(metrics, l, atEpochSec, lookbackSec),
        evalInstant(metrics, r, atEpochSec, lookbackSec), op, isBool, on,
        ignoring,
        leftProvenUnique = uniqueUnder(l, on, ignoring),
        rightProvenUnique = uniqueUnder(r, on, ignoring))
    case TopK(fn, k, inner, by, without) =>
      topk(evalInstant(metrics, inner, atEpochSec, lookbackSec), fn, k, by, without)
    case LimitAgg(fn, p, inner, by, without) =>
      limitAgg(evalInstant(metrics, inner, atEpochSec, lookbackSec), fn, p,
        by, without)
    case QuantileOverTime(q, sel, w) =>
      PromOps.quantileOverTime(
        PromOps.rangeSelector(matcherFilter(metrics, sel), sel.name,
          sel.evalAt(atEpochSec), w), q)
    case MadOverTime(sel, w) =>
      PromOps.madOverTime(
        PromOps.rangeSelector(matcherFilter(metrics, sel), sel.name,
          sel.evalAt(atEpochSec), w))
    case QuantileSubquery(q, inner, w, step) =>
      // the SLO idiom: the subquery grid's per-point values ARE the
      // range samples; the rank machinery only sees (skey, value)
      val sg0 = ((atEpochSec - w) / step + 1) * step
      val sg1 = (atEpochSec / step) * step
      PromOps.quantileOverTime(
        evalGrid(metrics, inner, sg0, sg1, step, lookbackSec), q)
    case MadSubquery(inner, w, step) =>
      val sg0 = ((atEpochSec - w) / step + 1) * step
      val sg1 = (atEpochSec / step) * step
      PromOps.madOverTime(
        evalGrid(metrics, inner, sg0, sg1, step, lookbackSec))
    case HoltWintersSubquery(inner, w, step, sf, tf) =>
      val sg0 = ((atEpochSec - w) / step + 1) * step
      val sg1 = (atEpochSec / step) * step
      PromOps.holtWintersFromSamples(
        evalGrid(metrics, inner, sg0, sg1, step, lookbackSec)
          .select(col("skey"), col("g").as("e"), col("value")), sf, tf)
    case DerivSubquery(inner, w, step, predict) =>
      val sg0 = ((atEpochSec - w) / step + 1) * step
      val sg1 = (atEpochSec / step) * step
      PromOps.derivFromSamples(
        evalGrid(metrics, inner, sg0, sg1, step, lookbackSec)
          .select(col("skey"), col("g").as("e"), col("value")),
        lit(atEpochSec - w), w, predict)
    case HistQuantile(q, inner) =>
      PromOps.histogramQuantile(
        evalInstant(metrics, inner, atEpochSec, lookbackSec), q)
    case HistFraction(lo, hi, inner) =>
      PromOps.histogramFraction(
        evalInstant(metrics, inner, atEpochSec, lookbackSec), lo, hi)
    case UnaryFn(fn, inner) =>
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("value", unary(fn, col("value")))
    case Clamp(inner, lo, hi) =>
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("value", clampValue(lo, hi))
    case Deriv(sel, w, predict) =>
      PromOps.derivOverRange(matcherFilter(metrics, sel), sel.name,
        sel.evalAt(atEpochSec), w, predict)
    case RoundFn(inner, to) =>
      // Prometheus round: nearest multiple of `to`, ties rounded up
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("value", floor(col("value") / to + 0.5) * to)
    case AggQuantile(q, inner, by, without) =>
      // regroup the instant vector onto the group key, then the same
      // rank-interpolation machinery as quantile_over_time — quantile
      // ACROSS series instead of across samples
      PromOps.quantileOverTime(
        evalInstant(metrics, inner, atEpochSec, lookbackSec)
          .withColumn("skey", seriesKeyOf(groupLabels(by, without))),
        q)
    case CountValues(lbl, inner, by, without) =>
      // one output series per (group key, formatted value): integers
      // print without a decimal point (the deterministic subset; float
      // formatting is engine-specific — stated in the AST doc)
      val isInt = col("value") === floor(col("value")) &&
        abs(col("value")) < 1e15
      val vstr = when(isInt, col("value").cast("long").cast("string"))
        .otherwise(col("value").cast("string"))
      val kept = map_filter(groupLabels(by, without), (k, _) => k =!= lit(lbl))
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("skey",
          seriesKeyOf(map_concat(kept, map(lit(lbl), vstr))))
        .groupBy(col("skey"))
        .agg(count(lit(1)).cast("double").as("value"))
    case SetOp(op, l, r, None, None) =>
      // set semantics on the full series key: semi/anti joins — the
      // match key is tiny (distinct series), so these broadcast
      val lf = evalInstant(metrics, l, atEpochSec, lookbackSec)
      val rf = evalInstant(metrics, r, atEpochSec, lookbackSec)
      op match {
        case "and" => lf.join(rf.select(col("skey")).distinct(), Seq("skey"), "left_semi")
        case "unless" => lf.join(rf.select(col("skey")).distinct(), Seq("skey"), "left_anti")
        case "or" => lf.unionByName(
          rf.join(lf.select(col("skey")).distinct(), Seq("skey"), "left_anti"))
      }
    case SetOp(op, l, r, on, ignoring) =>
      // on/ignoring (round 17): the same semi/anti/union joins, keyed on
      // the PROJECTED match key (kept labels under `on`, complement
      // under `ignoring`) instead of the full series key — the
      // `up == 1 and on(job) maintenance` idiom. Output rows keep the
      // owning side's full labels untouched (set ops never rewrite
      // labels); only the join key is projected. Distinct projected
      // keys are at most |series| — broadcastable like the bare form.
      val lf = evalInstant(metrics, l, atEpochSec, lookbackSec)
      val rf = evalInstant(metrics, r, atEpochSec, lookbackSec)
      val mk = matchKey(on, ignoring)
      // only the and/unless arms key on the RIGHT side's projected keys
      // (`or` anti-joins the right against the LEFT's); lazy so the `or`
      // arm doesn't appear to depend on it (ADVICE r17)
      lazy val rk = rf.select(mk.as("mkey")).distinct()
      op match {
        case "and" =>
          lf.withColumn("mkey", mk).join(rk, Seq("mkey"), "left_semi")
            .drop("mkey")
        case "unless" =>
          lf.withColumn("mkey", mk).join(rk, Seq("mkey"), "left_anti")
            .drop("mkey")
        case "or" => lf.unionByName(
          rf.withColumn("mkey", mk)
            .join(lf.select(mk.as("mkey")).distinct(), Seq("mkey"),
              "left_anti")
            .drop("mkey"))
      }
    case LabelJoin(inner, dst, sep, srcs) =>
      val labels = PromOps.labelsOf(col("skey"))
      val joined = concat_ws(sep,
        srcs.map(s => coalesce(labels.getItem(s), lit(""))): _*)
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("skey", PromOps.seriesKey(setLabel(labels, dst, joined)))
    case LabelReplace(inner, dst, repl, src, regex) =>
      val labels = PromOps.labelsOf(col("skey"))
      val anchored = "^(?:" + regex + ")$"
      val srcVal = coalesce(labels.getItem(src), lit("")) // missing matches ""
      val newKey = when(srcVal.rlike(anchored),
        PromOps.seriesKey(setLabel(labels, dst,
          regexp_replace(srcVal, anchored, repl))))
        .otherwise(col("skey")) // no match: series unchanged
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .withColumn("skey", newKey)
    case ScalarFn(inner) =>
      // exactly-one-series -> its value; otherwise NaN (Prometheus)
      evalInstant(metrics, inner, atEpochSec, lookbackSec)
        .agg(count(lit(1)).as("n"), min(col("value")).as("v"))
        .select(lit("{}").as("skey"),
          when(col("n") === 1, col("v"))
            .otherwise(lit(Double.NaN)).as("value"))
    case VectorLit(v) =>
      metrics.sparkSession.range(1)
        .select(lit("{}").as("skey"), lit(v).cast("double").as("value"))
    case NumLit(v) => // literal heading an arithmetic chain: one {} row
      metrics.sparkSession.range(1)
        .select(lit("{}").as("skey"), lit(v).cast("double").as("value"))
    case TimeFn() =>
      metrics.sparkSession.range(1)
        .select(lit("{}").as("skey"),
          lit(atEpochSec.toDouble).as("value"))
    case TimestampFn(sel) =>
      PromOps.instantVector(matcherFilter(metrics, sel), sel.name,
        sel.evalAt(atEpochSec), lookbackSec)
        .select(col("skey"), col("e").cast("double").as("value"))
    case Absent(sel) =>
      // alerting primitive: exactly one 1.0 iff no series matched — a
      // count aggregate, usable as a subquery leaf. The output labels
      // are derived from the selector's EQUALITY matchers (they are what
      // alert routing keys on), as Prometheus does.
      evalInstant(metrics, sel, atEpochSec, lookbackSec)
        .agg(count(lit(1)).as("n")).filter(col("n") === 0)
        .select(lit(absentKey(sel)).as("skey"), lit(1.0).as("value"))
    case AbsentOT(sel, w) =>
      // 1 iff the RANGE is empty: no sample from any matching series;
      // labels from the equality matchers, as for absent()
      PromOps.rangeSelector(matcherFilter(metrics, sel), sel.name,
        sel.evalAt(atEpochSec), w)
        .agg(count(lit(1)).as("n")).filter(col("n") === 0)
        .select(lit(absentKey(sel)).as("skey"), lit(1.0).as("value"))
    case HoltWinters(sel, w, sf, tf) =>
      PromOps.holtWinters(matcherFilter(metrics, sel), sel.name,
        sel.evalAt(atEpochSec), w, sf, tf)
    case other =>
      throw new IllegalArgumentException(s"unsupported instant expr: $other")
  }

  /** clamp(v, lo, hi) with lo > hi is NaN for every point, per
    * Prometheus; clamp_min/clamp_max have a single bound and no such
    * degenerate case.
    */
  private def clampValue(lo: Option[Double], hi: Option[Double]): Column = {
    val withLo = lo.fold(col("value"))(v => greatest(col("value"), lit(v)))
    val withBoth = hi.fold(withLo)(v => least(withLo, lit(v)))
    (lo, hi) match {
      case (Some(l), Some(h)) if l > h => lit(Double.NaN)
      case _ => withBoth
    }
  }

  /** Expressions that are one row by construction — legal as the scalar
    * side of a binop or comparison. Closed under arithmetic: a chain of
    * scalar-typed operands stays scalar-typed (`0.5 * scalar(x) + 1`).
    */
  private def scalarish(e: Expr): Boolean = e match {
    case _: ScalarFn | _: VectorLit | _: TimeFn | _: NumLit => true
    case Arith(i, _, _) => scalarish(i)
    case VecBin(_, l, r, None, None, None, _) => scalarish(l) && scalarish(r)
    case _ => false
  }

  private def unary(fn: String, v: Column): Column = fn match {
    case "abs" => abs(v)
    case "ceil" => ceil(v).cast("double") // PromQL math fns return floats
    case "floor" => floor(v).cast("double")
    case "sqrt" => sqrt(v)
    case "exp" => exp(v)
    case "ln" => log(v)
    case "log2" => log2(v)
    case "log10" => log10(v)
    case "sgn" => signum(v)
    // time components of an epoch-seconds value, UTC — pure integer
    // math (hour/minute/day_of_week) or calendar fields on a UTC
    // session (day_of_month/month/year); all exact cross-engine
    // (Column./ is FLOATING division even on longs — floor() it)
    case "hour" => (floor(v / 3600) % 24).cast("double")
    case "minute" => (floor(v / 60) % 60).cast("double")
    case "day_of_week" => // epoch day 0 = Thursday; Prometheus: 0 = Sunday
      ((floor(v / 86400) + 4) % 7).cast("double")
    case "day_of_month" =>
      dayofmonth(timestamp_seconds(v.cast("long"))).cast("double")
    case "day_of_year" =>
      dayofyear(timestamp_seconds(v.cast("long"))).cast("double")
    case "days_in_month" =>
      dayofmonth(last_day(timestamp_seconds(v.cast("long")))).cast("double")
    case "month" => month(timestamp_seconds(v.cast("long"))).cast("double")
    case "year" => year(timestamp_seconds(v.cast("long"))).cast("double")
    // trig family: libm-backed, spec-tested only (never in oracles)
    case "sin" => sin(v)
    case "cos" => cos(v)
    case "tan" => tan(v)
    case "asin" => asin(v)
    case "acos" => acos(v)
    case "atan" => atan(v)
    case "sinh" => sinh(v)
    case "cosh" => cosh(v)
    case "tanh" => tanh(v)
    case "deg" => degrees(v)
    case "rad" => radians(v)
  }

  /** The by/without-filtered label map of the current row's skey; both
    * empty means drop every label (aggregate-everything, key "{}").
    */
  private def groupLabels(by: Seq[String], without: Seq[String]): Column = {
    val labels = PromOps.labelsOf(col("skey"))
    (by, without) match {
      case (b, Nil) =>
        val keep = array(b.map(lit): _*)
        map_filter(labels, (k, _) => array_contains(keep, k))
      case (Nil, w) =>
        val drop = array(w.map(lit): _*)
        map_filter(labels, (k, _) => !array_contains(drop, k))
      case _ => throw new IllegalArgumentException("both by and without given")
    }
  }

  private def seriesKeyOf(labels: Column): Column = PromOps.seriesKey(labels)

  /** Static output-key bound for the one-to-one duplicate guard: Some(K)
    * when every output row's label set is provably a SUBSET of K and
    * rows are unique per full label set. `sum by (user) (x)` gives
    * Some({user}); subsets, value transforms, one-to-one matches, and
    * set operations preserve the bound; anything else answers None and
    * stays guarded. (round 18 — the guard's min(struct) aggregate plans
    * as SortAggregate + Sort + Exchange per side, a real cost at scale
    * that the dominant `by`-aggregated idiom never needs to pay.)
    */
  private def keyedBy(e: Expr): Option[Set[String]] = e match {
    case Agg(_, _, by, Nil) => Some(by.toSet) // by() → Some(∅): one row
    case AggQuantile(_, _, by, Nil) => Some(by.toSet)
    case Arith(inner, _, _) => keyedBy(inner)
    case BoolCmp(inner, _, _) => keyedBy(inner)
    case FilterCmp(inner, _, _) => keyedBy(inner) // row subset
    case UnaryFn(_, inner) => keyedBy(inner)
    case Clamp(inner, _, _) => keyedBy(inner)
    case RoundFn(inner, _) => keyedBy(inner)
    case TopK(_, _, inner, _, _) => keyedBy(inner) // row subset
    case LimitAgg(_, _, inner, _, _) => keyedBy(inner) // row subset
    case VecBin(_, _, _, Some(on), _, None, _) => Some(on.toSet)
    case VecBin(_, l, r, None, None, None, _) =>
      for (kl <- keyedBy(l); kr <- keyedBy(r)) yield kl ++ kr
    case VecCmp(_, _, _, true, Some(on), _) => Some(on.toSet)
    case VecCmp(_, l, _, _, _, _) => keyedBy(l) // left rows (filter) or left keys (bool bare)
    case SetOp("and" | "unless", l, _, _, _) => keyedBy(l)
    case SetOp("or", l, r, _, _) =>
      // union dedups by full key (bare) or by a projection of it: rows
      // with equal full keys collapse either way, so uniqueness holds
      for (kl <- keyedBy(l); kr <- keyedBy(r)) yield kl ++ kr
    case _ => None
  }

  /** True when `e`'s output is provably unique per PROJECTED match key,
    * so [[oneRowPerMatchKey]] can be skipped: under `on(L)` a key bound
    * K ⊆ L projects injectively; under `ignoring(I)` the projection
    * drops nothing when K ∩ I = ∅. The bare form always qualifies (it
    * matches on the full series key, unique per instant vector).
    */
  private def uniqueUnder(e: Expr, on: Option[Seq[String]],
      ignoring: Option[Seq[String]]): Boolean = (on, ignoring) match {
    case (Some(ls), _) => keyedBy(e).exists(_.subsetOf(ls.toSet))
    // disjointness spelled via forall: the purity linter's eager-probe
    // pattern would false-positive on a `).isEmpty` call chain
    case (_, Some(ls)) => keyedBy(e).exists(_.forall(l => !ls.contains(l)))
    case _ => true
  }

  /** The vector-matching key: the full series key (bare op), the
    * kept-label key (`on`), or the complement-label key (`ignoring`).
    *
    * Prometheus treats an empty label value as ABSENT (`labels.Labels`
    * never stores empties; `label_replace`/`label_join` with an empty
    * result DELETE the label — mirrored by [[setLabel]]), so the
    * projected key drops null- and empty-valued entries: a series
    * carrying `k=""` must match one with no `k` at all (ADVICE r17).
    * The engine-wide invariant is that keys never hold empty values —
    * ingest synthesizes non-empty labels and [[setLabel]] deletes
    * empties — so for the bare form the stored `skey` is already
    * canonical and is used as-is; the filter here makes the PROJECTED
    * forms robust to any future frame that breaks the invariant.
    */
  private def matchKey(on: Option[Seq[String]],
      ignoring: Option[Seq[String]]): Column = (on, ignoring) match {
    case (Some(ls), _) =>
      val keep = array(ls.map(lit): _*)
      PromOps.seriesKey(map_filter(PromOps.labelsOf(col("skey")),
        (k, v) => array_contains(keep, k) && v.isNotNull && v =!= ""))
    case (_, Some(ls)) =>
      val drop = array(ls.map(lit): _*)
      PromOps.seriesKey(map_filter(PromOps.labelsOf(col("skey")),
        (k, v) => !array_contains(drop, k) && v.isNotNull && v =!= ""))
    case _ => col("skey")
  }

  /** Prometheus one-to-one matching ERRORS on duplicate series per match
    * group on either side ("found duplicate series for the match group"
    * — promql resultMetric matching). Enforced in-plan with the same
    * idiom as the group_left one-side check: group the side by its match
    * key, pin the group cardinality with assert_true (NULL when the
    * guard holds, so the filter keeps every row), and carry
    * min(struct(payload)) — with exactly one row per group that struct
    * IS the row, so no value is perturbed. Cost shape: the aggregate
    * shuffles on the same key the equi-join hashes on, so the join reads
    * pre-aggregated sides instead of raw sides — one HashAggregate per
    * side on eval-sized frames, no extra exchange beyond what matching
    * already requires.
    */
  private def oneRowPerMatchKey(df: DataFrame, keyCols: Seq[String],
      payload: Seq[String], side: String): DataFrame = {
    val st = struct(payload.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(min(st).as("_row"), count(lit(1)).as("_nm"))
      .filter(assert_true(col("_nm") === 1,
        concat(lit("one-to-one matching: duplicate series on the " +
          s"$side hand-side for match key "), col(keyCols.head))).isNull)
      .select(keyCols.map(col) ++
        payload.map(p => col(s"_row.$p").as(p)): _*)
  }

  /** Vector-vector arithmetic, one-to-one. With a matching modifier the
    * output series carries the match key as its label set, as Prometheus
    * does for one-to-one matches. The join is a plain equi-join on the
    * key — broadcastable when one side is small, shuffle-hash otherwise;
    * no label explosion, no cross join. Duplicate match keys on either
    * side raise at execution via [[oneRowPerMatchKey]], Prometheus's
    * one-to-one rule. `groupLabels` is the
    * `group_left(version)` label-copy list: the listed labels are copied
    * from the ONE side onto each output series (missing labels remove
    * the label, Prometheus's overwrite rule).
    */
  private def vecBin(left: DataFrame, right: DataFrame, op: String,
      on: Option[Seq[String]], ignoring: Option[Seq[String]],
      groupSide: Option[String] = None,
      groupLabels: Seq[String] = Nil,
      extraKeys: Seq[String] = Nil,
      leftProvenUnique: Boolean = false,
      rightProvenUnique: Boolean = false): DataFrame = {
    val mkey = matchKey(on, ignoring)
    // `extraKeys` (the grid point for range evaluation) ride along in
    // every join/group key, so a range binop matches per (series, point)
    val extras = extraKeys.map(col)
    groupSide match {
      case None =>
        // duplicate match keys are only POSSIBLE under on/ignoring (the
        // key projects to a label subset); the bare form matches on the
        // full series key, unique per instant vector by construction —
        // Prometheus's binop never sees duplicate full labelsets either
        // (it errors at the producing function), so skipping the guard
        // there is exact, and the guarded plan is paid only where the
        // semantics demand it. A side whose uniqueness is STRUCTURAL
        // ([[uniqueUnder]]: e.g. `sum by (user) (x)` matched `on(user)`)
        // also skips — the guard's min(struct) aggregate costs a
        // SortAggregate+Sort+Exchange pipeline that a proof makes
        // unreachable (round 18).
        val guard = on.nonEmpty || ignoring.nonEmpty
        def side(df: DataFrame, v: String, which: String,
            proven: Boolean): DataFrame = {
          val sel = df.select(
            mkey.as("skey") +: extras :+ col("value").as(v): _*)
          if (guard && !proven)
            oneRowPerMatchKey(sel, "skey" +: extraKeys, Seq(v), which)
          else sel
        }
        val lf = side(left, "lv", "left", leftProvenUnique)
        val rf = side(right, "rv", "right", rightProvenUnique)
        lf.join(rf, "skey" +: extraKeys)
          .select(col("skey") +: extras :+
            arith2(col("lv"), op, col("rv")).as("value"): _*)
      case Some(side) =>
        // many-to-one: the group_left/right side is the MANY side and
        // keeps its full series key; the other side joins on the match
        // key alone (one row per key — typically a by()-aggregate, so
        // small and broadcastable). Uniqueness on the 'one' side is
        // ENFORCED: a duplicate match key raises at execution (Prometheus
        // errors on many-to-many matches rather than multiplying rows).
        // assert_true returns NULL when the guard holds, so the filter
        // keeps every row while pinning the check into the plan. The
        // label-copy values ride the same one-row-per-key aggregate, so
        // the copy costs nothing beyond the columns themselves.
        val (many, one) = if (side == "left") (left, right) else (right, left)
        val mf = many.select(col("skey") +: mkey.as("mkey") +: extras :+
          col("value").as("manyv"): _*)
        val oneLabels = PromOps.labelsOf(col("skey"))
        val copySel = groupLabels.zipWithIndex.map { case (lbl, i) =>
          oneLabels.getItem(lbl).as(s"cp$i") }
        val copyCols = groupLabels.indices.map(i => col(s"cp$i"))
        val aggs = Seq(min(col("onev")).as("onev"),
          count(lit(1)).as("nmatch")) ++
          groupLabels.indices.map(i => min(col(s"cp$i")).as(s"cp$i"))
        val of = one.select(Seq(mkey.as("mkey")) ++ extras ++ copySel :+
          col("value").as("onev"): _*)
          .groupBy(col("mkey") +: extras: _*)
          .agg(aggs.head, aggs.tail: _*)
          .filter(assert_true(col("nmatch") === 1,
            concat(lit("many-to-many matching: duplicate 'one'-side series for key "),
              col("mkey"))).isNull)
          .select(Seq(col("mkey")) ++ extras ++ copyCols :+ col("onev"): _*)
        val joined = mf.join(of, "mkey" +: extraKeys)
        val value =
          if (side == "left") arith2(col("manyv"), op, col("onev"))
          else arith2(col("onev"), op, col("manyv"))
        val outKey =
          if (groupLabels.isEmpty) col("skey")
          else PromOps.seriesKey(
            groupLabels.zipWithIndex.foldLeft(PromOps.labelsOf(col("skey"))) {
              case (lbls, (lbl, i)) => setLabel(lbls, lbl, col(s"cp$i"))
            })
        joined.select(outKey.as("skey") +: extras :+ value.as("value"): _*)
    }
  }

  /** Vector-vector comparison: equi-join on the match key. Without
    * `bool` the LEFT series survives with its full label set and value
    * when the predicate holds (the filtering form); with `bool` every
    * matched pair scores 1/0, and under a matching modifier the output
    * carries the match key as its label set (the one-to-one output-label
    * rule). Broadcastable when one side is small. Duplicate match keys
    * on either side raise at execution via [[oneRowPerMatchKey]] —
    * comparisons use the same one-to-one matching machinery as
    * arithmetic in Prometheus, so the same duplicate-series rule
    * applies (the left side's full skey rides the payload struct, so
    * the filtering form still emits the left series unchanged).
    */
  private def vecCmp(left: DataFrame, right: DataFrame, op: String,
      isBool: Boolean, on: Option[Seq[String]],
      ignoring: Option[Seq[String]], extraKeys: Seq[String] = Nil,
      leftProvenUnique: Boolean = false,
      rightProvenUnique: Boolean = false): DataFrame = {
    val mkey = matchKey(on, ignoring)
    val extras = extraKeys.map(col)
    // same scoping rule as [[vecBin]]: the guard is paid only under
    // on/ignoring, the only forms where duplicate match keys can exist —
    // and only on sides whose uniqueness isn't structural (round 18)
    val guard = on.nonEmpty || ignoring.nonEmpty
    val lfSel = left.select(Seq(mkey.as("mkey")) ++ extras ++
      Seq(col("skey"), col("value").as("lv")): _*)
    val rfSel = right.select(
      mkey.as("mkey") +: extras :+ col("value").as("rv"): _*)
    val lf = if (guard && !leftProvenUnique)
      oneRowPerMatchKey(lfSel, "mkey" +: extraKeys, Seq("skey", "lv"), "left")
    else lfSel
    val rf = if (guard && !rightProvenUnique)
      oneRowPerMatchKey(rfSel, "mkey" +: extraKeys, Seq("rv"), "right")
    else rfSel
    val joined = lf.join(rf, "mkey" +: extraKeys)
    val pred = PromOps.cmpCol(col("lv"), op, col("rv"))
    if (isBool) {
      val outKey =
        if (on.isEmpty && ignoring.isEmpty) col("skey") else col("mkey")
      joined.select(outKey.as("skey") +: extras :+ pred.as("value"): _*)
    } else joined.filter(pred === 1.0)
      .select(col("skey") +: extras :+ col("lv").as("value"): _*)
  }

  /** topk/bottomk: whole-series selection, deterministic skey tie-break.
    * Global top-k (no by/without) compiles to orderBy+limit — Spark plans
    * TakeOrderedAndProject, a distributed per-partition heap + single
    * merge of k rows, never a full sort. Grouped top-k is a row_number
    * window over the group key: one shuffle on the group key, heap-sorted
    * partitions.
    */
  private def topk(df: DataFrame, fn: String, k: Int,
      by: Seq[String], without: Seq[String]): DataFrame = {
    val ord =
      if (fn == "topk") Seq(col("value").desc, col("skey").asc)
      else Seq(col("value").asc, col("skey").asc)
    (by, without) match {
      case (Nil, Nil) => df.orderBy(ord: _*).limit(k).select(col("skey"), col("value"))
      case _ =>
        // grouped form: the K-bounded native aggregate, never a per-group
        // window sort (series per group can be corpus-sized). Descending
        // value rides as its exact IEEE negation; a NaN value then sorts
        // LAST under the aggregate's total order, i.e. NaN never beats a
        // number — which is Prometheus's own topk rule (the former
        // window's `desc` put NaN first). bottomk's ascending order
        // already sorts NaN last both ways.
        val gkeyCol: Column = (by, without) match {
          case (b, Nil) =>
            val keep = array(b.map(lit): _*)
            PromOps.seriesKey(map_filter(PromOps.labelsOf(col("skey")),
              (key, _) => array_contains(keep, key)))
          case (Nil, w) =>
            val drop = array(w.map(lit): _*)
            PromOps.seriesKey(map_filter(PromOps.labelsOf(col("skey")),
              (key, _) => !array_contains(drop, key)))
          case _ => throw new IllegalArgumentException("both by and without given")
        }
        val vOrd = if (fn == "topk") (-col("value")).as("v") else col("value").as("v")
        graft.ext.Ranking.explodeTopK(
          df.withColumn("gkey", gkeyCol),
          Seq("gkey"),
          struct(vOrd, col("skey")),
          struct(col("skey"), col("value")), k)
          .select(col("skey"), col("value"))
    }
  }

  /** limitk / limit_ratio on an instant vector (deterministic stated
    * deviations — see [[PromParser.LimitAgg]]). limitk's global form is a
    * TakeOrderedAndProject (k smallest series keys, never a full sort);
    * the grouped form is one row_number window. limit_ratio is a pure
    * filter on the 60-bit-md5 unit-interval hash of the series key —
    * no shuffle at all, and the same series survive on every evaluation
    * and every engine.
    */
  private def limitAgg(df: DataFrame, fn: String, p: Double,
      by: Seq[String], without: Seq[String]): DataFrame = fn match {
    case "limitk" =>
      (by, without) match {
        case (Nil, Nil) =>
          df.orderBy(col("skey").asc).limit(p.toInt)
            .select(col("skey"), col("value"))
        case _ =>
          // K-bounded native aggregate (k lexicographically-smallest
          // series keys per group), same shape as grouped topk
          graft.ext.Ranking.explodeTopK(
            df.withColumn("gkey", seriesKeyOf(groupLabels(by, without))),
            Seq("gkey"),
            struct(col("skey")),
            struct(col("skey"), col("value")), p.toInt)
            .select(col("skey"), col("value"))
      }
    case "limit_ratio" =>
      df.filter(ratioKeep(p)).select(col("skey"), col("value"))
  }

  /** The limit_ratio keep predicate: h(skey) ∈ [0,1) from the repo's
    * standard 60-bit md5 prefix; r ≥ 0 keeps h < r, r < 0 keeps the
    * complement h ≥ 1+r — the two partition the vector exactly.
    */
  private def ratioKeep(p: Double): Column = {
    val h = conv(substring(md5(col("skey")), 1, 15), 16, 10)
      .cast("long").cast("double") / math.pow(2, 60)
    if (p >= 0) h < lit(p) else h >= lit(1.0 + p)
  }

  /** Set/overwrite one label; an empty or null value REMOVES it
    * (Prometheus's label_replace/label_join contract).
    */
  private def setLabel(labels: Column, dst: String, value: Column): Column = {
    val without = map_filter(labels, (k, _) => k =!= lit(dst))
    when(value.isNull || value === "", without)
      .otherwise(map_concat(without, map(lit(dst), value)))
  }

  private def arith2(l: Column, op: String, r: Column): Column = op match {
    case "*" => l * r
    case "/" => l / r
    case "+" => l + r
    case "-" => l - r
    case "%" => l % r // Spark Remainder == Java % == Go math.Mod (fmod)
    case "^" => pow(l, r)
    case "atan2" => atan2(l, r) // libm → spec-only policy, like ^
  }

  /** Evaluate `expr` at every aligned grid point in [g0, g1] (step-aligned):
    * (skey, g, value).
    */
  def evalGrid(metrics: DataFrame, expr0: Expr, g0: Long, g1: Long,
      stepSec: Long, lookbackSec: Long): DataFrame = {
    // range query: start()/end() pin to the range's own bounds. By the
    // time a subquery recursion re-enters here the top-level resolve has
    // already run (hasAtEdge is false), so inner selectors can never pin
    // to a subquery's derived grid.
    val expr =
      if (hasAtEdge(expr0)) resolveAtEdges(expr0, g0, g1) else expr0
    evalGridResolved(metrics, expr, g0, g1, stepSec, lookbackSec)
  }

  private def evalGridResolved(metrics: DataFrame, expr: Expr, g0: Long,
      g1: Long, stepSec: Long, lookbackSec: Long): DataFrame = expr match {
    case ts: TimeShift if ts.atSec.nonEmpty =>
      // @-pinned subquery on a grid: one instant evaluation, replicated
      // across the grid points (the selector pinnedGrid discipline)
      pinnedGrid(metrics, ts, g0, g1, stepSec, lookbackSec)
    case TimeShift(inner, off, None, _) =>
      // offset subquery per grid point: evaluate the shifted grid and
      // relabel, exactly the selector-offset rule
      require(off % stepSec == 0,
        s"subquery offset ${off}s must be a multiple of the ${stepSec}s step")
      val base = evalGrid(metrics, inner, g0 - off, g1 - off, stepSec, lookbackSec)
      if (off == 0) base else base.withColumn("g", col("g") + off)
    case s: Selector if s.atSec.nonEmpty =>
      pinnedGrid(metrics, s, g0, g1, stepSec, lookbackSec)
    case s: Selector =>
      // offset shifts every evaluation point: value at g is the selector
      // at g - offset, so evaluate the shifted grid and relabel. The
      // offset must keep the grid step-aligned.
      require(s.offsetSec % stepSec == 0,
        s"offset ${s.offsetSec}s must be a multiple of the ${stepSec}s step")
      val off = s.offsetSec
      val base = PromOps.rangeEval(matcherFilter(metrics, s), s.name,
        g0 - off, g1 - off, stepSec, lookbackSec)
      if (off == 0) base else base.withColumn("g", col("g") + off)
    case BoolCmp(inner, op, v) =>
      evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .withColumn("value", PromOps.boolCmp(col("value"), op, v))
    case FilterCmp(inner, op, v) =>
      evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .filter(PromOps.boolCmp(col("value"), op, v) === 1.0)
    case Arith(inner, op, v) =>
      evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .withColumn("value", arith(col("value"), op, v))
    case Agg(fn, inner, by, without) =>
      regroup(evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec),
        fn, by, without, Seq("g"))
    case OverTime(_, sel, _) if sel.atSec.nonEmpty =>
      pinnedGrid(metrics, expr, g0, g1, stepSec, lookbackSec)
    case OverTime(fn, sel, w) =>
      // moving-window family at range — one explode + one aggregation,
      // linear in samples × window/step (PromOps.windowGrid)
      require(sel.offsetSec % stepSec == 0,
        s"offset ${sel.offsetSec}s must be a multiple of the ${stepSec}s step")
      val off = sel.offsetSec
      val base = PromOps.windowGrid(matcherFilter(metrics, sel), sel.name,
        g0 - off, g1 - off, stepSec, w)
        .groupBy(col("skey"), col("g"))
        .agg(overTimeAgg(fn, col("e")).as("value"))
      if (off == 0) base else base.withColumn("g", col("g") + off)
    case Rate(_, sel, _) if sel.atSec.nonEmpty =>
      pinnedGrid(metrics, expr, g0, g1, stepSec, lookbackSec)
    case Rate(kind, sel, w) =>
      require(sel.offsetSec % stepSec == 0,
        s"offset ${sel.offsetSec}s must be a multiple of the ${stepSec}s step")
      val off = sel.offsetSec
      val base = PromOps.rateOverGrid(matcherFilter(metrics, sel), sel.name,
        g0 - off, g1 - off, stepSec, w, kind)
      if (off == 0) base else base.withColumn("g", col("g") + off)
    case VecBin(op, l, r, on, ignoring, groupSide, _)
        if scalarish(l) != scalarish(r) =>
      // vector op scalar per grid point: the scalar side is one row per
      // point, so the pairing is a broadcast equi-join on g alone
      require(on.isEmpty && ignoring.isEmpty && groupSide.isEmpty,
        "on/ignoring/group_* are invalid with a scalar-typed operand")
      val (vec, sc, scalarOnLeft) =
        if (scalarish(l)) (r, l, true) else (l, r, false)
      val vf = evalGrid(metrics, vec, g0, g1, stepSec, lookbackSec)
      PromParser.constFold(sc) match {
        case Some(v) =>
          val value =
            if (scalarOnLeft) arith2(lit(v), op, col("value"))
            else arith2(col("value"), op, lit(v))
          vf.select(col("skey"), col("g"), value.as("value"))
        case None =>
          val sf = broadcast(evalGrid(metrics, sc, g0, g1, stepSec, lookbackSec)
            .select(col("g"), col("value").as("scv")))
          val value =
            if (scalarOnLeft) arith2(col("scv"), op, col("value"))
            else arith2(col("value"), op, col("scv"))
          vf.join(sf, "g").select(col("skey"), col("g"), value.as("value"))
      }
    case VecBin(op, l, r, on, ignoring, groupSide, groupLabels) =>
      // per-point vector matching: the ratio-of-rates range panel.
      // The uniqueness proofs carry per grid point: a by-aggregate is
      // one row per (group key, g), and `g` rides every join key.
      vecBin(evalGrid(metrics, l, g0, g1, stepSec, lookbackSec),
        evalGrid(metrics, r, g0, g1, stepSec, lookbackSec), op, on,
        ignoring, groupSide, groupLabels, extraKeys = Seq("g"),
        leftProvenUnique = uniqueUnder(l, on, ignoring),
        rightProvenUnique = uniqueUnder(r, on, ignoring))
    case UnaryFn(fn, inner) =>
      evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .withColumn("value", unary(fn, col("value")))
    case RoundFn(inner, to) =>
      evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .withColumn("value", floor(col("value") / to + 0.5) * to)
    case Clamp(inner, lo, hi) =>
      evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .withColumn("value", clampValue(lo, hi))
    case VecCmp(op, l, r, isBool, on, ignoring)
        if scalarish(l) != scalarish(r) =>
      // vector-scalar comparison per grid point (see the instant twin)
      require(on.isEmpty && ignoring.isEmpty,
        "on/ignoring are invalid with a scalar-typed comparison operand")
      val scalarOnLeft = scalarish(l)
      val (vec, sc) = if (scalarOnLeft) (r, l) else (l, r)
      val vf = evalGrid(metrics, vec, g0, g1, stepSec, lookbackSec)
      val sf = broadcast(evalGrid(metrics, sc, g0, g1, stepSec, lookbackSec)
        .select(col("g"), col("value").as("scv")))
      val pred =
        if (scalarOnLeft) PromOps.cmpCol(col("scv"), op, col("value"))
        else PromOps.cmpCol(col("value"), op, col("scv"))
      val joined = vf.join(sf, "g")
      if (isBool) joined.select(col("skey"), col("g"), pred.as("value"))
      else joined.filter(pred === 1.0)
        .select(col("skey"), col("g"), col("value"))
    case VecCmp(op, l, r, isBool, on, ignoring) =>
      vecCmp(evalGrid(metrics, l, g0, g1, stepSec, lookbackSec),
        evalGrid(metrics, r, g0, g1, stepSec, lookbackSec), op, isBool, on,
        ignoring, extraKeys = Seq("g"),
        leftProvenUnique = uniqueUnder(l, on, ignoring),
        rightProvenUnique = uniqueUnder(r, on, ignoring))
    case SetOp(op, l, r, None, None) =>
      // per-point set semantics on the series key
      val lf = evalGrid(metrics, l, g0, g1, stepSec, lookbackSec)
      val rf = evalGrid(metrics, r, g0, g1, stepSec, lookbackSec)
      lazy val rk = rf.select(col("skey"), col("g")).distinct()
      op match {
        case "and" => lf.join(rk, Seq("skey", "g"), "left_semi")
        case "unless" => lf.join(rk, Seq("skey", "g"), "left_anti")
        case "or" => lf.unionByName(
          rf.join(lf.select(col("skey"), col("g")).distinct(),
            Seq("skey", "g"), "left_anti"))
      }
    case SetOp(op, l, r, on, ignoring) =>
      // projected-key matching per grid point (the instant-eval round-17
      // on/ignoring semantics, with the grid column joining the key)
      val lf = evalGrid(metrics, l, g0, g1, stepSec, lookbackSec)
      val rf = evalGrid(metrics, r, g0, g1, stepSec, lookbackSec)
      val mk = matchKey(on, ignoring)
      // lazy for the same reason as the instant twin: `or` never reads it
      lazy val rk = rf.select(mk.as("mkey"), col("g")).distinct()
      op match {
        case "and" =>
          lf.withColumn("mkey", mk).join(rk, Seq("mkey", "g"), "left_semi")
            .drop("mkey")
        case "unless" =>
          lf.withColumn("mkey", mk).join(rk, Seq("mkey", "g"), "left_anti")
            .drop("mkey")
        case "or" => lf.unionByName(
          rf.withColumn("mkey", mk)
            .join(lf.select(mk.as("mkey"), col("g")).distinct(),
              Seq("mkey", "g"), "left_anti")
            .drop("mkey"))
      }
    case Deriv(sel, _, _) if sel.atSec.nonEmpty =>
      pinnedGrid(metrics, expr, g0, g1, stepSec, lookbackSec)
    case Deriv(sel, w, predict) =>
      // offset: evaluate the shifted grid and relabel, as for OverTime
      require(sel.offsetSec % stepSec == 0,
        s"offset ${sel.offsetSec}s must be a multiple of the ${stepSec}s step")
      val off = sel.offsetSec
      val base = PromOps.derivOverGrid(matcherFilter(metrics, sel), sel.name,
        g0 - off, g1 - off, stepSec, w, predict)
      if (off == 0) base else base.withColumn("g", col("g") + off)
    case QuantileOverTime(_, sel, _) if sel.atSec.nonEmpty =>
      pinnedGrid(metrics, expr, g0, g1, stepSec, lookbackSec)
    case QuantileOverTime(q, sel, w) =>
      require(sel.offsetSec % stepSec == 0,
        s"offset ${sel.offsetSec}s must be a multiple of the ${stepSec}s step")
      val off = sel.offsetSec
      val base = PromOps.quantileOverTime(
        PromOps.windowGrid(matcherFilter(metrics, sel), sel.name,
          g0 - off, g1 - off, stepSec, w),
        q, extraKeys = Seq("g"))
      if (off == 0) base else base.withColumn("g", col("g") + off)
    case MadOverTime(sel, _) if sel.atSec.nonEmpty =>
      pinnedGrid(metrics, expr, g0, g1, stepSec, lookbackSec)
    case MadOverTime(sel, w) =>
      require(sel.offsetSec % stepSec == 0,
        s"offset ${sel.offsetSec}s must be a multiple of the ${stepSec}s step")
      val off = sel.offsetSec
      val base = PromOps.madOverTime(
        PromOps.windowGrid(matcherFilter(metrics, sel), sel.name,
          g0 - off, g1 - off, stepSec, w), extraKeys = Seq("g"))
      if (off == 0) base else base.withColumn("g", col("g") + off)
    case Absent(sel) if sel.atSec.nonEmpty =>
      pinnedGrid(metrics, expr, g0, g1, stepSec, lookbackSec)
    case Absent(sel) =>
      // per-point absence of the instant vector: grid points where no
      // sample is visible under the staleness rule — anti-join of the
      // dense grid against the sparse presence set
      require(sel.offsetSec == 0,
        "offset on a grid absent() is unsupported (stated)")
      val present = PromOps.rangeEval(matcherFilter(metrics, sel), sel.name,
        g0, g1, stepSec, lookbackSec).select(col("g")).distinct()
      gridFrame(metrics, g0, g1, stepSec)
        .join(broadcast(present), Seq("g"), "left_anti")
        .select(lit(absentKey(sel)).as("skey"), col("g"), lit(1.0).as("value"))
    case AbsentOT(sel, _) if sel.atSec.nonEmpty =>
      pinnedGrid(metrics, expr, g0, g1, stepSec, lookbackSec)
    case AbsentOT(sel, w) =>
      require(sel.offsetSec == 0,
        "offset on a grid absent_over_time() is unsupported (stated)")
      val present = PromOps.windowGrid(matcherFilter(metrics, sel), sel.name,
        g0, g1, stepSec, w).select(col("g")).distinct()
      gridFrame(metrics, g0, g1, stepSec)
        .join(broadcast(present), Seq("g"), "left_anti")
        .select(lit(absentKey(sel)).as("skey"), col("g"), lit(1.0).as("value"))
    case HistQuantile(q, inner) =>
      PromOps.histogramQuantile(
        evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec),
        q, extraKeys = Seq("g"))
    case HistFraction(lo, hi, inner) =>
      PromOps.histogramFraction(
        evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec),
        lo, hi, extraKeys = Seq("g"))
    case NumLit(v) =>
      gridFrame(metrics, g0, g1, stepSec)
        .withColumn("value", lit(v).cast("double"))
    case VectorLit(v) =>
      gridFrame(metrics, g0, g1, stepSec)
        .withColumn("value", lit(v).cast("double"))
    case TimeFn() => // time() on a grid is the grid point itself
      gridFrame(metrics, g0, g1, stepSec)
        .withColumn("value", col("g").cast("double"))
    case ScalarFn(inner) =>
      // scalar() per grid point: the single series' value where exactly
      // one series exists at that point, NaN otherwise — including points
      // where the inner vector is EMPTY, so the sparse grid left-joins
      // against the dense one
      val agg = evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n"), min(col("value")).as("v"))
      gridFrame(metrics, g0, g1, stepSec)
        .join(broadcast(agg), Seq("g"), "left")
        .select(col("skey"), col("g"),
          when(col("n") === 1, col("v"))
            .otherwise(lit(Double.NaN)).as("value"))
    case HoltWinters(sel, _, _, _) if sel.atSec.nonEmpty =>
      pinnedGrid(metrics, expr, g0, g1, stepSec, lookbackSec)
    case HoltWinters(sel, w, sf, tf) =>
      require(sel.offsetSec % stepSec == 0,
        s"offset ${sel.offsetSec}s must be a multiple of the ${stepSec}s step")
      val off = sel.offsetSec
      val base = PromOps.holtWintersGrid(matcherFilter(metrics, sel), sel.name,
        g0 - off, g1 - off, stepSec, w, sf, tf)
      if (off == 0) base else base.withColumn("g", col("g") + off)
    case TopK(fn, k, inner, by, without) =>
      // top-k PER GRID POINT: the grid point joins the window partition
      // key, so the global form is a per-point heap, not a global sort
      import org.apache.spark.sql.expressions.Window
      val df = evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
      val ord =
        if (fn == "topk") Seq(col("value").desc, col("skey").asc)
        else Seq(col("value").asc, col("skey").asc)
      val parts: Seq[Column] = (by, without) match {
        case (Nil, Nil) => Seq(col("g"))
        case _ => Seq(seriesKeyOf(groupLabels(by, without)), col("g"))
      }
      df.withColumn("rn",
          row_number().over(Window.partitionBy(parts: _*).orderBy(ord: _*)))
        .filter(col("rn") <= k)
        .select(col("skey"), col("g"), col("value"))
    case OverTimeSubquery(fn, inner, w, sstep) =>
      subqueryPoints(metrics, inner, w, sstep, g0, g1, stepSec, lookbackSec)
        .groupBy(col("skey"), col("og"))
        .agg(overTimeAgg(fn, col("ig")).as("value"))
        .select(col("skey"), col("og").as("g"), col("value"))
    case RateSubquery(kind, inner, w, sstep) =>
      val pts = subqueryPoints(metrics, inner, w, sstep, g0, g1, stepSec,
          lookbackSec)
        .select(col("skey"), col("og").as("g"), col("ig").as("e"),
          col("value"))
      if (kind == "resets" || kind == "changes")
        PromOps.resetsFromSamples(pts, kind, extraKeys = Seq("g"))
          .select(col("skey"), col("g"), col("value"))
      else
        PromOps.rateFromSamples(pts, kind, col("g") - w, col("g"), w,
          extraKeys = Seq("g"))
          .select(col("skey"), col("g"), col("value"))
    case QuantileSubquery(q, inner, w, sstep) =>
      PromOps.quantileOverTime(
        subqueryPoints(metrics, inner, w, sstep, g0, g1, stepSec, lookbackSec)
          .select(col("skey"), col("og").as("g"), col("value")),
        q, extraKeys = Seq("g"))
    case MadSubquery(inner, w, sstep) =>
      PromOps.madOverTime(
        subqueryPoints(metrics, inner, w, sstep, g0, g1, stepSec, lookbackSec)
          .select(col("skey"), col("og").as("g"), col("value")),
        extraKeys = Seq("g"))
    case HoltWintersSubquery(inner, w, sstep, sf, tf) =>
      PromOps.holtWintersFromSamples(
        subqueryPoints(metrics, inner, w, sstep, g0, g1, stepSec, lookbackSec)
          .select(col("skey"), col("og").as("g"), col("ig").as("e"),
            col("value")),
        sf, tf, extraKeys = Seq("g"))
    case DerivSubquery(inner, w, sstep, predict) =>
      PromOps.derivFromSamples(
        subqueryPoints(metrics, inner, w, sstep, g0, g1, stepSec, lookbackSec)
          .select(col("skey"), col("og").as("g"), col("ig").as("e"),
            col("value")),
        col("g") - w, w, predict, extraKeys = Seq("g"))
    case LimitAgg(fn, p, inner, by, without) =>
      // per grid point, same deterministic rules as the instant form;
      // limit_ratio's hash ignores g, so a series is kept or dropped
      // uniformly across the whole range — Prometheus's documented
      // "consistent sampling across steps" property for free
      import org.apache.spark.sql.expressions.Window
      val df = evalGrid(metrics, inner, g0, g1, stepSec, lookbackSec)
      fn match {
        case "limitk" =>
          val parts: Seq[Column] = (by, without) match {
            case (Nil, Nil) => Seq(col("g"))
            case _ => Seq(seriesKeyOf(groupLabels(by, without)), col("g"))
          }
          df.withColumn("rn", row_number().over(
              Window.partitionBy(parts: _*).orderBy(col("skey").asc)))
            .filter(col("rn") <= p.toInt)
            .select(col("skey"), col("g"), col("value"))
        case "limit_ratio" =>
          df.filter(ratioKeep(p)).select(col("skey"), col("g"), col("value"))
      }
    case other =>
      throw new IllegalArgumentException(s"unsupported grid expr: $other")
  }

  /** Subquery points exploded to the outer grid — range evaluation of
    * `fn((expr)[w:s])`: the inner expression evaluates ONCE on its own
    * aligned grid spanning every outer window, then each inner point
    * (skey, ig, value) maps to the outer points og whose window
    * (og−w, og] contains it — the same sample→grid explode
    * [[PromOps.rangeEval]] uses, applied to evaluated values instead of
    * raw samples. Cost is linear in inner points × (w/step) fan-out;
    * nothing is re-evaluated per outer point, and the shuffle key gains
    * og so a hot series spreads across reducers.
    */
  private def subqueryPoints(metrics: DataFrame, inner: Expr, w: Long,
      sstep: Long, g0: Long, g1: Long, stepSec: Long,
      lookbackSec: Long): DataFrame = {
    val ig1 = (g1 / sstep) * sstep
    val ig0 = ((g0 - w) / sstep + 1) * sstep
    evalGrid(metrics, inner, ig0, ig1, sstep, lookbackSec)
      .withColumn("lo", greatest(lit(g0),
        expr(s"((g + ${stepSec - 1}) div $stepSec) * $stepSec")))
      .withColumn("hi", least(lit(g1),
        expr(s"((g + ${w - 1}) div $stepSec) * $stepSec")))
      .filter(col("lo") <= col("hi"))
      .select(col("skey"), col("g").as("ig"), col("value"),
        explode(sequence(col("lo"), col("hi"), lit(stepSec))).as("og"))
  }

  /** An `@`-pinned expression on a grid: the @ timestamp replaces "now"
    * entirely (offset then applies relative to it), so the value is
    * CONSTANT across the grid — evaluate the instant form once and pair
    * every series with every aligned point via a broadcast of the tiny
    * grid frame (|grid| rows). This is Prometheus's range-query
    * semantics for @: each step evaluates at the same pinned instant.
    */
  private def pinnedGrid(metrics: DataFrame, expr: Expr, g0: Long, g1: Long,
      stepSec: Long, lookbackSec: Long): DataFrame =
    evalInstant(metrics, expr, g1, lookbackSec)
      .crossJoin(broadcast(gridFrame(metrics, g0, g1, stepSec).select(col("g"))))
      .select(col("skey"), col("g"), col("value"))

  /** absent()/absent_over_time() output labels: the selector's equality
    * matchers as a canonical series key (sorted by label, same JSON shape
    * as [[PromOps.seriesKey]]) — they are compile-time constants, so the
    * key is built driver-side. Duplicate matcher names keep the last
    * occurrence; non-equality matchers contribute nothing, per
    * Prometheus.
    */
  private def absentKey(sel: Selector): String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
    sel.eq.toMap.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + esc(k) + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
  }

  /** One (skey='{}', g) row per aligned grid point — the dense backbone
    * for scalar-typed grid expressions. |grid| rows total: tiny.
    */
  private def gridFrame(metrics: DataFrame, g0: Long, g1: Long,
      stepSec: Long): DataFrame =
    metrics.sparkSession.range(g0, g1 + 1, stepSec)
      .select(lit("{}").as("skey"), col("id").as("g"))

  /** Label matchers: equality filters push into the scan; the result keeps
    * only matching series. Regex matchers are fully anchored and treat a
    * missing label as the empty string, both per Prometheus. The regex
    * dialect is the Java/RE2-common subset (the repo-wide stated rule,
    * as for label_replace).
    */
  private def matcherFilter(metrics: DataFrame, s: Selector): DataFrame = {
    def anchored(l: String, rx: String): Column =
      coalesce(col("labels").getItem(l), lit(""))
        .rlike("^(?:" + rx + ")$")
    val withEq = s.eq.foldLeft(metrics) { case (df, (l, v)) =>
      df.filter(col("labels").getItem(l) === v)
    }
    val withNe = s.ne.foldLeft(withEq) { case (df, (l, v)) =>
      df.filter(col("labels").getItem(l).isNull || col("labels").getItem(l) =!= v)
    }
    val withRe = s.re.foldLeft(withNe) { case (df, (l, rx)) =>
      df.filter(anchored(l, rx))
    }
    s.nre.foldLeft(withRe) { case (df, (l, rx)) =>
      df.filter(!anchored(l, rx))
    }
  }

  private def applyMatchers(iv: DataFrame): DataFrame =
    iv.select(col("skey"), col("value"))

  private def arith(value: Column, op: String, v: Double): Column = op match {
    case "*" => value * v
    case "/" => value / v
    case "+" => value + v
    case "-" => value - v
    case "%" => value % v
    case "^" => pow(value, v)
    case "atan2" => atan2(value, lit(v))
  }

  private def aggColumn(fn: String): Column = fn match {
    case "sum" => sum(col("value"))
    case "max" => max(col("value"))
    case "min" => min(col("value"))
    case "avg" => avg(col("value"))
    case "count" => count(lit(1)).cast("double")
    case "group" => max(lit(1.0)) // 1 for every group, per Prometheus
    case "stdvar" => stdvarColumn
    case "stddev" => sqrt(stdvarColumn) // sqrt is IEEE correctly rounded:
    // deterministic cross-engine, unlike exp/ln
    case other => throw new IllegalArgumentException(s"unsupported agg fn: $other")
  }

  /** Population variance, cross-engine exact: values quantized to 1e-6
    * fixed point (the repo's vector-math trick), sums kept in scale-0
    * decimals (no decimal-scale-loss hazard), the final
    * (n·Σq² − (Σq)²)/n²/1e12 computed in doubles in an order the oracle
    * mirrors literally.
    */
  private def stdvarColumn: Column = {
    val q = floor(col("value") * 1e6 + 0.5).cast("decimal(38,0)")
    val n = count(lit(1))
    (n * sum(q * q) - sum(q) * sum(q)).cast("double") /
      (n * n).cast("double") / 1e12
  }

  private def overTimeAgg(fn: String, timeCol: Column): Column = fn match {
    case "last" => // flat-buffer latest: hash aggregate, no sort (r18)
      graft.functions.LatestSample.latest(timeCol, col("value"))
        .getField("value")
    case "present" => max(lit(1.0)) // 1 for any series with samples
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

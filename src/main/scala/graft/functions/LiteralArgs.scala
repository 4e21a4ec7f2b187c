package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Shared builder-argument plumbing for the native aggregates whose
  * shape parameters (k, steps, …) arrive as foldable SQL literals.
  * A bare `eval().asInstanceOf[Int]` turns `graft_kcenter(id, v, 8L)`
  * or a NULL literal into a raw ClassCastException/NPE at planning —
  * match on the evaluated Number instead and fail with an analysis-
  * grade message.
  */
private[functions] object LiteralArgs {

  /** Evaluate a foldable expression to an Int, accepting any integral
    * literal width (tinyint through bigint) and rejecting null,
    * fractional, and non-numeric literals with a clean error.
    */
  def int(e: Expression, fn: String, what: String): Int = e.eval() match {
    case null => throw new IllegalArgumentException(
      s"$fn: $what must be a non-null integer literal")
    case n: java.lang.Byte => n.intValue
    case n: java.lang.Short => n.intValue
    case n: java.lang.Integer => n.intValue
    case n: java.lang.Long =>
      if (n < Int.MinValue || n > Int.MaxValue)
        throw new IllegalArgumentException(
          s"$fn: $what out of int range: $n")
      n.intValue
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be an integer literal, got $other " +
        s"(${other.getClass.getSimpleName})")
  }
}

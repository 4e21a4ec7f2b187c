package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sqlc = spark.sqlContext
}

object SparkSpec {
  lazy val session: SparkSession = {
    // the full GraftSession config, not a hand-rolled subset: several of
    // those settings only take effect at session BUILD time (e.g.
    // spark.sql.legacy.parquet.nanosAsLong, which decides whether the
    // fixture's TIMESTAMP(NANOS) column reads as long or TIMESTAMP_NTZ),
    // so a test session configured differently from the harness sessions
    // would exercise different plans than the ones Bench/Verify run.
    val s = GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-tests"), 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

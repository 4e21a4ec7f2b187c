package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Sample, SeriesState}
import java.nio.file.Files

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState folds per-series state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Sample]
    val out = StatefulOps.seriesState(mem.toDS())
    val dir = Files.createTempDirectory("stateful").toString

    val q = out.writeStream
      .format("memory").queryName("series_state")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", s"$dir/cp")
      .start()

    mem.addData(Sample("a", 100, 1.0), Sample("a", 160, 2.0), Sample("b", 100, 9.0))
    q.processAllAvailable()
    mem.addData(Sample("a", 400, 3.0)) // 240s gap — state carries across batches
    q.processAllAvailable()

    val res = spark.table("series_state").as[(String, SeriesState)]
      .collect().groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
    q.stop()

    assert(res("a") == SeriesState(count = 3, lastTs = 400, lastValue = 3.0, maxGapSec = 240))
    assert(res("b") == SeriesState(count = 1, lastTs = 100, lastValue = 9.0, maxGapSec = 0))
  }
}

package graft

import graft.model.QueryConfig
import graft.sources.PromClient
import java.time.Instant

/** S1-S6 against a canned transport (the offline stand-in for the HTTP
  * boundary; everything after the bytes is the real pipeline).
  */
class PromClientSpec extends SparkSpec {
  private val now = Instant.parse("2024-01-31T00:00:00Z")

  private val vectorBody =
    """{"status":"success","data":{"resultType":"vector","result":[
      |{"metric":{"__name__":"up","instance":"a:9090"},"value":[1706659199,"1"]},
      |{"metric":{"__name__":"up","instance":"b:9090"},"value":[1706659199.5,"0"]}]}}""".stripMargin

  private val matrixBody =
    """{"status":"success","data":{"resultType":"matrix","result":[
      |{"metric":{"node":"n1"},"values":[[1706572800,"0.5"],[1706572860,"0.6"]]},
      |{"metric":{"node":"n2"},"values":[[1706572800,"0.7"]]}]}}""".stripMargin

  private def transport(body: String, record: collection.mutable.Buffer[(String, Map[String, String])] = collection.mutable.Buffer()) =
    new PromClient.Transport {
      def get(path: String, params: Map[String, String]): String = {
        record += (path -> params); body
      }
    }

  test("S1: instant query parses the wire vector into records") {
    val calls = collection.mutable.Buffer[(String, Map[String, String])]()
    val out = PromClient.instantQuery(spark, transport(vectorBody, calls),
      "up", Instant.ofEpochSecond(1706659199L), "q_up", now).collect()
    assert(calls.head._1 == "/api/v1/query")
    assert(calls.head._2("time") == "1706659199")
    assert(out.length == 2)
    assert(out.map(_.getAs[Double]("value")).toSet == Set(1.0, 0.0))
    assert(out.forall(_.getAs[String]("metric_name") == "up"))
    assert(out.forall(!_.getAs[Map[String, String]]("labels").contains("__name__")))
  }

  test("S2: range query flattens the matrix (T2)") {
    val out = PromClient.rangeQuery(spark, transport(matrixBody), "m",
      Instant.ofEpochSecond(1706572800L), Instant.ofEpochSecond(1706573000L),
      "1m", "q_m", now).collect()
    assert(out.length == 3) // 2 + 1 samples
    assert(out.forall(_.getAs[String]("result_type") == "range"))
  }

  test("S3: dispatch routes by configured type; unknown defaults to instant") {
    val cfg = QueryConfig("q", "n", None, "up", "0 0 1 * * *", "60s", true, 0,
      "5s", "bogus-type", Some("yesterday_end"), None, None, None)
    val calls = collection.mutable.Buffer[(String, Map[String, String])]()
    PromClient.queryWithTimeRange(spark, transport(vectorBody, calls), cfg, now).count()
    assert(calls.head._1 == "/api/v1/query") // instant default (client.go:219-229)
    assert(calls.head._2("time") == "1706659199") // yesterday_end resolved
  }

  test("scalar/string results are rejected like the executor does") {
    val scalarBody = """{"status":"success","data":{"resultType":"scalar","result":[1,"2"]}}"""
    intercept[IllegalArgumentException](
      PromClient.instantQuery(spark, transport(scalarBody), "scalar(1)",
        now, "q", now))
  }

  test("S6 + O9: metric discovery and health probe") {
    val names = PromClient.metricNames(spark,
      transport("""{"status":"success","data":["up","node_cpu"]}"""))
    assert(names == Seq("up", "node_cpu"))
    assert(PromClient.healthCheck(spark, transport(vectorBody), now))
    assert(!PromClient.healthCheck(spark, new PromClient.Transport {
      def get(p: String, q: Map[String, String]) = throw new RuntimeException("down")
    }, now))
  }
}

package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Plan visualization (reference PlanImpl.visualize analog): valid
  * DOT out of both the Catalyst plan and a named step pipeline. */
class PlanVizSpec extends SparkFunSuite {
  import graft.SparkTestBase.spark.implicits._

  test("toDot renders the optimized plan as a DOT digraph") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
      .filter(col("id") > 0).groupBy("v").count()
    val dot = PlanViz.toDot(df, "agg-plan")
    assert(dot.startsWith("digraph \"agg-plan\""))
    assert(dot.contains("Aggregate"))
    assert(dot.contains("->")) // at least one edge
    assert(dot.trim.endsWith("}"))
    // balanced braces, every node referenced by an edge exists
    assert(dot.count(_ == '{') == dot.count(_ == '}'))
  }

  test("pipelineDot marks sources and sinks and draws declared edges") {
    val src = Seq((1, "x")).toDF("doc_id", "text")
    val out = src.select("doc_id")
    val dot = PlanViz.pipelineDot(
      steps = Seq("scan" -> src, "project" -> out),
      edges = Seq("scan" -> "project"),
      name = "p")
    assert(dot.contains("[source]"))
    assert(dot.contains("[sink]"))
    assert(dot.contains("\"scan\" -> \"project\""))
  }
}

package graft.plans

import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Pipeline visualization — the reference renders its step DAG as
 * Graphviz (`model/impl/PlanImpl.java:91-176` `visualize()`/
 * `render()`); the Spark-native analog renders the CATALYST plan the
 * pipeline actually executes, which is strictly more informative: it
 * shows what the optimizer kept, fused, or pruned.
 *
 * Output is standard DOT (one node per logical operator, edges
 * child → parent), renderable by any Graphviz install — no
 * dependency is taken on one here.
 */
object PlanViz {

  /** DOT digraph of a Dataset's OPTIMIZED logical plan. */
  def toDot(df: Dataset[_], name: String = "plan"): String = {
    val root = df.queryExecution.optimizedPlan
    val sb = new StringBuilder
    sb.append(s"""digraph "${esc(name)}" {\n""")
    sb.append("  rankdir=BT;\n  node [shape=box, fontname=monospace, fontsize=10];\n")
    var nextId = 0
    def walk(node: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int = {
      val id = nextId; nextId += 1
      val label = node.simpleStringWithNodeId() match {
        case s if s.nonEmpty => s
        case _ => node.nodeName
      }
      sb.append(s"""  n$id [label="${esc(trim(label))}"];\n""")
      node.children.foreach { c =>
        val cid = walk(c)
        sb.append(s"  n$cid -> n$id;\n")
      }
      id
    }
    walk(root)
    sb.append("}\n")
    sb.toString
  }

  /** DOT digraph of a NAMED step pipeline (the reference's shape: a
    * user-declared DAG of named steps over DataFrames). `edges` are
    * (fromStep, toStep) names; steps with no incoming edge render as
    * sources, no outgoing as sinks — `helpers` carries per-step row
    * schemas when the caller wants them displayed. */
  def pipelineDot(steps: Seq[(String, DataFrame)],
                  edges: Seq[(String, String)],
                  name: String = "pipeline"): String = {
    val sb = new StringBuilder
    sb.append(s"""digraph "${esc(name)}" {\n""")
    sb.append("  rankdir=LR;\n  node [shape=box, fontname=monospace, fontsize=10];\n")
    val hasIn = edges.map(_._2).toSet
    val hasOut = edges.map(_._1).toSet
    steps.foreach { case (n, df) =>
      val role =
        if (!hasIn.contains(n)) "source"
        else if (!hasOut.contains(n)) "sink"
        else "step"
      val cols = df.columns.take(6).mkString(", ") +
        (if (df.columns.length > 6) ", …" else "")
      sb.append(s"""  "${esc(n)}" [label="${esc(n)}\\n[$role] $cols"];\n""")
    }
    edges.foreach { case (a, b) => sb.append(s"""  "${esc(a)}" -> "${esc(b)}";\n""") }
    sb.append("}\n")
    sb.toString
  }

  private def trim(s: String): String = {
    val one = s.replace('\n', ' ')
    if (one.length > 120) one.substring(0, 117) + "..." else one
  }

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }
}

package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths, StandardOpenOption}

/**
 * Optimization-round instrumentation (guide §1): per-query isolation
 * OUTSIDE the frozen [[Bench]] harness. For each selected SparkEntry
 * query this main
 *   - captures `.explain("formatted")` to `plans/<tag>/<name>_<suffix>.txt`
 *   - times the computation with the noop sink (computes every column,
 *     discards the write — guide §1.4) and with `.count()` (the frozen
 *     sweep's action, for comparability), min of `trials` runs each
 *   - labels jobs via setJobDescription so the UI/event logs attribute
 *     time per query.
 *
 * Usage: sbt "runMain graft.BenchExtra [suffix] [queryName ...]"
 *   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 *        SPARK_GRAFT_CPUS (default 32), GRAFT_PLANS_TAG (default r06),
 *        GRAFT_EXTRA_TRIALS (default 2).
 * With no query names, all declared queries run. Output: one
 * tab-separated line per query: name, noop_min_s, count_min_s.
 */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tag = sys.env.getOrElse("GRAFT_PLANS_TAG", "r06")
    val trials = sys.env.getOrElse("GRAFT_EXTRA_TRIALS", "2").toInt
    val suffix = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-c$cpus")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val planDir = Paths.get("plans", tag)
    Files.createDirectories(planDir)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(s, sfDir)
        Files.write(planDir.resolve(s"${name}_$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"),
          StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
        def timed(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        s.sparkContext.setJobDescription(s"extra:$name:noop")
        val tn = (1 to trials).map(_ => timed(
          fn(s, sfDir).write.format("noop").mode("overwrite").save())).min
        s.sparkContext.setJobDescription(s"extra:$name:count")
        val tc = (1 to trials).map(_ => timed(fn(s, sfDir).count())).min
        s.sparkContext.setJobDescription(null)
        println(f"EXTRA\t$name\t$tn%.3f\t$tc%.3f")
      } catch {
        case e: Throwable =>
          println(s"EXTRA\t$name\tERR\t${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
      }
    }
    s.stop()
  }
}

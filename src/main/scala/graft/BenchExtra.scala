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
  /** Decompose one build-wave's cost over an EXISTING index dir:
    * staging scan alone, scan+exchange+sort, and the same with the
    * tokenize loop (no posting construction / write). */
  private def probeWave(s: SparkSession, idxDir: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    val az = graft.analysis.Analyzer.V1
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE\t$label\t${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    val staging = graft.index.IndexBuilder.readStaging(s, idxDir)
      .select($"doc_id", $"segment", $"text", $"dl")
    val nSeg = staging.agg(max("segment")).head().getInt(0) + 1
    for (_ <- 1 to 2) {
      t("scan")(staging.write.format("noop").mode("overwrite").save())
      t("scan+exchange+sort")(
        staging.repartitionByRange(nSeg, col("segment"))
          .sortWithinPartitions("segment", "doc_id")
          .write.format("noop").mode("overwrite").save())
      t("scan+exchange+sort+tokenize")(
        staging.repartitionByRange(nSeg, col("segment"))
          .sortWithinPartitions("segment", "doc_id")
          .as[(Long, Int, String, Int)]
          .mapPartitions { it =>
            var acc = 0L
            it.foreach { r => acc += az.termPositions(r._3).size }
            Iterator.single(acc)
          }.write.format("noop").mode("overwrite").save())
    }
  }

  /** Decompose phase A alternatives over the bench corpus: persist-
    * based 2-pass (current) vs shuffle-reuse 2-pass (no cache). */
  private def probePhaseA(s: SparkSession, corpusDir: String): Unit = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.TaskContext
    val p = s.sparkContext.defaultParallelism
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PROBE\t$label\t${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    val turns = s.read.parquet(corpusDir).as[graft.model.Turn]
    for (_ <- 1 to 2) {
      locally {
        val sorted = turns.repartitionByRange(p, col("conv_id"), col("turn_idx"))
          .sortWithinPartitions("conv_id", "turn_idx")
          .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        t("A/persist: sort+count") {
          sorted.mapPartitions(it => Iterator.single((TaskContext.getPartitionId(), it.size.toLong))).collect()
        }
        t("A/persist: second-pass scan") {
          sorted.mapPartitions(it => Iterator.single(it.map(_.text.length.toLong).sum))
            .write.format("noop").mode("overwrite").save()
        }
        sorted.unpersist(true)
      }
      locally {
        val sorted = turns.repartitionByRange(p, col("conv_id"), col("turn_idx"))
          .sortWithinPartitions("conv_id", "turn_idx")
        t("B/nocache: sort+count") {
          sorted.mapPartitions(it => Iterator.single((TaskContext.getPartitionId(), it.size.toLong))).collect()
        }
        t("B/nocache: second-pass scan") {
          sorted.mapPartitions(it => Iterator.single(it.map(_.text.length.toLong).sum))
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
  }

  /** Serving-latency probe over an existing index: repeated top-10
    * searches under AQE on vs off (fresh newSession each, same JVM). */
  private def probeQuery(s: SparkSession, idxDir: String): Unit = {
    val queries = Seq("dup window spark", "merge vector stream",
      "query merge value", "hash join key", "scan filter sort")
    for (aqe <- Seq("true", "false")) {
      val qs = s.newSession()
      qs.conf.set("spark.sql.adaptive.enabled", aqe)
      qs.conf.set("spark.sql.shuffle.partitions",
        s.conf.get("spark.sql.shuffle.partitions"))
      val rdr = new graft.query.IndexReader(qs, idxDir)
      queries.foreach(q => rdr.search(q, 10)) // warm
      val lat = (1 to 3).flatMap(_ => queries.map { q =>
        val t0 = System.nanoTime(); rdr.search(q, 10)
        (System.nanoTime() - t0) / 1e9
      })
      println(f"PROBE\taqe=$aqe min=${lat.min}%.3f med=${lat.sorted.apply(lat.size / 2)}%.3f max=${lat.max}%.3f")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val tag = sys.env.getOrElse("GRAFT_PLANS_TAG", "r06")
    val trials = sys.env.getOrElse("GRAFT_EXTRA_TRIALS", "2").toInt
    val suffix = args.headOption.getOrElse("before")
    val names = args.drop(1).toSeq
    if (suffix == "probe-wave" || suffix == "probe-phasea") {
      val s0 = SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-probe").config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      s0.sparkContext.setLogLevel("WARN")
      if (suffix == "probe-wave") probeWave(s0, names.head)
      else probePhaseA(s0, names.head)
      s0.stop(); return
    }
    if (suffix == "probe-minhash") {
      val s0 = SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-probe").config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      s0.sparkContext.setLogLevel("WARN")
      import org.apache.spark.sql.functions._
      val docs = s0.read.parquet(s"$sfDir/documents.parquet")
      def t(label: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        println(f"PROBE\t$label\t${(System.nanoTime() - t0) / 1e9}%.3f")
      }
      for (_ <- 1 to 2) {
        val sig = docs.select(col("doc_id").as("id"),
          graft.functions.MinHashSigExpr(
            graft.operators.Dedup.tokens(col("text")), 3, 64, true).as("sig"))
          .filter(col("sig").isNotNull)
        t("sig")(sig.write.format("noop").mode("overwrite").save())
        val banded = sig.select(col("id"), col("sig"),
          posexplode(graft.functions.BandHashExpr(col("sig"), 16, 4, true)))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
        t("sig+band")(banded.write.format("noop").mode("overwrite").save())
        val buckets = banded.groupBy("band", "band_hash")
          .agg(org.apache.spark.sql.graft.ColumnBridge.bottomK(
            struct(col("id"), col("sig")), 64).as("m"))
          .filter(size(col("m")) >= 2)
        t("sig+band+agg")(buckets.write.format("noop").mode("overwrite").save())
        t("full")(graft.operators.Dedup.minHashNearDups(docs, "doc_id", "text",
          threshold = 0.5, crossEngine = true)
          .write.format("noop").mode("overwrite").save())
      }
      s0.stop(); return
    }
    if (suffix == "probe-battery") {
      val s0 = SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-probe").config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      s0.sparkContext.setLogLevel("WARN")
      for (i <- 1 to 2) {
        val r = Bench.queryLatencies(s0, names(0), names(1), includeLocal = false)
        println(s"BATTERY$i\t" + r.map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
      }
      s0.stop(); return
    }
    if (suffix == "probe-query") {
      val s0 = SparkSession.builder().master(s"local[$cpus]")
        .appName("graft-probe").config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      s0.sparkContext.setLogLevel("WARN")
      probeQuery(s0, names.head); s0.stop(); return
    }
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

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, one session —
  * mirrors the reference's shared `*TestBase` pattern,
  * `/root/reference/code/ingest/src/test/RUNNERS_vs_TESTS.txt`). */
object SparkTestBase {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "4g")
    .getOrCreate()

  lazy val tmpRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-test")
    sys.addShutdownHook {
      graft.store.Manifest.deleteRecursively(p)
    }
    p
  }
}

abstract class SparkFunSuite extends AnyFunSuite {
  def spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  def tmpDir(name: String): String = {
    val p = SparkTestBase.tmpRoot.resolve(name)
    graft.store.Manifest.deleteRecursively(p)
    p.toString
  }
}

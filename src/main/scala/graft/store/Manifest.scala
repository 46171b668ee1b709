package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Per-partition checkpoint / lineage / metrics ledger — the engine's
 * replacement for the reference's Cassandra FTI tables
 * (`jj_output_step_status`, `jj_scanner_doc_hash`;
 * `/root/reference/code/ingest/src/main/java/org/jesterj/ingest/model/impl/ScannerImpl.java:117-144`,
 * write path `logging/JesterJAppender.java:219-312`).
 *
 * Where the reference replays at-most-once status events per document,
 * we record one row per *partition* (index segment) and make the data
 * write idempotent (overwrite-by-partition), which is a strictly
 * stronger guarantee with none of the per-row ledger cost
 * (SURVEY.md §2.6).
 *
 * Commit protocol: JSON is written to `<file>.tmp` then atomically
 * renamed — a segment is COMPLETE iff its data directory rename AND its
 * manifest rename both landed; a rerun recomputes any segment whose
 * manifest is missing or non-COMPLETE. On HDFS, rename has the same
 * atomicity; on S3 this trait would be backed by a conditional PUT —
 * isolated here so a real Iceberg catalog is a drop-in.
 */
object Manifest {

  val Complete = "COMPLETE"
  val Failed = "FAILED"

  /** Flat string→string JSON; numbers stored as strings to keep the
    * parser trivial and dependency-free. */
  def writeAtomic(path: Path, fields: Map[String, String]): Unit = {
    Files.createDirectories(path.getParent)
    val json = fields.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + esc(k) + "\": \"" + esc(v) + "\""
    }.mkString("{\n  ", ",\n  ", "\n}\n")
    val tmp = path.resolveSibling(path.getFileName.toString + ".tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c => c.toString
    }

  private val FieldRe = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  def read(path: Path): Option[Map[String, String]] = {
    if (!Files.exists(path)) return None
    val txt = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    Some(FieldRe.findAllMatchIn(txt).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap)
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case x => sb.append(x)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def segPath(manifestDir: String, segment: Int): Path =
    Paths.get(manifestDir, f"seg-$segment%05d.json")

  def phaseAPath(manifestDir: String): Path = Paths.get(manifestDir, "phaseA.json")

  /** Commit point for the post-wave dictionary/corpus_stats derivation. */
  def finalizePath(manifestDir: String): Path = Paths.get(manifestDir, "finalize.json")

  def isComplete(path: Path): Boolean =
    read(path).exists(_.get("status").contains(Complete))

  /** Segments already COMPLETE (for resume anti-planning). */
  def completeSegments(manifestDir: String): Set[Int] = {
    val dir = Paths.get(manifestDir)
    if (!Files.exists(dir)) return Set.empty
    Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.matches("seg-\\d+\\.json"))
      .filter(isComplete)
      .map(p => p.getFileName.toString.stripPrefix("seg-").stripSuffix(".json").toInt)
      .toSet
  }

  /** Recursive delete (for overwrite rebuilds and tests). */
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
  }

  /** Atomic directory publish: move `tmp` to `dest` (replacing dest). */
  def publishDir(tmp: Path, dest: Path): Unit = {
    Files.createDirectories(dest.getParent)
    if (Files.exists(dest)) deleteRecursively(dest)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
  }
}

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
 * Segment state lives in an append-only LEDGER TABLE: one JSONL file
 * per committed wave, later rows superseding earlier ones — so resume
 * planning reads O(waves) files, never a directory listing of one
 * manifest per segment (2^20 files at the segment cap), and retry /
 * quarantine state (FAILED attempts → QUARANTINED) folds naturally as
 * last-writer-wins.
 *
 * Commit protocol: files are written to `<file>.tmp` then atomically
 * renamed — a wave is COMPLETE iff its data directory renames AND its
 * ledger append all landed; a rerun recomputes any segment whose
 * latest ledger state is missing or non-COMPLETE. On HDFS, rename has
 * the same atomicity; on S3 this trait would be backed by a
 * conditional PUT — isolated here so a real Iceberg catalog is a
 * drop-in.
 */
object Manifest {

  val Complete = "COMPLETE"
  val Failed = "FAILED"
  /** Poison segment: failed `maxAttempts` times → excluded from future
    * builds until the ledger is cleared (the reference's DEAD state,
    * `ScannerImpl.java:614-713`). */
  val Quarantined = "QUARANTINED"
  /** Segment invalidated by an incremental update (its staging rows
    * changed) — re-planned by the next Phase B pass. */
  val Stale = "STALE"

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
      case '\r' => "\\r" // a CR in an error message must not split a JSONL row
      case c if c < ' ' => f"\\u${c.toInt}%04x"
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
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case x => sb.append(x); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def phaseAPath(manifestDir: String): Path = Paths.get(manifestDir, "phaseA.json")

  /** Commit point for the post-wave dictionary/corpus_stats derivation. */
  def finalizePath(manifestDir: String): Path = Paths.get(manifestDir, "finalize.json")

  def isComplete(path: Path): Boolean =
    read(path).exists(_.get("status").contains(Complete))

  // ---- segment ledger: a TABLE, not a file per segment ----
  // One JSONL file per wave (atomic rename), each line one segment's
  // state row. Resume planning reads segments/waves-count files instead
  // of listing one JSON per segment (2^20 files at the segment cap).
  // Later entries supersede earlier ones: file names carry
  // (epoch-millis, per-JVM sequence) so replays and retries fold to a
  // last-writer-wins state per segment.

  private val ledgerSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Per-process unique name component: a crash-restart (or second
    * writer) whose AtomicLong restarts at 1 could otherwise collide
    * with an existing wave file within the same millisecond and
    * silently REPLACE a committed wave's rows. */
  private val procToken =
    java.util.UUID.randomUUID().toString.substring(0, 8)

  /** Append one wave's segment rows to the ledger (atomic). Every row
    * must carry "segment" and "status". */
  def appendLedger(manifestDir: String, rows: Seq[Map[String, String]]): Unit = {
    if (rows.isEmpty) return
    val dir = Paths.get(manifestDir)
    Files.createDirectories(dir)
    val name = f"wave-${System.currentTimeMillis()}%013d-${ledgerSeq.incrementAndGet()}%06d-$procToken.jsonl"
    val txt = rows.map { fields =>
      fields.toSeq.sortBy(_._1).map { case (k, v) =>
        "\"" + esc(k) + "\": \"" + esc(v) + "\""
      }.mkString("{", ", ", "}")
    }.mkString("", "\n", "\n")
    val tmp = dir.resolve(name + ".tmp")
    Files.write(tmp, txt.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Latest state row per segment (last writer wins across ledger
    * files ordered by name = commit order). */
  def segmentStates(manifestDir: String): Map[Int, Map[String, String]] = {
    val dir = Paths.get(manifestDir)
    if (!Files.exists(dir)) return Map.empty
    val listing = Files.list(dir)
    val files =
      try listing.iterator().asScala
        .filter(_.getFileName.toString.matches("wave-.*\\.jsonl"))
        .toSeq.sortBy(_.getFileName.toString)
      finally listing.close()
    val acc = scala.collection.mutable.HashMap.empty[Int, Map[String, String]]
    files.foreach { f =>
      Files.readAllLines(f, StandardCharsets.UTF_8).asScala.foreach { line =>
        if (line.nonEmpty) {
          val m = FieldRe.findAllMatchIn(line)
            .map(x => unesc(x.group(1)) -> unesc(x.group(2))).toMap
          m.get("segment").foreach(s => acc.update(s.toInt, m))
        }
      }
    }
    acc.toMap
  }

  /** Segments already COMPLETE (for resume anti-planning). */
  def completeSegments(manifestDir: String): Set[Int] =
    segmentStates(manifestDir).collect {
      case (s, m) if m.get("status").contains(Complete) => s
    }.toSet

  /** Segments quarantined after repeated failures (never re-planned). */
  def quarantinedSegments(manifestDir: String): Set[Int] =
    segmentStates(manifestDir).collect {
      case (s, m) if m.get("status").contains(Quarantined) => s
    }.toSet

  /** Recursive delete (for overwrite rebuilds and tests). */
  def deleteRecursively(p: Path): Unit = {
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      finally s.close()
    }
  }

  /** Atomic directory publish: move `tmp` to `dest` (replacing dest). */
  def publishDir(tmp: Path, dest: Path): Unit = {
    Files.createDirectories(dest.getParent)
    if (Files.exists(dest)) deleteRecursively(dest)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
  }
}

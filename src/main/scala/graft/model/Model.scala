package graft.model

import java.sql.Timestamp

/** One conversation turn — the input schema from BASELINE.json
  * `input_hint`. The reference's analog is the multi-valued string
  * `Document` (`/root/reference/code/ingest/src/main/java/org/jesterj/ingest/model/impl/DocumentImpl.java:78`);
  * transcripts need no multi-valued fields, so a flat case class +
  * Encoder is the typed Dataset row. */
case class Turn(conv_id: String, turn_idx: Int, role: String,
                text: String, tool: String, ts: Timestamp)

/** A turn after stable docID assignment (Phase A). segment = docId /
  * segSize — contiguous docId ranges, the unit of checkpoint/resume. */
case class DocTurn(doc_id: Long, segment: Int, conv_id: String, turn_idx: Int,
                   role: String, text: String, tool: String, dl: Int)

/** doc_stats table row (FIXTURES.md §2). */
case class DocStat(doc_id: Long, conv_id: String, turn_idx: Int, dl: Int,
                   segment: Int)

/** dictionary table row: global document frequency + collection
  * frequency per term. */
case class DictEntry(term: String, df: Long, cf: Long)

/** corpus_stats table row. */
case class CorpusStats(n_docs: Long, avgdl: Double, n_terms: Long,
                       index_version: Int, tokenizer_version: Int,
                       analyzer: String)

/** On-disk index format version. v2: block-max metadata is
  * (block_max_tf, block_min_dl) instead of a baked tf-normalization —
  * avgdl-independent, so incremental updates that shift the corpus
  * average never stale the stored bounds of untouched segments.
  * v3: per-posting POSITION lists (token indices in the analyzed
  * stream, delta+VByte, concatenated per block in posting order) —
  * phrase queries become exact and index-only, no candidate cap and
  * no re-read of document text.
  * Readers and the resume path refuse other versions cleanly. */
object IndexFormat {
  val Version = 3

  /** Single version gate shared by every reader (cluster + serving
    * paths must enforce identically). */
  def check(stats: CorpusStats, dir: String): Unit =
    require(stats.index_version == Version,
      s"index at $dir is format v${stats.index_version}; this reader " +
        s"requires v$Version — rebuild the index")
}

/** One encoded posting block: ≤ blockSize postings of one (segment,
  * term), docIds delta+VByte compressed, with skip (max_doc_id) and
  * block-max (block_max_tf + block_min_dl → an avgdl-independent WAND
  * bound: tfNorm is ↑ in tf and ↓ in dl, so tfNorm(max_tf, min_dl,
  * avgdl) ≥ every in-block contribution at ANY avgdl) metadata
  * (FIXTURES.md §2). All binary columns are self-contained (first
  * delta is absolute).
  *
  * `positions` (format v3): the i-th posting's tf_i token positions
  * (indices in the ANALYZED token stream — stopword chains renumber,
  * matching the query-side tokenization), delta-encoded within each
  * posting (first absolute), concatenated in posting order, VByte.
  * tf values delimit the per-posting runs, so no length prefixes. */
case class PostingBlockRow(term: String, segment: Int, block_id: Int,
                           n_docs: Int, max_doc_id: Long,
                           block_max_tf: Int, block_min_dl: Int,
                           doc_deltas: Array[Byte], tfs: Array[Byte],
                           dls: Array[Byte], positions: Array[Byte],
                           block_cf: Long)

/** A scored query hit. */
case class QueryHit(doc_id: Long, score: Double)

/** QueryHit joined back to its source turn identity. */
case class RankedTurn(doc_id: Long, score: Double, conv_id: String,
                      turn_idx: Int)

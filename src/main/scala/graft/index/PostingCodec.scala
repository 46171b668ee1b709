package graft.index

import graft.model.PostingBlockRow

/**
 * Posting-list block codec. For one (segment, term), postings sorted by
 * docId are cut into blocks of [[PostingCodec.BlockSize]] docs; each
 * block stores VByte(delta(docIds)), VByte(tfs), VByte(dls) plus skip
 * metadata: max_doc_id (skip pointer) and (block_max_tf, block_min_dl)
 * — tfNorm(max_tf, min_dl, avgdl) · idf computed at query time is the
 * block-max WAND bound, valid at any avgdl (format v2: incremental
 * updates may shift avgdl after a block is written).
 *
 * Blocks are self-contained (first delta absolute), so a cursor can
 * skip whole blocks via max_doc_id without decoding them.
 *
 * The reference delegates this to Lucene's postings format behind
 * `SendToSolrProcessor.getSolrClient().add(...)`
 * (`/root/reference/code/ingest/src/main/java/org/jesterj/ingest/processors/SendToSolrProcessor.java:112`);
 * this is our from-scratch equivalent (SURVEY.md §2.7).
 */
object PostingCodec extends Serializable {

  val BlockSize: Int = 128

  /** Encode one term's postings (already sorted by docId ascending). */
  def encodeTerm(term: String, segment: Int,
                 docIds: Array[Long], tfs: Array[Int], dls: Array[Int]): Seq[PostingBlockRow] = {
    require(docIds.length == tfs.length && tfs.length == dls.length)
    val out = Vector.newBuilder[PostingBlockRow]
    var start = 0
    var blockId = 0
    while (start < docIds.length) {
      val end = math.min(start + BlockSize, docIds.length)
      val ids = java.util.Arrays.copyOfRange(docIds, start, end)
      val btfs = java.util.Arrays.copyOfRange(tfs, start, end)
      val bdls = java.util.Arrays.copyOfRange(dls, start, end)
      var maxTf = 0
      var minDl = Int.MaxValue
      var cf = 0L
      var i = 0
      while (i < ids.length) {
        if (btfs(i) > maxTf) maxTf = btfs(i)
        if (bdls(i) < minDl) minDl = bdls(i)
        cf += btfs(i)
        i += 1
      }
      out += PostingBlockRow(term, segment, blockId, ids.length, ids.last,
        maxTf, minDl, VByte.encode(VByte.deltas(ids)), VByte.encodeInts(btfs),
        VByte.encodeInts(bdls), cf)
      start = end
      blockId += 1
    }
    out.result()
  }

  /** Decoded block: parallel arrays of absolute docIds, tfs, dls. */
  final case class DecodedBlock(docIds: Array[Long], tfs: Array[Int], dls: Array[Int])

  def decodeBlock(row: PostingBlockRow): DecodedBlock =
    DecodedBlock(VByte.undeltas(VByte.decode(row.doc_deltas)),
      VByte.decodeInts(row.tfs), VByte.decodeInts(row.dls))
}

package graft.index

import graft.model.PostingBlockRow
import graft.query.BM25

/**
 * Posting-list block codec. For one (segment, term), postings sorted by
 * docId are cut into blocks of [[PostingCodec.BlockSize]] docs; each
 * block stores VByte(delta(docIds)), VByte(tfs), VByte(dls) plus skip
 * metadata: max_doc_id (skip pointer) and block_max_tfn (the block's
 * maximum BM25 tf-normalization — multiplied by idf at query time this
 * is the block-max WAND bound).
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

  /** Encode one term's postings (already sorted by docId ascending).
    * avgdl is the corpus average doc length fixed in Phase A. */
  def encodeTerm(term: String, segment: Int,
                 docIds: Array[Long], tfs: Array[Int], dls: Array[Int],
                 avgdl: Double): Seq[PostingBlockRow] = {
    require(docIds.length == tfs.length && tfs.length == dls.length)
    val out = Vector.newBuilder[PostingBlockRow]
    var start = 0
    var blockId = 0
    while (start < docIds.length) {
      val end = math.min(start + BlockSize, docIds.length)
      val ids = java.util.Arrays.copyOfRange(docIds, start, end)
      val btfs = java.util.Arrays.copyOfRange(tfs, start, end)
      val bdls = java.util.Arrays.copyOfRange(dls, start, end)
      var maxTfn = 0.0
      var cf = 0L
      var i = 0
      while (i < ids.length) {
        val tfn = BM25.tfNorm(btfs(i), bdls(i), avgdl)
        if (tfn > maxTfn) maxTfn = tfn
        cf += btfs(i)
        i += 1
      }
      out += PostingBlockRow(term, segment, blockId, ids.length, ids.last,
        maxTfn, VByte.encode(VByte.deltas(ids)), VByte.encodeInts(btfs),
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

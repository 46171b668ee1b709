package graft.analysis

/**
 * Versioned text-analysis chain.
 *
 * The reference (JesterJ) delegates tokenization to the Lucene analysis
 * chain it loads from a Solr schema — see
 * `/root/reference/code/ingest/src/main/java/org/jesterj/ingest/processors/PreAnalyzeFields.java:64-114`
 * and the chains pinned in its test configsets
 * (`src/test/resources/solr/configsets/preanalyze/conf/schema.xml:39-60`:
 * StandardTokenizer → Stop → LowerCase → EnglishPossessive → PorterStem).
 *
 * Our engine defines the chain once, versioned, golden-tested:
 *
 *  - V1 (default, and what the DuckDB oracle mirrors as
 *    `regexp_extract_all(lower(text), '[a-z0-9]+')`): lowercase + maximal
 *    runs of ASCII `[a-z0-9]`. Implemented as a hand-rolled scanner (no
 *    regex allocation per call) so the `flatMap` hot path stays cheap.
 *  - Optional stages (off by default, unit-tested): English stopword
 *    removal and Porter stemming, mirroring the reference's `text_en`
 *    chain.
 *
 * All stages are pure functions of the input string — no locale, no
 * clock — so tokenization is deterministic at any parallelism.
 */
object Tokenizer extends Serializable {

  /** Bump when the default chain changes; persisted in corpus_stats. */
  val Version: Int = 1

  /** Default English stopword set (subset of Lucene's EnglishAnalyzer
    * ENGLISH_STOP_WORDS_SET, which is public knowledge). */
  val EnglishStopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")

  /** V1 chain: lowercase + `[a-z0-9]+` runs. Equivalent to
    * `regexp_extract_all(lower(text), '[a-z0-9]+')` but ~5x faster. */
  def tokenize(text: String): IndexedSeq[String] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[String]
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val c = text.charAt(i)
      val lc =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c >= '0' && c <= '9') c
        else 0.toChar
      if (lc != 0) sb.append(lc)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.result()
  }

  /** Full configurable chain: V1 → optional stopword filter → optional
    * Porter stem. Mirrors the reference's `text_en` field type. */
  def analyze(text: String,
              stopwords: Set[String] = Set.empty,
              stem: Boolean = false): IndexedSeq[String] = {
    var toks = tokenize(text)
    if (stopwords.nonEmpty) toks = toks.filterNot(stopwords.contains)
    if (stem) toks = toks.map(PorterStemmer.stem)
    toks
  }

  /** Per-document term frequencies in one pass; insertion order is not
    * meaningful — callers needing determinism sort by term. Scans the
    * text directly (no intermediate token collection — this sits on
    * the index build's hottest path). */
  def termFreqs(text: String): collection.Map[String, Int] = {
    val m = collection.mutable.HashMap.empty[String, Int]
    if (text == null || text.isEmpty) return m
    val n = text.length
    var i = 0
    val sb = new java.lang.StringBuilder(16)
    while (i < n) {
      val c = text.charAt(i)
      val lc =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c >= '0' && c <= '9') c
        else 0.toChar
      if (lc != 0) sb.append(lc)
      else if (sb.length > 0) {
        val t = sb.toString
        m.update(t, m.getOrElse(t, 0) + 1)
        sb.setLength(0)
      }
      i += 1
    }
    if (sb.length > 0) { val t = sb.toString; m.update(t, m.getOrElse(t, 0) + 1) }
    m
  }

  /** Document length = token count under the V1 chain. Counts maximal
    * alnum runs directly — `tokenize(text).length` built (and
    * discarded) a full token Vector per document, which profiled as a
    * top allocation site of the index build's phase A. */
  def docLength(text: String): Int = {
    if (text == null || text.isEmpty) return 0
    val n = text.length
    var i = 0
    var cnt = 0
    var inRun = false
    while (i < n) {
      val c = text.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9')
      if (alnum) { if (!inRun) { cnt += 1; inRun = true } }
      else inRun = false
      i += 1
    }
    cnt
  }

  /** [[docLength]] over a raw UTF8String view (no String decode):
    * ASCII alnum BYTE runs equal alnum CHAR runs — every byte of a
    * multi-byte UTF-8 char is ≥ 0x80, i.e. a separator in both views
    * (the same equivalence the native shingles/simhash kernels use). */
  def docLengthU8(s: org.apache.spark.unsafe.types.UTF8String): Int = {
    if (s == null) return 0
    val bytes = s.getBytes
    var i = 0
    var cnt = 0
    var inRun = false
    while (i < bytes.length) {
      val b = bytes(i)
      val alnum = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9')
      if (alnum) { if (!inRun) { cnt += 1; inRun = true } }
      else inRun = false
      i += 1
    }
    cnt
  }

  /** Growable position list (per-term, per-doc — typically 1-2 long). */
  final class IntBuf {
    var a = new Array[Int](2)
    var n = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
      a(n) = v; n += 1
    }
    def toArray: Array[Int] = java.util.Arrays.copyOf(a, n)
  }

  /** Per-document term → token positions (indices in the analyzed
    * stream) in one pass — the index build's hot path for format v3
    * positional postings. tf = position count. */
  def termPositions(text: String): collection.mutable.HashMap[String, IntBuf] = {
    val m = collection.mutable.HashMap.empty[String, IntBuf]
    if (text == null || text.isEmpty) return m
    val n = text.length
    var i = 0
    var p = 0
    val sb = new java.lang.StringBuilder(16)
    def emit(): Unit = {
      val t = sb.toString
      m.getOrElseUpdate(t, new IntBuf).add(p)
      p += 1
      sb.setLength(0)
    }
    while (i < n) {
      val c = text.charAt(i)
      val lc =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c >= '0' && c <= '9') c
        else 0.toChar
      if (lc != 0) sb.append(lc)
      else if (sb.length > 0) emit()
      i += 1
    }
    if (sb.length > 0) emit()
    m
  }

  /** One analyzed token with character offsets and position increment
    * — the attributes the reference extracts from the Lucene token
    * stream for Solr PreAnalyzed JSON (`{t, s, e, i}`;
    * `processors/PreAnalyzeFields.java:74-103`). */
  case class OffsetToken(t: String, s: Int, e: Int, i: Int)

  /** V1 chain with offsets: `s`/`e` are the char span of the source
    * run in the ORIGINAL text; `i` is the position increment (always
    * 1 in V1 — no stopword holes). */
  def tokenizeWithOffsets(text: String): IndexedSeq[OffsetToken] = {
    if (text == null || text.isEmpty) return Vector.empty
    val out = Vector.newBuilder[OffsetToken]
    val n = text.length
    var i = 0
    var start = -1
    val sb = new java.lang.StringBuilder(16)
    while (i <= n) {
      val c = if (i < n) text.charAt(i) else 0.toChar
      val lc =
        if (c >= 'a' && c <= 'z') c
        else if (c >= 'A' && c <= 'Z') (c + 32).toChar
        else if (c >= '0' && c <= '9') c
        else 0.toChar
      if (lc != 0) { if (start < 0) start = i; sb.append(lc) }
      else if (sb.length > 0) {
        out += OffsetToken(sb.toString, start, i, 1)
        sb.setLength(0); start = -1
      }
      i += 1
    }
    out.result()
  }
}

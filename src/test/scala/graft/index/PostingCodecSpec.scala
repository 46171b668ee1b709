package graft.index

import graft.query.BM25
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class PostingCodecSpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 100): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val postingsGen: Gen[(Array[Long], Array[Int], Array[Int])] = for {
    deltas <- Gen.nonEmptyListOf(Gen.chooseNum(1L, 5000L))
    ids = deltas.scanLeft(41L)(_ + _).tail.toArray
    tfs <- Gen.listOfN(ids.length, Gen.chooseNum(1, 50))
    dls <- Gen.listOfN(ids.length, Gen.chooseNum(1, 500))
  } yield (ids, tfs.toArray, dls.toArray)

  test("block round-trip preserves postings exactly") {
    samples(postingsGen).foreach { case (ids, tfs, dls) =>
      val blocks = PostingCodec.encodeTerm("t", 0, ids, tfs, dls)
      val decoded = blocks.flatMap { b =>
        val d = PostingCodec.decodeBlock(b)
        d.docIds.indices.map(i => (d.docIds(i), d.tfs(i), d.dls(i)))
      }
      assert(decoded == ids.indices.map(i => (ids(i), tfs(i), dls(i))).toSeq)
    }
  }

  test("block structure: size cap, skip pointers, block ids") {
    val n = 1000
    val ids = Array.tabulate(n)(i => (i * 3 + 1).toLong)
    val tfs = Array.fill(n)(2)
    val dls = Array.fill(n)(100)
    val blocks = PostingCodec.encodeTerm("t", 3, ids, tfs, dls)
    assert(blocks.length == math.ceil(n.toDouble / PostingCodec.BlockSize).toInt)
    assert(blocks.map(_.block_id) == blocks.indices)
    assert(blocks.forall(_.n_docs <= PostingCodec.BlockSize))
    assert(blocks.map(_.n_docs).sum == n)
    // skip pointer = last docId of each block; strictly ascending
    assert(blocks.map(_.max_doc_id).toVector == blocks.map(b =>
      PostingCodec.decodeBlock(b).docIds.last).toVector)
    assert(blocks.map(_.max_doc_id).sliding(2).forall(s => s.length < 2 || s(0) < s(1)))
  }

  test("positions round-trip exactly across block boundaries (format v3)") {
    val rng = new java.util.SplittableRandom(99)
    samples(postingsGen, 50).foreach { case (ids, tfs, dls) =>
      // tf random ascending positions per posting, may start at 0
      val positions: Array[Array[Int]] = tfs.map { tf =>
        val out = new Array[Int](tf)
        var p = rng.nextInt(3)
        var i = 0
        while (i < tf) { out(i) = p; p += 1 + rng.nextInt(7); i += 1 }
        out
      }
      val blocks = PostingCodec.encodeTerm("t", 0, ids, tfs, dls, positions)
      val decoded = blocks.flatMap { b =>
        val d = PostingCodec.decodeBlock(b)
        d.docIds.indices.map(i =>
          d.posFlat.slice(d.posOff(i), d.posOff(i + 1)).toVector)
      }
      assert(decoded == positions.map(_.toVector).toSeq)
    }
  }

  test("synthesized positions (no explicit lists) keep the tf-sum invariant") {
    val ids = Array.tabulate(300)(i => (i * 2 + 1).toLong)
    val tfs = Array.tabulate(300)(i => 1 + i % 5)
    val dls = Array.fill(300)(50)
    PostingCodec.encodeTerm("t", 0, ids, tfs, dls).foreach { b =>
      val d = PostingCodec.decodeBlock(b)
      assert(d.posFlat.length == d.tfs.sum)
      d.docIds.indices.foreach { i =>
        assert(d.posFlat.slice(d.posOff(i), d.posOff(i + 1)).toVector ==
          Vector.range(0, d.tfs(i)))
      }
    }
  }

  test("(block_max_tf, block_min_dl) bound in-block contributions at any avgdl") {
    samples(postingsGen, 50).foreach { case (ids, tfs, dls) =>
      PostingCodec.encodeTerm("t", 0, ids, tfs, dls).foreach { b =>
        val d = PostingCodec.decodeBlock(b)
        assert(b.block_max_tf == d.tfs.max)  // exact extrema, not approximate
        assert(b.block_min_dl == d.dls.min)
        // the derived bound dominates every contribution at any avgdl
        Seq(1.0, 77.7, 5000.0).foreach { avgdl =>
          val bound = BM25.tfNorm(b.block_max_tf, b.block_min_dl, avgdl)
          val maxActual = d.docIds.indices
            .map(i => BM25.tfNorm(d.tfs(i), d.dls(i), avgdl)).max
          assert(bound >= maxActual)
        }
      }
    }
  }
}

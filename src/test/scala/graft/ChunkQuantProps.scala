package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck laws for the chunker and the int8 quantizer — the
  * coverage/reconstruction guarantees must hold for ANY input, not just
  * the handcrafted spec fixtures. */
object ChunkQuantProps extends Properties("chunkquant") {

  private lazy val spark = SparkSpec.session

  private val genDoc: Gen[(Int, Int, Int)] = for {
    n <- Gen.choose(0, 300)       // tokens in the doc
    window <- Gen.choose(1, 80)
    stride <- Gen.choose(1, window)
  } yield (n, window, stride)

  property("chunk spans tile the document: full coverage, correct overlap, in-bounds") =
    Prop.forAll(genDoc) { case (n, window, stride) =>
      import spark.implicits._
      val text = (1 to n).map(i => s"w$i").mkString(" ")
      val spans = graft.ops.TextAnalysis.chunkSpans(
          Seq((1L, text)).toDF("id", "text"), "id", "text", window, stride)
        .collect()
        .map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
        .sortBy(_._1)
      // an empty text still tokenizes to [""] (n becomes 1), so the
      // effective token count the operator sees is max(n, 1)
      val en = math.max(n, 1)
      val starts = spans.map(_._2)
      val lastCovered = spans.map(s => s._2 + s._3).max
      (starts.head == 0) :| "first chunk at 0" &&
        spans.zipWithIndex.forall { case ((ci, st, _), i) =>
          ci == i && st == i * stride } :| "stride spacing" &&
        (lastCovered == en) :| s"last token covered ($lastCovered != $en)" &&
        spans.forall { case (_, st, len) =>
          len >= 1 && len <= window && st + len <= en } :| "spans in bounds" &&
        // every start before the last is a full window
        spans.dropRight(1).forall(_._3 == window) :| "only the last chunk is short"
    }

  private val genVec: Gen[List[Float]] = for {
    d <- Gen.choose(1, 32)
    xs <- Gen.listOfN(d, Gen.chooseNum(-100.0f, 100.0f))
  } yield xs

  property("int8 codes reconstruct within half a quantization step") =
    Prop.forAll(genVec) { xs =>
      import spark.implicits._
      val row = graft.ops.Quantize.int8(
          Seq((1L, xs.toArray)).toDF("vec_id", "embedding"), "vec_id", "embedding")
        .collect()(0)
      val scale = xs.map(x => math.abs(x.toDouble)).max
      // recompute codes the same way and check the reconstruction bound
      val codes = xs.map { x =>
        if (scale == 0) 0L
        else math.max(-127L, math.min(127L,
          math.floor(x.toDouble / scale * 127.0 + 0.5).toLong))
      }
      val qsumOk = row.getLong(2) == codes.sum
      val reconOk = scale == 0 || xs.zip(codes).forall { case (x, q) =>
        math.abs(q * scale / 127.0 - x) <= scale / 254.0 + 1e-9 }
      qsumOk :| "qsum matches reference codes" &&
        reconOk :| "reconstruction within half a step"
    }
}

package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck differential properties for the packing operators:
  * the distributed plans vs naive in-memory references over random
  * corpora — pack laws must hold for ANY doc-size distribution, not
  * just the handcrafted spec fixtures. */
object PackingProps extends Properties("packing") {

  private lazy val spark = SparkSpec.session

  private val genDocs: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    sizes <- Gen.listOfN(n, Gen.choose(0L, 900L))
  } yield sizes.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private val genBudget: Gen[Long] = Gen.choose(64L, 700L)

  /** Naive single-threaded concat-and-chunk over one shard. */
  private def naiveChunks(docs: Seq[(Long, Long)], budget: Long): Seq[(Long, Long, Long, Long)] = {
    var cum = 0L
    docs.filter(_._2 > 0).flatMap { case (id, toks) =>
      val start = cum
      cum += toks
      (start / budget to (cum - 1) / budget).map { bin =>
        val inBin = math.min((bin + 1) * budget, cum) - math.max(bin * budget, start)
        val off = math.max(bin * budget, start) - start
        (bin, id, inBin, off)
      }
    }
  }

  property("selectByBudget == naive per-shard greedy prefix") =
    Prop.forAll(genDocs, Gen.choose(10L, 400L)) { (docs, budget) =>
      import spark.implicits._
      val shards = 3
      val scored = docs.map { case (id, toks) =>
        (id, math.max(1L, toks), (id * 7 % 13).toDouble) }
      val got = graft.ops.Selection.selectByBudget(
          scored.toDF("id", "toks", "score"), "id", "score", "toks",
          budget, shards)
        .select("id").collect().map(_.getLong(0)).toSet
      val base = budget / shards
      val rem = budget % shards
      val want = scored.groupBy(t => t._1 % shards).flatMap { case (sh, g) =>
        val shardBudget = if (sh < rem) base + 1 else base
        var cum = 0L
        g.sortBy(t => (-t._3, t._1)).takeWhile { t =>
          cum += t._2; cum <= shardBudget }.map(_._1)
      }.toSet
      got == want
    }

  property("packChunks == naive per-shard concat-and-chunk") = Prop.forAll(genDocs, genBudget) { (docs, budget) =>
    import spark.implicits._
    val shards = 4
    val got = graft.ops.Packing.packChunks(
        docs.toDF("doc_id", "toks"), "doc_id", "toks", budget, shards)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val want = (0L until shards.toLong).flatMap { sh =>
      naiveChunks(docs.filter(_._1 % shards == sh).sortBy(_._1), budget)
        .map { case (bin, id, inBin, off) => (sh, bin, id, inBin, off) }
    }.toSet
    got == want
  }

  /** Naive next-fit over one shard. */
  private def naiveWhole(docs: Seq[(Long, Long)], budget: Long): Seq[(Long, Long)] = {
    var bin = -1L
    var used = 0L
    docs.filter(_._2 > 0).map { case (id, toks) =>
      if (bin < 0 || used + toks > budget) { bin += 1; used = 0L }
      used += toks
      (id, bin)
    }
  }

  property("packWhole == naive per-shard next-fit") = Prop.forAll(genDocs, genBudget) { (docs, budget) =>
    import spark.implicits._
    val shards = 4
    val got = graft.ops.Packing.packWhole(
        docs.toDF("doc_id", "toks"), "doc_id", "toks", budget, shards)
      .collect()
      .map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
      .toSet // (id, shard, bin)
    val want = (0L until shards.toLong).flatMap { sh =>
      naiveWhole(docs.filter(_._1 % shards == sh).sortBy(_._1), budget)
        .map { case (id, bin) => (id, sh, bin) }
    }.toSet
    got == want
  }
}

package graft

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark query engines and columnar storage"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    (5L, "unrelated short text")).toDF("id", "text")

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(corpus, "id", "text").collect()
    val dupGroup = groups.find(_.getLong(2) == 2)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getLong(1) === 1L) // canonical = min id
    assert(groups.length === 4)
  }

  test("minhash LSH surfaces near-dup and exact-dup pairs") {
    val pairs = Dedup.minhashDedup(corpus, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup: jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near-dups
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash finds exact dups, excludes unrelated docs") {
    // hamming ≤ 3 only holds for long near-identical docs; on these short
    // ones a single changed token flips many low-margin bits, so only the
    // exact dup is asserted here
    val pairs = Dedup.simhashPairs(corpus, "id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.contains((1L, 5L)))
  }

  test("token jaccard exact pairs") {
    val pairs = Dedup.tokenJaccardPairs(corpus, "id", "text", 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 4L)) === 1.0)
    // doc2 swaps today->tonight: 11 shared of 13 distinct-union = 0.8462
    assert(pairs((1L, 2L)) === 0.8462)
    assert(!pairs.contains((1L, 3L)))
  }

  test("LSH top-k achieves high recall vs brute force on clustered data") {
    // a 10-vector cluster of perturbations around vec 7 + 190 random
    // vectors: LSH must keep the cluster findable (sign patterns survive
    // small perturbations); uniform-random corpora have no structure for
    // ANY sublinear index, so that is the honest test shape
    def randVec(tag: String): Array[Float] = Array.tabulate(64)(d =>
      (graft.functions.Hash64.hashString(s"$tag:$d").toDouble / Long.MaxValue).toFloat)
    val base = randVec("cluster-center")
    val vecs = ((0 until 190).map(i => (i.toLong, randVec(s"v$i"))) ++
      (190 until 200).map { i =>
        val noise = randVec(s"noise$i")
        (i.toLong, base.indices.map(d => base(d) + 0.1f * noise(d)).toArray)
      }).toDF("vec_id", "embedding")
    val q = base
    val brute = Similarity.topK(vecs, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    assert(brute === (190L until 200L).toSet) // cluster is the true top-10
    val bucketed = Similarity.buildLsh(vecs, "vec_id", "embedding")
    val approx = Similarity.lshTopK(bucketed, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(approx).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("near-dup clusters: connected components with min-id canonicals") {
    // components: {1,2,3,4} via chain 1-2, 2-3, 3-4; {7,9}; singleton 5 absent
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (9L, 7L)).toDF("a", "b")
    val got = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    def randVec(tag: String): Array[Float] = Array.tabulate(64)(d =>
      (graft.functions.Hash64.hashString(s"$tag:$d").toDouble / Long.MaxValue).toFloat)
    val base = randVec("ivf-center")
    val vecs = ((0 until 190).map(i => (i.toLong, randVec(s"iv$i"))) ++
      (190 until 200).map { i =>
        val noise = randVec(s"ivnoise$i")
        (i.toLong, base.indices.map(d => base(d) + 0.1f * noise(d)).toArray)
      }).toDF("vec_id", "embedding")
    val brute = graft.ops.Similarity.topK(vecs, "vec_id", "embedding", base, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = graft.ops.Ivf.build(vecs, "vec_id", "embedding", nLists = 8)
    val approx = graft.ops.Ivf.topK(idx, "vec_id", "embedding", base, 10, nProbe = 2)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(approx).size.toDouble / brute.size
    assert(recall >= 0.8, s"IVF recall $recall too low")
    // the cluster lives in one cell: probing 2 of 8 cells must find it
  }

  test("language id on real-language samples") {
    val samples = Seq(
      (1L, "the cat sat on the mat and it was happy with the result of the day"),
      (2L, "el perro corre en la casa de los vecinos y la plaza del pueblo"),
      (3L, "der Hund läuft durch die Straße und das ist nicht ungewöhnlich von ihm"),
      (4L, "le chat est dans la maison et les enfants jouent dans le jardin pour une heure"),
      (5L, "这是一个中文句子 with some latin")).toDF("id", "text")
    val got = samples.select($"id", TextAnalysis.languageId($"text").as("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh"))
  }

  test("quality score favors fluent text over noise") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is a fine day in the park"),
      (2L, "@@@ ### !!! $$$ %%% ^^^ &&& *** ((()))")).toDF("id", "text")
    val scores = df.select($"id", TextAnalysis.qualityScore($"text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L))
    assert(scores(2L) < 0.4)
  }

  test("winnowing fingerprints overlap for near-dups") {
    val fp = TextAnalysis.winnowingUdf(5, 4)
    val rows = corpus.select($"id", fp($"text").as("fps")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val j14 = rows(1L).intersect(rows(4L)).size.toDouble / rows(1L).union(rows(4L)).size
    val j13 = rows(1L).intersect(rows(3L)).size.toDouble / rows(1L).union(rows(3L)).size
    assert(j14 === 1.0) // identical docs -> identical sketch
    assert(j13 < 0.2)
  }

  test("multimodal batch featurize preserves schema and determinism") {
    val media = Multimodal.syntheticMedia(corpus, "id", "text")
    val feats = Multimodal.batchFeaturize(media, batchSize = 2).collect()
    assert(feats.length === 5)
    val f1 = feats.find(_.id == 1L).get
    val f4 = feats.find(_.id == 4L).get
    assert(f1.features.toSeq === f4.features.toSeq) // same bytes -> same features
    assert(f1.meta.sizeBytes > 0 && Set("png", "jpeg", "webp").contains(f1.meta.format))
    assert(f1.features.length === 64)
  }
}

package graft.semantic

import graft.fts.Analyzer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable text-embedding provider (reference semantic.py uses a
  * network embedding API, 1024-dim float, batch 96, 8000-token truncate —
  * /root/reference/src/bikidata/semantic.py:15-42). The engine only
  * depends on this trait; a network-backed implementation slots in
  * without touching query code, and tests use the deterministic offline
  * implementation below. */
trait Embedder extends Serializable {
  def dim: Int
  /** Batch size the provider accepts (the reference's API max is 96). */
  def batchSize: Int = 96
  /** Embed DOCUMENTS (the index-build path — the reference's
    * `get_buf_embeddings`). */
  def embed(texts: Seq[String]): Seq[Array[Float]]
  /** Embed a QUERY (the reference's `get_embedding`). Intent is explicit —
    * never inferred from batch size, so a 1-document trailing chunk of an
    * index build still lands in the document embedding space. Providers
    * with asymmetric spaces (query vs document input types) override this;
    * the default is symmetric. */
  def embedQuery(text: String): Array[Float] = embed(Seq(text)).head
  final def embedOne(text: String): Array[Float] = embedQuery(text)
}

/** Deterministic offline embedder: feature-hash the token multiset into
  * `dim` buckets and L2-normalize. Token overlap → cosine similarity, so
  * near-duplicate texts embed near each other — enough structure for
  * tests and for exercising the vector path at scale without a network.
  */
final case class HashingEmbedder(dim: Int = 256) extends Embedder {
  def embed(texts: Seq[String]): Seq[Array[Float]] = texts.map { t =>
    val v = new Array[Float](dim)
    val tokens = Analyzer.tokenize(if (t == null) "" else t, stem = false)
    var i = 0
    while (i < tokens.length) {
      val h = graft.functions.Hash64.hashString(tokens(i))
      val bucket = java.lang.Math.floorMod(h, dim.toLong).toInt
      val sign = if (((h >>> 32) & 1L) == 0L) 1.0f else -1.0f
      v(bucket) += sign
      i += 1
    }
    var norm = 0.0
    i = 0
    while (i < dim) { norm += v(i).toDouble * v(i); i += 1 }
    if (norm > 0) {
      val inv = (1.0 / math.sqrt(norm)).toFloat
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }
}

object Semantic {

  /** Cosine distance between two float vectors (the reference's
    * `array_cosine_distance`): 1 - dot/(|a||b|). Null/zero vectors yield
    * null, which drops them from threshold filters. */
  val cosineDistance: (Seq[Float], Seq[Float]) => java.lang.Double = (a, b) => {
    if (a == null || b == null || a.length != b.length) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
        i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else java.lang.Double.valueOf(1.0 - dot / math.sqrt(na * nb))
    }
  }

  val cosineDistanceUdf = udf(cosineDistance)

  /** Build the `literals_semantic` table: per-subject embedding of the
    * 2-hop FTS document (semantic.py:41-87 — note the `hash` column holds
    * the SUBJECT hash, fed from `fts.s`). Embedding happens inside
    * `mapPartitions` in provider-batch-sized chunks — the distributed
    * analogue of the reference's sequential batch-96 loop.
    * Input: fts docs (s: Long, values: String); output (hash: Long,
    * vec: Array[Float]).
    */
  def buildSemantic(ftsDocs: DataFrame, embedder: Embedder): DataFrame = {
    val spark = ftsDocs.sparkSession
    import spark.implicits._
    ftsDocs.select(col("s"), col("values"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.filter(r => r._2 != null && r._2.nonEmpty)
          .grouped(embedder.batchSize)
          .flatMap { batch =>
            val vecs = embedder.embed(batch.map(_._2))
            batch.map(_._1).zip(vecs)
          }
      }
      .toDF("hash", "vec")
  }
}

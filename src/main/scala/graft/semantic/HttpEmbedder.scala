package graft.semantic

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Network-backed [[Embedder]] mirroring the reference's embedding client
  * (/root/reference/src/bikidata/semantic.py:8-42): POSTs batches of at
  * most 96 texts to an embed API, requests `truncate=END` at 8000 tokens
  * and float embeddings of `dim` dimensions, and refuses to start without
  * the API key environment variable (the reference logs the same guard).
  *
  * Intent is EXPLICIT, never inferred from batch size: [[embed]] always
  * sends `search_document` (the reference's `get_buf_embeddings` index
  * build path — including a trailing 1-document chunk), [[embedQuery]]
  * always sends `search_query` (`get_embedding`, the per-query path the
  * engine reaches via `embedOne`).
  *
  * The HTTP client is @transient: executors deserializing the embedder
  * inside `mapPartitions` each build their own.
  */
final case class HttpEmbedder(
    endpoint: String = HttpEmbedder.DefaultEndpoint,
    apiKeyEnv: String = "COHERE_API_KEY",
    model: String = "embed-v4.0",
    override val dim: Int = 1024,
    maxTokens: Int = 8000,
    requestTimeoutSeconds: Long = 60L,
    // tests inject a key directly; production reads the env var
    apiKeyOverride: Option[String] = None) extends Embedder {

  override def batchSize: Int = 96 // the API's documented max batch

  private def apiKey: String =
    apiKeyOverride.orElse(sys.env.get(apiKeyEnv)).getOrElse(
      throw new IllegalStateException(
        s"$apiKeyEnv environment variable is not set"))

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(requestTimeoutSeconds))
      .build()

  def embed(texts: Seq[String]): Seq[Array[Float]] =
    send(texts, "search_document")

  override def embedQuery(text: String): Array[Float] =
    send(Seq(text), "search_query").head

  private def send(texts: Seq[String], inputType: String): Seq[Array[Float]] = {
    val key = apiKey // fail before any network call when unconfigured
    texts.grouped(batchSize).flatMap { chunk =>
      val body = JsonMethods.compact(JsonMethods.render(
        JObject(
          "model" -> JString(model),
          "input_type" -> JString(inputType),
          "texts" -> JArray(chunk.map(t => JString(if (t == null) "" else t)).toList),
          "max_tokens" -> JInt(maxTokens),
          "truncate" -> JString("END"),
          "output_dimension" -> JInt(dim),
          "embedding_types" -> JArray(List(JString("float"))))))
      val req = java.net.http.HttpRequest.newBuilder()
        .uri(java.net.URI.create(endpoint))
        .timeout(java.time.Duration.ofSeconds(requestTimeoutSeconds))
        .header("Authorization", s"Bearer $key")
        .header("Content-Type", "application/json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(
          s"embed API returned ${resp.statusCode()}: ${resp.body().take(500)}")
      parseEmbeddings(resp.body(), chunk.size)
    }.toSeq
  }

  /** Response shape: `{"embeddings": {"float": [[...], ...]}}`. */
  private def parseEmbeddings(body: String, expected: Int): Seq[Array[Float]] = {
    val vecs = JsonMethods.parse(body) \ "embeddings" \ "float" match {
      case JArray(rows) => rows.map {
        case JArray(vs) => vs.map {
          case JDouble(d) => d.toFloat
          case JInt(i) => i.toFloat
          case JDecimal(d) => d.toFloat
          case other => throw new RuntimeException(s"non-numeric embedding value: $other")
        }.toArray
        case other => throw new RuntimeException(s"non-array embedding row: $other")
      }
      case other => throw new RuntimeException(
        s"unexpected embed response shape: ${JsonMethods.compact(JsonMethods.render(other)).take(200)}")
    }
    if (vecs.size != expected)
      throw new RuntimeException(s"embed API returned ${vecs.size} vectors for $expected texts")
    vecs
  }
}

object HttpEmbedder {
  val DefaultEndpoint = "https://api.cohere.com/v2/embed"
}

package graft.ops

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Network-backed [[Multimodal.MediaEncoder]] — the media counterpart of
  * [[graft.semantic.HttpEmbedder]], completing the provider seam the
  * reference splits its embedding client behind (semantic.py:15-38):
  * POSTs batches of base64 data-URI images to an embed API, refuses to
  * start without the API key environment variable, and demands exactly
  * one `dim`-length float vector back per input.
  *
  * Same executor contract as the text embedder: the HTTP client is
  * @transient, so each executor deserializing the encoder inside
  * [[Multimodal.batchFeaturize]]'s partition-local batches builds its
  * own; one POST per batch (one model forward pass per [[batchSize]]
  * rows). [[Multimodal.HistogramEncoder]] remains the deterministic
  * offline default — this class is the transport a real deployment
  * drops in.
  */
final case class HttpMediaEncoder(
    endpoint: String = HttpMediaEncoder.DefaultEndpoint,
    apiKeyEnv: String = "COHERE_API_KEY",
    model: String = "embed-v4.0",
    override val dim: Int = 1024,
    /** Media type stamped on each data URI. */
    mimeType: String = "image/png",
    requestTimeoutSeconds: Long = 60L,
    // tests inject a key directly; production reads the env var
    apiKeyOverride: Option[String] = None,
    override val batchSize: Int = 32) extends Multimodal.MediaEncoder {

  private def apiKey: String =
    apiKeyOverride.orElse(sys.env.get(apiKeyEnv)).getOrElse(
      throw new IllegalStateException(
        s"$apiKeyEnv environment variable is not set"))

  @transient private lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(requestTimeoutSeconds))
      .build()

  def encode(batch: Seq[Array[Byte]]): Seq[Array[Float]] = {
    val key = apiKey // fail before any network call when unconfigured
    batch.grouped(batchSize).flatMap { chunk =>
      val uris = chunk.map { bytes =>
        val b64 = java.util.Base64.getEncoder.encodeToString(
          if (bytes == null) Array.empty[Byte] else bytes)
        s"data:$mimeType;base64,$b64"
      }
      val body = JsonMethods.compact(JsonMethods.render(
        JObject(
          "model" -> JString(model),
          "input_type" -> JString("image"),
          "images" -> JArray(uris.map(JString(_)).toList),
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
          s"media embed API returned ${resp.statusCode()}: ${resp.body().take(500)}")
      parseEmbeddings(resp.body(), chunk.size)
    }.toSeq
  }

  /** Response shape: `{"embeddings": {"float": [[...], ...]}}` — shared
    * with the text endpoint. */
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
        s"unexpected media embed response shape: ${JsonMethods.compact(JsonMethods.render(other)).take(200)}")
    }
    if (vecs.size != expected)
      throw new RuntimeException(
        s"media embed API returned ${vecs.size} vectors for $expected inputs")
    vecs
  }
}

object HttpMediaEncoder {
  val DefaultEndpoint = "https://api.cohere.com/v2/embed"
}

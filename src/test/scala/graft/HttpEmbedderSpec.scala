package graft

import graft.semantic.HttpEmbedder
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Drives [[HttpEmbedder]] against a local stub server: request shape
  * (batching at 96, truncate/max_tokens params, auth header, per-size
  * input_type) and the env-key guard. No Spark needed. */
class HttpEmbedderSpec extends AnyFunSuite {

  private def withStub(f: (String, () => Seq[JValue]) => Unit): Unit = {
    val requests = scala.collection.mutable.ArrayBuffer.empty[JValue]
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        val parsed = JsonMethods.parse(body)
        requests.synchronized { requests += JObject(
          "body" -> parsed,
          "auth" -> JString(Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""))) }
        val texts = (parsed \ "texts").asInstanceOf[JArray].arr
        val dim = (parsed \ "output_dimension") match {
          case JInt(d) => d.toInt
          case _ => 4
        }
        // deterministic fake: vec[i] = text length + i
        val vecs = JArray(texts.map { case JString(t) =>
          JArray((0 until dim).map(i => JDouble(t.length + i)).toList)
        case _ => JArray(Nil) })
        val resp = JsonMethods.compact(JsonMethods.render(
          JObject("embeddings" -> JObject("float" -> vecs))))
        val bytes = resp.getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/embed",
      () => requests.synchronized(requests.toSeq))
    finally server.stop(0)
  }

  test("batches at 96, sets auth header and truncation params") {
    withStub { (endpoint, recorded) =>
      val e = HttpEmbedder(endpoint = endpoint, dim = 4,
        apiKeyOverride = Some("test-key"))
      val texts = (0 until 100).map(i => s"doc $i")
      val vecs = e.embed(texts)
      assert(vecs.size === 100)
      assert(vecs.head.length === 4)
      // deterministic fake round-trips: "doc 0".length == 5
      assert(vecs.head.toSeq === Seq(5f, 6f, 7f, 8f))
      val reqs = recorded()
      assert(reqs.size === 2, "100 texts must split into 96 + 4")
      val sizes = reqs.map(r => (r \ "body" \ "texts").asInstanceOf[JArray].arr.size)
      assert(sizes.sorted === List(4, 96))
      for (r <- reqs) {
        assert((r \ "auth") === JString("Bearer test-key"))
        assert((r \ "body" \ "truncate") === JString("END"))
        assert((r \ "body" \ "max_tokens") === JInt(8000))
        assert((r \ "body" \ "model") === JString("embed-v4.0"))
        // multi-text batches are documents
        assert((r \ "body" \ "input_type") === JString("search_document"))
      }
    }
  }

  test("single text goes out as search_query (the engine's embedOne path)") {
    withStub { (endpoint, recorded) =>
      val e = HttpEmbedder(endpoint = endpoint, dim = 4,
        apiKeyOverride = Some("k"))
      e.embedOne("what is tatooine")
      val reqs = recorded()
      assert(reqs.size === 1)
      assert((reqs.head \ "body" \ "input_type") === JString("search_query"))
    }
  }

  test("a 1-document index-build chunk stays search_document (intent, not size)") {
    withStub { (endpoint, recorded) =>
      val e = HttpEmbedder(endpoint = endpoint, dim = 4,
        apiKeyOverride = Some("k"))
      // a 97-text build: the trailing chunk has exactly 1 text, and the
      // reference's get_buf_embeddings keeps it in the document space
      e.embed((0 until 97).map(i => s"doc $i"))
      val reqs = recorded()
      assert(reqs.size === 2)
      assert(reqs.forall(r => (r \ "body" \ "input_type") === JString("search_document")))
      // a singleton embed() call is STILL a document — only embedQuery
      // selects the query space
      e.embed(Seq("lonely doc"))
      assert((recorded().last \ "body" \ "input_type") === JString("search_document"))
    }
  }

  test("missing API key fails before any network call") {
    val e = HttpEmbedder(endpoint = "http://127.0.0.1:1/embed",
      apiKeyEnv = "GRAFT_TEST_NO_SUCH_KEY")
    val ex = intercept[IllegalStateException](e.embed(Seq("x")))
    assert(ex.getMessage.contains("GRAFT_TEST_NO_SUCH_KEY"))
  }

  test("non-2xx and malformed responses raise clear errors") {
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/bad", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val b = "rate limited".getBytes("UTF-8")
        ex.sendResponseHeaders(429, b.length); ex.getResponseBody.write(b); ex.close()
      }
    })
    server.start()
    try {
      val e = HttpEmbedder(endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/bad",
        apiKeyOverride = Some("k"))
      val ex = intercept[RuntimeException](e.embed(Seq("x")))
      assert(ex.getMessage.contains("429"))
    } finally server.stop(0)
  }
}

package graft.api

import graft.ingest.Quad
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Single-writer queue tier mirroring the reference's Redis
  * manager/worker processes (workers.py:27-108) without the Redis
  * dependency:
  *
  *  - ONE manager thread drains the inbound queue and executes
  *    insert/delete INLINE — the single-writer routing that serializes
  *    all mutations (redis_manager, workers.py:39-70);
  *  - N worker threads drain the ready queue and serve queries through
  *    an md5-keyed result cache (redis_worker, workers.py:73-108);
  *  - clients get a ticket future and block with a timeout
  *    (query_async, workers.py:115-128).
  *
  * Spark jobs are already cluster-parallel, so "workers" are threads in
  * the session JVM rather than forked OS processes; [[WorkerServer]]
  * replaces the Redis transport with a line-delimited-JSON TCP socket
  * for cross-process clients.
  */
final class WorkerPool(bk: Bikidata, numWorkers: Int = 1, cacheSize: Int = 1024,
    cacheTtlMillis: Long = Bikidata.DefaultCacheTtlMillis,
    clock: () => Long = () => System.currentTimeMillis()) {

  private final case class Req(json: String,
      promise: java.util.concurrent.CompletableFuture[String])

  private val inQ = new java.util.concurrent.LinkedBlockingQueue[Req]()
  private val readyQ = new java.util.concurrent.LinkedBlockingQueue[Req]()
  @volatile private var running = true

  // LRU + the reference's 7-day result expiry (workers.py:104-107),
  // shared implementation with the facade cache. Entries are keyed
  // under the store EPOCH they were computed against: a mutation bumps
  // the epoch, so lookups never see pre-mutation envelopes — and a
  // worker that was mid-query during the mutation writes its stale
  // result under the OLD epoch key, where no future lookup finds it
  // (a bare clear() would race exactly that in-flight put and
  // re-poison the cache for the full TTL). Old-epoch entries age out
  // of the LRU like any other.
  private val cache = new TtlLruCache(cacheSize, cacheTtlMillis, clock)
  private val storeEpoch = new java.util.concurrent.atomic.AtomicLong(0L)
  private def epochKey(epoch: Long, key: String): String = s"$epoch:$key"
  private def cacheGet(key: String): Option[String] =
    cache.get(epochKey(storeEpoch.get(), key))
  val cacheHits = new java.util.concurrent.atomic.AtomicLong()

  /** Submit a request (reference opts JSON: a query dict, or
    * `{"action": "insert"|"delete", "data": [{s,p,o,g}], ...}`) and wait
    * for its result envelope. */
  def submit(optsJson: String, timeoutSeconds: Long = 60L): String = {
    val p = submitAsync(optsJson)
    try p.get(timeoutSeconds, java.util.concurrent.TimeUnit.SECONDS)
    catch { case _: java.util.concurrent.TimeoutException =>
      throw new java.util.concurrent.TimeoutException(
        s"query timed out after ${timeoutSeconds}s")
    }
  }

  /** Fire-and-collect submit for transports that deliver the result out
    * of band (the RESP adapter pushes it onto the request's ticket
    * list, the way redis_manager/redis_worker lpush to `query_ticket`,
    * workers.py:54,108). */
  def submitAsync(optsJson: String): java.util.concurrent.CompletableFuture[String] = {
    val p = new java.util.concurrent.CompletableFuture[String]()
    inQ.put(Req(optsJson, p))
    p
  }

  private def md5(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Runs the mutation and reports (envelope JSON, store changed?) — the
    * epoch must bump only when the store actually changed: a refused
    * batch (validation error, unknown action) flushing the whole pool
    * cache would cost every cached result for no correctness gain
    * (the facade invalidates only on success for the same reason). */
  private def runMutation(parsed: JValue): (String, Boolean) = {
    implicit val fmts: Formats = DefaultFormats
    val action = (parsed \ "action").extract[String]
    val areHashes = (parsed \ "are_hashes").extractOrElse[Boolean](false)
    val data = (parsed \ "data") match {
      case JArray(items) => items.map { it =>
        ((it \ "s").extractOrElse[String](""), (it \ "p").extractOrElse[String](""),
          (it \ "o") match {
            case JString(o) => Some(o)
            case JNull | JNothing => None
            case other => Some(other.extract[String])
          },
          (it \ "g").extractOrElse[String](""))
      }
      case _ => Nil
    }
    val res = action match {
      case "insert" =>
        bk.insert(data.map { case (s, p, o, g) => Quad(s, p, o.getOrElse(""), g) })
      case "delete" =>
        bk.delete(data, areHashes)
      case other =>
        graft.store.MutationResult(error = Some(s"unknown action: $other"))
    }
    val fields: List[JField] = List(
      "triples_inserted" -> JInt(res.triplesInserted),
      "iris_inserted" -> JInt(res.irisInserted),
      "literals_inserted" -> JInt(res.literalsInserted),
      "triples_deleted" -> JInt(res.triplesDeleted)) ++
      res.error.map(e => JField("error", JString(e))).toList
    (JsonMethods.compact(JsonMethods.render(JObject(fields))), res.error.isEmpty)
  }

  private val manager = new Thread(() => {
    while (running) {
      val req = inQ.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
      if (req != null) {
        try {
          val parsed = JsonMethods.parse(req.json)
          (parsed \ "action") match {
            case JString("insert") | JString("delete") =>
              // inline in the manager: the single writer. Bump the store
              // epoch after the store changes — query_hash keys are
              // content-derived (no ticket), so an entry cached
              // pre-mutation would otherwise satisfy the same query for
              // the full TTL. (Deliberate divergence: the reference's
              // Redis cache keeps serving pre-mutation envelopes for up
              // to 7 days, workers.py:104-107; the facade cache already
              // invalidates, Bikidata.invalidate — the pool now agrees.)
              val (resJson, changed) = runMutation(parsed)
              if (changed) storeEpoch.incrementAndGet()
              req.promise.complete(resJson)
            case _ => readyQ.put(req)
          }
        } catch { case e: Exception =>
          req.promise.complete(errorJson(e))
        }
      }
    }
  }, "graft-worker-manager")

  private def errorJson(e: Exception): String =
    JsonMethods.compact(JsonMethods.render(JObject(List(
      "error" -> JString("Failed to process query"),
      "trace" -> JString(String.valueOf(e))))))

  private val workers = (1 to numWorkers).map { i =>
    new Thread(() => {
      while (running) {
        val req = readyQ.poll(200, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (req != null) {
          try {
            implicit val fmts: Formats = DefaultFormats
            val parsed = JsonMethods.parse(req.json)
            val useCache = (parsed \ "use_cache").extractOrElse[Boolean](true)
            // reference clients stamp every request with a unique
            // query_ticket but a CONTENT-derived query_hash (md5 of the
            // sorted opts, workers.py:116-118) — cache on that when
            // present, or repeated queries would never hit (the ticket
            // makes the raw json unique per request)
            val key = (parsed \ "query_hash") match {
              case JString(h) if h.nonEmpty => h
              case _ => md5(req.json)
            }
            val hit = if (useCache) cacheGet(key) else None
            hit match {
              case Some(v) =>
                cacheHits.incrementAndGet()
                req.promise.complete(v)
              case None =>
                // pass the client's cache opt-out through: the facade
                // keeps its own md5 cache on the same key, and answering
                // from it would defeat use_cache=false. The epoch is
                // snapshotted BEFORE the query runs: if a mutation lands
                // mid-query, the result files under the old epoch key
                // and is never served.
                val epoch = storeEpoch.get()
                val res = bk.queryJson(req.json, useCache = useCache)
                if (useCache) cache.put(epochKey(epoch, key), res)
                req.promise.complete(res)
            }
          } catch { case e: Exception =>
            req.promise.complete(errorJson(e))
          }
        }
      }
    }, s"graft-worker-$i")
  }

  (manager +: workers).foreach { t => t.setDaemon(true); t.start() }

  def shutdown(): Unit = running = false
}

/** TCP front end for [[WorkerPool]]: one line-delimited JSON request per
  * line in, one response line out — the cross-process transport the
  * reference gets from Redis lists. */
final class WorkerServer(bk: Bikidata, port: Int = 0, numWorkers: Int = 1) {
  val pool = new WorkerPool(bk, numWorkers)
  private val server = new java.net.ServerSocket(port)
  def boundPort: Int = server.getLocalPort
  @volatile private var running = true

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val sock = server.accept()
        val t = new Thread(() => {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
          val out = new java.io.PrintWriter(
            new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"), true)
          try {
            var line = in.readLine()
            while (line != null && running) {
              if (line.trim.nonEmpty) {
                // a slow query (pool.submit TimeoutException) or any other
                // per-request failure gets an error ENVELOPE on the wire —
                // it must not kill the connection thread mid-protocol
                val resp =
                  try pool.submit(line)
                  catch {
                    case e: java.io.IOException => throw e // socket itself broke
                    case scala.util.control.NonFatal(e) =>
                      """{"error": "Failed to process query", "trace": """ +
                        JsonMethods.compact(JsonMethods.render(JString(String.valueOf(e)))) + "}"
                  }
                out.println(resp.replace("\n", " "))
              }
              line = in.readLine()
            }
          } catch { case _: java.io.IOException => () }
          finally sock.close()
        })
        t.setDaemon(true)
        t.start()
      } catch { case _: java.io.IOException => () } // closed during accept
    }
  }, "graft-worker-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def close(): Unit = {
    running = false
    pool.shutdown()
    server.close()
  }
}

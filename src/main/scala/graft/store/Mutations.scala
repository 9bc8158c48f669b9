package graft.store

import graft.functions.Hash64
import graft.ingest.Quad
import graft.model.Term
import org.apache.spark.sql.functions._

final case class MutationResult(
    triplesInserted: Int = 0,
    irisInserted: Int = 0,
    literalsInserted: Int = 0,
    triplesDeleted: Int = 0,
    error: Option[String] = None)

/** Point insert / delete with the reference's validation semantics
  * (/root/reference/src/bikidata/query.py:468-617), re-expressed over
  * immutable DataFrames: an insert unions delta rows in, a delete
  * anti-joins the victims out. [[Warehouse]] persists the same operations
  * as delta parts + tombstones; these pure functions serve in-memory
  * graphs and tests.
  */
object Mutations {

  private def h(s: String): Long = Hash64.hashString(s)

  /** Validate one insert item (query.py:538-546). */
  def validateInsert(q: Quad): Option[String] = {
    if (q.s.isEmpty || q.p.isEmpty || q.o.isEmpty) Some("Insert triple missing s, p, or o")
    else if (!(q.s.startsWith("<") || q.s.startsWith("_:"))) Some("Subject must be an IRI or BlankNode")
    else if (!(q.p.startsWith("<") && q.p.endsWith(">"))) Some("Predicate must be an IRI")
    else if (!(q.o.startsWith("\"") || q.o.startsWith("<") || q.o.startsWith("_:")))
      Some("Object must be a literal, IRI or a BlankNode")
    else None
  }

  /** Insert quads; refuses the whole batch on the first invalid or
    * already-existing triple (reference behavior: error out, nothing
    * applied). */
  def insert(graph: Graph, quads: Seq[Quad]): (Graph, MutationResult) = {
    val (g2, res, _, _) = insertWithDeltas(graph, quads)
    (g2, res)
  }

  /** [[insert]] that also returns the new-dictionary-entry frames, so
    * disk-backed callers can append exactly those rows without
    * recomputing them (they are persisted and already counted). */
  def insertWithDeltas(graph: Graph, quads: Seq[Quad])
      : (Graph, MutationResult, org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val spark = graph.spark
    import spark.implicits._
    val empty = spark.emptyDataFrame
    quads.flatMap(validateInsert) match {
      case err +: _ => return (graph, MutationResult(error = Some(err)), empty, empty)
      case _ => ()
    }
    val rows = quads.map(q => (h(q.s), h(q.p), h(q.o), h(q.g)))
    val candidates = rows.toDF("s", "p", "o", "g")

    // dictionary deltas: graph name only when non-default (query.py:566-567)
    val terms = quads.flatMap(q =>
      Seq(q.s, q.p, q.o) ++ (if (q.g.nonEmpty) Seq(q.g) else Nil)).distinct
    val (lits, irisTerms) = terms.partition(Term.isLiteral)

    // For point/small-batch inserts (the reference's mutation API shape)
    // the which-terms-already-exist probe is an `isin`-filtered dictionary
    // SCAN — the predicate reaches the columnar scan, no join, no shuffle.
    // Past `batchJoinThreshold` terms, an IN list stops being a scan
    // predicate, so large bulk loads keep the anti-join plan instead.
    val batchJoinThreshold = 10000
    def existingHashes(dict: org.apache.spark.sql.DataFrame, ts: Seq[String]): Set[Long] =
      if (ts.isEmpty) Set.empty
      else dict.filter(col("hash").isin(ts.map(h): _*))
        .select("hash").collect().map(_.getLong(0)).toSet

    // the batch existence probe and the two dictionary probes are
    // independent — overlap their jobs
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val existsF = Future {
      // same isin-pruned probe as delete validation: a point insert's
      // duplicate check touches only the subject's batches of the
      // s-sorted copy, not the whole corpus
      val sHashes = rows.map(_._1).distinct
      val base =
        if (sHashes.size <= batchJoinThreshold)
          graph.subjectAccess.filter(col("s").isin(sHashes: _*))
        else graph.triples
      base.join(broadcast(candidates), Seq("s", "p", "o", "g"), "left_semi").count()
    }

    val (newIris, newLits, nIris, nLits) =
      if (terms.size <= batchJoinThreshold) {
        val fIris = Future(existingHashes(graph.iris, irisTerms))
        val fLits = Future(existingHashes(graph.literals, lits))
        val haveIris = Await.result(fIris, Duration.Inf)
        val haveLits = Await.result(fLits, Duration.Inf)
        val ni = irisTerms.map(t => (h(t), t)).filterNot(e => haveIris(e._1))
        val nl = lits.map(t => (h(t), t)).filterNot(e => haveLits(e._1))
        (ni.toDF("hash", "value"), nl.toDF("hash", "value"), ni.size, nl.size)
      } else {
        def newEntries(existingDict: org.apache.spark.sql.DataFrame, ts: Seq[String]) = {
          val df = ts.map(t => (h(t), t)).toDF("hash", "value")
          df.join(existingDict, Seq("hash"), "left_anti").localCheckpoint()
        }
        val fi = Future(newEntries(graph.iris, irisTerms))
        val fl = Future(newEntries(graph.literals, lits))
        val ni = Await.result(fi, Duration.Inf)
        val nl = Await.result(fl, Duration.Inf)
        (ni, nl, ni.count().toInt, nl.count().toInt)
      }

    if (Await.result(existsF, Duration.Inf) > 0)
      return (graph, MutationResult(error = Some("Triple already exists, skipping insert")), empty, empty)

    val g2 = graph.copy(
      triples = graph.triples.union(candidates),
      iris = graph.iris.union(newIris),
      literals = graph.literals.union(newLits))
    (g2,
      MutationResult(triplesInserted = quads.size, irisInserted = nIris, literalsInserted = nLits),
      newIris, newLits)
  }

  /** Delete by (s,p,o,g) or (s,p,g) with o wildcard (query.py:468-526).
    * Terms are N3 strings unless `areHashes` (then decimal hash strings). */
  def delete(
      graph: Graph,
      items: Seq[(String, String, Option[String], String)],
      areHashes: Boolean = false): (Graph, MutationResult) = {
    val spark = graph.spark
    import spark.implicits._
    def toHash(v: String): Long =
      if (areHashes) java.lang.Long.parseUnsignedLong(v) else h(v)

    if (!areHashes) {
      val exactKeys = items.collect { case (s, p, Some(o), g) => (h(s), h(p), h(o), h(g)) }
      val wildKeys = items.collect { case (s, p, None, g) => (h(s), h(p), h(g)) }
      if (Mutations.deleteBatchMissing(graph, exactKeys, wildKeys))
        return (graph, MutationResult(error = Some("Triple does not exist, skipping delete")))
    }

    val exact = items.collect { case (s, p, Some(o), g) => (toHash(s), toHash(p), toHash(o), toHash(g)) }
    val wild = items.collect { case (s, p, None, g) => (toHash(s), toHash(p), toHash(g)) }
    var t = graph.triples
    if (exact.nonEmpty)
      t = t.join(exact.toDF("s", "p", "o", "g"), Seq("s", "p", "o", "g"), "left_anti")
    if (wild.nonEmpty)
      t = t.join(wild.toDF("s", "p", "g"), Seq("s", "p", "g"), "left_anti")
    (graph.copy(triples = t), MutationResult(triplesDeleted = items.size))
  }

  /** Batch-existence validation for delete (query.py:478-482 refuses the
    * whole batch) — the ONE implementation, shared by the in-memory path
    * above and the warehouse tombstone path, so the probe/concurrency
    * optimizations cannot drift between them. One semi-join per key
    * shape, never a per-item count job; point/small-batch deletes (the
    * reference's mutation API shape) probe the s-sorted copy with an
    * `isin` subject filter so the predicate reaches the columnar scan's
    * min/max stats, while bulk batches keep the full-scan semi-join; the
    * exact and wildcard validation jobs run concurrently. */
  private[store] def deleteBatchMissing(graph: Graph,
      exactKeys: Seq[(Long, Long, Long, Long)],
      wildKeys: Seq[(Long, Long, Long)]): Boolean = {
    val spark = graph.spark
    import spark.implicits._
    val subjectHashes = (exactKeys.map(_._1) ++ wildKeys.map(_._1)).distinct
    val probeBase =
      if (subjectHashes.nonEmpty && subjectHashes.size <= 10000)
        graph.subjectAccess.filter(col("s").isin(subjectHashes: _*))
      else graph.triples
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val missingExactF = Future(exactKeys.distinct match {
      case Nil => false
      case ks => probeBase
        .join(broadcast(ks.toDF("s", "p", "o", "g")), Seq("s", "p", "o", "g"), "left_semi")
        .select("s", "p", "o", "g").distinct().count() < ks.size
    })
    val missingWildF = Future(wildKeys.distinct match {
      case Nil => false
      case ks => probeBase
        .join(broadcast(ks.toDF("s", "p", "g")), Seq("s", "p", "g"), "left_semi")
        .select("s", "p", "g").distinct().count() < ks.size
    })
    Await.result(missingExactF, Duration.Inf) || Await.result(missingWildF, Duration.Inf)
  }
}

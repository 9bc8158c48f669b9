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

  /** Key batches up to this size turn into OR-of-conjunction SCAN
    * predicates instead of broadcast joins: a point mutation's probe and
    * its application then carry NO broadcast exchange — each broadcast
    * materialization is its own Spark job, i.e. one more scheduling
    * floor per mutation. Past the limit the predicate would bloat the
    * plan, so bulk batches keep the broadcast semi/anti-join. */
  private val inlineKeyLimit = 100

  private def keyPred4(ks: Seq[(Long, Long, Long, Long)]) =
    ks.map { case (sv, pv, ov, gv) =>
      col("s") === sv && col("p") === pv && col("o") === ov && col("g") === gv
    }.reduce(_ || _)

  private def keyPred3(ks: Seq[(Long, Long, Long)]) =
    ks.map { case (sv, pv, gv) =>
      col("s") === sv && col("p") === pv && col("g") === gv
    }.reduce(_ || _)

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
    val sHashes = rows.map(_._1).distinct

    val (newIris, newLits, nIris, nLits) =
      if (terms.size <= batchJoinThreshold && sHashes.size <= batchJoinThreshold) {
        // small-batch fast path: the triple-existence probe and both
        // dictionary probes FOLD INTO ONE JOB (tagged union of three
        // isin-pruned scans) — a point insert pays one scheduling floor
        // for its whole validation, not three overlapped ones. The
        // existence leg probes the s-sorted copy so the subject predicate
        // reaches the columnar scan's min/max stats; output is bounded by
        // |candidates| + |terms|.
        val existsProbe = {
          val base = graph.subjectAccess.filter(col("s").isin(sHashes: _*))
          // inline the quad predicate for point batches (no broadcast
          // job); past the limit fall back to the broadcast semi-join
          if (rows.size <= inlineKeyLimit) base.filter(keyPred4(rows))
          else base.join(broadcast(candidates), Seq("s", "p", "o", "g"), "left_semi")
        }.select(lit(0).as("k"), lit(0L).as("hash"))
        def dictProbe(dict: org.apache.spark.sql.DataFrame, ts: Seq[String], tag: Int) =
          if (ts.isEmpty) None
          else Some(dict.filter(col("hash").isin(ts.map(h): _*))
            .select(lit(tag).as("k"), col("hash")))
        val probed = (Seq(existsProbe) ++ dictProbe(graph.iris, irisTerms, 1) ++
            dictProbe(graph.literals, lits, 2))
          .reduce(_ unionAll _).collect()
        if (probed.exists(_.getInt(0) == 0))
          return (graph, MutationResult(error = Some("Triple already exists, skipping insert")), empty, empty)
        val haveIris = probed.filter(_.getInt(0) == 1).map(_.getLong(1)).toSet
        val haveLits = probed.filter(_.getInt(0) == 2).map(_.getLong(1)).toSet
        val ni = irisTerms.map(t => (h(t), t)).filterNot(e => haveIris(e._1))
        val nl = lits.map(t => (h(t), t)).filterNot(e => haveLits(e._1))
        (ni.toDF("hash", "value"), nl.toDF("hash", "value"), ni.size, nl.size)
      } else {
        // bulk path: anti-join plans, independent probes overlapped
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val existsF = Future {
          graph.triples
            .join(broadcast(candidates), Seq("s", "p", "o", "g"), "left_semi").count()
        }
        def newEntries(existingDict: org.apache.spark.sql.DataFrame, ts: Seq[String]) = {
          val df = ts.map(t => (h(t), t)).toDF("hash", "value")
          df.join(existingDict, Seq("hash"), "left_anti").localCheckpoint()
        }
        val fi = Future(newEntries(graph.iris, irisTerms))
        val fl = Future(newEntries(graph.literals, lits))
        val ni = Await.result(fi, Duration.Inf)
        val nl = Await.result(fl, Duration.Inf)
        if (Await.result(existsF, Duration.Inf) > 0)
          return (graph, MutationResult(error = Some("Triple already exists, skipping insert")), empty, empty)
        (ni, nl, ni.count().toInt, nl.count().toInt)
      }

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
    // small batches subtract via a pure NOT-filter (pushes to the scan,
    // no broadcast job); bulk deletes keep the anti-join plan
    if (exact.nonEmpty)
      t = if (exact.size <= inlineKeyLimit) t.filter(!keyPred4(exact))
          else t.join(exact.toDF("s", "p", "o", "g"), Seq("s", "p", "o", "g"), "left_anti")
    if (wild.nonEmpty)
      t = if (wild.size <= inlineKeyLimit) t.filter(!keyPred3(wild))
          else t.join(wild.toDF("s", "p", "g"), Seq("s", "p", "g"), "left_anti")
    (graph.copy(triples = t), MutationResult(triplesDeleted = items.size))
  }

  /** Batch-existence validation for delete (query.py:478-482 refuses the
    * whole batch) — the ONE implementation, shared by the in-memory path
    * above and the warehouse tombstone path, so the probe optimizations
    * cannot drift between them. The exact-key and wildcard-key probes
    * FOLD INTO ONE JOB (tagged union of two semi-joins over the shared
    * probe base), so a point delete pays one scheduling floor for its
    * whole validation; point/small-batch deletes (the reference's
    * mutation API shape) probe the s-sorted copy with an `isin` subject
    * filter so the predicate reaches the columnar scan's min/max stats,
    * while bulk batches keep the full-scan semi-join. */
  private[store] def deleteBatchMissing(graph: Graph,
      exactKeys: Seq[(Long, Long, Long, Long)],
      wildKeys: Seq[(Long, Long, Long)]): Boolean = {
    val spark = graph.spark
    import spark.implicits._
    val eKeys = exactKeys.distinct
    val wKeys = wildKeys.distinct
    if (eKeys.isEmpty && wKeys.isEmpty) return false
    val subjectHashes = (eKeys.map(_._1) ++ wKeys.map(_._1)).distinct
    val probeBase =
      if (subjectHashes.size <= 10000)
        graph.subjectAccess.filter(col("s").isin(subjectHashes: _*))
      else graph.triples
    // distinct matched keys per shape, tagged: k=0 exact, k=1 wildcard;
    // small batches match via inline predicates (no broadcast job)
    val eProbe =
      if (eKeys.isEmpty) None
      else Some((
        if (eKeys.size <= inlineKeyLimit) probeBase.filter(keyPred4(eKeys))
        else probeBase.join(broadcast(eKeys.toDF("s", "p", "o", "g")),
          Seq("s", "p", "o", "g"), "left_semi"))
        .select(lit(0).as("k"),
          concat_ws(",", col("s"), col("p"), col("o"), col("g")).as("key")))
    val wProbe =
      if (wKeys.isEmpty) None
      else Some((
        if (wKeys.size <= inlineKeyLimit) probeBase.filter(keyPred3(wKeys))
        else probeBase.join(broadcast(wKeys.toDF("s", "p", "g")),
          Seq("s", "p", "g"), "left_semi"))
        .select(lit(1).as("k"),
          concat_ws(",", col("s"), col("p"), col("g")).as("key")))
    val matched = (eProbe ++ wProbe).reduce(_ unionAll _)
      .groupBy("k").agg(countDistinct("key").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    matched.getOrElse(0, 0L) < eKeys.size || matched.getOrElse(1, 0L) < wKeys.size
  }
}

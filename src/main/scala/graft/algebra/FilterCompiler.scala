package graft.algebra

import graft.functions.Hash64
import graft.fts.FtsIndex
import graft.semantic.{Embedder, HashingEmbedder, Semantic}
import graft.store.Graph
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Everything a query needs besides the opts: the graph, the optional
  * derived indexes, the embedding provider, and a sample seed (the
  * reference's `random N` is nondeterministic, query.py:155-164; a fixed
  * seed makes tests reproducible).
  *
  * `dictBroadcast` is the decode fast path: when the term dictionary fits
  * on the driver (serving sessions at test/warehouse scale), hash→string
  * decode becomes a broadcast-map lookup instead of a per-query join —
  * the join would re-broadcast (or shuffle) the whole dictionary for
  * every page decode. At corpus scales where the dictionary cannot fit,
  * leave it None and every decode falls back to the join path. */
final case class EngineContext(
    graph: Graph,
    fts: Option[FtsIndex] = None,
    semantic: Option[DataFrame] = None, // literals_semantic (hash=subject, vec)
    // lossless IVF cell partition of `semantic` — threshold queries scan
    // only cells whose spherical cap can hold a match (identical results)
    semanticAnn: Option[graft.semantic.SemanticAnn] = None,
    embedder: Embedder = HashingEmbedder(),
    sampleSeed: Long = 42L,
    maxPathIterations: Int = 50,
    // chains kept on the driver before paths() switches to the
    // distributed frontier (branchy multi-parent graphs)
    maxDriverChains: Int = 65536,
    // edge-count bound for the paths() broadcast-arrays fast path
    // (~64 MB of long pairs at the default — same order as the facet
    // broadcast budget); corpus-scale properties keep the join walk.
    // A context knob (not a constant) so deployments can size it to
    // driver memory and tests can force each walk.
    maxBroadcastPathEdges: Long = 4000000L,
    // probe sets (regex-matched literal hashes, hop frontiers) at or
    // under this become an o-IN scan predicate on the triples probe —
    // batch min/max pruning instead of a join; above it, broadcast join
    isinProbeCap: Int = 1000,
    dictBroadcast: Option[org.apache.spark.broadcast.Broadcast[Map[Long, String]]] = None,
    // per-property parent edge sets for paths(), persisted across queries
    // for the lifetime of the context (a serving session runs the same
    // hierarchy property on every page) — the filter+distinct shuffle is
    // paid once per property instead of once per query, as is the
    // single-parent test that lets paths() drop its fanout guard.
    // copy() shares the map, so derived contexts (e.g. with semantic
    // indexes) reuse the same cached edge sets.
    pathEdges: java.util.concurrent.ConcurrentHashMap[String, PathEdges] =
      new java.util.concurrent.ConcurrentHashMap[String, PathEdges](),
    // whole-store scalar stats (total()), computed once per context: the
    // store is immutable between mutations and every mutation replaces
    // the context (Bikidata.invalidate), so between mutations these are
    // constants — a serving tier answers them from the materialized
    // value, not a fresh count-distinct per request. Shared via copy()
    // like pathEdges, so derived contexts reuse the same stats.
    stats: java.util.concurrent.ConcurrentHashMap[String, Long] =
      new java.util.concurrent.ConcurrentHashMap[String, Long](),
    // whole-store aggregate frames (properties(), whole-DB facets) —
    // same store-constant argument as `stats`, but the value is a small
    // persisted DataFrame (vocab-sized: one row per property/graph).
    // Bikidata.invalidate unpersists these with the graph they view.
    statFrames: java.util.concurrent.ConcurrentHashMap[String, DataFrame] =
      new java.util.concurrent.ConcurrentHashMap[String, DataFrame](),
    // built (NOT materialized) query frames keyed by canonical query
    // text — see servingPlan. Plain plans over this context's pinned
    // frames: dropping the map is a full release (nothing persisted).
    servingPlans: java.util.concurrent.ConcurrentHashMap[String, DataFrame] =
      new java.util.concurrent.ConcurrentHashMap[String, DataFrame](),
    // bounded probe RESULTS (collected isin/page value arrays, each
    // ≤ isinProbeCap / page-size rows) keyed by the probe plan's
    // semantic hash — see servingValue. Driver-resident and tiny;
    // cleared (no blocks to free) on the same mutation drain.
    servingValues: java.util.concurrent.ConcurrentHashMap[String, AnyRef] =
      new java.util.concurrent.ConcurrentHashMap[String, AnyRef](),
    // set (before draining) when a mutation retires this context: a query
    // thread can be mid-computeIfAbsent on pathEdges/statFrames while the
    // drain runs and install its persisted frame AFTER the clear — into a
    // map nobody will ever drain again, leaking the persisted blocks for
    // the session lifetime. Installers re-check this flag post-install
    // (cachedPathEdges/cachedStatFrame) and re-drain; unpersist is
    // idempotent, so the double-drain overlap is harmless.
    retired: java.util.concurrent.atomic.AtomicBoolean =
      new java.util.concurrent.atomic.AtomicBoolean(false)) {

  /** Decode column via the broadcast map (None => use the join path).
    *
    * The decode is wrapped in [[graft.functions.Fence]] — the typed
    * placement barrier: decode sits at plan TOPS (envelope/gate
    * presentation over aggregated, page-bounded rows), and unfenced,
    * Catalyst pushes the `inner` null-filter `isnotnull(decode(key))`
    * below the aggregate and into join keys — running the map lookup
    * once per CORPUS row instead of once per result row (measured 0.27
    * → 0.40 s on a 4-row facet; at 100 TB it would be a full-corpus
    * decode). Nothing downstream needs decode pushdown: every consumer
    * decodes last by construction; pinned in PlanContractSpec. A native
    * expression rather than a Scala UDF: the UDF form paid
    * ResolveEncodersInUDF/HandleNullInputsForUDF analyzer work on every
    * decoding query — pure per-query planning cost on the serving path. */
  def decodeExpr(c: org.apache.spark.sql.Column): Option[org.apache.spark.sql.Column] =
    dictBroadcast.map { b =>
      org.apache.spark.sql.GraftShims.column(graft.functions.Fence(
        graft.functions.DictDecode(
          org.apache.spark.sql.GraftShims.expression(c), b)))
    }

  /** Unpersist + clear every derived cache. Remove-then-unpersist per
    * key (not forEach+clear) so an entry installed mid-drain is either
    * removed here or caught by its installer's own retired re-check. */
  def drainDerivedCaches(): Unit = {
    val pi = pathEdges.keySet().iterator()
    while (pi.hasNext) Option(pathEdges.remove(pi.next())).foreach { pe =>
      pe.edges.unpersist()
      // non-blocking release: in-flight queries holding the broadcast
      // still complete; the blocks just stop being cached
      pe.parentArrays.foreach(_.unpersist(false))
    }
    val si = statFrames.keySet().iterator()
    while (si.hasNext) Option(statFrames.remove(si.next())).foreach(_.unpersist())
    stats.clear()
    servingPlans.clear()
    servingValues.clear()
  }

  /** [[statFrames]].computeIfAbsent with the retire re-check: the frame
    * stays correct for the caller's in-flight query either way (it just
    * loses its cache status if the context retired underneath it). */
  def cachedStatFrame(key: String)(build: => DataFrame): DataFrame = {
    val df = statFrames.computeIfAbsent(key, _ => build)
    if (retired.get()) drainDerivedCaches()
    df
  }

  /** [[pathEdges]].computeIfAbsent with the same retire re-check. */
  def cachedPathEdges(key: String)(build: => PathEdges): PathEdges = {
    val pe = pathEdges.computeIfAbsent(key, _ => build)
    if (retired.get()) drainDerivedCaches()
    pe
  }

  /** Serving-tier PLAN cache — the prepared-statement analog for a
    * long-lived session issuing the same parameterized queries
    * repeatedly (the reference's worker tier goes further and caches
    * whole RESULTS in its cache db, workers.py; this caches only the
    * built DataFrame, so every call still EXECUTES the physical plan
    * against the live store). What it saves is the per-call Dataset
    * construction + eager analysis of a ~15-node tree — pure driver
    * work that DuckDB's ~ms parser never pays at this magnitude.
    * Keyed by the caller's canonical query text/name; entries die with
    * the context on mutation (same drain as the other derived caches),
    * so a cached plan can never read a retired store — it closes over
    * THIS context's pinned frames only.
    * get/putIfAbsent, NOT computeIfAbsent: a gate/facade entry caches
    * its WHOLE query under servingPlan while inner probe helpers cache
    * their fragments in the same map — nested computeIfAbsent on one
    * ConcurrentHashMap throws "Recursive update". A lost race builds a
    * plan twice; both are pure driver-side trees, so last-writer-loses
    * costs nothing (nothing persisted to unpersist). */
  def servingPlan(key: String)(build: => DataFrame): DataFrame = {
    var df = servingPlans.get(key)
    if (df == null) {
      val built = org.apache.spark.sql.GraftShims.ofOptimized(build)
      val prev = servingPlans.putIfAbsent(key, built)
      df = if (prev == null) built else prev
      boundServingCaches()
    }
    if (retired.get()) drainDerivedCaches()
    df
  }

  /** Cap on the pure-cache maps: a long-lived session serving many
    * DISTINCT ad-hoc shapes must not grow driver heap monotonically —
    * mutation drains are the only other eviction, and a read-only
    * session never mutates. Clearing on overflow loses warmth, never
    * correctness (nothing in either map is persisted or externally
    * referenced). The steady-state serving case (a bounded set of
    * parameterized shapes) never reaches the cap. */
  private def boundServingCaches(): Unit = {
    if (servingPlans.size() > EngineContext.maxServingEntries) servingPlans.clear()
    if (servingValues.size() > EngineContext.maxServingEntries) servingValues.clear()
  }

  /** [[servingValue]] hardened for HASH-DERIVED keys: the entry carries
    * the canonical probe plan it was built from and a key hit counts
    * only when `sameResult` confirms the plans match. The serving keys
    * are built from 32-bit `semanticHash` values — cheap, but a
    * birthday collision between two different probe shapes in one
    * long-lived context would otherwise silently serve one query's
    * probe rows to the other. On a verified mismatch the probe rebuilds
    * uncached (the first entry keeps the slot) — correctness never
    * depends on hash width. */
  def servingProbe[T <: AnyRef](key: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)(build: => T): T = {
    servingValues.get(key) match {
      case e: EngineContext.ProbeEntry if e.plan.sameResult(plan) =>
        if (retired.get()) drainDerivedCaches()
        return e.value.asInstanceOf[T]
      case _ => ()
    }
    val built = build
    servingValues.putIfAbsent(key, EngineContext.ProbeEntry(plan, built))
    boundServingCaches()
    if (retired.get()) drainDerivedCaches()
    built
  }

  /** [[servingProbe]] for compiled value-bound scan FRAGMENTS: verified
    * on both the base plan and the bound value array (the key folds the
    * values to a 32-bit `Arrays.hashCode` — same collision argument). */
  def servingFragment(key: String,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      values: Array[Long])(build: => DataFrame): DataFrame = {
    servingValues.get(key) match {
      case e: EngineContext.FragmentEntry
          if java.util.Arrays.equals(e.values, values) && e.plan.sameResult(plan) =>
        if (retired.get()) drainDerivedCaches()
        return e.df
      case _ => ()
    }
    val built = org.apache.spark.sql.GraftShims.ofOptimized(build)
    servingValues.putIfAbsent(key, EngineContext.FragmentEntry(plan, values, built))
    boundServingCaches()
    if (retired.get()) drainDerivedCaches()
    built
  }

  /** Serving-tier probe-RESULT cache, the same store-constant argument
    * as [[stats]]/[[statFrames]]/`dictBroadcast` applied to the engine's
    * BOUNDED probe collects (o-IN value sets, facet subject sets, page
    * rows — every entry is capped at `isinProbeCap`/page-size rows by
    * its builder, so the map stays KBs): between mutations the store is
    * immutable and a probe plan is a pure function of it, so its first
    * execution IS its value for the context's lifetime. Steady-state
    * serving then answers probe-backed queries in ONE job (the main
    * scan) instead of re-collecting an identical array per call — still
    * strictly less caching than the reference's worker tier, which
    * memoizes whole query RESULTS in its cache db (workers.py). Entries
    * die with the context on mutation, before any new store state is
    * visible. Same get/putIfAbsent re-entrancy contract as
    * [[servingPlan]] (a value build runs probe plans that cache
    * themselves); a lost race collects a bounded probe twice. */
  def servingValue[T <: AnyRef](key: String)(build: => T): T = {
    var v = servingValues.get(key)
    if (v == null) {
      val built = build
      val prev = servingValues.putIfAbsent(key, built)
      v = if (prev == null) built else prev
    }
    if (retired.get()) drainDerivedCaches()
    v.asInstanceOf[T]
  }
}

/** A persisted parent edge set for [[QueryEngine.paths]] plus the
  * property's shape: `singleParent` means no node has two parents, so a
  * frontier can never GROW across a walk — the driver-side walk may then
  * collect each round directly instead of materializing executor-side
  * first to guard against fanout^k blow-up.
  *
  * `parentArrays` is the walk's broadcast fast path, built once per
  * (context, property) when the graph is single-parent AND the edge
  * count fits [[EngineContext.maxBroadcastPathEdges]]: (sorted child
  * hashes, parallel parent hashes) — a primitive-array map (binary
  * search per lookup, no boxing) that lets one projection walk EVERY
  * level of a chain in a single job, with no per-level join or
  * broadcast-build job. A corpus-scale property leaves it None and
  * keeps the iterative join walk. */
final case class PathEdges(edges: DataFrame, singleParent: Boolean,
    parentArrays: Option[org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Long])]] = None)

object EngineContext {
  /** Overflow bound for [[EngineContext.servingPlans]]/`servingValues`
    * (see boundServingCaches). */
  private[algebra] val maxServingEntries = 1024

  /** A verified probe-cache entry: the canonical plan the value was
    * collected from rides along so a semanticHash key collision is
    * detected, not served. */
  private[algebra] final case class ProbeEntry(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, value: AnyRef)

  /** [[ProbeEntry]] for compiled value-bound fragments. */
  private[algebra] final case class FragmentEntry(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      values: Array[Long], df: DataFrame)

  /** Collect + broadcast the dictionary when it is bounded. One
    * limit-bounded collect decides AND delivers: reading maxEntries + 1
    * rows either proves the dictionary is too big (fall back to the
    * join decode path, driver memory capped at one extra row) or
    * already holds the whole map — the previous count()-then-collect()
    * scanned the full dictionary twice at every session start. */
  def withDictBroadcast(ctx: EngineContext, maxEntries: Long = 5000000L): EngineContext = {
    val max = math.min(maxEntries, Int.MaxValue - 1L).toInt
    val rows = ctx.graph.dict.limit(max + 1).collect()
    if (rows.length > max) ctx
    else {
      val m = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
      ctx.copy(dictBroadcast = Some(ctx.graph.spark.sparkContext.broadcast(m)))
    }
  }
}

/** Compiles one [[FilterQ]] into a subject-set DataFrame — the Spark
  * counterpart of the reference's `q_to_sql` (query.py:122-218). Every
  * filter produces `(s)` or, when `withScore` and the filter scores,
  * `(s, score)` — NEITHER is deduplicated — or None for unrecognized
  * shapes, which the caller silently drops, as the reference does
  * (query.py:659-669).
  *
  * Branch outputs carry duplicate subjects on purpose:
  * [[QueryEngine.combineSets]] applies ONE final dedup whose partial
  * (map-side) aggregation removes duplicates before the shuffle, so a
  * single global distinct is strictly cheaper than a distinct per branch
  * — and set-operator joins (`intersect`/`except`) plus semi-join
  * consumers ([[QueryEngine.facet]]) need no dedup at all. Scored
  * outputs are NOT deduplicated either (the fts branch emits one row
  * per posting hit; only the semantic branch happens to be internally
  * distinct): consumers MUST fold multiplicity themselves — the engine's
  * score path does `max(score) GROUP BY s` before any ordering/paging.
  */
object FilterCompiler {

  /** `"fts 2 <iri>"` → (2, Some("<iri>"), "fts") — query.py:90-107. */
  def parseHopsAndProp(pStr: String): (Int, Option[String], String) = {
    val toks = Option(pStr).getOrElse("").split("\\s+").filter(_.nonEmpty)
    var hops = 0
    var prop: Option[String] = None
    if (toks.length >= 2) {
      if (toks(1).forall(_.isDigit) && toks(1).nonEmpty) {
        // toIntOption, not toInt: an all-digit token past Int range must
        // flag the filter MALFORMED (hops = -1 → no compile branch
        // matches → silently dropped), not abort the query with a
        // NumberFormatException and not degrade to a 0-hop filter the
        // user never wrote. (The reference's unbounded int(toks[1])
        // would try to build a hops-join SQL string of that length —
        // there is no sane behavior to be faithful to.)
        hops = toks(1).toIntOption.getOrElse(-1)
        if (toks.length >= 3 && toks(2).startsWith("<") && toks(2).endsWith(">"))
          prop = Some(toks(2))
      } else if (toks(1).startsWith("<") && toks(1).endsWith(">"))
        prop = Some(toks(1))
    }
    (hops, prop, if (toks.nonEmpty) toks(0) else "")
  }

  def h(term: String): Long = Hash64.hashString(term)

  /** The reference's `oo` fragment (query.py:134-144): a space-separated
    * multi-IRI object list becomes an IN over the per-IRI hashes, any
    * other o an equality on the whole-string hash (N3 surface equality,
    * lang/datatype included). The SAME fragment applies to the column
    * the branch matches on — `o` for property/reverse filters, `s` for
    * the id branch (query.py:33-44 interpolates `s{oo}`) — so it is ONE
    * definition here, shared by [[compile]] and [[simplePredicate]]. */
  private[graft] def oMatch(target: org.apache.spark.sql.Column, o: String): org.apache.spark.sql.Column =
    if (o.startsWith("<") && o.endsWith(">") && o.split(" ").length > 1)
      target.isin(o.split(" ").map(h).toIndexedSeq: _*)
    else target === h(o)

  /** Longest leading run of regex-literal characters in a pattern — the
    * chars every match must start with. Stops at the first metacharacter
    * (conservatively including one char BEFORE `*?{`-style quantifiers,
    * which make their predecessor optional). A top-level alternation
    * anywhere voids the prefix entirely (`abc|def` matches need not
    * start with `abc`). */
  private[graft] def staticRegexPrefix(pattern: String): String = {
    // top-level '|' check: depth-0 outside character classes
    var depth = 0
    var inClass = false
    var j = 0
    while (j < pattern.length) {
      val c = pattern.charAt(j)
      if (c == '\\') j += 1
      else if (inClass) { if (c == ']') inClass = false }
      else c match {
        case '[' => inClass = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '|' if depth == 0 => return ""
        case _ => ()
      }
      j += 1
    }
    val meta = ".^$|()[]{}\\*+?"
    val out = new StringBuilder
    var i = 0
    var done = false
    while (!done && i < pattern.length) {
      val c = pattern.charAt(i)
      if (meta.indexOf(c.toInt) >= 0) done = true
      else {
        // a following quantifier makes this char optional — exclude it
        if (i + 1 < pattern.length && "*?{".indexOf(pattern.charAt(i + 1).toInt) >= 0)
          done = true
        else out += c
        i += 1
      }
    }
    out.toString
  }

  /** n-hop ancestor walk: subjects that REFERENCE the current subject set,
    * repeated `hops` times (join_parents_sql, query.py:110-119). Each hop
    * is one hash equi-join on the o column; `extra` columns (score) ride
    * along from the inner set. */
  private def hopUp(ctx: EngineContext, t0: DataFrame, hops: Int, extra: Seq[String]): DataFrame = {
    var acc = t0
    for (i <- 1 to hops) {
      val t = ctx.graph.triples.as(s"T$i")
      // size-conditional probe: a small frontier (no score ride-along)
      // becomes an o-IN scan predicate, pruned by the (p,o,s)-sorted
      // batch stats; otherwise the frontier is the broadcast side so the
      // full triples relation never shuffles per hop
      acc =
        if (extra.isEmpty && ctx.isinProbeCap > 0)
          oInOrJoin(ctx, ctx.graph.triples, acc.select("s").distinct())
        else
          t.join(broadcast(acc.as(s"A$i")), col(s"T$i.o") === col(s"A$i.s"))
            .select(col(s"T$i.s").as("s") +: extra.map(c => col(s"A$i.$c")): _*)
    }
    acc
  }

  /** Size-conditional o-IN probe shared by the regex/fts/hop paths. A
    * bounded collect sizes the match set AND, in the selective (≤ cap)
    * case, IS its materialization: the probe values feed a scan-level
    * o-IN predicate directly (batch min/max pruning on the
    * (p,o,s)-sorted layout) — one job, one upstream execution, nothing
    * checkpointed. Past the cap the fallback broadcast-joins a
    * localCheckpoint of the set (the upstream match plan runs twice on
    * that path: the limit-pushed sizing probe stopped early, and a
    * corpus-scale frontier is the already-degraded serving shape).
    * cap <= 0 disables probing entirely and keeps the set lazy on the
    * join's broadcast side. Probe PLANS and value-bound scan fragments
    * are cached via [[EngineContext.servingPlan]]; the probe collect
    * itself runs on every call. */
  private def oInOrJoin(ctx: EngineContext, base: DataFrame, hashSet: DataFrame): DataFrame = {
    val cap = ctx.isinProbeCap
    val hs = hashSet.toDF("__oh")
    if (cap <= 0)
      return base.join(broadcast(hs), col("o") === col("__oh")).select("s")
    // Prepared-probe serving: the probe PLAN is cached by its semantic
    // hash (pure compile) and so is its bounded RESULT (servingValue —
    // ≤ cap+1 longs, a store-constant value between mutations), so a
    // steady-state session pays the probe job once per context and the
    // query runs as ONE job after. The collect both SIZES the set and,
    // in the selective (≤ cap) case, IS the materialization: the value
    // array feeds a scan-level o-IN predicate whose compiled fragment is
    // cached keyed by the VALUES (parameter binding — same probe result
    // ⇒ same plan, no per-call Dataset construction). All three caches
    // die with the context on mutation.
    val hsPlan = hs.queryExecution.analyzed
    val probe = ctx.servingProbe("oin:p:" + hsPlan.semanticHash() + ":r", hsPlan) {
      hs.limit(cap + 1).collect().map(_.getLong(0))
    }
    if (probe.length <= cap) {
      if (probe.isEmpty) // In(o, Nil) folds to an empty relation — no
        return base.filter(col("o").isin()).select("s") // point caching
      val basePlan = base.queryExecution.analyzed
      val vh = java.util.Arrays.hashCode(probe)
      ctx.servingFragment(
        s"oin:m:${basePlan.semanticHash()}:${probe.length}:$vh", basePlan, probe)(
        base.filter(col("o").isin(probe.toIndexedSeq: _*)).select("s"))
    } else {
      // over-cap fallback: uncached, and the upstream match plan runs a
      // second time for the checkpoint (the probe's limit stopped early;
      // a corpus-scale frontier is the already-degraded serving path)
      val pinned = hs.persist()
      try
        base.join(broadcast(pinned.localCheckpoint()), col("o") === col("__oh")).select("s")
      finally { pinned.unpersist(); () }
    }
  }

  /** [[oInOrJoin]] with a score ride-along, for the scoring (fts)
    * filter. The selective (≤ cap) case rebuilds the collected
    * (mhash, score) rows as a LocalRelation: the match-aggregate plan
    * (window + explode + groupBy over the inverted lists) executes
    * exactly ONCE — the collect — and every later execution of the
    * consumer (notably the range-partitioning sample a global sort runs
    * over its child) replays a 37-row literal, not the whole chain.
    * Past the cap, same localCheckpoint contract as [[oInOrJoin]]. */
  private def scoredOInOrJoin(ctx: EngineContext, base: DataFrame,
      scored: DataFrame): DataFrame = {
    val cap = ctx.isinProbeCap
    def joined(rhs: DataFrame): DataFrame =
      base.join(broadcast(rhs), col("o") === col("mhash"))
        .select(col("s"), col("score"))
    if (cap <= 0) return joined(scored)
    // same prepared-probe contract as [[oInOrJoin]]: cached probe plan,
    // cached bounded probe result, value-keyed cached scan fragment
    val scoredPlan = scored.queryExecution.analyzed
    val probe = ctx.servingProbe(
        "soin:p:" + scoredPlan.semanticHash() + ":r", scoredPlan) {
      scored.limit(cap + 1).collect()
    }
    if (probe.length <= cap) {
      val spark = base.sparkSession
      if (probe.isEmpty)
        return base.filter(col("o").isin()).select(col("s"), lit(null).cast("double").as("score"))
      // a trailing null-flag long per row: folding a null score to 0.0
      // BITS alone would key a null-scored probe and a 0.0-scored probe
      // identically
      val flat = probe.flatMap(r => Array(r.getLong(0),
        if (r.isNullAt(1)) 0L else java.lang.Double.doubleToLongBits(r.getDouble(1)),
        if (r.isNullAt(1)) 1L else 0L))
      val basePlan = base.queryExecution.analyzed
      val vh = java.util.Arrays.hashCode(flat)
      ctx.servingFragment(
        s"soin:m:${basePlan.semanticHash()}:${probe.length}:$vh", basePlan, flat) {
        val local = spark.createDataFrame(
          java.util.Arrays.asList(probe: _*),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("mhash",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("score",
              org.apache.spark.sql.types.DoubleType, nullable = true))))
        // isin first: the o-IN predicate reaches the (p,o,s)-sorted
        // scan's batch stats; the broadcast local join only attaches
        // the score to the pruned rows
        base.filter(col("o").isin(probe.map(_.getLong(0)).toIndexedSeq: _*))
          .join(broadcast(local), col("o") === col("mhash"))
          .select(col("s"), col("score"))
      }
    } else {
      val pinned = scored.persist()
      try joined(pinned.localCheckpoint())
      finally { pinned.unpersist(); () }
    }
  }

  /** The triples-scan predicate of a SIMPLE filter — p/o/g/id equality
    * or IN, no hops and no derived index — or None when the filter
    * needs its own plan (fts/regex/semantic/sample/hops). A forest
    * whose every filter is simple can then be evaluated in ONE
    * scan+aggregate ([[QueryEngine.fusedSubjects]]) instead of one
    * distinct per branch plus set-operator joins. Must stay in exact
    * agreement with the corresponding [[compile]] branches. */
  def simplePredicate(ctx: EngineContext, f: FilterQ): Option[org.apache.spark.sql.Column] = {
    val p = f.p.trim
    val o = f.o.trim
    val g = f.g.trim
    val (hops, _, pHead) = parseHopsAndProp(p)
    val gCond: Option[org.apache.spark.sql.Column] =
      if (g.isEmpty) None
      else Some(col("g").isin(g.split(" ").map(h).toIndexedSeq: _*))
    val base: Option[org.apache.spark.sql.Column] =
      if (p.isEmpty && (o.startsWith("<") || o.startsWith("_:")))
        Some(oMatch(col("o"), o)) // reverse reference
      else if (p == "id" && !(o.startsWith("random") || o.startsWith("sample")))
        Some(oMatch(col("s"), o)) // point lookup (or multi-point IN)
      else if (p.startsWith("<") && hops == 0) {
        val pc = col("p") === h(pHead)
        Some(if (o.nonEmpty) pc && oMatch(col("o"), o) else pc)
      } else None
    base.map(b => gCond.fold(b)(gc => b && gc))
  }

  def compile(ctx: EngineContext, f: FilterQ, withScore: Boolean = false): Option[DataFrame] = {
    val triples = ctx.graph.triples
    val p = f.p.trim
    val o = f.o.trim
    val g = f.g.trim
    val (hops, pProp, pHead) = parseHopsAndProp(p)
    // malformed hop count (parseHopsAndProp sentinel): drop the filter
    if (hops < 0) return None

    // named-graph restriction on the T0 scan (query.py:145-148)
    def withG(df: DataFrame): DataFrame =
      if (g.isEmpty) df
      else df.filter(col("g").isin(g.split(" ").map(h).toIndexedSeq: _*))

    // o equality: the shared [[oMatch]] fragment (query.py:134-144)
    def oCond = oMatch(col("o"), o)

    def propFilter(df: DataFrame): DataFrame =
      pProp.fold(df)(pp => df.filter(col("p") === h(pp)))

    if (p.isEmpty && (o.startsWith("<") || o.startsWith("_:"))) {
      // reverse reference: subjects of triples whose object is o
      Some(withG(triples).filter(oCond).select("s"))
    } else if (p == "id") {
      if (o.startsWith("random") || o.startsWith("sample")) {
        val parts = o.split(" ")
        val n = if (parts.length > 1)
          try parts(1).toInt catch { case _: NumberFormatException => 1 }
        else 1
        // `USING SAMPLE n` samples n TRIPLE rows then takes distinct s —
        // up to n subjects (the dedup happens in combineSets). rand(seed)
        // + limit gives the same contract, deterministically under a
        // fixed seed.
        Some(withG(triples)
          .orderBy(rand(ctx.sampleSeed)).limit(n)
          .select("s"))
      } else {
        // s{oo} in the reference: a multi-IRI o is a multi-point IN
        Some(withG(triples).filter(oMatch(col("s"), o)).select("s"))
      }
    } else if (p.startsWith("semantic")) {
      ctx.semantic.map { sem =>
        val qvec = ctx.embedder.embedOne(o)
        // ANN prefilter when the cell index exists: probe only cells whose
        // spherical cap can intersect the query cap, then rescore exactly
        // — provably the same rows as the full scan (SemanticAnn scaladoc)
        val source = ctx.semanticAnn.fold(sem)(_.candidates(qvec, maxDist = 0.5))
        // codegen'd Catalyst expression — no per-row boxing (Hash64-style
        // wrapper over graft.functions.CosineDistance)
        val dist = graft.functions.CosineDistance(col("vec"), lit(qvec))
        val scored = source.withColumn("distance", dist)
          .filter(col("distance") < 0.5)
          .withColumn("score", lit(1.0) / col("distance"))
        if (g.isEmpty) {
          // `hash` IS the subject hash (SURVEY §1.1), one row per subject,
          // and the index only ever holds subjects present in triples
          // (mutations invalidate it) — the reference's `join triples`
          // here only multiplies rows its DISTINCT then removes. Skipping
          // it saves a full triples scan per query.
          val cols = if (withScore) Seq(col("hash").as("s"), col("score"))
                     else Seq(col("hash").as("s"))
          scored.select(cols: _*).distinct()
        } else {
          // graph restriction needs the triples rows: join on T0.s = LS.hash;
          // the thresholded score set is small — broadcast it
          val joined = withG(triples.as("T0"))
            .join(broadcast(scored.as("LS")), col("T0.s") === col("LS.hash"))
          val cols = if (withScore) Seq(col("T0.s").as("s"), col("LS.score").as("score"))
                     else Seq(col("T0.s").as("s"))
          joined.select(cols: _*).distinct()
        }
      }
    } else if (p.startsWith("regex")) {
      // DuckDB `SIMILAR TO` is full-string anchored; rlike is not →
      // anchor explicitly (SURVEY §2.2). A static prefix of the pattern
      // becomes a startsWith pre-filter: it reaches the columnar scan
      // (min/max pruning) and short-circuits before the regex engine —
      // the same prune DuckDB applies to SIMILAR TO.
      val prefix = FilterCompiler.staticRegexPrefix(o)
      val preFiltered =
        if (prefix.nonEmpty) ctx.graph.literals.filter(col("value").startsWith(prefix))
        else ctx.graph.literals
      val lits = preFiltered
        .filter(col("value").rlike("^(?:" + o + ")$"))
        .select(col("hash").as("lhash"))
      // size-conditional probe (same policy as decode): a selective
      // pattern yields few literal hashes → an o-IN predicate reaches
      // the (p,o,s)-sorted scan's batch stats and skips most of the
      // corpus; past the cap, broadcast-join the SAME materialized set
      val t0 = oInOrJoin(ctx, propFilter(withG(triples)), lits)
      Some(hopUp(ctx, t0, hops, Nil))
    } else if (p.startsWith("fts")) {
      ctx.fts.map { idx =>
        val scored = idx.matchBm25(o).withColumnRenamed("hash", "mhash")
        if (withScore) {
          // size-conditional probe, like the set-only path below but
          // with the score riding along: the match aggregate runs once.
          // No terminal distinct — every consumer dedups ((s,score)
          // multiplicity folds into subjectsFromCompiled's terminal
          // distinct, combineSets' set-ops, or the score chain's
          // groupBy-max), so the exchange would be pure overhead. The
          // hop path keeps one distinct BEFORE the walk: it bounds the
          // frontier hopUp broadcasts at each level.
          val t0 = scoredOInOrJoin(ctx, propFilter(withG(triples)), scored)
          if (hops == 0) t0.select("s", "score")
          else hopUp(ctx, t0.select("s", "score").distinct(), hops,
            Seq("score")).select("s", "score")
        } else {
          // set-only contract: no score ride-along → a small match set
          // becomes an o-IN scan predicate, and hop frontiers stay
          // isin-eligible; the match set materializes exactly once
          val t0 = oInOrJoin(ctx, propFilter(withG(triples)),
            scored.select("mhash"))
          hopUp(ctx, t0, hops, Nil)
        }
      }
    } else if (p.startsWith("<")) {
      val t0 = withG(triples).filter(col("p") === h(pHead))
      val filtered = if (o.nonEmpty) t0.filter(oCond) else t0
      Some(hopUp(ctx, filtered.select("s"), hops, Nil))
    } else None
  }
}

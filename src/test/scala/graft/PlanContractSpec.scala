package graft

import graft.algebra.{FilterQ, QueryEngine, QueryOpts}
import org.apache.spark.sql.functions._

/** Pins the physical-plan decisions the perf work depends on — if a
  * refactor silently turns a broadcast into a two-sided shuffle or
  * un-prunes a scan, these fail before a benchmark ever notices. */
class PlanContractSpec extends SparkSpec {

  private lazy val ctx = Fixture.ctx(spark)

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("semantic delta compose: the corpus-sized base never shuffles") {
    // base ∪ delta resolution must exclude superseded base rows via a
    // BROADCAST anti-join on the (delta-sized) hash set — a shuffled
    // anti-join would move the whole embedding corpus per context init
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-sem").toString
    import spark.implicits._
    Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("hash", "vec")
      .write.parquet(s"$dir/literals_semantic")
    Seq((2L, Some(Array(1f, 1f)), 5L), (3L, None: Option[Array[Float]], 5L))
      .toDF("hash", "vec", "seq")
      .write.parquet(s"$dir/literals_semantic_delta")
    val (sem, gen) =
      graft.semantic.SemanticMaintenance.composeWithGen(spark, dir).get
    assert(gen === 5L)
    val p = plan(sem)
    assert(p.contains("BroadcastExchange"), s"compose must broadcast the delta side:\n$p")
    assert(!p.contains("SortMergeJoin"), s"compose shuffled the base:\n$p")
    // and the resolution itself is correct: 1 kept, 2 replaced, 3 removed
    val rows = sem.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(2L) === Seq(1f, 1f))
  }

  test("facet probe: a selective subject set becomes an s-IN scan predicate") {
    val sres = QueryEngine.subjects(ctx,
      QueryOpts(filters = Seq(FilterQ(p = Fixture.a, o = Fixture.human)))).get
    // bounded store + tiny set → the probed isin path: no semi-join, no
    // BroadcastExchange BUILD JOB for the subject side (the only join
    // left is the envelope decode, which may itself broadcast the dict)
    val an = QueryEngine.facet(ctx, "graphs", sres, sCount = Some(2L))
      .queryExecution.optimizedPlan.toString
    assert(an.contains("s#") && an.toLowerCase.contains(" in ("),
      s"facet subject set not an s-IN predicate:\n$an")
    assert(!an.toLowerCase.contains("join leftsemi"),
      s"probed facet still semi-joins the subject set:\n$an")
  }

  test("facet joins broadcast the known-small filtered subject set") {
    // probing disabled → the semi-join fallback, which must carry the
    // broadcast hint for a known-small set (the scale serving path)
    val nctx = ctx.copy(isinProbeCap = 0)
    val sres = QueryEngine.subjects(nctx,
      QueryOpts(filters = Seq(FilterQ(p = Fixture.a, o = Fixture.human)))).get
    val p = plan(QueryEngine.facet(nctx, "graphs", sres, sCount = Some(2L)))
    assert(p.contains("BroadcastExchange"), s"no broadcast in facet plan:\n$p")
    // the triples side must not shuffle for the semi-join
    assert(!p.contains("SortMergeJoin"), s"facet fell back to SMJ:\n$p")
  }

  test("facet past the broadcast cap drops the broadcast hint") {
    val nctx = ctx.copy(isinProbeCap = 0) // exercise the join fallback
    val sres = QueryEngine.subjects(nctx,
      QueryOpts(filters = Seq(FilterQ(p = Fixture.a, o = Fixture.human)))).get
    // on a SMALL store any subject subset is broadcast-safe a priori
    // (the set derives from the bounded triples relation), so the hint
    // appears even with no caller count — the sizing job is gone
    val hinted = QueryEngine.facet(nctx, "graphs", sres, sCount = None)
      .queryExecution.analyzed.toString
    assert(hinted.toLowerCase.contains("hint"), s"small-store set not hinted:\n$hinted")
    // on a CORPUS-SCALE store (simulated: a range relation whose plan
    // stats dwarf the broadcast budget) a claimed-huge count must not
    // FORCE the broadcast — the low-selectivity-filter case that would
    // blow the driver limit. AQE may still pick broadcast at runtime
    // for small actual data; the contract is on the analyzed-plan hint.
    val spark0 = ctx.graph.spark
    val bigTriples = spark0.range(2000000000L)
      .selectExpr("id AS s", "id AS p", "id AS o", "pmod(id, 4) AS g")
    val bigCtx = ctx.copy(graph = ctx.graph.copy(triples = bigTriples))
    val unhinted = QueryEngine.facet(bigCtx, "graphs",
        bigTriples.select("s").limit(10), sCount = Some(Long.MaxValue))
      .queryExecution.analyzed.toString
    assert(!unhinted.toLowerCase.contains("hint"),
      s"oversized facet subject set still force-broadcast:\n$unhinted")
  }

  test("hydration resolves a capped page to an s-IN + literal pos map") {
    val opts = QueryOpts(filters = Seq(FilterQ(p = Fixture.a, o = Fixture.human)))
    val wanted = QueryEngine.wantedPage(ctx, opts,
      QueryEngine.subjects(ctx, opts).get, None)
    val p = plan(QueryEngine.hydrate(ctx, opts, wanted))
    // the page side is gone from the plan: no join, no broadcast-build
    // job — an s-IN scan predicate plus an element_at(literal map) pos
    assert(!p.contains("BroadcastExchange"),
      s"capped page still broadcast-joined:\n$p")
    assert(p.contains("element_at"), s"pos not a literal-map lookup:\n$p")
    assert(p.contains(" IN ("), s"page subjects not an s-IN predicate:\n$p")
  }

  test("hydration broadcasts the page side when probing is off") {
    val nctx = ctx.copy(isinProbeCap = 0)
    val opts = QueryOpts(filters = Seq(FilterQ(p = Fixture.a, o = Fixture.human)))
    val wanted = QueryEngine.wantedPage(nctx, opts,
      QueryEngine.subjects(nctx, opts).get, None)
    val p = plan(QueryEngine.hydrate(nctx, opts, wanted))
    assert(p.contains("BroadcastExchange"), s"no broadcast in hydrate plan:\n$p")
  }

  test("relational scans prune columns and push filters") {
    val df = SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
    val p = plan(df)
    // only the 6 needed lineitem columns reach the scan, not all 11
    assert(p.contains("ReadSchema"), p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_tax") && !readSchema.contains("l_orderkey"),
      s"scan reads unneeded columns: $readSchema")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [") && p.contains("l_shipdate"),
      s"shipdate filter not pushed:\n$p")
  }

  test("s-bound spo lookups push the subject filter into the s-sorted copy") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-plan").toString + "/wh"
    graft.ingest.Build.write(
      graft.ingest.Build.graphFromQuads(spark, Fixture.quads.toDF()), dir)
    val g = graft.ingest.Build.load(spark, dir)
    assert(g.byS.nonEmpty, "warehouse must carry the triples_by_s copy")
    val dctx = graft.algebra.EngineContext(g)
    val p = plan(QueryEngine.spo(dctx, s = Some("<http://ex/luke>")))
    assert(p.contains("triples_by_s"), s"spo not reading the s-sorted copy:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(s), EqualTo(s,"),
      s"subject filter not pushed:\n$p")
  }

  test("regex: selective matches become an o-IN predicate on the triples probe") {
    val compiled = graft.algebra.FilterCompiler.compile(ctx,
      FilterQ(p = "regex", o = "\"Luke .*\"")).get
    val p = plan(compiled)
    // few matched literal hashes → the probe is a scan-level IN filter
    // (batch min/max pruning on the (p,o,s)-sorted layout), not a join
    assert("""o#\d+L? (IN|=)""".r.findFirstIn(p).isDefined || p.contains("INSET"),
      s"o-IN predicate not on the triples probe:\n$p")
    assert(!p.contains("Join"), s"selective regex should be join-free:\n$p")
  }

  test("regex fallback path: static prefix reaches the literals scan as StartsWith") {
    // cap 0 forces the broadcast-join fallback (the >cap shape), where
    // the literal side stays lazy — pin its scan-level prune there
    val compiled = graft.algebra.FilterCompiler.compile(ctx.copy(isinProbeCap = 0),
      FilterQ(p = "regex", o = "\"Luke .*\"")).get
    val p = plan(compiled)
    // the anchored pattern's static prefix must land as a scan-level
    // StartsWith BEFORE the regex engine runs — batch min/max pruning
    // plus short-circuit, the same prune DuckDB applies to SIMILAR TO.
    // The matched surface form is the quoted N3 literal, so the prefix
    // includes the opening quote: StartsWith(value#NN, "Luke …
    assert("""StartsWith\(value#\d+, "Luke """.r.findFirstIn(p).isDefined,
      s"prefix prune not in scan filters:\n$p")
    assert(p.contains("RLIKE"), s"regex filter missing:\n$p")
    assert(p.contains("BroadcastExchange"), s"fallback should broadcast the literal side:\n$p")
  }

  test("cross-corpus subtraction broadcasts the reference fingerprints") {
    import spark.implicits._
    val corpus = (1L to 100L).map(i => (i, s"doc body number $i")).toDF("id", "text")
    val ref = Seq((1L, "doc body number 7")).toDF("id", "text")
    val p = plan(graft.ops.Dedup.subtractByContent(corpus, ref, "text", "text"))
    assert(p.contains("BroadcastExchange"),
      s"reference side not broadcast in subtractByContent:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"subtractByContent fell back to a two-sided shuffle:\n$p")
  }

  test("row-local pipeline ops stay shuffle-free") {
    import spark.implicits._
    val docsDf = (1L to 50L).map(i => (i, s"some text $i here")).toDF("doc_id", "text")
    val vecs = (1L to 20L).map(i => (i, Array(0.1f * i, -0.2f))).toDF("vec_id", "embedding")
    for ((name, df) <- Seq(
        "piiStats" -> graft.ops.Redaction.piiStats(docsDf, "doc_id", "text"),
        "chunkSpans" -> graft.ops.TextAnalysis.chunkSpans(docsDf, "doc_id", "text"),
        "int8" -> graft.ops.Quantize.int8(vecs, "vec_id", "embedding"))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), s"$name plan shuffles:\n$p")
    }
  }

  test("budget selection: one shard-window exchange, no join") {
    import spark.implicits._
    val scored = (1L to 100L).map(i => (i, i % 7 + 1, i * 0.01))
      .toDF("id", "toks", "score")
    val p = plan(graft.ops.Selection.selectByBudget(
      scored, "id", "score", "toks", budget = 200L, shards = 4))
    assert(!p.contains("Join"), s"selection plan joins:\n$p")
    assert("Exchange".r.findAllIn(p).size === 1,
      s"selection should shuffle once (the shard window):\n$p")
  }

  test("dup-span stats: doc-frequency is a map-combined groupBy joined " +
      "back — never a gram-partitioned window, never pairwise") {
    import spark.implicits._
    val docsDf = (1L to 30L).map(i =>
      (i, (1 to 12).map(j => s"w${(i + j) % 9}").mkString(" "))).toDF("id", "text")
    val p = plan(graft.ops.Decontam.dupSpanStats(docsDf, "id", "text", n = 8))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      s"dupSpanStats must never go pairwise:\n$p")
    // the de-skew shape: no window over the gram key (a billion-row
    // boilerplate gram cannot be split by AQE inside one window
    // partition) and no countDistinct — the df aggregate must be a
    // partial-aggregating groupBy
    assert(!p.contains("Window"),
      s"gram doc-frequency must not be a gram-partitioned window:\n$p")
    assert(!p.toLowerCase.contains("count(distinct"),
      s"gram df must not plan a countDistinct:\n$p")
  }

  test("span removal: gram df is a two-stage distinct, dup join-back " +
      "stays an equi-join, no cartesian anywhere") {
    import spark.implicits._
    val docsDf = (1L to 30L).map(i =>
      (i, (1 to 12).map(j => s"w${(i + j) % 9}").mkString(" "))).toDF("id", "text")
    val p = plan(graft.ops.Decontam.stripDupSpans(docsDf, "id", "text", n = 8))
    assert(!p.contains("Cartesian") && !p.contains("NestedLoop"),
      s"stripDupSpans must never go pairwise:\n$p")
    // the universal-gram de-skew shape: the distinct's exchange is
    // keyed (gram, id), never a countDistinct on the gram partition
    assert("hashpartitioning\\(gram#\\d+, id#\\d+".r.findFirstIn(p).isDefined,
      s"gram df distinct must shuffle on (gram, id):\n$p")
    assert(!p.toLowerCase.contains("count(distinct"),
      s"gram df must not plan a countDistinct:\n$p")
  }

  test("DSIR: feature extraction row-local, lambda table broadcasts, " +
      "acceptance never shuffles the corpus a second time") {
    import spark.implicits._
    val docsDf = (1L to 40L).map(i =>
      (i, (1 to 6).map(j => s"t${(i * j) % 7}").mkString(" "))).toDF("id", "text")
    val p = plan(graft.ops.Dsir.resample(docsDf,
      docsDf.filter(col("id") % 3 === 0), "id", "text", tauE4 = 0L,
      buckets = 64))
    // the per-doc weight join consumes the bounded lambda table as a
    // broadcast — a shuffled join here would exchange the corpus side
    assert(p.contains("BroadcastHashJoin"),
      s"DSIR lambda join must broadcast:\n$p")
    // the (Σw, n) normalizer attaches as a broadcast 1-row loop join —
    // the only acceptable nested loop; an unbroadcast cartesian is not
    assert(!p.contains("CartesianProduct"),
      s"DSIR must not plan a cartesian:\n$p")
  }

  test("quality LR scoring: weight table broadcasts, one per-doc " +
      "aggregate, no iteration over the corpus") {
    import spark.implicits._
    val docsDf = (1L to 40L).map(i =>
      (i, (1 to 6).map(j => s"t${(i * j) % 7}").mkString(" "),
        (i % 2).toInt)).toDF("id", "text", "label")
    val m = graft.ops.QualityClassifier.train(docsDf, "id", "text", "label",
      buckets = 64, iters = 5)
    val p = plan(graft.ops.QualityClassifier.score(docsDf, m, "id", "text"))
    assert(p.contains("BroadcastHashJoin"),
      s"LR weight join must broadcast:\n$p")
    // per-doc weighted sum is map-side combined before its exchange
    assert(p.contains("partial_sum"),
      s"LR per-doc sum must be partial-aggregated:\n$p")
    assert(!p.contains("Cartesian"), s"LR score must not plan a cartesian:\n$p")
  }

  test("boilerplate line-df is a two-stage distinct, no single-reducer " +
      "countDistinct on the line key") {
    import spark.implicits._
    val docsDf = (1L to 30L).map(i => (i, s"line a\nline b$i\nfoot"))
      .toDF("id", "text")
    val p = plan(graft.ops.TextAnalysis.stripBoilerplateLines(
      docsDf, "id", "text", minDocs = 3, totalDocs = Some(30L)))
    // a universal boilerplate line must spread by id before any count:
    // the distinct's exchange is keyed (line, id), and no aggregate
    // carries a distinct-state function on the line partition
    assert("hashpartitioning\\(line#\\d+, id#\\d+".r.findFirstIn(p).isDefined,
      s"line-df distinct must shuffle on (line, id):\n$p")
    assert(!p.toLowerCase.contains("count(distinct"),
      s"line-df must not plan a countDistinct:\n$p")
  }

  test("centroid aggregate is partial (map-side combine) over exact integer units") {
    import spark.implicits._
    val vecs = (1L to 20L).map(i => (i, Array(0.1f * i, -0.2f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val p = plan(graft.ops.Quantize.centroids(vecs, "label", "embedding"))
    assert(p.contains("partial_sum"), s"centroids not map-side combined:\n$p")
    // exactly one shuffle: the (label, dim) aggregate exchange
    assert("Exchange".r.findAllIn(p).size === 1, s"centroids plan over-shuffles:\n$p")
  }

  test("fts match prunes the inverted lists with an IN filter, no join") {
    val idx = ctx.fts.get
    val p = plan(idx.matchBm25("skywalker"))
    assert(p.toLowerCase.contains("skywalk"), // stemmed IN literal visible in scan filter
      s"posting-list scan not term-pruned:\n$p")
    // df comes from a window over the pruned lists — the match plan must
    // not join (or broadcast) a corpus-scale side at query time
    assert(!p.contains("Join"), s"fts match should be join-free:\n$p")
  }

  test("scored fts filter under the probe cap replays a literal, not the match plan") {
    val df = graft.algebra.FilterCompiler.compile(
      ctx, FilterQ(p = "fts", o = "skywalker"), withScore = true).get
    val p = plan(df)
    // the match aggregate ran exactly once, at compile (the probe
    // collect); the consumer's plan must carry its result as a local
    // literal — a global sort downstream re-executes its child for
    // range sampling, and replaying the whole inverted-list aggregate
    // there was the q_rdf_fts_score regression
    assert(!p.contains("Window"), s"score plan re-runs the match chain:\n$p")
    assert(p.contains("LocalTableScan"),
      s"scored match set should be a LocalRelation:\n$p")
    // and the triples probe is an o-IN scan predicate (a 1-hash match
    // folds to equality), not a shuffled join probe
    assert("""o#\d+L (IN|=)""".r.findFirstIn(p).isDefined,
      s"triples scan not o-pruned:\n$p")
    assert(!p.contains("SortMergeJoin"), s"scored path shuffled:\n$p")
  }

  test("small-corpus BM25 match is single-task: no exchange below the window") {
    val idx = ctx.fts.get
    assert(idx.numDocs <= graft.fts.FtsIndex.singleTaskMatchDocs)
    val p = plan(idx.matchBm25("skywalker"))
    assert(p.contains("Coalesce 1"), s"pruned lists not collapsed:\n$p")
    // the query-side plan (everything above the cached lists relation)
    // must be exchange-free; the relation's own BUILD plan below the
    // InMemoryTableScan legitimately shuffles once
    val cut = p.indexOf("InMemoryRelation")
    val queryside = if (cut < 0) p else p.substring(0, cut)
    assert(!queryside.contains("Exchange"),
      s"single-task match still exchanges:\n$p")
  }

  test("a delta-appended stored index keeps the join-free term-pruned match plan") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-plan-fts").toString
    val base = Seq((1L, "alpha skywalker"), (2L, "beta thing")).toDF("hash", "value")
    graft.fts.FtsIndex.write(graft.fts.FtsIndex.build(base), wh)
    assert(graft.fts.FtsIndex.appendDelta(spark, wh,
      Seq((3L, "gamma skywalker appended")).toDF("hash", "value")))
    val idx = graft.fts.FtsIndex.load(spark, wh).get
    val p = plan(idx.matchBm25("skywalker"))
    assert(p.toLowerCase.contains("skywalk"), s"delta index scan not term-pruned:\n$p")
    assert(!p.contains("Join"), s"delta-appended match should stay join-free:\n$p")
    // and both the base and the appended doc match
    assert(idx.matchBm25("skywalker").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("decode is fenced: isnotnull(decode) never sinks below the aggregate") {
    // the exact shape the Fence contract exists for: decode + null
    // filter ABOVE an aggregate. Unfenced, Catalyst pushes
    // isnotnull(decode(s)) below the groupBy — the broadcast-map lookup
    // then runs once per CORPUS row instead of once per result row
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
    val bctx = graft.algebra.EngineContext.withDictBroadcast(ctx)
    val dec = bctx.decodeExpr(col("s")).getOrElse(fail("fixture dict did not broadcast"))
    val df = bctx.graph.triples.groupBy(col("s")).agg(count("*").as("n"))
      .select(dec.as("s_str"), col("n"))
      .filter(col("s_str").isNotNull)
    val opt = df.queryExecution.optimizedPlan
    def hasDecode(p: LogicalPlan): Boolean = p.expressions.exists(_.exists {
      case _: graft.functions.DictDecode => true
      case _ => false
    })
    val aggs = opt.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, s"shape lost its aggregate:\n$opt")
    val sunk = aggs.exists(_.children.exists(
      _.collect { case n if hasDecode(n) => n }.nonEmpty))
    assert(!sunk, s"decode sank below the aggregate:\n$opt")
    // decode is still in the plan (above the agg), wrapped in the fence
    val fenced = opt.collect { case n: LogicalPlan if n.expressions.exists(_.exists {
      case graft.functions.Fence(_: graft.functions.DictDecode) => true
      case _ => false
    }) => n }.nonEmpty
    assert(fenced, s"fenced decode missing from the plan top:\n$opt")
    // and the fence is an identity: values decode exactly as unfenced
    assert(df.collect().forall(_.getString(0) != null))
  }

  test("point mutations: no broadcast exchange in probe or application") {
    import graft.store.Mutations
    import graft.ingest.Quad
    val g = ctx.graph
    // delete of an existing fixture triple: application is a pure
    // NOT-filter (scan predicate), validation passed as one folded job
    val (g2, dres) = Mutations.delete(g,
      Seq(("<http://ex/leia>", Fixture.homeworld, Some("<http://ex/alderaan>"), "")))
    assert(dres.error.isEmpty, dres.error)
    val dPlan = plan(g2.triples)
    assert(!dPlan.contains("BroadcastExchange"),
      s"point delete must subtract via a scan predicate, not a join:\n$dPlan")
    assert(g2.triples.count() === g.triples.count() - 1)
    // point insert: the validated union plan is join-free too
    val (g3, ires) = Mutations.insert(g,
      Seq(Quad("<http://ex/plan_probe>", Fixture.label, "\"Plan Probe\"", "")))
    assert(ires.error.isEmpty, ires.error)
    val iPlan = plan(g3.triples)
    assert(!iPlan.contains("BroadcastExchange"),
      s"point insert must union the delta, not join it:\n$iPlan")
    assert(g3.triples.count() === g.triples.count() + 1)
  }

  test("asof join: one key exchange, a window carry, and no join operator") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val left = (1L to 40L).map(i => (i % 4, ts(i * 10), i)).toDF("k", "ts", "lid")
    val right = (1L to 20L).map(i => (i % 4, ts(i * 17), i, 0.5)).toDF("k", "ts", "rid", "rv")
    val p = plan(graft.ops.AsOf.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv")))
    assert(!p.contains("Join"), s"asof must be a window carry, not a join:\n$p")
    assert(p.contains("Window"), s"asof lost its window carry:\n$p")
    // exactly one exchange: the key partitioning for the window (the
    // union's two local scans feed it directly)
    assert("Exchange".r.findAllIn(p).size === 1,
      s"asof should shuffle once, on the key:\n$p")
  }

  test("epoch repetition is shuffle-free; shuffle-shard pays exactly one exchange") {
    import spark.implicits._
    val docsDf = (1L to 80L).map(i => (i, s"src${i % 5}")).toDF("id", "grp")
    val pe = plan(graft.ops.Sampling.epochRepeat(
      docsDf, "id", "grp", Map("src0" -> 2.5, "src1" -> 0.3)))
    assert(!pe.contains("Exchange"), s"epochRepeat plan shuffles:\n$pe")
    val ps = plan(graft.ops.Shards.trainingShuffle(docsDf, "id", nShards = 4))
    // one hash exchange on shard feeding the rank window — nothing else
    assert("Exchange".r.findAllIn(ps).size === 1,
      s"trainingShuffle should shuffle once, on the shard column:\n$ps")
    assert(ps.contains("Window"), s"trainingShuffle lost its rank window:\n$ps")
    // the write layout repartitions to nShards BEFORE the window, whose
    // ClusteredDistribution the explicit repartition already satisfies —
    // a second exchange would mean the window re-shuffled to
    // spark.sql.shuffle.partitions on top of the write partitioning
    val pw = plan(graft.ops.Shards.shardedForWrite(docsDf, "id", nShards = 4))
    assert("Exchange".r.findAllIn(pw).size === 1,
      s"writeShards layout should pay exactly one exchange:\n$pw")
    assert(pw.contains("Window"), s"writeShards layout lost its rank window:\n$pw")
  }

  test("semDedup pairs join carries the cell conjunct — never a pure product") {
    import spark.implicits._
    val vecs = (1L to 30L).map(i => (i, Array(0.1f * i, 1f - 0.05f * i), 0))
      .toDF("vec_id", "embedding", "label")
    val p = plan(graft.ops.Similarity.semDedupPairs(
      vecs, "vec_id", "embedding", threshold = 0.99, nLists = 4))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semDedup candidate join degenerated to a corpus-squared product:\n$p")
    assert(p.toLowerCase.contains("cell"),
      s"semDedup lost its cell-scoped candidate join:\n$p")
  }

  test("jaccard pair chain: 4 equi-joins, sizes ride the substrate, no product") {
    import spark.implicits._
    val docsDf = (1L to 50L).map(i => (i, s"tok${i % 7} tok${i % 5} shared common words here $i"))
      .toDF("id", "text")
    val p = plan(graft.ops.Dedup.tokenJaccardPlanOnly(docsDf, "id", "text", 0.8))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"jaccard chain degenerated to a product:\n$p")
    // 7 joins in the UNPERSISTED lazy plan: prefix self-join + two
    // intersection sides + the df-count attach replicated into each of
    // the substrate's four consumers (execution persists the substrate,
    // so the attach runs ONCE — see jaccardPairsFromToks). The former
    // per-side `sizes` joins would push this to 9: the margin is the
    // regression being pinned.
    val joins = "Join".r.findAllIn(p).size
    assert(joins <= 7, s"jaccard chain grew to $joins joins (sizes re-join leak?):\n$p")
    assert(p.contains("Window"), s"jaccard chain lost its rank/size window:\n$p")
  }

  test("curation ops: row-local filters, single-exchange windows, broadcast centroids") {
    import spark.implicits._
    val docsDf = (1L to 60L).map(i => (i, s"tok$i text here")).toDF("doc_id", "text")
    // normalization projection and the blocklist filter never shuffle
    val pn = plan(docsDf.select(
      graft.ops.TextAnalysis.normalizeText(col("text")).as("t")))
    assert(!pn.contains("Exchange"), s"normalizeText shuffles:\n$pn")
    val urls = (1L to 40L).map(i => (i, s"http://h$i.ex${i % 3}.com/p")).toDF("id", "url")
    val pb = plan(graft.ops.Urls.filterBlockedDomains(urls, "url", Seq("ex1.com")))
    assert(!pb.contains("Exchange") && !pb.contains("Join"),
      s"blocklist filter should be pure row-local arithmetic:\n$pb")
    // padding report: ONE aggregate exchange, boundary-list-sized output
    val pp = plan(graft.ops.Packing.paddingReport(
      docsDf.select((col("doc_id") % 100).as("toks")), "toks"))
    assert("Exchange".r.findAllIn(pp).size === 1,
      s"padding report should pay one aggregate exchange:\n$pp")
    // scoreBuckets: the rank and count windows share one group exchange
    val sb = plan(graft.ops.Selection.scoreBuckets(
      (1L to 50L).map(i => (s"g${i % 3}", i, i * 0.1)).toDF("g", "id", "s"),
      "g", "s", "id"))
    assert("Exchange".r.findAllIn(sb).size === 1,
      s"scoreBuckets should shuffle once on the group:\n$sb")
    // manifest over the layout: the shard aggregate reuses the window's
    // shard partitioning — one exchange for layout AND audit together
    val pm = plan(graft.ops.Shards.manifest(
      graft.ops.Shards.trainingShuffle(docsDf, "doc_id", 4), "doc_id", "text"))
    assert("Exchange".r.findAllIn(pm).size === 1,
      s"manifest should reuse the layout window's exchange:\n$pm")
    // bpe pair counts: two aggregate exchanges (word, pair), no join
    val bp = plan(graft.ops.TextAnalysis.bpePairCounts(docsDf, "text"))
    assert(!bp.contains("Join"), s"bpePairCounts joins:\n$bp")
    assert("Exchange hashpartitioning".r.findAllIn(bp).size === 2,
      s"bpePairCounts should pay exactly the word + pair aggregates:\n$bp")
    // prototypicality: the centroid lookup is a row-local plan-constant
    // array (no join AT ALL — the r12 broadcast-join shape let the
    // optimizer infer isnotnull(cell) and evaluate the nearest_cell
    // argmin twice per row, once in the pushed scan filter and once in
    // the projection); the corpus never shuffles to score, and pruning
    // adds exactly the cell window
    val vecs = (1L to 30L).map(i => (i, Array(0.1f * i, 1f))).toDF("vec_id", "embedding")
    val pr = plan(graft.ops.Similarity.prototypicality(vecs, "vec_id", "embedding", nLists = 4))
    assert(!pr.contains("Join") && !pr.contains("BroadcastExchange") &&
      !pr.contains("Exchange hashpartitioning"),
      s"prototypicality should score row-locally, no join/shuffle:\n$pr")
    assert(!pr.contains("Filter isnotnull(nearest_cell") &&
      !pr.contains("isnotnull(nearest_cell"),
      s"the argmin must not be duplicated into a filter:\n$pr")
    val pk = plan(graft.ops.Similarity.prunePrototypes(
      vecs, "vec_id", "embedding", pruneFrac = 0.25, nLists = 4))
    assert("Exchange hashpartitioning".r.findAllIn(pk).size === 1,
      s"prunePrototypes should add exactly the cell window exchange:\n$pk")
    // salted agg: the (key, salt) partial + the key final — two
    // exchanges, the second over the bucket-partial table only
    val sk = plan(graft.ops.Skew.saltedAgg(
      (1L to 50L).map(i => (i, s"k${i % 3}", i % 7)).toDF("id", "key", "v"),
      "key", "id", Seq("v"), buckets = 8))
    assert("Exchange hashpartitioning".r.findAllIn(sk).size === 2,
      s"saltedAgg should pay exactly the partial + final exchanges:\n$sk")
    assert(!sk.contains("Join"), s"saltedAgg joins:\n$sk")
    // interleave over a pre-sharded frame: the (shard, group) rank
    // window and the shard order window — two exchanges, no join
    val il = plan(graft.ops.Sampling.interleaveByWeight(
      (1L to 60L).map(i => (i, s"g${i % 3}", i % 4, i)).toDF("id", "grp", "shard", "pos"),
      "id", "grp", Map("g0" -> 2.0)))
    assert("Exchange hashpartitioning".r.findAllIn(il).size === 2,
      s"interleave should pay exactly its two window exchanges:\n$il")
    assert(!il.contains("Join"), s"interleave joins:\n$il")
  }

  test("band join: hash equi-join on (key, bucket), never a cartesian/range loop") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val rows = (1L to 60L).map(i => (i % 3, i, ts(i * 7))).toDF("k", "id", "ts")
    val p = plan(graft.ops.AsOf.rangeSelfPairs(rows, Seq("k"), "ts", "id", 60L))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band join degenerated to a product:\n$p")
    assert(p.contains("Join"), s"band join lost its equi-join:\n$p")
  }
}

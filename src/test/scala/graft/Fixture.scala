package graft

import graft.algebra.EngineContext
import graft.fts.FtsIndex
import graft.ingest.{Build, Quad}
import graft.semantic.{HashingEmbedder, Semantic}
import graft.store.Graph
import org.apache.spark.sql.SparkSession

/** Small star-wars-shaped graph exercising every term kind: lang-tagged /
  * plain / typed literals, bnodes, named graphs, a broader-hierarchy,
  * numeric-prefixed labels for natural sort. */
object Fixture {

  val label = "<http://www.w3.org/2000/01/rdf-schema#label>"
  val a = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
  val jedi = "<http://ex/Jedi>"
  val human = "<http://ex/Human>"
  val homeworld = "<http://ex/homeworld>"
  val broader = "<http://ex/broader>"
  val height = "<http://ex/height>"

  def quads: Seq[Quad] = Seq(
    // Luke
    Quad("<http://ex/luke>", a, jedi, ""),
    Quad("<http://ex/luke>", a, human, ""),
    Quad("<http://ex/luke>", label, "\"Luke Skywalker\"", ""),
    Quad("<http://ex/luke>", label, "\"Lucas Cielocaminante\"@es", ""),
    Quad("<http://ex/luke>", homeworld, "<http://ex/tatooine>", ""),
    Quad("<http://ex/luke>", height, "\"1.72\"^^<http://www.w3.org/2001/XMLSchema#decimal>", ""),
    // Leia
    Quad("<http://ex/leia>", a, human, ""),
    Quad("<http://ex/leia>", label, "\"Leia Organa\"", ""),
    Quad("<http://ex/leia>", homeworld, "<http://ex/alderaan>", ""),
    // Vader (in a named graph)
    Quad("<http://ex/vader>", a, jedi, "<http://ex/graph1>"),
    Quad("<http://ex/vader>", label, "\"Darth Vader\"", "<http://ex/graph1>"),
    Quad("<http://ex/vader>", homeworld, "<http://ex/tatooine>", "<http://ex/graph1>"),
    // planets with labels
    Quad("<http://ex/tatooine>", label, "\"Tatooine\"", ""),
    Quad("<http://ex/tatooine>", label, "\"Tatuin\"@de", ""),
    Quad("<http://ex/alderaan>", label, "\"Alderaan\"", ""),
    // place hierarchy via broader: city -> region -> planet
    Quad("<http://ex/mos_eisley>", broader, "<http://ex/tatooine_desert>", ""),
    Quad("<http://ex/tatooine_desert>", broader, "<http://ex/tatooine>", ""),
    Quad("<http://ex/mos_eisley>", label, "\"Mos Eisley\"", ""),
    Quad("<http://ex/tatooine_desert>", label, "\"Dune Sea\"", ""),
    // numeric-prefixed labels for natural sort
    Quad("<http://ex/ep1>", label, "\"1 The Phantom Menace\"", ""),
    Quad("<http://ex/ep2>", label, "\"2 Attack of the Clones\"", ""),
    Quad("<http://ex/ep10>", label, "\"10 The Next One\"", ""),
    Quad("<http://ex/ep1>", a, "<http://ex/Film>", ""),
    Quad("<http://ex/ep2>", a, "<http://ex/Film>", ""),
    Quad("<http://ex/ep10>", a, "<http://ex/Film>", ""),
    // bnode
    Quad("_:b0", a, human, ""),
    Quad("_:b0", label, "\"Unknown Person\"", ""))

  @volatile private var cached: Option[EngineContext] = None

  def ctx(spark: SparkSession): EngineContext = cached.getOrElse {
    import spark.implicits._
    val graph = Build.graphFromQuads(spark, quads.toDF()).persist()
    graph.triples.count() // materialize
    val fts = FtsIndex.build(graph.literals).persist()
    val docs = FtsIndex.buildFtss(graph.triples, graph.literals)
    val embedder = HashingEmbedder(64)
    val sem = Semantic.buildSemantic(docs, embedder)
    val c = EngineContext(graph, fts = Some(fts), semantic = Some(sem), embedder = embedder)
    cached = Some(c)
    c
  }
}

package graft

import graft.ingest.{NtParser, Quad}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck fuzz for the NT/TriG line parser: random streams of
  * valid quads (with unicode escapes, spaced literals, lang tags,
  * datatypes), TriG graph-open lines, junk, and unpaired-surrogate
  * poison quads — the parser must recover exactly the constructed
  * quads with exactly the constructed graph state, and drop exactly
  * the poison. Pure JVM, no Spark session. */
object ParserProps extends Properties("ntparser") {

  /** A term as (rendered-on-the-wire, decoded-as-parsed). */
  private case class T(wire: String, parsed: String)

  private val genCore: Gen[String] = for {
    n <- Gen.choose(1, 8)
    cs <- Gen.listOfN(n, Gen.alphaNumChar)
  } yield cs.mkString

  private val genIri: Gen[T] = for {
    core <- genCore
    esc <- Gen.oneOf(0, 1, 2)
  } yield esc match {
    case 0 => T(s"<urn:t:$core>", s"<urn:t:$core>")
    case 1 => T(s"<urn:t:$core\\u00e9>", s"<urn:t:${core}\u00e9>") // \uXXXX
    case _ => T(s"<urn:t:$core\\U0001F600\\u0041>", s"<urn:t:$core\uD83D\uDE00A>") // \U + pair
  }

  private val genSubject: Gen[T] = Gen.frequency(
    4 -> genIri,
    1 -> genCore.map(c => T(s"_:b$c", s"_:b$c")))

  // literal content: inner spaces, escaped quotes, periods — all opaque
  // to the positional split (the object is "rest of line")
  private val genLiteral: Gen[T] = for {
    words <- Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, genCore))
    quoted <- Gen.oneOf(false, true)
    dotted <- Gen.oneOf(false, true)
    tag <- Gen.oneOf("", "@en", "^^<urn:dt:int>")
  } yield {
    val inner = words.mkString(" ") +
      (if (quoted) " \\\"q\\\"" else "") + (if (dotted) " ." else "")
    T(s""""$inner"$tag""", s""""$inner"$tag""")
  }

  private val genObject: Gen[T] = Gen.frequency(2 -> genIri, 3 -> genLiteral)

  /** One stream event: (lines to emit, quads expected, graph after). */
  private sealed trait Ev
  private case class Data(s: T, p: T, o: T, lead: String) extends Ev
  private case class Open(g: String) extends Ev
  private case class Junk(line: String) extends Ev
  private case object Poison extends Ev

  private val genEv: Gen[Ev] = Gen.frequency(
    6 -> (for { s <- genSubject; p <- genIri; o <- genObject;
                lead <- Gen.oneOf("", "  ") } yield Data(s, p, o, lead)),
    1 -> genCore.map(c => Open(s"<urn:g:$c>")),
    1 -> Gen.oneOf(
      "", "# comment", "}", "@prefix ex: <urn:x> .", "random text",
      "<urn:a> <urn:b> .",      // 2 tokens -> skipped
      "[] <urn:p> \"x\" .",     // bad subject -> skipped
      "<urn:a> _:p \"x\" .",    // bad predicate -> skipped
      "<urn:g> { ",             // trailing space -> not an open
      "<urn:a> <urn:b> \"x\" . " // trailing space -> not a data line
    ).map(Junk.apply),
    1 -> Gen.const(Poison))

  property("parseLines recovers exactly the constructed quads and graph state") =
    Prop.forAll(Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, genEv))) { evs =>
      val lines = scala.collection.mutable.ListBuffer[String]()
      val want = scala.collection.mutable.ListBuffer[Quad]()
      var g = ""
      evs.foreach {
        case Data(s, p, o, lead) =>
          lines += s"$lead${s.wire} ${p.wire} ${o.wire} ."
          want += Quad(s.parsed, p.parsed, o.parsed, g)
        case Open(iri) =>
          lines += s"$iri {"
          g = iri
        case Junk(l) =>
          lines += l
        case Poison =>
          // JSON-style lone-surrogate escape: the term survives decoding
          // but fails the encodability check -> whole quad dropped
          lines += "<urn:t:p> <urn:t:q> \"bad \\ud83d\" ."
      }
      val got = NtParser.parseLines(lines.iterator).toList
      got == want.toList
    }
}

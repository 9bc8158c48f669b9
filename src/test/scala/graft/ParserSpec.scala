package graft

import graft.ingest.{NtParser, Quad}
import graft.model.Term

class ParserSpec extends SparkSpec {

  def parse(lines: String*): Seq[Quad] = NtParser.parseLines(lines.iterator).toSeq

  test("plain triple with IRI object") {
    assert(parse("<http://ex/s> <http://ex/p> <http://ex/o> .") ===
      Seq(Quad("<http://ex/s>", "<http://ex/p>", "<http://ex/o>", "")))
  }

  test("literal objects keep N3 surface form, spaces preserved") {
    val qs = parse(
      """<http://ex/s> <http://ex/p> "plain text with spaces" .""",
      """<http://ex/s> <http://ex/p> "Text"@de .""",
      """<http://ex/s> <http://ex/p> "1.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .""")
    assert(qs.map(_.o) === Seq(
      "\"plain text with spaces\"",
      "\"Text\"@de",
      "\"1.5\"^^<http://www.w3.org/2001/XMLSchema#decimal>"))
  }

  test("blank nodes allowed as subject and object; non-IRI predicate skipped") {
    assert(parse("_:b0 <http://ex/p> _:b1 .") === Seq(Quad("_:b0", "<http://ex/p>", "_:b1", "")))
    assert(parse("<http://ex/s> notAnIri <http://ex/o> .").isEmpty)
    assert(parse("garbage line").isEmpty)
    assert(parse("<http://ex/s> <http://ex/p> <http://ex/o>").isEmpty) // no ' .'
  }

  test("TriG graph block switches the graph") {
    val qs = parse(
      "<http://ex/s> <http://ex/p> <http://ex/o> .",
      "<http://ex/g1> {",
      "<http://ex/s2> <http://ex/p> <http://ex/o2> .",
      "}")
    assert(qs.map(_.g) === Seq("", "<http://ex/g1>"))
  }

  test("unicode escapes decoded; unpaired surrogates drop the quad") {
    val ok = parse("""<http://ex/s> <http://ex/p> "café \U0001F600" .""")
    assert(ok.head.o === "\"café 😀\"")
    // JSON-style escaped emoji: lone surrogate pair halves written as two \u
    val lone = parse("""<http://ex/s> <http://ex/p> "bad \ud83d" .""")
    assert(lone.isEmpty)
  }

  test("literalToParts splits value/lang/datatype") {
    assert(Term.literalToParts("\"txt\"") === (Some("txt"), None, None))
    assert(Term.literalToParts("\"txt\"@de") === (Some("txt"), Some("de"), None))
    assert(Term.literalToParts("\"1.5\"^^<http://x>") === (Some("1.5"), None, Some("<http://x>")))
    assert(Term.literalToParts("<http://x>") === (None, None, None))
  }
}

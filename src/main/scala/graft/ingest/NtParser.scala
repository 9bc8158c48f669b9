package graft.ingest

import graft.model.Term

/** One RDF quad in N3 surface form; `g = ""` means the default graph. */
final case class Quad(s: String, p: String, o: String, g: String)

/** Line-level N-Triples / TriG parser replicating the reference's
  * `read_nt` (/root/reference/src/bikidata/main.py:70-115):
  *
  *  - a data line must end in `" ."`; everything else is skipped, except a
  *    TriG graph-open line `^<IRI> {` which switches the current graph,
  *  - `\uXXXX`/`\UXXXXXXXX` escapes decoded before splitting,
  *  - naive positional split on `' '`: s = tok0, p = tok1, o = rest rejoined
  *    (so literals containing spaces survive),
  *  - subjects must be `<iri>` or `_:bnode`; predicates must be `<iri>`,
  *  - terms containing unpaired surrogates (JSON-style `\ud83d` escapes)
  *    drop the whole quad (the reference fails them at hash time,
  *    main.py:173-180).
  *
  * The parser is stateful only through the current-graph string, so pure
  * `.nt` content is embarrassingly parallel; TriG files are parsed one
  * file per task (see [[Build.quads]]).
  */
object NtParser {

  /** Parse one line given the current graph; returns (quad?, next graph). */
  def parseLine(rawLine: String, graph: String): (Option[Quad], String) = {
    if (!rawLine.endsWith(" .")) {
      if (rawLine.endsWith(" {") && rawLine.startsWith("<")) {
        val parts = rawLine.split(" ")
        if (parts.length == 2) return (None, parts(0))
      }
      return (None, graph)
    }
    var line = Term.decodeUnicodeEscapes(rawLine).trim
    line = line.substring(0, math.max(0, line.length - 2))
    val parts = line.split(" ")
    if (parts.length <= 2) return (None, graph)
    val s = parts(0)
    val p = parts(1)
    val o = parts.drop(2).mkString(" ")
    if (!((s.startsWith("<") && s.endsWith(">")) || s.startsWith("_:")))
      return (None, graph)
    if (!(p.startsWith("<") && p.endsWith(">"))) return (None, graph)
    if (!(Term.isEncodable(s) && Term.isEncodable(p) && Term.isEncodable(o) &&
          Term.isEncodable(graph))) return (None, graph)
    (Some(Quad(s, p, o, graph)), graph)
  }

  /** Stateful scan over the lines of one file. */
  def parseLines(lines: Iterator[String]): Iterator[Quad] = {
    var graph = ""
    lines.flatMap { line =>
      val (quad, g2) = parseLine(line, graph)
      graph = g2
      quad
    }
  }
}

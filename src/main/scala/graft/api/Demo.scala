package graft.api

import org.apache.spark.sql.SparkSession

/** Executable walkthrough of the reference's notebook flows
  * (examples.ipynb / eswc_2026.ipynb cells) against a small built-in
  * dataset — build, fts, filter combination, size:0 aggregates, random
  * sampling, id lookup, pagination, reverse reference, paths.
  * Run: `sbt "runMain graft.api.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val nt = s"$dir/starwars.nt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(nt),
      """<http://sw/luke> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://sw/Jedi> .
        |<http://sw/luke> <http://www.w3.org/2000/01/rdf-schema#label> "Luke Skywalker" .
        |<http://sw/luke> <http://sw/homeworld> <http://sw/tatooine> .
        |<http://sw/vader> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://sw/Jedi> .
        |<http://sw/vader> <http://www.w3.org/2000/01/rdf-schema#label> "Darth Vader" .
        |<http://sw/vader> <http://sw/homeworld> <http://sw/tatooine> .
        |<http://sw/leia> <http://www.w3.org/2000/01/rdf-schema#label> "Leia Organa" .
        |<http://sw/leia> <http://sw/homeworld> <http://sw/alderaan> .
        |<http://sw/tatooine> <http://www.w3.org/2000/01/rdf-schema#label> "Tatooine" .
        |<http://sw/tatooine> <http://sw/partOf> <http://sw/outer_rim> .
        |<http://sw/outer_rim> <http://www.w3.org/2000/01/rdf-schema#label> "Outer Rim" .
        |""".stripMargin)

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bk = new Bikidata(spark, s"$dir/wh")
    println(s"build: ${bk.build(Seq(nt))} triples")
    println(s"total: ${bk.total()} subjects")

    def show(title: String, opts: String): Unit = {
      println(s"\n== $title\n   $opts")
      println("   -> " + bk.queryJson(opts))
    }

    // examples.ipynb cell 2: fts query
    show("full-text search", """{"filters":[{"p":"fts","o":"skywalker"}]}""")
    // examples.ipynb cell 5: fts + NOT combination
    show("fts + not", """{"filters":[{"p":"fts","o":"tatooine"},{"op":"not","p":"<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>","o":"<http://sw/Jedi>"}]}""")
    // examples.ipynb cell 6: aggregates with size:0
    show("aggregates only", """{"size":0,"filters":[{"p":"<http://sw/homeworld>"}],"aggregates":["<http://sw/homeworld>"]}""")
    // eswc cell 4: random sampling
    show("random sample", """{"filters":[{"p":"id","o":"random 2"}]}""")
    // eswc cell 11: id point lookup
    show("id lookup", """{"filters":[{"p":"id","o":"<http://sw/luke>"}]}""")
    // eswc cell 7: pagination
    show("page 2 of size 1", """{"filters":[{"p":"<http://www.w3.org/2000/01/rdf-schema#label>"}],"size":1,"start":1}""")
    // eswc cell 9: reverse reference
    show("reverse reference", """{"filters":[{"o":"<http://sw/tatooine>"}]}""")
    // paths through partOf
    show("paths", """{"filters":[{"p":"id","o":"<http://sw/tatooine>"}],"paths":["<http://sw/partOf>"]}""")

    spark.stop()
  }
}

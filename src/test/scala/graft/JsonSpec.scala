package graft

import graft.algebra.{FilterQ, OrderRule, QueryOpts}

/** JSON opts codec quirks (reference coercions at query.py:123-125,
  * 620-627, 230-242). */
class JsonSpec extends SparkSpec {

  test("p/o/g are stringified and space-stripped") {
    val o = QueryOpts.fromJson("""{"filters":[{"p":42,"o":" <http://x> ","g":null}]}""")
    assert(o.filters === Seq(FilterQ(p = "42", o = "<http://x>", g = "")))
  }

  test("size/start fall back to defaults on junk") {
    assert(QueryOpts.fromJson("""{"size":"banana","start":"x"}""").size === 999)
    assert(QueryOpts.fromJson("""{"size":"banana"}""").start === 0)
    assert(QueryOpts.fromJson("""{"size":"10","start":5}""") ===
      QueryOpts(size = 10, start = 5))
    assert(QueryOpts.fromJson("""{"size":0}""").size === 0) // size=0 legal
  }

  test("order accepts dict, [dict], and [[dict]]") {
    val d = QueryOpts.fromJson("""{"order":{"by":"label","dir":"desc"}}""")
    val l = QueryOpts.fromJson("""{"order":[{"by":"label","dir":"desc"}]}""")
    val ll = QueryOpts.fromJson("""{"order":[[{"by":"label","dir":"desc"}]]}""")
    val expected = Seq(OrderRule(by = "label", dir = "desc"))
    assert(d.order === expected && l.order === expected && ll.order === expected)
  }

  test("default op is should; missing filters tolerated") {
    assert(QueryOpts.fromJson("""{"filters":[{"p":"<p>"}]}""").filters.head.op === "should")
    assert(QueryOpts.fromJson("""{}""").filters.isEmpty)
    assert(QueryOpts.fromJson("""{"filters":"junk"}""").filters.isEmpty)
  }

  test("order clean flags default per mode") {
    val lex = QueryOpts.fromJson("""{"order":{"by":"label"}}""").order.head
    assert(lex.cleanOrDefault.lower && lex.cleanOrDefault.trim)
    val raw = QueryOpts.fromJson("""{"order":{"by":"label","mode":"raw"}}""").order.head
    assert(!raw.cleanOrDefault.lower)
    val custom = QueryOpts.fromJson(
      """{"order":{"by":"label","clean":{"strip_punct":true,"trim":false}}}""").order.head
    assert(custom.clean.get.stripPunct && !custom.clean.get.trim && custom.clean.get.lower)
  }

  test("aggregates / paths / only+exclude properties parse as string lists") {
    val o = QueryOpts.fromJson(
      """{"aggregates":["properties","<p>"],"paths":["<b>"],
        |"only_properties":["<x>"],"exclude_properties":["<y>"]}""".stripMargin)
    assert(o.aggregates === Seq("properties", "<p>"))
    assert(o.paths === Seq("<b>"))
    assert(o.onlyProperties === Seq("<x>") && o.excludeProperties === Seq("<y>"))
  }
}

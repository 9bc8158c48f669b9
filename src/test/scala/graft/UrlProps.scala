package graft

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck differential properties for the URL canonicalization
  * operators: the normalization laws (idempotence, decoration-
  * equivalence) and the dedup/cap accounting laws must hold for ANY
  * generated url shape, not just the handcrafted spec fixtures. */
object UrlProps extends Properties("urls") {

  private lazy val spark = SparkSpec.session

  // host labels avoid a leading 'www' (the www-strip rule would then
  // rewrite the BASE url too, voiding the decoration-equivalence law —
  // real-world www-hosts are decoration, not identity)
  private val genLabel: Gen[String] =
    Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar))
      .map(_.mkString).suchThat(s => s.nonEmpty && s != "www")

  private case class Base(scheme: String, host: String, path: String,
      query: String) {
    def url: String = s"$scheme://$host$path$query"
  }

  private val genBase: Gen[Base] = for {
    scheme <- Gen.oneOf("http", "https")
    labels <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genLabel))
    segs <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, genLabel))
    q <- Gen.oneOf("", "?Key=Value", "?a=1&b=2")
  } yield Base(scheme, labels.mkString("."),
    segs.map("/" + _).mkString, q)

  /** Random decoration of a base url with exactly the forms the rules
    * fold: scheme/host case, a www label, the scheme's default port,
    * trailing slashes (only when no query — a slash after the query is
    * part of the query string), and a fragment. */
  private def genDecorated(b: Base): Gen[String] = for {
    up <- Gen.oneOf(true, false)
    www <- Gen.oneOf(true, false)
    port <- Gen.oneOf(true, false)
    slashes <- if (b.query.isEmpty) Gen.choose(0, 2) else Gen.const(0)
    frag <- Gen.oneOf("", "#x", "#Sec.2")
  } yield {
    val sh = (if (www) "www." else "") + b.host
    val auth = (if (up) (b.scheme + "://" + sh).toUpperCase
                else b.scheme + "://" + sh) +
      (if (port) (if (b.scheme == "http") ":80" else ":443") else "")
    auth + b.path + b.query + ("/" * slashes) + frag
  }

  property("normalizeUrl folds every decoration to the base form") =
    Prop.forAll(genBase.flatMap(b => Gen.listOfN(8, genDecorated(b)).map(b -> _))) {
      case (base, decorated) =>
        import spark.implicits._
        val all = (base.url :: decorated).zipWithIndex.map(_.swap)
        val norms = all.toDF("i", "u")
          .select(graft.ops.Urls.normalizeUrl(org.apache.spark.sql.functions.col("u")))
          .collect().map(_.getString(0)).toSet
        norms.size == 1
    }

  property("normalizeUrl is idempotent") = Prop.forAll(
    genBase.flatMap(genDecorated)) { u =>
    import spark.implicits._
    val once = Seq(u).toDF("u")
      .select(graft.ops.Urls.normalizeUrl(org.apache.spark.sql.functions.col("u")))
      .collect()(0).getString(0)
    val twice = Seq(once).toDF("u")
      .select(graft.ops.Urls.normalizeUrl(org.apache.spark.sql.functions.col("u")))
      .collect()(0).getString(0)
    once == twice
  }

  property("dedupByUrl conserves multiplicity and keeps min ids") =
    Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 6)) { (n, distinctUrls) =>
      import spark.implicits._
      val rows = (1L to n.toLong).map(i => (i, s"http://h${i % distinctUrls}.ex.com/p"))
      val got = graft.ops.Urls.dedupByUrl(rows.toDF("id", "url"), "id", "url")
        .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
      val byUrl = rows.groupBy(_._2)
      got.map(_._3).sum == n.toLong &&
        got.length == byUrl.size &&
        got.forall { case (u, id, cnt) =>
          // closed-form normalization of the generated shape
          val origUrl = rows.find(_._1 == id).get._2
          val members = byUrl(origUrl)
          id == members.map(_._1).min && cnt == members.length.toLong
        }
    }

  property("capPerDomain keeps exactly min(cap, |domain|) per domain, a subset of input") =
    Prop.forAll(Gen.choose(1, 50), Gen.choose(1, 4), Gen.choose(1, 7)) {
      (n, nDoms, cap) =>
        import spark.implicits._
        val rows = (1L to n.toLong).map(i => (i, s"http://sub$i.dom${i % nDoms}.com/x"))
        val got = graft.ops.Urls.capPerDomain(rows.toDF("id", "url"), "id", "url", cap)
          .collect().map(r => (r.getLong(0), r.getString(2)))
        val byDom = rows.groupBy { case (i, _) => s"dom${i % nDoms}.com" }
        got.map(_._1).toSet.subsetOf(rows.map(_._1).toSet) &&
          got.groupBy(_._2).forall { case (d, kept) =>
            kept.length == math.min(cap, byDom(d).size)
          }
    }
}

package graft

import graft.functions.{GraftFunctions, GraftSparkExtensions, Hash64}

/** The SQL surface of the custom Catalyst expressions: `raw()` users
  * must be able to join the hash-encoded views and score vectors from
  * plain `spark.sql`. */
class SqlFunctionsSpec extends SparkSpec {

  test("registered SQL functions match the Catalyst expressions bit-for-bit") {
    GraftFunctions.register(spark)
    val h = spark.sql("SELECT xxhash64_seed0('<urn:t:nation:3>') AS h")
      .collect()(0).getLong(0)
    assert(h === Hash64.hashString("<urn:t:nation:3>"),
      "SQL xxhash64_seed0 must match the dictionary hash (builtin xxhash64 is seed 42)")

    val d = spark.sql(
      "SELECT cosine_distance(array(float(1), float(0)), array(float(0), float(1))) AS d")
      .collect()(0).getDouble(0)
    assert(math.abs(d - 1.0) < 1e-9)

    val s = spark.sql(
      "SELECT cosine_similarity(array(float(3), float(4)), array(float(3), float(4))) AS s")
      .collect()(0).getDouble(0)
    assert(math.abs(s - 1.0) < 1e-9)

    val g = spark.sql(
      "SELECT word_grams(array('a','b','c','b','c'), 2) AS g")
      .collect()(0).getSeq[String](0)
    assert(g === Seq("a b", "b c", "c b"),
      "window order with first-occurrence dedup")
    val gAll = spark.sql(
      "SELECT word_grams(array('a','b','c','b','c'), 2, false) AS g")
      .collect()(0).getSeq[String](0)
    assert(gAll === Seq("a b", "b c", "c b", "b c"))
  }

  test("registration is idempotent and builders validate arity") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark) // createOrReplace — second call is a no-op
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_distance(array(float(1)))").collect()
    }
    assert(String.valueOf(err.getMessage).nonEmpty)
  }

  test("the extensions class wires the same builders at session build time") {
    // a shared-context test JVM cannot build a second session to observe
    // injection end-to-end; pin that apply() registers every function
    // without throwing (the injectFunction tuples are built eagerly)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    (new GraftSparkExtensions).apply(ext)
  }
}

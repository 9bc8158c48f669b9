package graft.functions

import org.apache.spark.sql.{GraftShims, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, XxHash64}

/** SQL registration for the engine's custom Catalyst expressions, so
  * `raw()` users (reference query.py:8-10's escape hatch) can reach the
  * dictionary hash and the vector metrics from plain `spark.sql`:
  *
  * {{{
  *   SELECT i.value FROM triples t JOIN iris i ON t.p = i.hash
  *   WHERE t.s = xxhash64_seed0('<urn:t:nation:3>')
  *
  *   SELECT cosine_distance(a.vec, b.vec) FROM ...
  * }}}
  *
  * Two wirings, same builders:
  *  - [[GraftFunctions.register]] — onto a LIVE session (the facade's
  *    `raw()` calls this, so the views and the functions arrive
  *    together);
  *  - [[GraftSparkExtensions]] —
  *    `spark.sql.extensions=graft.functions.GraftSparkExtensions` at
  *    session build time, the public injection route for sessions the
  *    facade does not own.
  *
  * All three are codegen'd Catalyst expressions (no UDF boundary):
  * seed-0 XXH64 ([[Hash64]] — Spark's builtin `xxhash64` is seed 42 and
  * does NOT match the dictionary), [[CosineDistance]] and
  * [[CosineSimilarity]] over float-array columns.
  */
object GraftFunctions {

  /** (name, usage, builder) for every exposed function. */
  val all: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("xxhash64_seed0",
      "xxhash64_seed0(term) - seed-0 XXH64 of the term's UTF-8 bytes; " +
        "matches the triples/iris/literals dictionary encoding (Spark's " +
        "builtin xxhash64 uses seed 42 and does not)",
      (es: Seq[Expression]) => XxHash64(es, 0L)),
    ("cosine_distance",
      "cosine_distance(a, b) - 1 - cosine similarity of two float arrays",
      { es: Seq[Expression] =>
        require(es.length == 2, "cosine_distance takes exactly 2 arguments")
        CosineDistance(es.head, es(1))
      }),
    ("cosine_similarity",
      "cosine_similarity(a, b) - cosine similarity of two float arrays",
      { es: Seq[Expression] =>
        require(es.length == 2, "cosine_similarity takes exactly 2 arguments")
        CosineSimilarity(es.head, es(1))
      }),
    ("word_grams",
      "word_grams(tokens, n[, distinct]) - every n-token window of a " +
        "string array, space-joined; distinct (default true) keeps first " +
        "occurrences; fewer than n tokens yields an empty array",
      { es: Seq[Expression] =>
        require(es.length == 2 || es.length == 3,
          "word_grams takes 2 or 3 arguments")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"word_grams $what must be an integer literal")
        }
        def boolLit(e: Expression): Boolean = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case _ => throw new IllegalArgumentException(
            "word_grams distinct must be a boolean literal")
        }
        WordGrams(es.head, intLit(es(1), "n"),
          if (es.length == 3) boolLit(es(2)) else true)
      }),
    ("winnow_md5",
      "winnow_md5(s, k, w) - winnowing fingerprints of an already-" +
        "normalized string: low-60-bit md5 of every k-char gram, minimum " +
        "per sliding w-window, first-occurrence distinct",
      { es: Seq[Expression] =>
        require(es.length == 3, "winnow_md5 takes exactly 3 arguments")
        def intLit(e: Expression, what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"winnow_md5 $what must be an integer literal")
        }
        WinnowMd5(es.head, intLit(es(1), "k"), intLit(es(2), "w"))
      }))

  /** Register (or refresh) the functions on a live session's registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      GraftShims.registerTempFunction(spark, name, builder)
    }

  /** Inject into a session being built (`spark.sql.extensions`). */
  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, usage, builder) =>
      // 5-arg form: (className, db, name, usage, extended) — the 3-arg
      // constructor is (className, db, name) and would misfile the usage
      // text as the function NAME in DESCRIBE FUNCTION output
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(
          GraftFunctions.getClass.getCanonicalName, null, name, usage, ""),
        builder))
    }
}

/** `spark.sql.extensions=graft.functions.GraftSparkExtensions` — injects
  * [[GraftFunctions.all]] at session build time. */
final class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.inject(ext)
}

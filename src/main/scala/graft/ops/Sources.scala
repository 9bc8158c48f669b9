package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL corpus interchange — the de-facto format LLM training corpora
  * ship in (one JSON document per line, optionally gzipped; Spark's
  * json source splits and decompresses transparently, so a directory of
  * .jsonl.gz shards parallelizes by file for free).
  *
  * The schema is ENFORCED, never inferred: inference would silently
  * scan the corpus twice and drift with the data; a fixed schema makes
  * corrupt lines detectable instead of becoming nulls. */
object Sources {

  val DocSchema = "doc_id LONG, text STRING, lang STRING, source STRING"

  /** Strict read: any malformed line fails the job (the right default
    * for a reproducible training run — silent row loss is worse than a
    * loud failure). */
  def readJsonlDocs(spark: SparkSession, path: String,
      schema: String = DocSchema): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Quarantine read: malformed lines are routed to the second frame
    * (raw line text) instead of failing the job — the curation-pipeline
    * shape, where a rejects sample is triaged while the good rows flow.
    * One pass; the split is a filter on the corrupt-record column.
    *
    * The cached raw frame backing both splits is corpus-sized — call
    * the returned `release` thunk once both frames are consumed, or
    * the cache competes with the session's serving relations until the
    * session ends. */
  def readJsonlDocsWithRejects(spark: SparkSession, path: String,
      schema: String = DocSchema): JsonlSplit = {
    val raw = spark.read
      .schema(schema + ", _corrupt_record STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // the json source parses corrupt-record splits lazily; without a
      // barrier the two filters below could disagree on a re-read
      .cache()
    val good = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val rejects = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("line"))
    JsonlSplit(good, rejects, () => { raw.unpersist(); () })
  }

  /** The two splits of a quarantine read plus the cache-release hook.
    * Destructures like the old pair: `val JsonlSplit(good, rejects, _)`. */
  final case class JsonlSplit(good: DataFrame, rejects: DataFrame,
      release: () => Unit)

  /** Write a corpus as JSONL shards (gzip so shards stay line-splittable
    * by file; one file per partition — partition count IS the shard
    * count at scale). */
  def writeJsonlDocs(df: DataFrame, path: String,
      compress: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** Read WET files (WARC extracted-text, the Common Crawl corpus
    * format) into (url, date, length, text) rows — conversion records
    * only; warcinfo/request/response records are skipped.
    *
    * Records split on the `WARC/1.0\r\n` version line via the text
    * source's custom `lineSep`, so a directory of `.wet(.gz)` shards
    * parallelizes by file and gzip decompresses transparently —
    * standard Common Crawl segments are one record stream per ~150 MB
    * .gz member, which is exactly the by-file parallelism a 100 TB
    * crawl drop arrives with. Header parsing and the Content-Length
    * cut run row-locally inside one projection; no UDF on the headers
    * (plain column splits), one small `mapPartitions`-free plan.
    *
    * WET payloads are text by definition; a payload that itself
    * contains the version line (possible in adversarial text, not in
    * crawler output) would split early and the tail fragment drops at
    * the WARC-Type filter — documented trade for splitter-free
    * distributed reads. */
  def readWetDocs(spark: SparkSession, path: String): DataFrame = {
    val rec = spark.read.option("lineSep", "WARC/1.0\r\n").text(path)
    // header block ends at the first blank line; both parts row-local
    val headers = substring_index(col("value"), "\r\n\r\n", 1)
    val body = expr("substring(value, length(substring_index(value, '\r\n\r\n', 1)) + 5)")
    def header(name: String) = {
      // "...\r\nName: v\r\n..." → the line after the marker, pre-':' dropped
      val marker = s"\r\n$name: "
      when(col("__h").contains(marker),
        substring_index(substring_index(concat(lit("\r\n"), col("__h")), marker, -1),
          "\r\n", 1))
    }
    rec
      .withColumn("__h", concat(lit("\r\n"), headers))
      .withColumn("__type", header("WARC-Type"))
      .filter(col("__type") === "conversion")
      .select(
        header("WARC-Target-URI").as("url"),
        header("WARC-Date").as("date"),
        header("Content-Length").cast("long").as("length"),
        body.as("__b"))
      // the record splitter leaves the inter-record blank lines on the
      // body tail — cut at the declared Content-Length in BYTES, the
      // WARC contract: encode → binary substring → decode is byte-exact
      // for multi-byte UTF-8 payloads (a char-based substring would
      // over-cover by bytes−chars and need an rtrim that also destroys
      // legitimate trailing payload whitespace). A record missing the
      // header falls back to trimming the separator CRLFs, the only
      // tail the splitter can leave. A valid Content-Length never cuts
      // mid-codepoint (it spans the whole payload); a record truncated
      // by an in-payload early split (see above) just yields the bytes
      // present.
      .withColumn("text",
        when(col("length").isNotNull,
          expr("decode(substring(encode(__b, 'UTF-8'), 1, length), 'UTF-8')"))
          .otherwise(rtrim(col("__b"), " \r\n")))
      .select("url", "date", "length", "text")
  }
}

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
}

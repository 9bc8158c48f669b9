package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local-mode scan parallelism: the testdata tables are single
      // small parquet files, and the default 4 MB file-open cost floors
      // maxSplitBytes so a 2 MB table scans as ONE task (the partial
      // aggregate then runs single-threaded while DuckDB splits by row
      // group). 128 KB lets bytes/parallelism drive the split; cluster
      // deployments keep the default (many-file inputs split by file)
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.autoBroadcastJoinThreshold", "134217728")
      // interactive serving: results are page-sized and every shuffle is
      // a fixed, small partition count (this session's cpu count), so
      // AQE's per-exchange re-planning only adds a scheduler round-trip
      // per stage (~1 extra job per query at the local-mode floor);
      // batch/pipeline sessions at corpus scale should keep AQE on
      // (skew-join splitting, partition coalescing)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // auxiliary oracle inputs (e.g. the MinHash pair table DuckDB's
    // recursive-CTE component oracle reads) — exported BEFORE the query
    // dumps so a mid-run crash cannot leave oracle_sql.json referencing
    // a missing table
    try PipelineQueries.exportOracleAux(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[verify] oracle aux export failed: ${e.getMessage}")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // a failed query must not leave a PREVIOUS run's dump behind —
        // a stale parquet in a reused outDir would hash-match the oracle
        // and grade the broken query green
        try {
          val d = new java.io.File(outDir, name)
          if (d.exists()) { new scala.reflect.io.Directory(d).deleteRecursively(); () }
        } catch { case _: Exception => () }
      }
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Verify.q(k)}: ${Verify.q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    PipelineQueries.clearCaches()
    spark.stop()
  }

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20)
    * — a tab or CR in builder-authored SQL (or an env-provided path in
    * Bench's output line) would otherwise make the driver's json.load
    * fail and silently zero the round's results. Shared by Verify and
    * Bench so the two emitters cannot drift. */
  private[graft] def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

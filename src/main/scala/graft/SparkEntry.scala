package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] demonstrates one operator from SURVEY.md §2
  * (or a scale-pipeline op); [[oracleSql]] holds the DuckDB-equivalent SQL
  * the driver runs over the same parquet tables for the correctness gate.
  *
  * Determinism rules used throughout (so Spark and DuckDB hash-match):
  *  - aggregate outputs are cast to DECIMAL explicitly on both sides
  *    (double sums are order-dependent; decimal sums are exact),
  *  - every result has a total ORDER BY on both sides,
  *  - counts are cast to BIGINT in DuckDB (its integer SUM is HUGEINT).
  */
object SparkEntry {

  // resolved-relation cache: each spark.read.parquet call pays a
  // 1-task schema-inference job (footer read) at ACTION time — per
  // query that is one scheduling floor per referenced table (q3_join
  // reads three). The cache reuses the analyzed relation (schema +
  // file index); the DATA is still read from parquet per query, so the
  // comparison against the DuckDB baseline stays scan-for-scan honest.
  private val relCache = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    relCache.computeIfAbsent(
      s"${System.identityHashCode(s)}:$dir/$name",
      _ => s.read.parquet(s"$dir/$name.parquet"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's headline analytical query (wikidata.md:45-67): rank
    * entities by shared (p,o) pairs with a seed entity. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_rdf_flagship")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ RdfQueries.queries ++ PipelineQueries.queries

  /** One-time store/index builds (the ingest phase in real usage — the
    * DuckDB baseline likewise queries a prebuilt database). Bench calls
    * this before timing so per-query numbers are steady-state. */
  def warmup(spark: SparkSession, sfDir: String): Unit = {
    val ctx = graft.rdfize.Rdfize.ctx(spark, sfDir)
    // the inverted-list materialization and the semantic index build are
    // independent of each other (both need only ctx) — overlap their jobs
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val ftsF = Future(ctx.fts.foreach(_.postingLists.count()))
    val semF = Future(graft.rdfize.Rdfize.semantic(spark, sfDir))
    // await BOTH before propagating a failure: rethrowing on the first
    // await would leave the other build running its Spark jobs
    // concurrently with Bench's timed queries, inflating their medians
    val r1 = scala.util.Try(Await.result(ftsF, Duration.Inf))
    val r2 = scala.util.Try(Await.result(semF, Duration.Inf))
    r1.get; r2.get
    ()
  }

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ RdfQueries.oracle ++ PipelineQueries.oracle
}

/** Core relational primitives (scan, filter, hash-agg, joins, window,
  * top-k) — the Spark substrate every SURVEY §2 operator compiles onto,
  * and the bench headliners. */
object RelationalQueries {
  import SparkEntry.t

  /** TZ-invariant timestamp comparison (column, bound) pair. The testdata
    * stores naive wall-clock timestamps (isAdjustedToUTC=false), DuckDB
    * compares them TZ-free, and the harness's Spark session timezone is
    * not under our control — a `lit("...").cast("timestamp")` bound would
    * shift with it. Handles both parquet read modes: TIMESTAMP_NTZ
    * (compare wall clock to an NTZ literal — string→NTZ casts never
    * consult the session TZ) and LTZ (compare raw epoch seconds). */
  private def tsVs(df: DataFrame, name: String, date: String): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =
    df.schema(name).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        (col(name), lit(date).cast("timestamp_ntz"))
      case _ =>
        (col(name).cast("long"), lit(java.time.LocalDate.parse(date).toEpochDay * 86400L))
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SURVEY §2.5 hash aggregation (partial+final), §2.1 parquet scan with
    // predicate pushdown. TPC-H Q1 shape.
    //
    // Sums are integer-exact cents (BIGINT), not DECIMAL: every money /
    // quantity column in the testdata is a 2-decimal value stored as
    // double, so round(x*100) is the exact integer in ANY engine under
    // ANY rounding mode, and sum_disc_price decomposes exactly as
    // Σ cents(price) × (100 − cents(discount)) in units of 1e-4
    // (max ~6e14 ≪ 2^63). This removes the per-row double→DECIMAL cast
    // whose rounding/rendering differs across DuckDB versions — the
    // r1/r2 gate hash-failure channel. Decimal-sum coverage stays via
    // q3_join (same cast pattern, hash-green).
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val (ship, bound) = tsVs(li, "l_shipdate", "1995-09-02")
      def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")
      li.filter(ship <= bound)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(cents($"l_quantity")).as("sum_qty_cents"),
          sum(cents($"l_extendedprice")).as("sum_base_price_cents"),
          sum(cents($"l_extendedprice") * (lit(100L) - cents($"l_discount")))
            .as("sum_disc_price_e4"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Diagnostic twin of q1_agg: identical filter + grouping, counts
    // only. If a driver-side hash mismatch ever reappears, this pair
    // localizes it — counts red ⇒ the timestamp bound/row set diverged;
    // counts green but q1_agg red ⇒ the aggregate value channel did.
    "q1_agg_counts" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val (ship, bound) = tsVs(li, "l_shipdate", "1995-09-02")
      li.filter(ship <= bound)
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // SURVEY §2.3 joins: broadcast dim (customer) + shuffle join (orders ⋈
    // lineitem on orderkey), agg + top-k. TPC-H Q3 shape.
    "q3_join" -> ((s, dir) => {
      import s.implicits._
      val cst = t(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
      val ord0 = t(s, dir, "orders")
      val (odate, obound) = tsVs(ord0, "o_orderdate", "1995-03-15")
      val ord = ord0.filter(odate < obound)
      val li0 = t(s, dir, "lineitem")
      val (ship, sbound) = tsVs(li0, "l_shipdate", "1995-03-15")
      val li = li0.filter(ship > sbound)
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cst), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // SURVEY §2.6 window functions: row_number partitioned rank.
    "q_window" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"o_orderpriority", $"rn", $"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderpriority", $"rn")
    }),

    // SURVEY §2.8 sort / top-k with deterministic tie-break.
    "q_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .orderBy($"p_retailprice".desc, $"p_partkey")
        .select($"p_partkey", $"p_name", $"p_retailprice")
        .limit(10)
    }),
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
        |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |           * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS sum_disc_price_e4,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1995-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q1_agg_counts" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1995-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue
        |FROM lineitem, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q_window" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q_topk" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin,
  )
}


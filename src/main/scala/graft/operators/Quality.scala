package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.Op
import graft.sources.Tables

/** Data-quality operators (reference: ecs/validation/validate_task.py).
  *
  * The reference validates each batch with pandas, single-node: required-column
  * presence (validate_task.py:153-159), per-column null counts (:161-177), and
  * cross-table referential integrity via `isin`-negation (:179-217). Re-expressed
  * Spark-first: null counts become one distributed aggregate pass (a single
  * partial+final HashAggregate — no per-column scans), FK checks become
  * `left_anti` joins (broadcast for small parents, shuffled otherwise — both fine
  * at 100 TB, where pandas would simply not run).
  *
  * The whole-batch accept/reject protocol (reject ALL files if any check fails,
  * SURVEY.md §2.2.6) lives in [[graft.pipeline.Validator]]; this module is the
  * per-check operator layer.
  */
object Quality {

  /** V1: required-column presence — schema-level, no job needed
    * (validate_task.py:153-159; contract :14-18).
    */
  def missingColumns(df: DataFrame, required: Seq[String]): Seq[String] = {
    val have = df.columns.toSet
    required.filterNot(have)
  }

  /** A5: per-column null counts in ONE pass (validate_task.py:168-177 does a
    * pandas `isnull().sum()`; here a single HashAggregate over all columns —
    * one scan regardless of column count).
    */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => count(when(col(c).isNull, lit(1))).as(s"${c}_nulls")): _*)

  /** J5: distinct child keys with no matching parent (validate_task.py:179-217
    * used pandas `~isin`; `left_anti` keeps the child distributed and lets
    * Catalyst/AQE pick broadcast vs shuffled anti-join by parent size).
    */
  def fkViolations(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .distinct()

  /** First-N violation report, deterministic (the reference reports the first 5
    * violating ids: validate_task.py:193-195).
    */
  def fkViolationReport(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String, n: Int = 5): DataFrame =
    fkViolations(child, childKey, parent, parentKey).orderBy(col(childKey)).limit(n)

  /** Table profile: row/null counts, min/max, exact distinct, and exact
    * quartiles of the quantity column — the "describe table" pass a pipeline
    * runs before training on a new corpus drop.
    *
    * Scale notes: everything except the quartiles is one distributed
    * aggregate. Exact `percentile` funnels the column through a single
    * reducer — fine for profiling runs; at 100 TB flip to
    * `approx_percentile` (t-digest, fully distributed) the same way
    * [[Analytics.dailyUniquesApprox]] swaps exact distinct for HLL.
    * Quartile determinism across engines: l_quantity holds small integers
    * and quartile positions have dyadic fractions, so the linear
    * interpolation is exact in IEEE arithmetic on both sides (no ULP drift).
    */
  def profileLineitem(li: DataFrame): DataFrame =
    li.agg(
      count(lit(1)).as("n_rows"),
      count(col("l_quantity")).as("n_qty"),
      (count(lit(1)) - count(col("l_quantity"))).as("n_qty_null"),
      min(col("l_quantity")).as("qty_min"),
      max(col("l_quantity")).as("qty_max"),
      countDistinct(col("l_returnflag")).as("n_flags"),
      expr("percentile(l_quantity, 0.25)").as("qty_p25"),
      expr("percentile(l_quantity, 0.5)").as("qty_p50"),
      expr("percentile(l_quantity, 0.75)").as("qty_p75"))

  /** Validate-while-writing: write `df` to parquet and collect row/null
    * metrics in the SAME pass via Spark's `Observation` API — the reference
    * validates with a separate read pass over the batch
    * (validate_task.py:161-177); observed metrics make that scan free (the
    * accumulators ride the write job). Returns the metric map once the
    * write commits; [[nullCounts]] remains the standalone-scan twin the
    * spec compares against.
    */
  def writeWithMetrics(df: DataFrame, cols: Seq[String], path: String): Map[String, Long] = {
    val obs = org.apache.spark.sql.Observation(s"graft_write_${System.nanoTime()}")
    val exprs = count(lit(1)).as("n_rows") +:
      cols.map(c => count(when(col(c).isNull, lit(1))).as(s"${c}_nulls"))
    df.observe(obs, exprs.head, exprs.tail: _*)
      .write.mode("overwrite").parquet(path)
    obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
  }

  /** Null-rate drift between two ingest periods — the schema-health monitor
    * a pipeline runs on every new data window ([[Analytics.priceDrift]]'s
    * value-distribution check, applied to nullability): per column, the
    * early/late null rates and their delta. A sudden null-rate jump is the
    * classic upstream-schema-change symptom. ONE aggregate pass over the
    * fact table (conditional sums, like [[nullCounts]]); rates are exact
    * integer counts under one IEEE division each.
    */
  def nullRateDrift(items: DataFrame, cols: Seq[String],
      splitDate: String = Analytics.driftSplitDate): DataFrame = {
    val early = col("created_at") < lit(splitDate).cast(
      org.apache.spark.sql.types.TimestampType)
    def cnt(e: org.apache.spark.sql.Column) = sum(when(e, 1L).otherwise(0L))
    def nulls(c: String, e: org.apache.spark.sql.Column) =
      sum(when(e && col(c).isNull, 1L).otherwise(0L))
    val rates = cols.flatMap { c =>
      Seq((nulls(c, early).cast("double") / cnt(early)).as(s"${c}_null_early"),
        (nulls(c, !early).cast("double") / cnt(!early)).as(s"${c}_null_late"))
    }
    val aggs = Seq(cnt(early).as("n_early"), cnt(!early).as("n_late")) ++ rates
    items
      .agg(aggs.head, aggs.tail: _*)
      .select(col("*") +: cols.map(c =>
        (col(s"${c}_null_late") - col(s"${c}_null_early")).as(s"${c}_null_drift")): _*)
  }

  /** Edit-distance threshold for [[fuzzyNamePairs]]. */
  val fuzzyTau = 2

  /** Entity resolution over a name catalog: candidate pairs of DISTINCT
    * names that share a blocking key (the last name token — "cold bolt" and
    * "old bolt" block together on "bolt") and verify at
    * `levenshtein ≤ [[fuzzyTau]]` — the blocked fuzzy-match join that
    * reconciles vendor catalogs / user-entered names, which the reference's
    * exact `isin` checks cannot express. Blocking is part of the contract
    * (as in every dedup op here); the spec brute-forces the fixture to show
    * the block loses nothing at this τ.
    *
    * Scale shape: entity resolution runs on the DISTINCT-name frame (one
    * hash agg collapses the table to its catalog, with min-key canonical
    * ids), then one equi-join on the block key; the verify is per-candidate
    * codegen. No all-pairs: pair work is bounded by block sizes, the
    * standard ER decomposition.
    */
  def fuzzyNamePairs(part: DataFrame, tau: Int = fuzzyTau): DataFrame = {
    val names = part.groupBy(col("p_name"))
      .agg(min(col("p_partkey")).as("pid"), count(lit(1)).as("n_parts"))
      .withColumn("block", element_at(split(col("p_name"), " "), -1))
    names.as("a").join(names.as("b"),
        col("a.block") === col("b.block") && col("a.p_name") < col("b.p_name"))
      .select(
        col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
        levenshtein(col("a.p_name"), col("b.p_name")).as("lev"),
        col("a.pid").as("pid_a"), col("b.pid").as("pid_b"),
        (col("a.n_parts") + col("b.n_parts")).as("n_parts_affected"))
      .filter(col("lev") <= tau)
  }

  // --------------------------------------------------------------------------
  // Registered ops + DuckDB oracles
  // --------------------------------------------------------------------------

  /** Benford first-digit expectation in parts-per-million — the published
    * log10(1 + 1/d) values as integer constants, so the runtime needs no
    * logarithm (the repo-wide no-`ln` rule; libm ULP drift would break the
    * oracle).
    */
  val benfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** Benford first-digit drift: observed leading-digit shares of a positive
    * numeric column vs Benford's law, with a χ²-form contribution per digit
    * — the classic fabricated/truncated-data detector. All integer: shares
    * on the ppm grid, contribution = (obs−exp)² div exp. The leading digit
    * comes from the decimal's string form (both engines render DECIMAL with
    * its full scale, so char 1 is identical); non-1..9 leads (values < 1)
    * are excluded on both sides. One narrow scan + a 9-row aggregate.
    */
  def benfordDrift(values: DataFrame, valueCol: String): DataFrame = {
    val spark = values.sparkSession
    import spark.implicits._
    val counts = values
      .select(substring(col(valueCol).cast(StringType), 1, 1).as("dg"))
      .filter(col("dg").between("1", "9"))
      .groupBy(col("dg")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("tot"))
    val exp = benfordPpm.toDF("digit", "benford_ppm")
    counts.select(col("dg").cast(IntegerType).as("digit"), col("n"))
      .join(broadcast(exp), "digit")
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"), expr("(n * 1000000) div tot").as("obs_ppm"),
        col("benford_ppm"))
      .select(col("digit"), col("n"), col("obs_ppm"), col("benford_ppm"),
        expr("((obs_ppm - benford_ppm) * (obs_ppm - benford_ppm)) div benford_ppm")
          .as("chi2_ppm"))
  }

  private val itemCols = Seq("order_id", "product_id", "sale_price", "returned_at", "created_at")

  /** Order-independent table content signature: COUNT plus BIT_XOR of a
    * per-row portable 60-bit hash over a canonical string rendering. THE
    * cheap replication/migration check at 100 TB — two copies of a table
    * compare by exchanging ONE row each, with no sort, no shuffle-to-one,
    * and no row ever leaving its partition (xor is commutative/associative,
    * so partial signatures combine map-side in any order). Caveats are the
    * contract: columns must be rendered identically on both engines (ints
    * and strings verbatim, dates via the fixed `yyyy-MM-dd` format under
    * the UTC session) and non-null — a null would collapse the whole row
    * string on one engine and skip a separator on the other.
    */
  def rowsChecksum(orders: DataFrame): DataFrame =
    orders
      .select(graft.functions.Portable.hash60(concat_ws("|",
        col("o_orderkey").cast(StringType), col("o_custkey").cast(StringType),
        col("o_orderstatus"), col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM-dd"))).as("h60"))
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h60)").as("xor_sig"))

  /** Declarative data-quality rule engine: a fixed battery of per-table
    * business rules evaluated in ONE aggregate pass per table — every rule
    * is a `sum(when(pred))` branch inside the same hash aggregate, then
    * `stack` melts the 1-row result to (rule, n_violations) long form — so
    * adding a rule never adds a scan (the validate-task generalization:
    * the reference hard-codes its checks as separate passes,
    * validate_task.py:14-317; a 100 TB audit can afford exactly one pass
    * per fact table). Zero-violation rules are REPORTED at zero — an
    * audit that silently drops clean rules can't prove it ran them.
    */
  def ruleViolations(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val li = lineitem.agg(
      count(lit(1)).as("n"),
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).as("v1"),
      sum(when(col("l_discount") >= 0.08, 1L).otherwise(0L)).as("v2"),
      sum(when(col("l_returnflag") === "R" && col("l_linestatus") === "O", 1L)
        .otherwise(0L)).as("v3"))
      .selectExpr(
        """stack(3,
          |  'item_quantity_out_of_range', v1,
          |  'item_discount_ge_8pct', v2,
          |  'item_returned_still_open', v3) AS (rule, n_violations)""".stripMargin,
        "n AS n_rows")
    val ord = orders.agg(
      count(lit(1)).as("n"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("v1"),
      sum(when(!col("o_orderstatus").isin("F", "O", "P"), 1L).otherwise(0L)).as("v2"),
      sum(when(col("o_orderdate") < lit("1992-01-01").cast("timestamp"), 1L)
        .otherwise(0L)).as("v3"))
      .selectExpr(
        """stack(3,
          |  'order_nonpositive_total', v1,
          |  'order_unknown_status', v2,
          |  'order_pre_epoch_date', v3) AS (rule, n_violations)""".stripMargin,
        "n AS n_rows")
    li.unionByName(ord)
      .withColumn("violation_ppm", expr("(n_violations * 1000000) div n_rows"))
  }

  /** k-anonymity threshold for [[kAnonymity]]. */
  val kAnonK = 5

  /** k-anonymity audit — the re-identification release gate an LLM-data
    * pipeline runs before publishing user-derived tables (companion to the
    * PII redaction op: redaction hides direct identifiers, this measures
    * QUASI-identifier risk). Quasi-identifier = (nation, market segment,
    * account-balance band of 1000); every QI equivalence class is reported
    * with its size and an `at_risk` flag (size < k ⇒ the class's members
    * are re-identifiable by joining public attributes). The downstream
    * release join suppresses or generalizes exactly the flagged classes.
    *
    * Plan: one hash aggregate at QI grain — map-side partials, no window,
    * no skew risk (class count is bounded by the QI domain, not row count).
    * `floor` before the BIGINT cast on both engines (DuckDB rounds,
    * Spark truncates — the documented cast gotcha).
    */
  def kAnonymity(customers: DataFrame, k: Int = kAnonK): DataFrame =
    customers.select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("group_size"))
      .withColumn("at_risk",
        when(col("group_size") < k, 1).otherwise(0))

  /** Minimum distinct sensitive values per QI class for [[lDiversity]]. */
  val lDiverseL = 2

  /** l-diversity audit — [[kAnonymity]]'s standard sibling: a QI class can
    * be large enough (k-anonymous) yet still leak when every member shares
    * the same SENSITIVE value (homogeneity attack: knowing someone is in
    * the class reveals their attribute). Quasi-identifier = (nation,
    * balance band); sensitive attribute = market segment; every class
    * reports its size, distinct sensitive-value count, and the
    * `homogeneous` flag (l < [[lDiverseL]]). A release suppresses or
    * generalizes classes flagged by EITHER audit. Same single QI-grain
    * hash-aggregate shape (countDistinct adds one dedup pass at class
    * grain, still bounded by the QI domain).
    */
  def lDiversity(customers: DataFrame, l: Int = lDiverseL): DataFrame =
    customers.select(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .groupBy(col("c_nationkey"), col("bal_band"))
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col("c_mktsegment")).as("l_distinct"))
      .withColumn("homogeneous",
        when(col("l_distinct") < l, 1).otherwise(0))

  /** Keys reported by [[joinSkew]]. */
  val joinSkewTopK = 10

  /** Join-key skew diagnostic: the [[joinSkewTopK]] hottest keys of a join
    * column with each key's row share (ppm) and its skew-vs-mean ratio on
    * the ×1000 grid (`skew_x1000 = cnt·n_keys/total`; 1000 = perfectly
    * uniform) — the numbers read before choosing salting, broadcast, or AQE
    * skew-join for a 100 TB join. Per-key counts are one hash aggregate;
    * the top-k is Spark's distributed TakeOrdered over key-grain rows
    * (never a full sort); totals ride a broadcast 1-row frame; the
    * rank window orders ≤ topK rows.
    */
  def joinSkew(df: DataFrame, keyCol: String, topK: Int = joinSkewTopK): DataFrame = {
    val k = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    val tot = k.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"))
    k.orderBy(col("cnt").desc, col("key")).limit(topK)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("key"))).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"), col("rank"), col("n_keys"), col("total"),
        expr("(cnt * 1000000) div total").as("share_ppm"),
        expr("(cnt * 1000 * n_keys) div total").as("skew_x1000"))
  }

  def ops: Seq[Op] = Seq(
    Op.sql("quality_l_diversity",
      s"""SELECT c_nationkey,
         |       CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         |       COUNT(*) AS group_size,
         |       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l_distinct,
         |       CAST(CASE WHEN COUNT(DISTINCT c_mktsegment) < $lDiverseL
         |                 THEN 1 ELSE 0 END AS INTEGER) AS homogeneous
         |FROM customer
         |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      lDiversity(Tables.customer(s, d))
    },

    Op.sql("quality_k_anonymity",
      s"""SELECT c_nationkey, c_mktsegment,
         |       CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         |       COUNT(*) AS group_size,
         |       CAST(CASE WHEN COUNT(*) < $kAnonK THEN 1 ELSE 0 END AS INTEGER) AS at_risk
         |FROM customer
         |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      kAnonymity(Tables.customer(s, d))
    },

    // One-pass-per-table declarative rule battery, zero rules reported.
    Op.sql("quality_rule_violations",
      """WITH li AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |         CAST(SUM(CASE WHEN l_discount >= 0.08 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS v2,
        |         CAST(SUM(CASE WHEN l_returnflag = 'R' AND l_linestatus = 'O'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v3
        |  FROM lineitem),
        |ord AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS v1,
        |         CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v2,
        |         CAST(SUM(CASE WHEN CAST(o_orderdate AS TIMESTAMP)
        |                            < TIMESTAMP '1992-01-01'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v3
        |  FROM orders),
        |long AS (
        |  SELECT 'item_quantity_out_of_range' AS rule, v1 AS n_violations, n AS n_rows FROM li
        |  UNION ALL SELECT 'item_discount_ge_8pct', v2, n FROM li
        |  UNION ALL SELECT 'item_returned_still_open', v3, n FROM li
        |  UNION ALL SELECT 'order_nonpositive_total', v1, n FROM ord
        |  UNION ALL SELECT 'order_unknown_status', v2, n FROM ord
        |  UNION ALL SELECT 'order_pre_epoch_date', v3, n FROM ord)
        |SELECT rule, n_violations, n_rows,
        |       (n_violations * 1000000) // n_rows AS violation_ppm
        |FROM long""".stripMargin) { (s, d) =>
      ruleViolations(Tables.lineitem(s, d), Tables.orders(s, d))
    },

    // Order-independent content signature of the orders table.
    Op.sql("quality_rows_checksum",
      """WITH h AS (
        |  SELECT CAST(('0x'||substr(md5(
        |           CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
        |           || '|' || o_orderstatus || '|' || o_orderpriority || '|' ||
        |           strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')), 1, 15))
        |         AS BIGINT) AS h60
        |  FROM orders)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
        |       CAST(bit_xor(h60) AS BIGINT) AS xor_sig
        |FROM h""".stripMargin) { (s, d) =>
      rowsChecksum(Tables.orders(s, d))
    },
    // Benford leading-digit drift over order totals.
    Op.sql("quality_benford_prices", {
      val values = benfordPpm.map { case (d, p) => s"($d, $p)" }.mkString(", ")
      s"""WITH c AS (
         |  SELECT dg, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM (SELECT substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS dg FROM orders)
         |  WHERE dg BETWEEN '1' AND '9' GROUP BY dg),
         |t AS (SELECT SUM(n) AS tot FROM c),
         |b(digit, benford_ppm) AS (VALUES $values),
         |j AS (
         |  SELECT CAST(c.dg AS INTEGER) AS digit, c.n,
         |         (c.n * 1000000) // t.tot AS obs_ppm, b.benford_ppm
         |  FROM c JOIN b ON CAST(c.dg AS INTEGER) = b.digit CROSS JOIN t)
         |SELECT digit, n, CAST(obs_ppm AS BIGINT) AS obs_ppm,
         |       CAST(benford_ppm AS BIGINT) AS benford_ppm,
         |       CAST(((obs_ppm - benford_ppm) * (obs_ppm - benford_ppm))
         |            // benford_ppm AS BIGINT) AS chi2_ppm
         |FROM j""".stripMargin
    }) { (s, d) =>
      benfordDrift(Tables.orders(s, d), "o_totalprice")
    },
    Op.sql("quality_null_counts_items",
      s"""${Tables.domainCtes}
         |SELECT ${itemCols.map(c => s"COUNT(CASE WHEN $c IS NULL THEN 1 END) AS ${c}_nulls").mkString(", ")}
         |FROM order_items""".stripMargin) { (s, d) =>
      nullCounts(Tables.orderItems(s, d), itemCols)
    },

    // Expected-clean FK: every order_items.order_id exists in orders → 0 rows.
    Op.sql("quality_fk_items_orders",
      s"""${Tables.domainCtes}
         |SELECT DISTINCT i.order_id FROM order_items i
         |WHERE NOT EXISTS (SELECT 1 FROM orders_v o WHERE o.order_id = i.order_id)""".stripMargin) { (s, d) =>
      fkViolations(Tables.orderItems(s, d), "order_id", Tables.ordersDomain(s, d), "order_id")
    },

    Op.sql("quality_fk_items_products",
      s"""${Tables.domainCtes}
         |SELECT DISTINCT i.product_id FROM order_items i
         |WHERE NOT EXISTS (SELECT 1 FROM products p WHERE p.id = i.product_id)""".stripMargin) { (s, d) =>
      fkViolations(Tables.orderItems(s, d), "product_id", Tables.products(s, d), "id")
    },

    Op.sql("profile_lineitem",
      """SELECT COUNT(*) AS n_rows, COUNT(l_quantity) AS n_qty,
        |       COUNT(*) - COUNT(l_quantity) AS n_qty_null,
        |       MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max,
        |       COUNT(DISTINCT l_returnflag) AS n_flags,
        |       quantile_cont(l_quantity, 0.25) AS qty_p25,
        |       quantile_cont(l_quantity, 0.5) AS qty_p50,
        |       quantile_cont(l_quantity, 0.75) AS qty_p75
        |FROM lineitem""".stripMargin) { (s, d) =>
      profileLineitem(Tables.lineitem(s, d))
    },

    Op.sql("quality_null_drift_items", {
      val cs = Seq("returned_at", "sale_price")
      val rateSql = cs.flatMap { c =>
        Seq(
          s"CAST(SUM(CASE WHEN early AND $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / SUM(CASE WHEN early THEN 1 ELSE 0 END) AS ${c}_null_early",
          s"CAST(SUM(CASE WHEN NOT early AND $c IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / SUM(CASE WHEN NOT early THEN 1 ELSE 0 END) AS ${c}_null_late")
      }.mkString(",\n       ")
      val driftSql = cs.map(c => s"${c}_null_late - ${c}_null_early AS ${c}_null_drift")
        .mkString(", ")
      s"""${Tables.domainCtes},
         |b AS (SELECT *, created_at < TIMESTAMP '${Analytics.driftSplitDate}' AS early
         |      FROM order_items),
         |r AS (
         |  SELECT CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS n_early,
         |         CAST(SUM(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
         |       $rateSql
         |  FROM b)
         |SELECT *, $driftSql FROM r""".stripMargin
    }) { (s, d) =>
      nullRateDrift(Tables.orderItems(s, d), Seq("returned_at", "sale_price"))
    },

    Op.sql("quality_fuzzy_part_pairs",
      s"""WITH names AS (
         |  SELECT p_name, MIN(p_partkey) AS pid, COUNT(*) AS n_parts,
         |         string_split(p_name, ' ')[-1] AS block
         |  FROM part GROUP BY p_name),
         |cand AS (
         |  SELECT a.p_name AS name_a, b.p_name AS name_b,
         |         levenshtein(a.p_name, b.p_name) AS lev,
         |         a.pid AS pid_a, b.pid AS pid_b,
         |         a.n_parts + b.n_parts AS n_parts_affected
         |  FROM names a JOIN names b
         |    ON a.block = b.block AND a.p_name < b.p_name)
         |SELECT name_a, name_b, CAST(lev AS INTEGER) AS lev, pid_a, pid_b,
         |       n_parts_affected
         |FROM cand WHERE lev <= $fuzzyTau""".stripMargin) { (s, d) =>
      fuzzyNamePairs(Tables.part(s, d))
    },

    // Violating FK with a real payoff: events.user_id is not constrained to
    // customers — exercises the non-empty branch + first-5 report shape.
    Op.sql("quality_fk_report_event_users",
      // NULLS FIRST pins DuckDB to Spark's default asc ordering, so the
      // LIMIT picks the same set even if null child keys ever appear
      """SELECT DISTINCT e.user_id FROM events e
        |WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
        |ORDER BY e.user_id NULLS FIRST LIMIT 5""".stripMargin) { (s, d) =>
      fkViolationReport(Tables.events(s, d), "user_id", Tables.customer(s, d), "c_custkey")
    },

    // Hottest join keys + skew-vs-mean ratio: the salting/AQE decision input.
    Op.sql("quality_join_skew",
      s"""WITH k AS (SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt
         |           FROM events GROUP BY user_id),
         |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         |               CAST(SUM(cnt) AS BIGINT) AS total FROM k)
         |SELECT key, cnt, CAST(rank AS BIGINT) AS rank, n_keys, total,
         |  CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
         |  CAST((cnt * 1000 * n_keys) // total AS BIGINT) AS skew_x1000
         |FROM (SELECT key, cnt,
         |        ROW_NUMBER() OVER (ORDER BY cnt DESC, key NULLS FIRST) AS rank
         |      FROM k) r, tot
         |WHERE rank <= $joinSkewTopK""".stripMargin) { (s, d) =>
      joinSkew(Tables.events(s, d), "user_id")
    },
  )
}

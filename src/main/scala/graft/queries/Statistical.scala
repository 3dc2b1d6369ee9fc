package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.QueryDef
import graft.sources.Tables

/** Statistical / analytic breadth beyond [[Analytic]]: distribution
  * statistics, exact percentiles, pivot, lateral explode with outer
  * semantics, GROUPING SETS, correlated + scalar subqueries, the
  * extended string library, and a generated date spine.
  *
  * The reference reaches these through its embedded-SQL surface
  * (`dags/tutorial_objectstorage.py:118-120` — arbitrary analytic SQL
  * over loaded parquet) and its reporting DAGs' summary steps
  * (`dags/sql/sample.sql:20-24`). Each row is a declarative Catalyst
  * plan (or `spark.sql` over the registered catalog — same plan space)
  * with a DuckDB oracle twin.
  *
  * Cross-engine determinism notes:
  *   - double-valued statistics (stddev/corr/percentile) are rounded at
  *     the output boundary: summation order may differ between engines
  *     and partitions, so the raw last ulp is not comparable. Rounding
  *     precision is chosen per column so the rounding slack (~1e-4
  *     relative) dwarfs double accumulation error (~1e-12 relative);
  *   - skewness/kurtosis are deliberately absent from the oracle rows:
  *     Spark computes population (g1/g2) moments while DuckDB
  *     bias-corrects, so their values legitimately differ;
  *   - Spark `percentile` and DuckDB `quantile_cont` both implement
  *     type-7 linear interpolation, so exact quantiles DO match.
  */
object Statistical {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact-at-every-sf decimal→double cast for a scale-4 moment sum
    * (q45): quantize the sum's SCALED integer (x·10^4 — exact, it is
    * the decimal's own representation) to 15 significant digits —
    * mantissa < 10^15 < 2^53 — with arithmetic BOTH engines perform
    * exactly, then rebuild the double from that mantissa. Steps
    * (x ≥ 0, as every moment sum here is):
    *
    *   1. I = (x·10^4) cast to an integer decimal — exact, the
    *      fraction is zero by construction;
    *   2. d = digit count of I, via a string length — exact;
    *   3. j = max(0, d − 15), the digits to drop (j = 0 at small sf:
    *      nothing is lost until I itself approaches 2^53);
    *   4. K = floor(I / 10^j), spelled I − (I % 10^j) then an exact
    *      decimal division whose quotient is integral (so the
    *      engine's result-scale rounding never fires) — the oracle
    *      spells the same K as a HUGEINT floor-division, an identity
    *      for non-negative I;
    *   5. K casts to double exactly (K < 2^53); K·10^j is ONE IEEE
    *      multiply of exact operands (10^j is representable for
    *      j ≤ 22 — sums to 10^33, far past any sf) and the final
    *      /10^4.0 is ONE IEEE divide — both correctly rounded, hence
    *      bit-identical across engines.
    *
    * Relative quantization error ≤ 10^-14 — far below the output
    * round() slack — and in exchange the cast stops depending on any
    * engine's >2^53 decimal→double rounding path. Oracle twin:
    * [[quantCastSql]]. */
  private def quantCast(c: Column): Column = {
    val i = (c * lit(10000)).cast(DecimalType(38, 0))
    val d = length(i.cast("string"))
    val j = greatest(lit(0), d - lit(15))
    val p = pow(lit(10.0), j).cast(DecimalType(38, 0))
    val k = ((i - i % p) / p).cast(DecimalType(38, 0))
    // exactness guard: step 5 needs 10^j double-exact, which holds
    // only for j <= 22 (scaled sums < 10^37 — sf ~10^9 territory).
    // Past that the claim would silently degrade to approximate and
    // the Spark/DuckDB pow paths could diverge — fail LOUDLY instead
    // (the when-branch keeps the guard inside codegen; it never fires
    // at any reachable sf, so the happy path is unchanged)
    // NULL propagates FIRST: length(NULL) makes the digit guard NULL,
    // and CaseWhen would fall through to the error branch — an empty
    // or all-NULL group must stay NULL, not abort the query
    when(c.isNull, lit(null).cast("double"))
      .when(d <= lit(37),
        k.cast("double") * pow(lit(10.0), j) / lit(10000.0))
      .otherwise(raise_error(lit(
        "quantCast: scaled sum has > 37 digits — 10^j is no longer " +
          "double-exact and the cross-engine exactness guarantee is " +
          "void; widen the quantization budget before trusting this sf")))
  }

  /** DuckDB spelling of [[quantCast]] over pre-computed helper columns
    * `i_<name>` = CAST(x * 10000 AS HUGEINT) and `j_<name>` =
    * greatest(0, length(i) - 15): HUGEINT floor-division by 10^j, the
    * exact cast, and the same multiply-then-divide tail. */
  private def quantCastSql(name: String): String =
    s"CAST(i_$name // CAST(power(10, j_$name) AS HUGEINT) AS DOUBLE) " +
      s"* power(10, j_$name) / 10000.0"

  private def sql(q: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    (spark, dir) => { Tables.registerAll(spark, dir); spark.sql(q) }

  val defs: Seq[QueryDef] = Seq(

    // ----- A5/F14: distribution statistics per group -----
    // One partial-aggregated shuffle on the 3-value group key. The
    // MOMENT statistics (stddev/var/corr/covar) are built from EXACT
    // DECIMAL sums (n, Σq, Σq², Σp, Σp², Σqp — quantities and prices
    // are DECIMALs, their products and sums are exact and
    // order-independent) and finished with ONE mirrored double
    // expression per statistic: the engines' native covar_samp/corr
    // sum doubles in their own partition orders, and a 1-ulp Σ
    // difference flips a rounding boundary — found REAL at sf0.001,
    // where covar_qp landed on ....245 and the two engines rounded
    // 2dp apart. The exact-sums spelling trades the numerically-
    // stabler streaming M2 for bit-reproducibility. The decimal→double
    // casts themselves are made EXACT at every sf by [[quantCast]]:
    // n, sq and sp stay below 2^53 in scaled-integer form far past
    // sf1000 so their casts are exact as-is, while sq2/sp2/sqp (whose
    // scaled integers pass 2^53 around sf0.1) are first quantized to a
    // 15-significant-digit budget through mirrored exact integer
    // arithmetic — after which both engines cast the identical
    // sub-2^53 mantissa and every downstream double op is bitwise
    // deterministic. No empirical cast-coincidence remains in this
    // query. Exact percentiles collect
    // per-group value sketches (ObjectHashAggregate) and interpolate
    // deterministically from sorted decimals, so they stay native; at
    // 100 TB prefer approx_percentile unless exactness is required.
    QueryDef(
      "q45_stats",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        val sums = li.groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("l_quantity")).as("sq"),
            sum(col("l_quantity") * col("l_quantity")).as("sq2"),
            sum(col("l_extendedprice")).as("sp"),
            sum(col("l_extendedprice") * col("l_extendedprice")).as("sp2"),
            sum(col("l_quantity") * col("l_extendedprice")).as("sqp"),
            percentile(col("l_quantity"), lit(0.25)).as("p25"),
            percentile(col("l_quantity"), lit(0.75)).as("p75"),
            // LOWER (type-1) median — the value at rank ⌈n/2⌉, an
            // ACTUAL price, always an exact 2-decimal number. The
            // interpolated even-count median is the midpoint of two
            // prices — a 3-decimal .xx5 value whose double sits a hair
            // under the boundary, and the engines' round() semantics
            // disagree exactly there (Spark rounds the shortest
            // decimal representation HALF_UP; DuckDB multiplies by
            // 10^d first, which can carry the value ONTO the
            // boundary) — found REAL at sf0.001 (52724.245).
            // l_quantity's p25/p75 stay interpolated: quarter
            // positions between decimal quantities are exact in
            // binary, so no boundary exists there.
            element_at(sort_array(collect_list(col("l_extendedprice"))),
              ((size(collect_list(col("l_extendedprice"))) + 1) / 2)
                .cast("int")).as("med"))
        // the three >2^53-hazard sums go through the exact quantized
        // cast; n/sq/sp cast exactly as-is (sub-2^53 scaled integers)
        val casted = sums.select(col("l_returnflag"),
          col("n").cast("double").as("nd"),
          col("sq").cast("double").as("sqd"),
          col("sp").cast("double").as("spd"),
          quantCast(col("sq2")).as("sq2d"),
          quantCast(col("sp2")).as("sp2d"),
          quantCast(col("sqp")).as("sqpd"),
          col("p25"), col("p75"), col("med"))
        val mq = col("sq2d") - col("sqd") * col("sqd") / col("nd")
        val mp = col("sp2d") - col("spd") * col("spd") / col("nd")
        val mqp = col("sqpd") - col("sqd") * col("spd") / col("nd")
        casted.select(col("l_returnflag"),
          round(sqrt(mq / (col("nd") - 1)), 4).as("sd_qty"),
          round(mq / (col("nd") - 1), 4).as("var_qty"),
          round(sqrt(mq / col("nd")), 4).as("sdp_qty"),
          round(mqp / sqrt(mq * mp), 6).as("corr_qp"),
          round(mqp / (col("nd") - 1), 2).as("covar_qp"),
          round(col("p25"), 4).as("p25_qty"),
          round(col("p75"), 4).as("p75_qty"),
          col("med").cast("double").as("med_price"))
      },
      Some(s"""
        WITH s0 AS (
          SELECT l_returnflag,
                 count(*) AS n0,
                 sum(l_quantity) AS sq0,
                 sum(l_quantity * l_quantity) AS sq20,
                 sum(l_extendedprice) AS sp0,
                 sum(l_extendedprice * l_extendedprice) AS sp20,
                 sum(l_quantity * l_extendedprice) AS sqp0,
                 quantile_cont(l_quantity, 0.25) AS p25,
                 quantile_cont(l_quantity, 0.75) AS p75
          FROM lineitem GROUP BY l_returnflag),
        -- quantCast twin: exact integer part + digits-to-drop per
        -- >2^53-hazard sum (see quantCast's scaladoc)
        s1 AS (
          SELECT *,
                 CAST(sq20 * 10000 AS HUGEINT) AS i_sq2,
                 CAST(sp20 * 10000 AS HUGEINT) AS i_sp2,
                 CAST(sqp0 * 10000 AS HUGEINT) AS i_sqp
          FROM s0),
        s2 AS (
          SELECT *,
                 greatest(0, length(CAST(i_sq2 AS VARCHAR)) - 15) AS j_sq2,
                 greatest(0, length(CAST(i_sp2 AS VARCHAR)) - 15) AS j_sp2,
                 greatest(0, length(CAST(i_sqp AS VARCHAR)) - 15) AS j_sqp
          FROM s1),
        s AS (
          SELECT l_returnflag,
                 CAST(n0 AS DOUBLE) AS n,
                 CAST(sq0 AS DOUBLE) AS sq,
                 ${quantCastSql("sq2")} AS sq2,
                 CAST(sp0 AS DOUBLE) AS sp,
                 ${quantCastSql("sp2")} AS sp2,
                 ${quantCastSql("sqp")} AS sqp,
                 p25, p75
          FROM s2),
        md AS (
          SELECT l_returnflag, min(v) AS med FROM (
            SELECT l_returnflag, l_extendedprice AS v,
                   row_number() OVER (PARTITION BY l_returnflag
                                      ORDER BY l_extendedprice) AS rn,
                   count(*) OVER (PARTITION BY l_returnflag) AS n
            FROM lineitem)
          WHERE 2 * rn >= n GROUP BY l_returnflag)
        SELECT s.l_returnflag,
               round(sqrt((sq2 - sq * sq / n) / (n - 1)), 4) AS sd_qty,
               round((sq2 - sq * sq / n) / (n - 1), 4) AS var_qty,
               round(sqrt((sq2 - sq * sq / n) / n), 4) AS sdp_qty,
               round((sqp - sq * sp / n) / sqrt((sq2 - sq * sq / n) * (sp2 - sp * sp / n)), 6) AS corr_qp,
               round((sqp - sq * sp / n) / (n - 1), 2) AS covar_qp,
               round(p25, 4) AS p25_qty,
               round(p75, 4) AS p75_qty,
               CAST(md.med AS DOUBLE) AS med_price
        FROM s JOIN md USING (l_returnflag)""")),

    // ----- A5: pivot (wide conditional aggregation) -----
    // Explicit value list (A/N/R) keeps the plan a single aggregate —
    // no discovery pass — and makes the output schema static, which is
    // what you want at scale (pivot without values = extra distinct job).
    QueryDef(
      "q46_pivot",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        li.groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(dec(col("l_quantity"))).cast("double"))
      },
      Some("""
        SELECT l_linestatus,
               CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "A",
               CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "N",
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "R"
        FROM lineitem
        GROUP BY l_linestatus""")),

    // ----- F12/O1: positional explode with OUTER semantics -----
    // posexplode_outer keeps rows whose array is empty (pos/tok NULL) —
    // the lateral-view shape the reference's map-iteration step implies
    // when a document has no matching tokens. Narrow transform: no
    // shuffle, generator runs inside the scan stage.
    QueryDef(
      "q47_explode_pos",
      (spark, dir) => {
        val docs = Tables.load(spark, dir, "documents")
        val zs = filter(split(col("text"), " "), w => startswith(w, lit("z")))
        docs.filter(col("doc_id") < 200)
          .select(col("doc_id"), posexplode_outer(zs).as(Seq("pos", "tok")))
      },
      Some("""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> starts_with(w, 'z')) AS arr
          FROM documents WHERE doc_id < 200)
        SELECT doc_id, NULL::INT AS pos, NULL::VARCHAR AS tok FROM t WHERE len(arr) = 0
        UNION ALL
        SELECT doc_id, unnest(range(len(arr)))::INT AS pos, unnest(arr) AS tok
        FROM t WHERE len(arr) > 0""")),

    // ----- A5: GROUPING SETS with grouping() markers -----
    // Sentinel coalescing alone is ambiguous when a real group value
    // could equal the sentinel; grouping() disambiguates. Spark expands
    // grouping sets via a single Expand + one aggregate — one shuffle.
    QueryDef(
      "q48_grouping_sets",
      sql("""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""),
      Some("""
        SELECT coalesce(l_returnflag, 'ALL') AS flag,
               coalesce(l_linestatus, 'ALL') AS status,
               CAST(grouping(l_returnflag) AS INT) AS g_flag,
               CAST(grouping(l_linestatus) AS INT) AS g_status,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""")),

    // ----- J2/P6: correlated EXISTS / NOT EXISTS + scalar subquery -----
    // Catalyst rewrites EXISTS → left-semi and NOT EXISTS → left-anti
    // joins; the scalar subquery becomes a broadcast single-row plan.
    // Same physical shape as q09, reached from the SQL surface.
    QueryDef(
      "q49_subqueries",
      sql("""
        SELECT c_custkey, 'big_spender' AS tag FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        UNION ALL
        SELECT c_custkey, 'quiet' AS tag FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND c_acctbal <= (SELECT avg(c_acctbal) FROM customer)"""),
      Some("""
        SELECT c_custkey, 'big_spender' AS tag FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        UNION ALL
        SELECT c_custkey, 'quiet' AS tag FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
          AND c_acctbal <= (SELECT avg(c_acctbal) FROM customer)""")),

    // ----- F14: extended string library (edit distance, translate, …) -----
    QueryDef(
      "q50_strings2",
      (spark, dir) => {
        val p = Tables.load(spark, dir, "part")
        p.filter(col("p_partkey") < 500)
          .select(
            col("p_partkey"),
            levenshtein(col("p_brand"), col("p_type")).as("edit_dist"),
            translate(col("p_name"), "aeiou", "AEIOU").as("name_tr"),
            expr("split_part(p_name, ' ', 1)").as("first_word"),
            instr(col("p_name"), "o").as("first_o"),
            expr("repeat('*', p_size % 4)").as("stars"),
            reverse(col("p_brand")).as("brand_rev"))
      },
      Some("""
        SELECT p_partkey,
               levenshtein(p_brand, p_type) AS edit_dist,
               translate(p_name, 'aeiou', 'AEIOU') AS name_tr,
               split_part(p_name, ' ', 1) AS first_word,
               strpos(p_name, 'o') AS first_o,
               repeat('*', p_size % 4) AS stars,
               reverse(p_brand) AS brand_rev
        FROM part
        WHERE p_partkey < 500""")),

    // ----- F7/F12: generated date spine + zero-preserving daily counts -----
    // sequence() generates the spine from the observed [min, max] date
    // range (single-row aggregate); the left join keeps days with no
    // events at 0 — the gap-filling shape every reporting DAG needs.
    // The broadcast hint goes on `daily` (the build/right side of the
    // left outer join — Spark cannot build on the preserved side, so a
    // hint there is silently dropped): daily is O(days) rows even at
    // 100 TB, so the join never shuffles either input.
    QueryDef(
      "q51_date_spine",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val bounds = e.agg(
          min(to_date(col("ts"))).as("lo"), max(to_date(col("ts"))).as("hi"))
        val spine = bounds.select(
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
        val daily = e.groupBy(to_date(col("ts")).as("d"))
          .agg(count(lit(1)).as("n_events"))
        spine.join(broadcast(daily), Seq("d"), "left")
          .select(col("d"), coalesce(col("n_events"), lit(0L)).as("n_events"))
      },
      Some("""
        WITH b AS (SELECT min(CAST(ts AS DATE)) AS lo, max(CAST(ts AS DATE)) AS hi
                   FROM events),
             spine AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS d
                       FROM b),
             daily AS (SELECT CAST(ts AS DATE) AS d, count(*) AS n_events
                       FROM events GROUP BY 1)
        SELECT spine.d, coalesce(daily.n_events, 0) AS n_events
        FROM spine LEFT JOIN daily USING (d)""")),

    // ----- W1: distribution window functions + positional values -----
    // Total per-partition order (price desc, key asc) so ntile/nth_value
    // never depend on partitioning; percent_rank/cume_dist rounded at
    // the boundary (double ratios).
    QueryDef(
      "q58_window_dist",
      (spark, dir) => {
        val o = Tables.load(spark, dir, "orders")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val wFull = w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)
        o.select(
          col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("nt"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"),
          first_value(col("o_orderkey")).over(w).as("top_key"),
          last_value(col("o_orderkey")).over(wFull).as("bottom_key"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               ntile(4) OVER w AS nt,
               round(percent_rank() OVER w, 6) AS pr,
               round(cume_dist() OVER w, 6) AS cd,
               nth_value(o_orderkey, 2) OVER wf AS second_key,
               first_value(o_orderkey) OVER w AS top_key,
               last_value(o_orderkey) OVER wf AS bottom_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
               wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""")),

    // ----- A5/F12: unpivot (wide → long, the inverse of q46's pivot) -----
    QueryDef(
      "q59_unpivot",
      (spark, dir) => {
        val li = Tables.load(spark, dir, "lineitem")
        val wide = li.groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(count(lit(1)))
        wide.unpivot(Array(col("l_linestatus")),
          Array(col("A"), col("N"), col("R")), "flag", "n")
      },
      Some("""
        WITH agg AS (
          SELECT l_linestatus,
                 CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 END) AS BIGINT) AS "A",
                 CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 END) AS BIGINT) AS "N",
                 CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT) AS "R"
          FROM lineitem GROUP BY 1)
        SELECT l_linestatus, flag, n
        FROM agg UNPIVOT (n FOR flag IN ("A", "N", "R"))""")),

    // ----- F11/F14: higher-order array functions -----
    // transform/filter/exists/forall/aggregate/zip_with — the lambda
    // surface. Array outputs are string-joined at the boundary (array
    // rendering differs across engines; strings don't). Narrow
    // projection: no shuffle, all lambdas run inside the scan stage.
    QueryDef(
      "q60_array_hof",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val t = split(col("text"), " ")
        d.filter(col("doc_id") < 50).select(
          col("doc_id"),
          concat_ws("-", transform(slice(t, 1, 3), w => upper(w))).as("up3"),
          size(filter(t, w => length(w) > 4)).as("n_long"),
          exists(t, w => startswith(w, lit("z"))).as("has_z"),
          forall(t, w => w.rlike("^[a-z]+$")).as("all_alpha"),
          aggregate(t, lit(0L), (acc, w) => acc + length(w)).as("total_chars"),
          concat_ws("|", zip_with(sequence(lit(1), lit(3)), slice(t, 1, 3),
            (i, w) => concat(i.cast("string"), lit(":"), w))).as("indexed3"))
      },
      Some("""
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                   FROM documents WHERE doc_id < 50)
        SELECT doc_id,
               array_to_string(list_transform(w[1:3], x -> upper(x)), '-') AS up3,
               CAST(len(list_filter(w, x -> length(x) > 4)) AS INT) AS n_long,
               len(list_filter(w, x -> starts_with(x, 'z'))) > 0 AS has_z,
               len(list_filter(w, x -> NOT regexp_matches(x, '^[a-z]+$'))) = 0 AS all_alpha,
               list_reduce(
                 list_prepend(0::BIGINT, list_transform(w, x -> length(x)::BIGINT)),
                 (acc, x) -> acc + x) AS total_chars,
               array_to_string(list_transform([1, 2, 3],
                 i -> i::VARCHAR || ':' || w[i]), '|') AS indexed3
        FROM t""")),

    // ----- F12/F13: map transforms (filter / transform_values /
    // concat / from_entries), exploded to rows at the boundary -----
    // The map pipeline runs entirely inside one narrow projection; the
    // explode is the only generator. DuckDB has no map lambdas, so the
    // oracle works on the exploded entry set — same observable rows.
    QueryDef(
      "q62_map_functions",
      (spark, dir) => {
        val e = Tables.load(spark, dir, "events")
        val m = from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>"))
        val big = map_filter(m, (_, v) => v > 50)
        val doubled = transform_values(big, (_, v) => v * 2)
        val tagged = map_concat(doubled,
          map_from_entries(array(struct(lit("event_id"), col("event_id")))))
        e.filter(col("event_id") < 500)
          .select(col("event_id"), explode(tagged).as(Seq("k", "v")))
      },
      Some("""
        WITH entries AS (
          SELECT event_id,
                 unnest(json_keys(props)) AS k,
                 CAST(json_extract_string(props, '$.' ||
                   unnest(json_keys(props))) AS BIGINT) AS v
          FROM events WHERE event_id < 500)
        SELECT event_id, k, v * 2 AS v FROM entries WHERE v > 50
        UNION ALL
        SELECT event_id, 'event_id' AS k, event_id AS v
        FROM events WHERE event_id < 500""")),

    // ----- A5/W1: FILTER-clause aggregates + lag default + IGNORE NULLS -----
    // Conditional aggregation without CASE-wrapping every argument, a
    // defaulted lag, and gap-filling navigation (last non-null purchase
    // value seen so far per user). Window order is total (ts, event_id).
    QueryDef(
      "q63_filter_ignore_nulls",
      sql("""
        SELECT e.event_id, e.user_id,
               lag(e.value, 1, -1.0) OVER w AS prev_or_default,
               last_value(CASE WHEN e.event_type = 'purchase' THEN e.value END)
                 IGNORE NULLS OVER w AS last_purchase,
               a.n_big, a.n
        FROM events e
        JOIN (SELECT user_id,
                     count(*) AS n,
                     count(*) FILTER (WHERE value > 50) AS n_big
              FROM events GROUP BY user_id) a
          ON e.user_id = a.user_id
        WHERE e.event_id < 1000
        WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)"""),
      Some("""
        SELECT e.event_id, e.user_id,
               lag(e.value, 1, -1.0) OVER w AS prev_or_default,
               last_value(CASE WHEN e.event_type = 'purchase' THEN e.value END
                 IGNORE NULLS) OVER w AS last_purchase,
               a.n_big, a.n
        FROM events e
        JOIN (SELECT user_id,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(count(*) FILTER (value > 50) AS BIGINT) AS n_big
              FROM events GROUP BY user_id) a
          ON e.user_id = a.user_id
        WHERE e.event_id < 1000
        WINDOW w AS (PARTITION BY e.user_id ORDER BY e.ts, e.event_id)""")),

    // ----- Recursive CTE (Spark 4): month spine + zero-preserving counts -----
    // The iterative-generation alternative to q51's sequence() spine.
    // Recursion depth = number of months (bounded, well under the
    // engine's recursion limit); each step is one incremental union.
    QueryDef(
      "q64_recursive_cte",
      sql("""
        WITH RECURSIVE months(m) AS (
          SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) FROM orders
          UNION ALL
          SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM months
          WHERE m < (SELECT CAST(date_trunc('month', max(o_orderdate)) AS DATE)
                     FROM orders)
        )
        SELECT m, count(o_orderkey) AS n
        FROM months LEFT JOIN orders
          ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY m"""),
      Some("""
        WITH RECURSIVE months(m) AS (
          SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) FROM orders
          UNION ALL
          SELECT CAST(m + INTERVAL 1 MONTH AS DATE) FROM months
          WHERE m < (SELECT CAST(date_trunc('month', max(o_orderdate)) AS DATE)
                     FROM orders)
        )
        SELECT m, count(o_orderkey) AS n
        FROM months LEFT JOIN orders
          ON CAST(date_trunc('month', o_orderdate) AS DATE) = m
        GROUP BY m"""),
      // not benched: wall time is ~80 driver-side recursion steps —
      // constant in data size, so it measures iteration machinery, not
      // throughput (the scale answer for spines is q51's sequence())
      bench = false),

    // ----- LATERAL correlated subquery (per-row aggregate probe) -----
    // Catalyst decorrelates the lateral into a left outer aggregate
    // join — same plan family as q08, reached from the SQL surface the
    // reference's embedded-SQL step exposes.
    QueryDef(
      "q65_lateral",
      sql("""
        SELECT c_custkey, c_mktsegment, t.top_price, t.n_orders
        FROM customer c,
        LATERAL (SELECT max(o_totalprice) AS top_price, count(*) AS n_orders
                 FROM orders WHERE o_custkey = c_custkey) t"""),
      Some("""
        SELECT c_custkey, c_mktsegment, t.top_price,
               CAST(t.n_orders AS BIGINT) AS n_orders
        FROM customer c,
        LATERAL (SELECT max(o_totalprice) AS top_price, count(*) AS n_orders
                 FROM orders WHERE o_custkey = c_custkey) t""")),

    // ----- Null semantics under ANSI mode: TRY_CAST, null-safe
    // equality, nullif/ifnull -----
    // The session runs ANSI (overflow/bad casts THROW — see Session);
    // TRY_CAST is the explicit opt-back-in to NULL-on-failure, and the
    // null-safe comparison surface is what joins/dedup on nullable
    // keys are built from. Spark `<=>` ≡ DuckDB IS NOT DISTINCT FROM.
    QueryDef(
      "q66_null_semantics",
      sql("""
        SELECT p_partkey,
               TRY_CAST(substring(p_type, 1, 3) AS INT) AS bad_cast,
               TRY_CAST(CAST(p_size AS STRING) AS INT) AS good_cast,
               nullif(p_brand, 'Brand#13') AS brand_or_null,
               (nullif(p_brand, 'Brand#13') <=> NULL) AS was_13,
               ifnull(nullif(p_brand, 'Brand#13'), 'THIRTEEN') AS relabeled
        FROM part WHERE p_partkey < 300"""),
      Some("""
        SELECT p_partkey,
               TRY_CAST(substring(p_type, 1, 3) AS INT) AS bad_cast,
               TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS good_cast,
               nullif(p_brand, 'Brand#13') AS brand_or_null,
               (nullif(p_brand, 'Brand#13') IS NOT DISTINCT FROM NULL) AS was_13,
               ifnull(nullif(p_brand, 'Brand#13'), 'THIRTEEN') AS relabeled
        FROM part WHERE p_partkey < 300""")),

    // ----- A5 closure: fixed-width histogram + width_bucket + share -----
    // Document-length distribution: one partial→final aggregate builds
    // the histogram; the per-bucket share is a window over the tiny
    // AGGREGATED result (bucket count ≈ dozens of rows — the single
    // partition there is by construction not a scale concern).
    // width_bucket is pinned against its SQL-standard definition
    // spelled out in the oracle (DuckDB has no width_bucket builtin).
    QueryDef(
      "q71_histogram",
      (spark, dir) => {
        val d = Tables.load(spark, dir, "documents")
        val h = d.groupBy(
            (floor(col("n_chars") / 50L) * 50L).cast("long").as("bucket_lo"),
            width_bucket(col("n_chars").cast("double"),
              lit(0.0), lit(600.0), lit(12L)).as("wb"))
          .agg(count(lit(1)).as("n"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"))
        h.withColumn("share",
          round(col("n") / sum(col("n")).over(
            Window.partitionBy(lit(1))), 6))
      },
      Some("""
        WITH h AS (
          SELECT CAST(floor(n_chars / 50) * 50 AS BIGINT) AS bucket_lo,
                 CAST(CASE WHEN n_chars < 0 THEN 0
                           WHEN n_chars >= 600 THEN 13
                           ELSE 1 + floor(CAST(n_chars AS DOUBLE) / 50.0)
                      END AS BIGINT) AS wb,
                 count(*) AS n,
                 min(n_chars) AS min_chars,
                 max(n_chars) AS max_chars
          FROM documents
          GROUP BY 1, 2
        )
        SELECT bucket_lo, wb, n, min_chars, max_chars,
               round(n / (sum(n) OVER ()), 6) AS share
        FROM h"""))
  )
}

package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Cleaning, Demojize}
import graft.operators.{Regression, Reshape}

/** Queries derived 1:1 from the reference's operator inventory
  * (SURVEY.md §2), re-expressed over the driver's test tables per the
  * §7.2 mapping. Every query ends in a total-order sort and every
  * numeric output is normalized (long / rounded double) so the DuckDB
  * oracle hash-matches bit-for-bit.
  */
object RefOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // A1–A4 / M3 — full-data OLS fit (the Lambda's deterministic path).
    "q_m3_regression_fit" -> { (s, d) =>
      Regression.fit(Tables.lineitem(s, d), "l_quantity", "l_extendedprice")
    },

    // M1/M2/A5 — deterministic modulo split, fit on train, RMSE on test.
    "q_m1_train_test_rmse" -> { (s, d) =>
      Regression.trainEval(Tables.lineitem(s, d), "l_orderkey", "l_quantity", "l_extendedprice")
    },

    // K5 — the HTTP response envelope around the model results (the API
    // Gateway contract, engine-shaped: 1-row frame with a deterministic
    // JSON body instead of a Python dict).
    "q_k5_http_envelope" -> { (s, d) =>
      Regression.responseEnvelope(
        Regression.trainEval(Tables.lineitem(s, d), "l_orderkey", "l_quantity", "l_extendedprice"))
    },

    // F1–F3 — the sanitization chain over deterministically dirtied text.
    "q_f1f3_clean_chain" -> { (s, d) =>
      val dirty = concat(
        col("p_name"), lit(";"), lit("\t"), col("p_brand"), lit("\n"),
        expr("chr(233)"), lit("\\t"), col("p_type"))
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          Cleaning.escapeDelimiter(dirty).as("f1"),
          Cleaning.stripNonAscii(Cleaning.escapeDelimiter(dirty)).as("f2"),
          Cleaning.cleanChain(dirty).as("cleaned"))
        .orderBy("p_partkey")
    },

    // F4 — demojize: emoji → #*name#* over deterministically
    // emoji-decorated text (documents are ASCII by construction, so the
    // emoji under test are injected from the same shared constant list
    // on both engines — two per row, exercising multi-codepoint
    // skin-tone sequences and the longest-first ordering).
    "q_f4_demojize" -> { (s, d) =>
      val ems = Demojize.mapping.map(_._1)
      val n = ems.size
      def pick(idx: org.apache.spark.sql.Column) =
        element_at(array(ems.map(lit): _*), (pmod(idx, lit(n)) + 1).cast("int"))
      val raw = concat(col("text"), lit(" "), pick(col("doc_id")),
        lit(" and "), pick(col("doc_id") * 7 + 3))
      // r15 opt: the demojize pass is pure per-row compute over a
      // single-row-group scan — fan it out so it uses every core
      // (Tables.fanOut is a no-op when the scan already parallelizes).
      Tables.fanOut(Tables.documents(s, d))
        .select(col("doc_id"), Demojize.demojize(raw).as("demojized"))
        .orderBy("doc_id")
    },

    // F5 + S7 — day truncation/reformat and GA dd/MM/yyyy round trip.
    "q_f5_date_normalize" -> { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          Cleaning.dayString(col("ts")).as("day"),
          Cleaning.gaDayString(col("ts")).as("day_ga"),
          Cleaning.parseGaDay(Cleaning.gaDayString(col("ts"))).cast("string").as("day_iso"))
        .orderBy("event_id")
    },

    // R1/R2/P6/W1/O1 — unpivot with 1-based ordinal + mixed-direction sort.
    "q_r2_unpivot_ordinal" -> { (s, d) =>
      Reshape.unpivotWithOrdinal(Tables.part(s, d), col("p_partkey"), split(col("p_type"), " "))
        .withColumnRenamed("id", "p_partkey")
        .orderBy(col("p_partkey").desc, col("tag_number").asc)
    },

    // Outer generator: explode_outer keeps rows whose array is NULL or
    // empty (one row, null element) — the built-in face of the P5
    // coalesce-before-explode pattern.
    "q_r_explode_outer" -> { (s, d) =>
      val arr = when(pmod(col("p_partkey"), lit(7)) === 0, lit(null))
        .otherwise(split(col("p_type"), " "))
      Tables.part(s, d)
        .select(col("p_partkey"), explode_outer(arr).as("word"))
        .orderBy(col("p_partkey"), col("word").asc_nulls_first)
    },

    // P4/P5/P6 — null-safe defaults + NA row drop.
    "q_p5_null_default" -> { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          coalesce(nullif(col("p_brand"), lit("Brand#13")), lit("__default__")).as("brand_or_default"),
          nullif(col("p_type"), lit("")).as("type_nullable"),
          col("p_size").cast("long").as("p_size"))
        .na.drop("any", Seq("type_nullable"))
        .filter(col("p_size") =!= 0)
        .orderBy("p_partkey")
    },

    // J2/P1 — build array-of-structs per order, then flatten back out.
    "q_j2_nested_flatten" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"), col("l_quantity"))
      Reshape.nestThenFlatten(li, "l_orderkey", Seq("l_linenumber", "l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // J1/J4 — JSON parse of the events `props` payload.
    "q_j1_json_extract" -> { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").cast("long").as("k"))
        .orderBy("event_id")
    },

    // J1 via Spark 4's VARIANT type: parse_json → variant_get typed
    // extraction — the open-schema semi-structured path (vs from_json's
    // fixed schema in q_j1_json_extract).
    "q_j_variant" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .orderBy("event_id")
    },

    // J3/W2/O4 — hierarchy flatten: orders are parents (flag 0),
    // lineitems are replies (flag 1), unioned long-form.
    "q_w2_hierarchy_flatten" -> { (s, d) =>
      val parents = Tables.orders(s, d).select(
        col("o_orderkey").as("thread_id"),
        lit(0L).as("reply_flag"),
        lit(0L).as("item_no"),
        col("o_orderstatus").as("info"))
      val children = Tables.lineitem(s, d).select(
        col("l_orderkey").as("thread_id"),
        lit(1L).as("reply_flag"),
        col("l_linenumber").cast("long").as("item_no"),
        col("l_returnflag").as("info"))
      Reshape.hierarchyFlatten(parents, children)
        .orderBy("thread_id", "reply_flag", "item_no")
    },

    // §2.8 scalar-surface battery — string functions (beyond the F1–F3
    // chain) with engine-portable semantics.
    "q_f_string_funcs" -> { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 2, 5).as("sub"),
        trim(concat(lit("  "), col("p_type"), lit("  "))).as("trimmed"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        reverse(col("p_brand")).as("rev"),
        length(col("p_name")).cast("long").as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"))
        .orderBy("p_partkey")
    },

    // §2.8 scalar-surface battery — math functions (per-row IEEE ops are
    // bit-identical across engines; only ln/exp/pow get a guard round).
    "q_f_math_funcs" -> { (s, d) =>
      // r15 opt: per-row math over a single-row-group scan — fan out so
      // the projection uses every core (no-op on parallel scans).
      Tables.fanOut(Tables.lineitem(s, d)).select(
        col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        abs(col("l_discount") - lit(0.05)).as("a"),
        ceil(col("l_extendedprice")).cast("long").as("c"),
        floor(col("l_extendedprice")).cast("long").as("f"),
        round(log(col("l_extendedprice") + 1), 6).as("ln_p"),
        round(sqrt(col("l_quantity")), 6).as("sq"),
        round(pow(col("l_discount"), 2), 6).as("d2"),
        pmod(col("l_orderkey"), lit(7)).as("m7"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // §2.8/§2.9 — higher-order array-function battery: transform /
    // filter / exists / sort / slice / contains over split word lists
    // (codegen'd Column lambdas, serialized to strings for parity).
    "q_f_array_funcs" -> { (s, d) =>
      val ws = split(col("p_type"), " ")
      Tables.part(s, d).select(
        col("p_partkey"),
        size(ws).cast("long").as("n"),
        concat_ws(",", sort_array(ws)).as("sorted_ws"),
        concat_ws(",", transform(ws, w => upper(w))).as("upper_ws"),
        concat_ws(",", filter(ws, w => length(w) > 5)).as("long_ws"),
        array_contains(ws, "BRASS").cast("long").as("has_brass"),
        exists(ws, w => w.startsWith("P")).cast("long").as("any_p"),
        concat_ws(",", slice(ws, 1, 2)).as("first2"))
        .orderBy("p_partkey")
    },

    // Null semantics: null-safe equality, coalesce, count(col) vs
    // count(*), null-aware aggregation.
    "q_x_null_semantics" -> { (s, d) =>
      val withNulls = Tables.part(s, d)
        .withColumn("maybe_brand", nullif(col("p_brand"), lit("Brand#13")))
      withNulls.agg(
        count(lit(1)).as("n_rows"),
        count(col("maybe_brand")).as("n_nonnull"),
        sum(when(col("maybe_brand") <=> lit(null), 1L).otherwise(0L)).as("n_nullsafe_null"),
        sum(when(col("maybe_brand").isNull, 1L).otherwise(0L)).as("n_isnull"),
        countDistinct(col("maybe_brand")).as("n_distinct_nonnull"))
    },

    // O1 — multi-key mixed-direction sort (desc, asc, asc).
    "q_o1_multikey_sort" -> { (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber").cast("long").as("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_returnflag").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    }
  )

  val oracles: Map[String, String] = Map(
    "q_m3_regression_fit" ->
      """SELECT round(regr_slope(l_extendedprice, l_quantity), 6) AS b1,
        |       round(regr_intercept(l_extendedprice, l_quantity), 6) AS b0,
        |       count(*) AS n,
        |       round(avg(l_quantity), 6) AS avg_x,
        |       round(avg(l_extendedprice), 6) AS avg_y
        |FROM lineitem""".stripMargin,

    "q_m1_train_test_rmse" ->
      """WITH coef AS (
        |  SELECT regr_slope(l_extendedprice, l_quantity) AS b1,
        |         regr_intercept(l_extendedprice, l_quantity) AS b0
        |  FROM lineitem WHERE l_orderkey % 5 < 3)
        |SELECT round(sqrt(avg(pow(b0 + b1 * l_quantity - l_extendedprice, 2))), 6) AS rmse,
        |       round(any_value(b1), 6) AS b1,
        |       round(any_value(b0), 6) AS b0,
        |       count(*) AS n_test
        |FROM lineitem, coef WHERE l_orderkey % 5 >= 3""".stripMargin,

    "q_k5_http_envelope" ->
      """WITH coef AS (
        |  SELECT regr_slope(l_extendedprice, l_quantity) AS b1,
        |         regr_intercept(l_extendedprice, l_quantity) AS b0
        |  FROM lineitem WHERE l_orderkey % 5 < 3),
        |m AS (
        |  SELECT round(sqrt(avg(pow(b0 + b1 * l_quantity - l_extendedprice, 2))), 6) AS rmse,
        |         round(any_value(b0), 6) AS b0,
        |         round(any_value(b1), 6) AS b1
        |  FROM lineitem, coef WHERE l_orderkey % 5 >= 3)
        |SELECT CAST(200 AS BIGINT) AS status_code,
        |       'application/json' AS content_type,
        |       '{"RMSE": [' || CAST(CAST(rmse AS DECIMAL(38,6)) AS VARCHAR)
        |         || '], "Model Coefficients": [' || CAST(CAST(b0 AS DECIMAL(38,6)) AS VARCHAR)
        |         || ', ' || CAST(CAST(b1 AS DECIMAL(38,6)) AS VARCHAR) || ']}' AS body
        |FROM m""".stripMargin,

    "q_f1f3_clean_chain" ->
      """WITH t AS (
        |  SELECT p_partkey,
        |         p_name || ';' || chr(9) || p_brand || chr(10) || chr(233) || '\t' || p_type AS dirty
        |  FROM part),
        |f1 AS (SELECT p_partkey, regexp_replace(dirty, ';', ',', 'g') AS f1 FROM t),
        |f2 AS (SELECT p_partkey, f1, regexp_replace(f1, '[^\x00-\x7F]', '', 'g') AS f2 FROM f1)
        |SELECT p_partkey, f1, f2,
        |       regexp_replace(f2, '\\t|\\n|\\r|[\t\n\r]', '', 'g') AS cleaned
        |FROM f2 ORDER BY p_partkey""".stripMargin,

    "q_f4_demojize" -> {
      val ems = Demojize.mapping.map(_._1)
      val n = ems.size
      val emList = ems.map(e => s"'$e'").mkString("[", ", ", "]")
      // (x % n + n) % n mirrors Spark's pmod for ANY sign of x — DuckDB's
      // plain % returns a negative remainder for negative x, which would
      // index out of range if doc_id were ever negative.
      def pick(idx: String) = s"($emList)[(($idx) % $n + $n) % $n + 1]"
      val raw = s"(text || ' ' || ${pick("doc_id")} || ' and ' || ${pick("(doc_id * 7 + 3)")})"
      // The replace chain is layered across CTE steps: DuckDB's binder
      // caps expression depth at 128, and the full table is ~350 deep.
      val batches = Demojize.demojizeSqlBatches("t")
      val ctes = s"d0 AS (SELECT doc_id, $raw AS t FROM documents)" +:
        batches.zipWithIndex.map { case (b, i) =>
          s"d${i + 1} AS (SELECT doc_id, $b AS t FROM d$i)"
        }
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT doc_id, t AS demojized FROM d${batches.size} ORDER BY doc_id""".stripMargin
    },

    "q_f5_date_normalize" ->
      """SELECT event_id,
        |       strftime(ts, '%Y/%m/%d') AS day,
        |       strftime(ts, '%d/%m/%Y') AS day_ga,
        |       CAST(CAST(strptime(strftime(ts, '%d/%m/%Y'), '%d/%m/%Y') AS DATE) AS VARCHAR) AS day_iso
        |FROM events ORDER BY event_id""".stripMargin,

    "q_r2_unpivot_ordinal" ->
      """SELECT * FROM (
        |  SELECT p_partkey,
        |         unnest(range(1, len(string_split(p_type, ' ')) + 1)) AS tag_number,
        |         unnest(string_split(p_type, ' ')) AS tag_value
        |  FROM part)
        |ORDER BY p_partkey DESC, tag_number ASC""".stripMargin,

    // [NULL]-substitution mirrors explode_outer's null/empty-array row.
    "q_r_explode_outer" ->
      """WITH t AS (
        |  SELECT p_partkey,
        |         CASE WHEN p_partkey % 7 = 0 THEN [NULL]
        |              WHEN len(string_split(p_type, ' ')) = 0 THEN [NULL]
        |              ELSE string_split(p_type, ' ') END AS arr
        |  FROM part)
        |SELECT p_partkey, unnest(arr) AS word FROM t
        |ORDER BY p_partkey, word ASC NULLS FIRST""".stripMargin,

    "q_p5_null_default" ->
      """SELECT p_partkey,
        |       coalesce(nullif(p_brand, 'Brand#13'), '__default__') AS brand_or_default,
        |       nullif(p_type, '') AS type_nullable,
        |       CAST(p_size AS BIGINT) AS p_size
        |FROM part
        |WHERE nullif(p_type, '') IS NOT NULL AND p_size <> 0
        |ORDER BY p_partkey""".stripMargin,

    "q_j2_nested_flatten" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_j1_json_extract" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_j_variant" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_w2_hierarchy_flatten" ->
      """SELECT * FROM (
        |  SELECT o_orderkey AS thread_id, CAST(0 AS BIGINT) AS reply_flag,
        |         CAST(0 AS BIGINT) AS item_no, o_orderstatus AS info
        |  FROM orders
        |  UNION ALL
        |  SELECT l_orderkey, 1, CAST(l_linenumber AS BIGINT), l_returnflag FROM lineitem)
        |ORDER BY thread_id, reply_flag, item_no""".stripMargin,

    "q_f_string_funcs" ->
      """SELECT p_partkey,
        |       upper(p_name) AS up,
        |       lower(p_brand) AS lo,
        |       substr(p_name, 2, 5) AS sub,
        |       trim('  ' || p_type || '  ') AS trimmed,
        |       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
        |       reverse(p_brand) AS rev,
        |       CAST(length(p_name) AS BIGINT) AS len,
        |       concat_ws('|', p_brand, p_type) AS joined
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_f_math_funcs" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       abs(l_discount - 0.05) AS a,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS c,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS f,
        |       round(ln(l_extendedprice + 1), 6) AS ln_p,
        |       round(sqrt(l_quantity), 6) AS sq,
        |       round(pow(l_discount, 2), 6) AS d2,
        |       l_orderkey % 7 AS m7
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_f_array_funcs" ->
      """WITH t AS (SELECT p_partkey, string_split(p_type, ' ') AS ws FROM part)
        |SELECT p_partkey,
        |       CAST(len(ws) AS BIGINT) AS n,
        |       array_to_string(list_sort(ws), ',') AS sorted_ws,
        |       array_to_string(list_transform(ws, w -> upper(w)), ',') AS upper_ws,
        |       coalesce(array_to_string(list_filter(ws, w -> length(w) > 5), ','), '') AS long_ws,
        |       CAST(list_contains(ws, 'BRASS') AS BIGINT) AS has_brass,
        |       CAST(len(list_filter(ws, w -> w LIKE 'P%')) > 0 AS BIGINT) AS any_p,
        |       array_to_string(ws[1:2], ',') AS first2
        |FROM t ORDER BY p_partkey""".stripMargin,

    "q_x_null_semantics" ->
      """WITH t AS (SELECT nullif(p_brand, 'Brand#13') AS maybe_brand FROM part)
        |SELECT count(*) AS n_rows,
        |       count(maybe_brand) AS n_nonnull,
        |       CAST(sum(CASE WHEN maybe_brand IS NOT DISTINCT FROM NULL
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_null,
        |       CAST(sum(CASE WHEN maybe_brand IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_isnull,
        |       count(DISTINCT maybe_brand) AS n_distinct_nonnull
        |FROM t""".stripMargin,

    "q_o1_multikey_sort" ->
      """SELECT l_returnflag, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_quantity
        |FROM lineitem
        |ORDER BY l_returnflag DESC, l_orderkey ASC, l_linenumber ASC""".stripMargin
  )
}

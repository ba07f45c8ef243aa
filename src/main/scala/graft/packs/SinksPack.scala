package graft.packs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Num, RmseAggregator}
import graft.operators.Regression
import graft.streaming.StreamOps

/** Source/sink round trips (SURVEY.md §2.1–2.2), the UDAF surface
  * (§2.12), and the batch face of the streaming ops. Round-trip queries
  * prove the sink+source pair is lossless by aggregating the read-back
  * data and hash-matching an oracle computed directly on the original
  * parquet.
  */
object SinksPack {
  type Q = (SparkSession, String) => DataFrame

  private def tmpPath(kind: String, d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_${kind}_${d.replaceAll("[^A-Za-z0-9]", "_")}"

  val queries: Map[String, Q] = Map(
    // K1/S6 — `;`-CSV with quoted embedded newlines, written then read
    // back with multiLine=true (the reference's S3 CSV shape).
    "q_s6_csv_roundtrip" -> { (s, d) =>
      val dirty = Tables.part(s, d).select(
        col("p_partkey"), col("p_brand"),
        concat(col("p_name"), lit("\n"), col("p_type")).as("dirty"))
      val path = tmpPath("csv", d)
      dirty.write.mode("overwrite")
        .option("sep", ";").option("header", "true").csv(path)
      s.read
        .option("sep", ";").option("header", "true").option("multiLine", "true")
        .csv(path)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n"),
          sum(length(col("dirty"))).cast("long").as("sum_len"))
        .orderBy("p_brand")
    },

    // K4/J5 — JSON write + read-back (schema inferred on read).
    "q_k4_json_roundtrip" -> { (s, d) =>
      val path = tmpPath("json", d)
      Tables.documents(s, d).write.mode("overwrite").json(path)
      s.read.json(path)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("sum_chars"))
        .orderBy("lang")
    },

    // K2/K3 — catalog table create + append (the warehouse-load shape;
    // Spark batches writes instead of the reference's per-row commits).
    "q_k3_table_append" -> { (s, d) =>
      val t = "graft_wh_orders"
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
      o.write.mode("overwrite").format("parquet").saveAsTable(t)
      o.write.mode("append").format("parquet").saveAsTable(t)
      s.table(t)
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // A5/§2.12 — RMSE via the typed Aggregator vs the closed form: the
    // two columns must agree (and both match the oracle's formula).
    "q_a5_rmse_udaf" -> { (s, d) =>
      val rmseUdaf = udaf(RmseAggregator)
      val li = Tables.lineitem(s, d)
      val train = li.filter(Regression.isTrain(col("l_orderkey")))
      val test = li.filter(!Regression.isTrain(col("l_orderkey")))
      val coef = train.agg(
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("b1"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("b0"))
      test.crossJoin(coef)
        .withColumn("pred", col("b0") + col("b1") * col("l_quantity"))
        .agg(
          round(rmseUdaf(col("pred"), col("l_extendedprice")), 6).as("rmse_udaf"),
          round(sqrt(avg(pow(col("pred") - col("l_extendedprice"), 2))), 6).as("rmse_builtin"),
          count(lit(1)).as("n_test"))
    },

    // Streaming ops' batch face: hourly tumbling window aggregate.
    "q_st_tumbling_hourly" -> { (s, d) =>
      StreamOps.tumblingHourly(Tables.events(s, d))
        .orderBy("hour_start", "event_type")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_s6_csv_roundtrip" ->
      """SELECT p_brand, count(*) AS n,
        |       CAST(sum(length(p_name || chr(10) || p_type)) AS BIGINT) AS sum_len
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_k4_json_roundtrip" ->
      """SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_k3_table_append" ->
      """SELECT o_orderstatus, CAST(2 * count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_a5_rmse_udaf" ->
      """WITH coef AS (
        |  SELECT regr_slope(l_extendedprice, l_quantity) AS b1,
        |         regr_intercept(l_extendedprice, l_quantity) AS b0
        |  FROM lineitem WHERE l_orderkey % 5 < 3)
        |SELECT round(sqrt(avg(pow(b0 + b1 * l_quantity - l_extendedprice, 2))), 6) AS rmse_udaf,
        |       round(sqrt(avg(pow(b0 + b1 * l_quantity - l_extendedprice, 2))), 6) AS rmse_builtin,
        |       count(*) AS n_test
        |FROM lineitem, coef WHERE l_orderkey % 5 >= 3""".stripMargin,

    "q_st_tumbling_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         |       event_type, count(*) AS n_events,
         |       ${Num.dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin
  )
}

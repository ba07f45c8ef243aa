package graft

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed `Dataset[T]` surface for the tables where compile-time field
  * checks help (SURVEY.md §1.1 — case-class encoders over the same
  * parquet scans; column pruning still applies because the encoder's
  * field set drives the read schema).
  */
object TypedTables {
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double, l_tax: Double,
                      l_returnflag: String, l_linestatus: String,
                      l_shipdate: java.sql.Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double,
                   o_orderdate: java.sql.Timestamp, o_orderpriority: String)

  def lineitem(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[Lineitem]
  }

  def orders(spark: SparkSession, dir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, dir).as[Order]
  }
}

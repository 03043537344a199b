package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.RelationalQueries

/** Semi/anti-join TPC-H analogs (Q4/Q16/Q18): the oracle hash-checks the
  * values; these pin the JOIN SEMANTICS that make the numbers right —
  * semi means count-once, anti means excluded-means-gone, having-in means
  * the subquery relation drives the probe.
  */
class TpchAnalogSpec extends SparkSpec {

  test("q4: semi join counts each order once (equals EXISTS-distinct recount)") {
    val got = RelationalQueries.q4PrioritySemi(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("order_count")).toMap
    // independent recount: inner join + distinct order keys per priority
    val lo = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1996-04-01 00:00:00")
    val expect = graft.Tables.orders(spark, sf0001)
      .filter(col("o_orderdate") >= lit(lo) && col("o_orderdate") < lit(hi))
      .join(graft.Tables.lineitem(spark, sf0001).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("q16: no complaint-list supplier survives the anti join") {
    // sf0.01: the 100-supplier fixture has 6 negative balances; sf0.001's
    // 10 suppliers have none, which would make the anti join vacuous here
    val complaints = graft.Tables.supplier(spark, sf001)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      .collect().map(_.getLong(0)).toSet
    assert(complaints.nonEmpty, "fixture has complaint suppliers")
    // recount one reported group including complaints: the anti-joined
    // count must equal the all-suppliers recount minus the complaint ids
    val rows = RelationalQueries.q16SupplierCnt(spark, sf001).collect()
    assert(rows.nonEmpty)
    val (brand, ptype, size, cnt) = {
      val r = rows.head
      (r.getString(0), r.getString(1), r.getAs[Int]("p_size"), r.getAs[Long]("supplier_cnt"))
    }
    val all = graft.Tables.lineitem(spark, sf001)
      .join(graft.Tables.part(spark, sf001), col("l_partkey") === col("p_partkey"))
      .filter(col("p_brand") === brand && col("p_type") === ptype && col("p_size") === size)
      .select(col("l_suppkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert((all -- complaints).size.toLong === cnt)
  }

  test("q18: every reported order clears the threshold, descending, <= 20 rows") {
    val rows = RelationalQueries.q18LargeOrders(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val qtys = rows.map(_.getAs[Double]("total_qty")).toSeq
    assert(qtys.forall(_ > 150.0))
    assert(qtys == qtys.sortBy(-_))
  }
}

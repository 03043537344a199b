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

  test("q2: reported costs are the EUROPE-restricted per-part minima (filter-before-min)") {
    val rows = RelationalQueries.q2MinCost(spark, sf001).collect()
    assert(rows.nonEmpty)
    val eurKeys = graft.Tables.supplier(spark, sf001)
      .join(graft.Tables.nation(spark, sf001), col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf001).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey")).collect().map(_.getLong(0)).toSet
    val eurNames = graft.Tables.supplier(spark, sf001)
      .filter(col("s_suppkey").isin(eurKeys.toSeq: _*))
      .select(col("s_name")).collect().map(_.getString(0)).toSet
    // no out-of-region supplier leaks into the report
    assert(rows.forall(r => eurNames.contains(r.getAs[String]("s_name"))))
    // recount one part's minimum over the restricted cost set
    val pk = rows.head.getAs[Long]("p_partkey")
    val minCost = graft.Tables.lineitem(spark, sf001)
      .filter(col("l_partkey") === pk && col("l_suppkey").isin(eurKeys.toSeq: _*))
      .groupBy(col("l_suppkey"))
      .agg(graft.Parity.pround(
        min(col("l_extendedprice") / col("l_quantity")), 6).as("c"))
      .agg(min(col("c"))).first().getDouble(0)
    assert(rows.filter(_.getAs[Long]("p_partkey") == pk)
      .forall(_.getAs[Double]("cost") == minCost))
  }

  test("rfm: every ordering customer lands in exactly one segment; quintiles balanced") {
    val rows = RelationalQueries.rfmSegments(spark, sf001).collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = graft.Tables.orders(spark, sf001)
      .select(col("o_custkey")).distinct().count()
    assert(total === nCust)
    // value-based quintiles: each monetary quintile holds ~n/5 customers
    // (monetary is near-unique, so ties cannot skew buckets much)
    val byM = rows.groupBy(_.getAs[String]("segment").last)
      .view.mapValues(_.map(_.getAs[Long]("n_customers")).sum).toMap
    assert(byM.keySet === Set('1', '2', '3', '4', '5'), byM.toString)
    byM.values.foreach { n =>
      assert(math.abs(n - nCust / 5.0) < nCust * 0.05, byM.toString)
    }
  }

  test("q5: with broadcasts disabled the shuffle path is bit-equal (100 TB plan)") {
    // q5 joins the two largest SF-growing dimensions (customer, supplier);
    // neither is hinted, so with autoBroadcastJoinThreshold=-1 the planner
    // must fall back to shuffle joins for them — exactly the plan a
    // 100 TB run would get — while the only explicit hint left is the
    // fixed-25-row nation relation. Results must not move a bit.
    val default = RelationalQueries.q5NationRevenue(spark, sf001).collect()
      .map(r => (r.getString(0), r.getAs[Double]("revenue"))).toSeq
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = RelationalQueries.q5NationRevenue(spark, sf001)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // the one surviving broadcast is the hinted 25-row nation dim
      assert(plan.split("BroadcastHashJoin").length - 1 === 1, plan)
      val got = df.collect()
        .map(r => (r.getString(0), r.getAs[Double]("revenue"))).toSeq
      assert(got === default)
      assert(got.nonEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q13: the histogram includes a real zero bucket and totals |customer|") {
    val rows = RelationalQueries.q13OrderDist(spark, sf001).collect()
      .map(r => r.getAs[Long]("c_count") -> r.getAs[Long]("custdist")).toMap
    // outer-join semantics: zero-order customers exist at sf0.01 (203 of
    // them) ONLY if unmatched rows survive — an inner join would drop
    // this bucket entirely
    assert(rows.getOrElse(0L, 0L) > 0L, "zero bucket present (outer join kept unmatched)")
    val nCust = graft.Tables.customer(spark, sf001).count()
    assert(rows.values.sum === nCust, "every customer lands in exactly one bucket")
  }

  test("q15: reported suppliers all carry the maximum revenue") {
    val rows = RelationalQueries.q15TopSupplier(spark, sf001).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_rev")).distinct
    assert(revs.length === 1, "all reported rows tie at the max")
  }

  test("q17: decorrelated avg filter equals a per-row correlated recount") {
    val li = graft.Tables.lineitem(spark, sf001)
    // independent recount: window-avg per part instead of the aggregate join
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_partkey"))
    val expect = li
      .join(graft.Tables.part(spark, sf001).filter(col("p_brand") === "Brand#12"),
        col("l_partkey") === col("p_partkey"))
      .withColumn("avg_qty",
        sum(col("l_quantity").cast("decimal(30,10)")).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .count()
    val pa = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(col("l_quantity").cast("decimal(30,10)")).cast("double") /
        count(lit(1))).as("avg_qty"))
    val got = li
      .join(graft.Tables.part(spark, sf001).filter(col("p_brand") === "Brand#12"),
        col("l_partkey") === col("p_partkey"))
      .join(pa, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .count()
    assert(got === expect && got > 0L)
  }

  test("q19: disjunctive result equals the union-of-branches recount") {
    val li = graft.Tables.lineitem(spark, sf001)
    val part = graft.Tables.part(spark, sf001)
    def branch(brand: String, szHi: Int, qLo: Int, qHi: Int) =
      li.join(part.filter(col("p_brand") === brand && col("p_size").between(1, szHi)),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_quantity").between(qLo, qHi))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          col("l_discount"))
    val rows = branch("Brand#12", 5, 1, 11)
      .unionAll(branch("Brand#23", 10, 10, 20))
      .unionAll(branch("Brand#3", 15, 20, 30))
      .distinct() // branches are brand-disjoint; distinct guards the claim
    val expect = rows.agg(
      sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(30,10)")).cast("double")).first().getDouble(0)
    val got = RelationalQueries.q19Disjunctive(spark, sf001).first()
      .getAs[Double]("revenue")
    assert(math.abs(got - math.floor(expect * 1e4 + 0.5) / 1e4) < 1e-9)
  }

  test("q21: no reported supplier has a co-returned partner line, and each had company") {
    val li = graft.Tables.lineitem(spark, sf001)
    // reconstruct the per-line flag set independently via aggregates:
    // orders with >=2 distinct suppliers, and orders with exactly one
    // distinct RETURNING supplier — a line qualifies iff both hold
    val multi = li.groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("nsupp"))
      .filter(col("nsupp") >= 2).select(col("ok"))
    val oneRet = li.filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("ok"))
      .agg(countDistinct(col("l_suppkey")).as("nret"))
      .filter(col("nret") === 1).select(col("ok"))
    val expect = li.filter(col("l_returnflag") === "R")
      .join(multi, col("l_orderkey") === multi("ok"), "left_semi")
      .join(oneRet, col("l_orderkey") === oneRet("ok"), "left_semi")
      .count()
    val got = RelationalQueries.q21WaitingSupplier(spark, sf001)
      .agg(sum(col("numwait"))).first().getLong(0)
    // top-20 truncation: got <= expect always; equality when <=20 suppliers
    val nSupp = RelationalQueries.q21WaitingSupplier(spark, sf001).count()
    if (nSupp < 20) assert(got === expect) else assert(got <= expect)
    assert(got > 0L)
  }

  test("q22: every counted customer is above average and urgent-free") {
    val cust = graft.Tables.customer(spark, sf001)
    val avg = cust.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(30,10)")).cast("double") /
        count(lit(1))).first().getDouble(0)
    val urgent = graft.Tables.orders(spark, sf001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expect = cust.filter(col("c_acctbal") > avg)
      .collect().map(_.getLong(0)).count(ck => !urgent.contains(ck))
    val got = RelationalQueries.q22NoUrgent(spark, sf001)
      .agg(sum(col("numcust"))).first().getLong(0)
    assert(got === expect.toLong && got > 0L)
  }
}

package graft

import graft.queries.TpchRest
import org.apache.spark.sql.functions._

/** The final six TPC-H shapes, pinned against independent formulations. */
class TpchRestSpec extends SparkSpec {

  private def cents(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("q6: pure scan-agg equals collected filter-sum") {
    val got = TpchRest.q6ForecastRevenue(spark, sfDir).head().getDouble(0)
    val expect = Tables.lineitem(spark, sfDir)
      .select("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .collect().map { r =>
        val d = r.getAs[java.time.LocalDateTime](0).getYear
        val disc = r.getDouble(1)
        if (d == 1995 && disc >= 0.03 && disc <= 0.07 && r.getDouble(2) < 24)
          cents(r.getDouble(3) * disc * 100.0)
        else 0L
      }.sum / 100.0
    assert(got == expect && got > 0)
  }

  test("q8: market share equals naive conditional ratio per year") {
    val got = TpchRest.q8MarketShare(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got.nonEmpty && got.values.forall(s => s >= 0.0 && s <= 1.0))
    val suppNation = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "n_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byYear = Tables.lineitem(spark, sfDir)
      .select("l_shipdate", "l_suppkey", "l_extendedprice", "l_discount")
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0).getYear,
        suppNation(r.getLong(1)),
        cents(r.getDouble(2) * (1.0 - r.getDouble(3)) * 100.0)))
      .groupBy(_._1)
    val expect = byYear.view.mapValues { rs =>
      rs.collect { case (_, "NATION_1", c) => c }.sum.toDouble /
        rs.map(_._3).sum.toDouble
    }.toMap
    assert(got == expect)
  }

  test("q10: exactly 20 customers, ranked by lost revenue with custkey tie-break") {
    val got = TpchRest.q10ReturnedCustomers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(got.length == 20)
    val revs = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select("o_custkey", "l_extendedprice", "l_discount")
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => cents(r.getDouble(1) * (1.0 - r.getDouble(2)) * 100.0)).sum)
      .toMap
    val expect = revs.toSeq.sortBy { case (k, c) => (-c, k) }.take(20)
      .map { case (k, c) => (k, c / 100.0) }
    assert(got.sortBy(g => (-g._2, g._1)).toSeq == expect)
  }

  test("q12: high+low counts partition the joined rows per flag") {
    val rows = TpchRest.q12PriorityCounts(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("A", "N", "R"))
    val joined = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01"))
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (flag, (hi, lo)) =>
      assert(hi + lo == joined(flag), s"counts don't partition for $flag")
    }
  }

  test("q16: bad suppliers never counted, distinct within slice") {
    val got = TpchRest.q16SupplierCounts(spark, sfDir).collect()
    assert(got.nonEmpty)
    val bad = Tables.supplier(spark, sfDir).filter(col("s_acctbal") < 0)
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    // recompute one slice naively
    val (brand, ptype, psize) = (got.head.getString(0), got.head.getString(1),
      got.head.getInt(2))
    val parts = Tables.part(spark, sfDir)
      .filter(col("p_brand") === brand && col("p_type") === ptype &&
        col("p_size") === psize)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val naive = Tables.lineitem(spark, sfDir)
      .select("l_partkey", "l_suppkey").distinct()
      .collect()
      .filter(r => parts(r.getLong(0)) && !bad(r.getLong(1)))
      .map(_.getLong(1)).distinct.length
    assert(got.head.getLong(3) == naive.toLong)
  }

  test("q20: every kept supplier dominates some part's 1995 volume") {
    val got = TpchRest.q20DominantSuppliers(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val perPart = li.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val expect = li.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum)
      .collect { case ((p, s), q) if q > perPart(p) * 0.5 => s }
      .toSet
    assert(got == expect && got.nonEmpty)
  }
}

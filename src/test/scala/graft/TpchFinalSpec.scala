package graft

import graft.queries.TpchFinal
import org.apache.spark.sql.functions._

/** Third-wave relational shapes, each pinned against an independent
  * naive formulation (the DuckDB hash gate runs driver-side). */
class TpchFinalSpec extends SparkSpec {

  test("q2: exactly one supplier per nation, the min-balance one, ties to lower id") {
    val rows = TpchFinal.q2MinBalSupplier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
    assert(rows.map(_._1).distinct.length == rows.length, "duplicate nations")
    val naive = Tables.supplier(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("s_nationkey") === col("n_nationkey"))
      .collect()
      .map(r => (r.getString(r.fieldIndex("n_name")),
        r.getLong(r.fieldIndex("s_suppkey")),
        r.getDouble(r.fieldIndex("s_acctbal"))))
      .groupBy(_._1).view
      .mapValues(_.minBy(s => (s._3, s._2))).values
      .map(s => (s._1, s._2, BigDecimal(s._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    assert(rows.toSet == naive && rows.nonEmpty)
  }

  test("q11: every kept part exceeds the global-share threshold; none missed") {
    val perPart = Tables.lineitem(spark, sfDir)
      .groupBy("l_partkey")
      .agg(sum(round(col("l_extendedprice") * 100.0).cast("long")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mean = perPart.values.sum.toDouble / perPart.size
    val expect = perPart.filter { case (_, c) => c > mean * 1.5 }
      .map { case (k, c) => k -> c / 100.0 }
    val got = TpchFinal.q11ImportantParts(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == expect && got.nonEmpty)
  }

  test("q15: max revenue achieved, ALL ties kept") {
    val got = TpchFinal.q15TopSupplier(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.nonEmpty)
    val revs = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy("l_suppkey")
      .agg((sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100.0).cast("long")) / 100.0).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mx = revs.values.max
    assert(got.toMap == revs.filter(_._2 == mx), "tie set mismatch")
  }

  test("q19: disjunctive revenue equals naive filtered sum") {
    val got = TpchFinal.q19DisjunctiveRevenue(spark, sfDir).head().getDouble(0)
    val joined = Tables.lineitem(spark, sfDir)
      .join(Tables.part(spark, sfDir), col("l_partkey") === col("p_partkey"))
      .select("p_brand", "l_quantity", "p_size", "l_extendedprice", "l_discount")
      .collect()
    val cents = joined.map { r =>
      val (b, q, s) = (r.getString(0), r.getDouble(1), r.getInt(2))
      val keep =
        (b == "Brand#1" && q >= 1 && q <= 10 && s >= 1 && s <= 15) ||
        (b == "Brand#7" && q >= 5 && q <= 20 && s >= 1 && s <= 25) ||
        (b == "Brand#13" && q >= 10 && q <= 30 && s >= 1 && s <= 50)
      // HALF_UP, matching Spark's round() (math.rint is half-even)
      if (keep) BigDecimal(r.getDouble(3) * (1.0 - r.getDouble(4)) * 100.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      else 0L
    }.sum
    assert(got == cents / 100.0 && got > 0)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.ForecastReconcile

/** Largest-remainder apportionment: exact-sum property, hand-checked
  * remainder placement, zero-weight fallback, and the gated coherence
  * invariant. */
class ForecastReconcileSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked apportionment: P=10 over weights {1,1,1}") {
    // base 3 each, R = 1: all mods equal (10·1 mod 3 = 1) → key ASC
    // gives the extra unit to child 'a'
    val df = Seq(("p", "a", 1L, 10L), ("p", "b", 1L, 10L), ("p", "c", 1L, 10L))
      .toDF("par", "child", "raw", "pf")
    val r = ForecastReconcile.largestRemainder(df, "par", "child", "raw", "pf")
      .collect().map(x => (x.getString(1), x.getAs[Long]("reconciled")))
      .toMap
    assert(r === Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("largest remainders win the extra units") {
    // P=10, weights {7, 2, 1}: bases {7, 2, 1} exact → R = 0
    // P=11, weights {7, 2, 1}: bases {7·11/10=7, 2, 1}=10, mods {7,2,1}
    // → R=1 goes to the largest mod (child with weight 7)
    val df = Seq(("p", "x", 7L, 11L), ("p", "y", 2L, 11L), ("p", "z", 1L, 11L))
      .toDF("par", "child", "raw", "pf")
    val r = ForecastReconcile.largestRemainder(df, "par", "child", "raw", "pf")
      .collect().map(x => (x.getString(1), x.getAs[Long]("reconciled")))
      .toMap
    assert(r === Map("x" -> 8L, "y" -> 2L, "z" -> 1L))
    assert(r.values.sum === 11L)
  }

  test("zero total weight splits the parent equally with key-order extras") {
    val df = Seq(("p", "a", 0L, 7L), ("p", "b", 0L, 7L), ("p", "c", 0L, 7L))
      .toDF("par", "child", "raw", "pf")
    val r = ForecastReconcile.largestRemainder(df, "par", "child", "raw", "pf")
      .collect().map(x => (x.getString(1), x.getAs[Long]("reconciled")))
      .toMap
    assert(r.values.sum === 7L)
    assert(r === Map("a" -> 3L, "b" -> 2L, "c" -> 2L))
  }

  test("independent parents reconcile independently") {
    val df = Seq(("p", "a", 3L, 5L), ("q", "a", 3L, 9L), ("q", "b", 6L, 9L))
      .toDF("par", "child", "raw", "pf")
    val out = ForecastReconcile.largestRemainder(df, "par", "child", "raw", "pf")
    val sums = out.groupBy("par").agg(sum("reconciled").as("s"))
      .collect().map(x => (x.getString(0), x.getLong(1))).toMap
    assert(sums === Map("p" -> 5L, "q" -> 9L))
  }

  test("gated instance: reconciled nations sum exactly to the region parent") {
    val out = ForecastReconcile.reconcileRevenue(spark, sfDir)
    val bad = out.groupBy("region", "parent_forecast")
      .agg(sum("reconciled").as("s"))
      .filter(col("s") =!= col("parent_forecast"))
    assert(bad.count() === 0)
    assert(out.count() > 0)
  }
}

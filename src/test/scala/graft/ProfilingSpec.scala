package graft

import graft.functions.GoodTuring
import graft.operators.Profiling
import org.apache.spark.sql.functions._

/** Planted contracts: FD discovery separates holding from violated
  * dependencies (with composite LHS), IND discovery counts exactly the
  * missing values and ignores NULLs, and Chao1 reproduces the
  * bias-corrected closed form on a hand-counted corpus. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("fd: holding, violated, and composite-LHS candidates") {
    val df = Seq(
      (1L, "a", 10L), (1L, "a", 20L), (2L, "b", 30L), (3L, "a", 40L))
      .toDF("k", "s", "v")
    val out = Profiling.fdDiscover(Seq(
      ("k->s", df, Seq("k"), "s"),       // holds: each k has one s
      ("s->k", df, Seq("s"), "k"),       // fails: s='a' maps to k 1 and 3
      ("k,v->s", df, Seq("k", "v"), "s") // holds trivially (superkey)
    )).collect().map(r => r.getString(0) -> r).toMap
    assert(out("k->s").getAs[Boolean]("holds"))
    assert(out("k->s").getAs[Long]("n_lhs") == 3)
    assert(!out("s->k").getAs[Boolean]("holds"))
    assert(out("s->k").getAs[Long]("n_violating") == 1)
    assert(out("s->k").getAs[Long]("max_rhs_per_lhs") == 2)
    assert(out("k,v->s").getAs[Boolean]("holds"))
    assert(out("k,v->s").getAs[Long]("n_lhs") == 4)
  }

  test("ind: missing counts are exact and NULL lhs values are ignored") {
    val lhs = Seq(Some(1L), Some(2L), Some(5L), None, Some(2L))
      .toDF("x").select(col("x"))
    val rhs = Seq(1L, 2L, 3L).toDF("y").select(col("y"))
    val out = Profiling.indDiscover(Seq(("x<=y", lhs, rhs))).collect()(0)
    assert(out.getAs[Long]("n_distinct_lhs") == 3)
    assert(out.getAs[Long]("n_missing") == 1) // only 5
    assert(!out.getAs[Boolean]("contained"))
  }

  test("chao1: hand-counted corpus hits the closed form") {
    // tokens: a a a b b c d e → S=5, f1=3 (c,d,e), f2=1 (b), T=8
    // chao1 = 5 + 3·2/(2·2) = 5 + 1 = 6; coverage = 1 − 3/8 = 625000ppm
    val toks = Seq("a", "a", "a", "b", "b", "c", "d", "e").toDF("w")
    val out = GoodTuring.chao1(toks, "w").collect()(0)
    assert(out.getAs[Long]("s_obs") == 5 && out.getAs[Long]("f1") == 3
      && out.getAs[Long]("f2") == 1 && out.getAs[Long]("n_tokens") == 8)
    assert(out.getAs[Long]("chao1_est") == 6)
    assert(out.getAs[Long]("coverage_permicro") == 625000L)
  }

  test("gated instances: verdict mix on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val fd = Profiling.fdOrders(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("holds")).toMap
    assert(fd("o_orderkey->o_custkey"))
    // the synthetic generator does NOT enforce the TPC-H composite PK —
    // the discovery sweep is exactly the tool that reveals this
    assert(!fd("l_orderkey,l_linenumber->l_partkey"))
    assert(fd("p_partkey->p_brand"))
    assert(!fd("o_custkey->o_orderpriority") || fd.size == 7)
    val ind = Profiling.indOrders(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("contained")).toMap
    assert(ind("l_orderkey<=o_orderkey"))
    assert(ind("o_custkey<=c_custkey"))
    assert(ind("c_nationkey<=n_nationkey"))
    assert(!ind("o_orderkey<=c_custkey"))
    val c1 = GoodTuring.chao1Documents(spark, sf).collect()(0)
    assert(c1.getAs[Long]("chao1_est") >= c1.getAs[Long]("s_obs"))
  }
}

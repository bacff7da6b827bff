package graft

import org.apache.spark.sql.functions._
import graft.operators.Covisitation

/** Planted-ground-truth checks for the co-visitation recommender:
  * pair counts, the top-M cap order, history exclusion, the power-user
  * basket cap, and hand-computed recall/MAP on a tiny holdout. */
class CovisitationSpec extends SparkSpec {
  import spark.implicits._

  test("covisit counts users sharing both items; cap keeps top-M by (n, item)") {
    // u1: {a,b,c}  u2: {a,b}  u3: {a,c}  → c(a,b)=2 c(a,c)=2 c(b,c)=1
    val ui = Seq(("u1", "a"), ("u1", "b"), ("u1", "c"), ("u2", "a"),
      ("u2", "b"), ("u3", "a"), ("u3", "c"), ("u3", "c")).toDF("u", "i")
    val m = Covisitation.covisitTopM(ui, "u", "i", m = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // per item_a keep 1 neighbor: ties (a: b=2, c=2) break item ASC → b
    assert(m === Set(("a", "b", 2L), ("b", "a", 2L), ("c", "a", 2L)))
  }

  test("maxBasket drops power users whole") {
    val big = (1 to 50).map(i => ("bot", s"i$i")) ++
      Seq(("u1", "i1"), ("u1", "i2"), ("u2", "i1"), ("u2", "i2"))
    val m = Covisitation.covisitTopM(big.toDF("u", "i"), "u", "i",
      m = 5, maxBasket = 10)
    // only u1/u2 survive: every pair count is 2, none includes bot-only items
    assert(m.agg(max("n_users")).head.getLong(0) === 2L)
    assert(m.count() === 2L) // (i1,i2) and (i2,i1)
  }

  test("recommend scores sum capped counts and excludes history") {
    val hist = Seq(("u1", "a"), ("u1", "b")).toDF("u", "i")
    val cov = Seq(("a", "b", 5L, 1L), ("a", "c", 3L, 2L),
      ("b", "c", 2L, 1L), ("b", "d", 1L, 2L))
      .toDF("item_a", "item_b", "n_users", "rk")
    val recs = Covisitation.recommend(hist, cov, "u", "i", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // b excluded (history); c = 3+2 = 5 at rank 1, d = 1 at rank 2
    assert(recs.toSeq === Seq(("c", 5L, 1L), ("d", 1L, 2L)))
  }

  test("evaluate: exact hits, truncating recall and MAP on a planted holdout") {
    // u1 recs [x(hit), y, z(hit)]; truth {x, z, w} (n_rel=3)
    val recs = Seq(("u1", "x", 9L, 1L), ("u1", "y", 8L, 2L), ("u1", "z", 7L, 3L))
      .toDF("u", "i", "score", "rk")
    val truth = Seq(("u1", "x"), ("u1", "z"), ("u1", "w")).toDF("u", "i")
    val ev = Covisitation.evaluate(recs, truth, "u", "i", Seq(3))
      .collect().head
    assert(ev.getAs[Long]("n_users") === 1L)
    assert(ev.getAs[Long]("n_hits") === 2L)
    // precision@3 = 2/3 → 666666; recall = 2/3 → 666666
    assert(ev.getAs[Long]("precision_permicro") === 666666L)
    assert(ev.getAs[Long]("recall_permicro") === 666666L)
    // AP numerator: rank1 hit → 1e6·1/1; rank3 hit → 1e6·2/3=666666
    // ap = (1000000+666666) div min(3,3) = 555555
    assert(ev.getAs[Long]("map_permicro") === 555555L)
  }

  test("gated instances return rows at sf0.001") {
    assert(Covisitation.covisitParts(spark, sfDir).count() > 0)
    val ev = Covisitation.recsysEval(spark, sfDir)
    assert(ev.count() === 4)
  }
}

package graft

import graft.operators.Survival

/** Planted cohorts for the log-rank test: identical groups give
  * O1 = E1 exactly, a hand-computed two-time example, and the
  * single-subject guard. */
class LogRankSpec extends SparkSpec {
  import spark.implicits._

  test("identical survival in both groups: chi2 exactly zero") {
    // same durations/events in each arm → at every time n1 = n2 and
    // d splits evenly, so e1 = 1e6·d·n1/n = 1e6·d/2 = 1e6·o1 share
    val subj = Seq((5, true, true), (5, true, false),
      (9, true, true), (9, true, false),
      (12, false, true), (12, false, false)).toDF("dur", "ev", "g")
    val r = Survival.logRank(subj, "dur", "ev", "g").collect().head
    assert(r.getAs[Long]("o1") === 2L && r.getAs[Long]("o2") === 2L)
    assert(r.getAs[String]("e1_micro") === "2000000")
    assert(r.getAs[Long]("chi2_ppm") === 0L)
  }

  test("hand-computed two-time cohort") {
    // t=1: n1=2 n2=2 d=1 (group1 event) → e1 += (1e6·1·2)//4 = 500000
    //   v += ((500000·2)//4·(4−1))//3 = 250000·3//3 = 250000
    // t=2: remaining n1=1 n2=2, d=1 (group2) → e1 += (1e6·1)//3 = 333333
    //   v += ((333333·2)//3·(3−1))//2 = 222222·2//2 = 222222
    val subj = Seq((1, true, true), (2, true, false),
      (3, false, true), (3, false, false)).toDF("dur", "ev", "g")
    val r = Survival.logRank(subj, "dur", "ev", "g").collect().head
    assert(r.getAs[Long]("n1") === 2L && r.getAs[Long]("n2") === 2L)
    assert(r.getAs[Long]("o1") === 1L && r.getAs[Long]("o2") === 1L)
    assert(r.getAs[String]("e1_micro") === "833333")
    assert(r.getAs[String]("v_micro") === "472222")
    // chi2 = (1e6·1 − 833333)² div 472222 = 166667² div 472222 = 58823
    assert(r.getAs[Long]("chi2_ppm") ===
      (166667L * 166667L) / 472222L)
  }

  test("all events in one group at distinct times: chi2 positive") {
    val subj = (Seq.tabulate(10)(i => (i + 1, true, true)) ++
      Seq.tabulate(10)(i => (100 + i, false, false)))
      .toDF("dur", "ev", "g")
    val r = Survival.logRank(subj, "dur", "ev", "g").collect().head
    assert(r.getAs[Long]("o1") === 10L && r.getAs[Long]("o2") === 0L)
    assert(r.getAs[Long]("chi2_ppm") > 0L)
  }

  test("single subject: variance zero, chi2 NULL (guard)") {
    val subj = Seq((3, true, true)).toDF("dur", "ev", "g")
    val r = Survival.logRank(subj, "dur", "ev", "g").collect().head
    assert(r.getAs[String]("v_micro") === "0")
    assert(r.isNullAt(r.fieldIndex("chi2_ppm")))
  }

  test("gated instance returns one finite row at sf0.001") {
    val r = Survival.logrankEvents(spark, sfDir).collect().head
    assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") > 0L)
    assert(r.getAs[Long]("o1") >= 0L)
  }
}

package graft

import graft.operators.{KruskalWallis, Spearman}

/** Hand-walked ground truth for the rank-statistic pair added beside
  * Kendall/Mann-Whitney: Spearman rho on centered doubled ranks and
  * the Kruskal-Wallis H statistic. */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("Spearman: perfect monotone data is exactly +/-1e6 (clamped isqrt)") {
    val up = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("x", "y")
    val gotUp = Spearman.rho(up, "x", "y")
      .select("n", "rho_permicro").as[(Long, Long)].head()
    assert(gotUp === ((4L, 1000000L)))
    val down = Seq((1L, 4L), (2L, 3L), (3L, 2L), (4L, 1L)).toDF("x", "y")
    assert(Spearman.rho(down, "x", "y")
      .select("rho_permicro").as[Long].head() === -1000000L)
  }

  test("Spearman: balanced independent cells give rho exactly 0") {
    val df = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L)).toDF("x", "y")
    val got = Spearman.rho(df, "x", "y")
      .select("cov", "rho_permicro").as[(String, Long)].head()
    assert(got._1 === "0")
    assert(got._2 === 0L)
  }

  test("Spearman: tie-corrected variances match the doubled-rank walk") {
    // x = (1,1,2), y = (1,2,3): r2x = (2·0+2+1, 2·0+2+1, 2·2+1+1) =
    // (3,3,6); r2y = (2,4,6); n+1 = 4 -> dx = (-1,-1,2), dy = (-2,0,2)
    // cov = 2 + 0 + 4 = 6; varx = 1+1+4 = 6; vary = 4+0+4 = 8
    val df = Seq((1L, 1L), (1L, 2L), (2L, 3L)).toDF("x", "y")
    val got = Spearman.rho(df, "x", "y")
      .select("cov", "varx", "vary").as[(String, String, String)].head()
    assert(got === (("6", "6", "8")))
  }

  test("Kruskal-Wallis: two clean groups hand-walk to H = 2.4") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("q", "g")
    val got = KruskalWallis.hStat(df, "q", "g")
      .orderBy("grp")
      .select("grp", "n_g", "r2_sum", "n", "h_permicro")
      .as[(String, Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 2L, "6", 4L, 2400000L),
      ("b", 2L, "14", 4L, 2400000L)))
  }

  test("Kruskal-Wallis: identical group distributions give H near 0") {
    // both groups see the same value multiset -> rank sums equal,
    // H = 3/(N(N+1))·(2·(R2/2... )) - 3(N+1) lands at its minimum
    val df = Seq((1L, "a"), (2L, "a"), (1L, "b"), (2L, "b")).toDF("q", "g")
    val h = KruskalWallis.hStat(df, "q", "g")
      .select("h_permicro").as[Long].head()
    // R2_a = R2_b = 3+7 = 10 -> T = 50 each, S = 100, D = 20 ->
    // H = 3·5e6 − 15e6 = 0
    assert(h === 0L)
  }

  test("Kruskal-Wallis: all mass in one value cell stays finite and exact") {
    val df = Seq((7L, "a"), (7L, "a"), (7L, "b")).toDF("q", "g")
    val got = KruskalWallis.hStat(df, "q", "g")
      .orderBy("grp").select("r2_sum", "h_permicro")
      .as[(String, Long)].collect().toSeq
    // single cell: r2 = 2·0+3+1 = 4; R2_a = 8, R2_b = 4
    // T_a = 64/2 = 32, T_b = 16/1 = 16, S = 48, D = 12 -> q=4,r=0
    // H = 3·4e6 − 3e6·4 = 0 (all ties -> uncorrected H is 0)
    assert(got === Seq(("8", 0L), ("4", 0L)))
  }
}

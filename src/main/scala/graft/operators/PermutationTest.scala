package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Hll, MixMod61, Native}

/** Permutation (randomization) test for a difference of means, and the
  * Benjamini–Hochberg step-up procedure over a family of such tests —
  * the significance layer of the experiment-platform family
  * (`bootstrap_ab` gives the CI, `welch_t` the closed-form statistic;
  * the permutation p is the assumption-free readout the reference's
  * resampling evaluation reaches for:
  * /root/reference/MachineLearning/Data/bootstrap_metrics.py).
  *
  * Exactness discipline: classical permutation tests draw random
  * relabelings; here relabeling k assigns each unit to arm A iff
  * `mix(unit·STRIDE + k)` is even — the repo's validated two-round
  * mod-(2⁶¹−1) mixer ([[MixMod61]]), the same literal constants in
  * both engines, so the permutation distribution is a deterministic
  * function of the data and the p-value is an exact rational:
  *   p_ppm = 10⁶·(1 + #{k : |T_k| ≥ |T_obs|}) div (K+1),
  * the add-one (Phipson–Smyth) estimator in parts-per-million. The
  * statistic is the micro-quantized mean difference, truncating
  * division applied to |sum| with the sign reattached so trunc-vs-floor
  * never diverges between engines.
  *
  * The relabeling is Bernoulli(½) per unit (hash bit), not a
  * permutation of the observed arm vector — at n beyond a few hundred
  * the two randomization distributions are indistinguishable and the
  * Bernoulli form needs NO coordination across the cluster: each of
  * the K relabelings is a map-side bit of the unit id.
  *
  * Scale: the K-way explode is the only volume (K·n rows), consumed by
  * ONE partially-aggregated groupBy(k) → K rows. Nothing after the
  * map stage is data-shaped; the shuffle carries K·(4 longs). At
  * 100 TB this is a single scan with map-side combine — the same
  * envelope as `bootstrap_ab`.
  */
object PermutationTest {
  /** Relabelings; p-value granularity is 1/(K+1) = 1/32. */
  val K = 31
  /** Unit-id stride separating relabeling hash streams; ≥ K+2 keeps
    * (unit·STRIDE + k) injective across k, and a power of two distinct
    * from the bootstrap's 64 keeps the two hash streams disjoint. */
  val Stride = 128L

  private def mix(c: Column): Column =
    Native.call("graft_mix_mod61", exprs => MixMod61(exprs.head), c)

  /** Signed micro-mean as (sum, n) → BIGINT micros; trunc on |sum|. */
  private val meanMicro =
    (s: String, n: String) => s"""CASE WHEN $n > 0 THEN
      (CASE WHEN $s < 0 THEN -1L ELSE 1L END)
        * ((1000000 * abs(CAST($s AS DECIMAL(38,0)))) div $n) END"""

  /** One-row frame: (n1, n2, t_obs_micro, k_perms, ge_count, p_ppm)
    * for the observed arms in `armCol` (g1 vs g2) against K hash
    * relabelings of the unit ids. */
  def meanDiff(df: DataFrame, idCol: String, valueCol: String,
               armCol: String, g1: String, g2: String): DataFrame = {
    val base = df.filter(col(armCol) === g1 || col(armCol) === g2)
      .select(col(idCol).cast("long").as("i"),
        col(valueCol).cast("long").as("x"),
        (col(armCol) === g1).as("a1"))
      .localCheckpoint() // consumed by the observed AND relabeled pass
    val obs = base.agg(
        sum(when(col("a1"), col("x"))).cast("decimal(38,0)").as("s1"),
        count(when(col("a1"), lit(1))).as("n1"),
        sum(when(!col("a1"), col("x"))).cast("decimal(38,0)").as("s2"),
        count(when(!col("a1"), lit(1))).as("n2"))
      .select(col("n1"), col("n2"),
        (expr(meanMicro("s1", "n1")) - expr(meanMicro("s2", "n2")))
          .as("t_obs_micro"))
    val perms = base
      .withColumn("k", explode(expr(s"sequence(1, $K)")))
      .withColumn("pa", mix(col("i") * lit(Stride) + col("k")) % 2 === 0)
      .groupBy("k")
      .agg(sum(when(col("pa"), col("x"))).cast("decimal(38,0)").as("s1"),
        count(when(col("pa"), lit(1))).as("n1"),
        sum(when(!col("pa"), col("x"))).cast("decimal(38,0)").as("s2"),
        count(when(!col("pa"), lit(1))).as("n2"))
      .select((expr(meanMicro("s1", "n1")) - expr(meanMicro("s2", "n2")))
        .as("t"))
    obs.crossJoin(broadcast(
        perms.crossJoin(obs.select(col("t_obs_micro").as("__o")))
          .agg(count(when(abs(col("t")) >= abs(col("__o")), lit(1)))
            .as("ge_count"))))
      .select(col("n1"), col("n2"), col("t_obs_micro"),
        lit(K).as("k_perms"), col("ge_count"),
        expr(s"(1000000 * (1 + ge_count)) div ${K + 1}").as("p_ppm"))
  }

  /** Per-group permutation tests + Benjamini–Hochberg at `alphaPpm`:
    * within every `grpCol` value an A/A split of units by hash bit
    * (stream k=0) is tested against relabelings k=1..K; the m p-values
    * then pass through the step-up rule
    *   i* = max{ i : p_(i)·m ≤ α·i },  reject ranks ≤ i*
    * — all in integer ppm arithmetic. Ranks break p-ties by group name
    * so both engines agree on the order (rejection itself is
    * tie-stable: equal p at ranks i<j either both pass via i* ≥ j or
    * both fail).
    *
    * The BH window runs over the m-row per-group frame (m = group
    * cardinality, a dimension — ~5 event types here), never the fact.
    */
  def bhFdr(df: DataFrame, grpCol: String, idCol: String,
            valueCol: String, alphaPpm: Long = 50000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col(grpCol).as("g"),
        col(idCol).cast("long").as("i"),
        col(valueCol).cast("long").as("x"))
      .withColumn("k", explode(expr(s"sequence(0, $K)")))
      .withColumn("pa", mix(col("i") * lit(Stride) + col("k")) % 2 === 0)
      .groupBy("g", "k")
      .agg(sum(when(col("pa"), col("x"))).cast("decimal(38,0)").as("s1"),
        count(when(col("pa"), lit(1))).as("n1"),
        sum(when(!col("pa"), col("x"))).cast("decimal(38,0)").as("s2"),
        count(when(!col("pa"), lit(1))).as("n2"))
      .select(col("g"), col("k"), col("n1"), col("n2"),
        (expr(meanMicro("s1", "n1")) - expr(meanMicro("s2", "n2")))
          .as("t"))
    val obs = base.filter(col("k") === 0)
      .select(col("g"), col("n1"), col("n2"), col("t").as("t_obs_micro"))
    val pvals = base.filter(col("k") > 0)
      .join(obs.select(col("g"), col("t_obs_micro")), "g")
      .groupBy("g")
      .agg(count(when(abs(col("t")) >= abs(col("t_obs_micro")), lit(1)))
        .as("ge_count"))
      .select(col("g"),
        expr(s"(1000000 * (1 + ge_count)) div ${K + 1}").as("p_ppm"))
    val m = Window.orderBy(col("p_ppm"), col("g"))
    val ranked = obs.join(pvals, "g")
      .withColumn("rk", row_number().over(m))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("ok", col("p_ppm") * col("m") <= lit(alphaPpm) * col("rk"))
    ranked
      .withColumn("i_star", max(when(col("ok"), col("rk")).otherwise(0L))
        .over(Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("g"), col("n1"), col("n2"), col("t_obs_micro"),
        col("p_ppm"), col("rk").cast("long").as("rk"),
        (col("rk") <= col("i_star")).as("rejected"))
  }

  /** Benjamini–Yekutieli FDR — [[bhFdr]]'s guarantee holds only under
    * independence/PRDS; BY divides the budget by the harmonic number
    * c(m) = Σ 1/i and controls FDR under ARBITRARY dependence — the
    * honest correction when the per-group tests share users or time
    * (as A/A slices over one stream do). Same permutation p-values,
    * same rank walk; the rejection test scales to
    * p·m·c_micro ≤ α·rk·10⁶ with c quantized ONCE at micros
    * (Σ 10⁶ div i — deterministic, both engines; the ≤10⁻⁶ quantization
    * slack is three orders below the 5% budget granularity). */
  def byFdr(df: DataFrame, grpCol: String, idCol: String,
            valueCol: String, alphaPpm: Long = 50000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    bhFdr(df, grpCol, idCol, valueCol, alphaPpm)
      .drop("rejected")
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("c_micro", expr(
        "aggregate(sequence(1L, m), 0L, (acc, i) -> acc + 1000000L div i)"))
      .withColumn("ok",
        col("p_ppm") * col("m") * col("c_micro")
          <= lit(alphaPpm) * col("rk") * lit(1000000L))
      .withColumn("i_star", max(when(col("ok"), col("rk")).otherwise(0L))
        .over(wAll))
      .select(col("g"), col("n1"), col("n2"), col("t_obs_micro"),
        col("p_ppm"), col("rk"), col("c_micro"),
        (col("rk") <= col("i_star")).as("rejected"))
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated instance: lineitem quantity, returned ('R') vs
    * never-returned ('N') arms — the same frame as `bootstrap_ab`, so
    * the two significance readouts are directly comparable. */
  def permLineitem(spark: SparkSession, dir: String): DataFrame =
    meanDiff(Tables.lineitem(spark, dir).select(
      (col("l_orderkey") * 10 + col("l_linenumber")).as("lid"),
      round(col("l_quantity")).cast("long").as("q"),
      col("l_returnflag").as("flag")),
      "lid", "q", "flag", "R", "N")

  /** Gated instance: per-event-type A/A tests on value cents keyed by
    * user (the unit of randomization), BH at α = 5%. */
  def bhEvents(spark: SparkSession, dir: String): DataFrame =
    bhFdr(Tables.events(spark, dir).select(col("event_type"),
        col("user_id"), round(col("value") * 100).cast("long").as("cents")),
      "event_type", "user_id", "cents")

  /** Gated instance: the same tests under the dependence-honest BY
    * budget (the slices share the one event stream). */
  def byEvents(spark: SparkSession, dir: String): DataFrame =
    byFdr(Tables.events(spark, dir).select(col("event_type"),
        col("user_id"), round(col("value") * 100).cast("long").as("cents")),
      "event_type", "user_id", "cents")

  /** The mixer chain as DuckDB CTE columns over `key` → `pa`. */
  private def mixerCtes(src: String, keyExpr: String, carry: String): String =
    s"""hashed AS (
      |  SELECT $carry,
      |    CAST((CAST(${Hll.A} AS HUGEINT) * ($keyExpr) + ${Hll.B}) % ${Hll.P}
      |      AS BIGINT) AS h1
      |  FROM $src
      |), mixed AS (
      |  SELECT $carry,
      |    CAST((CAST(${Hll.A2} AS HUGEINT) * xor(h1, h1 >> 30)) % ${Hll.P}
      |      AS BIGINT) AS h2
      |  FROM hashed
      |), armed AS (
      |  SELECT $carry, xor(h2, h2 >> 27) % 2 = 0 AS pa FROM mixed
      |)""".stripMargin

  private val meanMicroSql =
    (s: String, n: String) => s"""CASE WHEN $n > 0 THEN
      CAST((CASE WHEN $s < 0 THEN -1 ELSE 1 END)
        * ((1000000 * abs(CAST($s AS HUGEINT))) // $n) AS BIGINT) END"""

  def oracleSql: String =
    s"""WITH base AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS i,
      |    CAST(round(l_quantity) AS BIGINT) AS x,
      |    l_returnflag = 'R' AS a1
      |  FROM lineitem WHERE l_returnflag IN ('R', 'N')
      |), obs AS (
      |  SELECT CAST(count(CASE WHEN a1 THEN 1 END) AS BIGINT) AS n1,
      |    CAST(count(CASE WHEN NOT a1 THEN 1 END) AS BIGINT) AS n2,
      |    ${meanMicroSql("sum(CASE WHEN a1 THEN x ELSE 0 END)",
             "count(CASE WHEN a1 THEN 1 END)")}
      |    - ${meanMicroSql("sum(CASE WHEN NOT a1 THEN x ELSE 0 END)",
             "count(CASE WHEN NOT a1 THEN 1 END)")} AS t_obs_micro
      |  FROM base
      |), rows_k AS (
      |  SELECT i, x, k FROM base
      |  CROSS JOIN (SELECT unnest(range(1, ${K + 1})) AS k)
      |), ${mixerCtes("rows_k", s"i * $Stride + k", "x, k")}
      |, perms AS (
      |  SELECT k,
      |    ${meanMicroSql("sum(CASE WHEN pa THEN x ELSE 0 END)",
             "count(CASE WHEN pa THEN 1 END)")}
      |    - ${meanMicroSql("sum(CASE WHEN NOT pa THEN x ELSE 0 END)",
             "count(CASE WHEN NOT pa THEN 1 END)")} AS t
      |  FROM armed GROUP BY k
      |), cnt AS (
      |  SELECT CAST(count(CASE WHEN abs(p.t) >= abs(o.t_obs_micro)
      |    THEN 1 END) AS BIGINT) AS ge_count
      |  FROM perms p CROSS JOIN obs o
      |)
      |SELECT o.n1, o.n2, o.t_obs_micro, $K AS k_perms, c.ge_count,
      |  CAST((1000000 * (1 + c.ge_count)) // ${K + 1} AS BIGINT) AS p_ppm
      |FROM obs o CROSS JOIN cnt c""".stripMargin

  def bhOracleSql: String =
    s"""WITH base AS (
      |  SELECT event_type AS g, user_id AS i,
      |    CAST(round(value * 100) AS BIGINT) AS x
      |  FROM events
      |), rows_k AS (
      |  SELECT g, i, x, k FROM base
      |  CROSS JOIN (SELECT unnest(range(0, ${K + 1})) AS k)
      |), ${mixerCtes("rows_k", s"i * $Stride + k", "g, x, k")}
      |, stats AS (
      |  SELECT g, k,
      |    CAST(count(CASE WHEN pa THEN 1 END) AS BIGINT) AS n1,
      |    CAST(count(CASE WHEN NOT pa THEN 1 END) AS BIGINT) AS n2,
      |    ${meanMicroSql("sum(CASE WHEN pa THEN x ELSE 0 END)",
             "count(CASE WHEN pa THEN 1 END)")}
      |    - ${meanMicroSql("sum(CASE WHEN NOT pa THEN x ELSE 0 END)",
             "count(CASE WHEN NOT pa THEN 1 END)")} AS t
      |  FROM armed GROUP BY g, k
      |), obs AS (
      |  SELECT g, n1, n2, t AS t_obs_micro FROM stats WHERE k = 0
      |), pv AS (
      |  SELECT s.g,
      |    CAST((1000000 * (1 + count(CASE WHEN abs(s.t) >= abs(o.t_obs_micro)
      |      THEN 1 END))) // ${K + 1} AS BIGINT) AS p_ppm
      |  FROM stats s JOIN obs o ON s.g = o.g
      |  WHERE s.k > 0 GROUP BY s.g
      |), ranked AS (
      |  SELECT o.g, o.n1, o.n2, o.t_obs_micro, p.p_ppm,
      |    CAST(row_number() OVER (ORDER BY p.p_ppm, o.g) AS BIGINT) AS rk,
      |    CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM obs o JOIN pv p ON o.g = p.g
      |), istar AS (
      |  SELECT coalesce(max(CASE WHEN p_ppm * m <= 50000 * rk
      |    THEN rk END), 0) AS i_star
      |  FROM ranked
      |)
      |SELECT r.g, r.n1, r.n2, r.t_obs_micro, r.p_ppm, r.rk,
      |  r.rk <= s.i_star AS rejected
      |FROM ranked r CROSS JOIN istar s""".stripMargin

  def byOracleSql: String =
    s"""WITH base AS (
      |  SELECT event_type AS g, user_id AS i,
      |    CAST(round(value * 100) AS BIGINT) AS x
      |  FROM events
      |), rows_k AS (
      |  SELECT g, i, x, k FROM base
      |  CROSS JOIN (SELECT unnest(range(0, ${K + 1})) AS k)
      |), ${mixerCtes("rows_k", s"i * $Stride + k", "g, x, k")}
      |, stats AS (
      |  SELECT g, k,
      |    CAST(count(CASE WHEN pa THEN 1 END) AS BIGINT) AS n1,
      |    CAST(count(CASE WHEN NOT pa THEN 1 END) AS BIGINT) AS n2,
      |    ${meanMicroSql("sum(CASE WHEN pa THEN x ELSE 0 END)",
             "count(CASE WHEN pa THEN 1 END)")}
      |    - ${meanMicroSql("sum(CASE WHEN NOT pa THEN x ELSE 0 END)",
             "count(CASE WHEN NOT pa THEN 1 END)")} AS t
      |  FROM armed GROUP BY g, k
      |), obs AS (
      |  SELECT g, n1, n2, t AS t_obs_micro FROM stats WHERE k = 0
      |), pv AS (
      |  SELECT s.g,
      |    CAST((1000000 * (1 + count(CASE WHEN abs(s.t) >= abs(o.t_obs_micro)
      |      THEN 1 END))) // ${K + 1} AS BIGINT) AS p_ppm
      |  FROM stats s JOIN obs o ON s.g = o.g
      |  WHERE s.k > 0 GROUP BY s.g
      |), ranked AS (
      |  SELECT o.g, o.n1, o.n2, o.t_obs_micro, p.p_ppm,
      |    CAST(row_number() OVER (ORDER BY p.p_ppm, o.g) AS BIGINT) AS rk,
      |    CAST(count(*) OVER () AS BIGINT) AS m
      |  FROM obs o JOIN pv p ON o.g = p.g
      |), cm AS (
      |  -- rk enumerates exactly 1..m, so the harmonic sum rides ranked
      |  SELECT CAST(sum(1000000 // rk) AS BIGINT) AS c_micro FROM ranked
      |), istar AS (
      |  SELECT coalesce(max(CASE
      |    WHEN r.p_ppm * r.m * c.c_micro <= 50000 * r.rk * 1000000
      |    THEN r.rk END), 0) AS i_star
      |  FROM ranked r CROSS JOIN cm c
      |)
      |SELECT r.g, r.n1, r.n2, r.t_obs_micro, r.p_ppm, r.rk,
      |  c.c_micro, r.rk <= s.i_star AS rejected
      |FROM ranked r CROSS JOIN istar s CROSS JOIN cm c""".stripMargin
}

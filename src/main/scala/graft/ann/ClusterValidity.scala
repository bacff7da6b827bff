package graft.ann

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions.{dotQ, quantize}

/** Clustering-validity scores — exact-integer forms of the indices the
  * reference computes after clustering
  * (/root/reference/MachineLearning/Ray/recsys/generate_data.py:
  * silhouette_score, calinski_harabasz_score, davies_bouldin_score
  * over HDBSCAN/UMAP output): given an assignment, HOW GOOD is the
  * clustering. Scored here for the [[KmeansStep]] assignment so the
  * whole fit→score loop is gate-pinned.
  *
  * Contract — every centroid is the TRUNCATED integer mean
  * (sign-split `|sum| div n`, [[KmeansStep]]'s own gated centroid
  * representation), so every distance is a plain integer ‖·‖² in
  * milli-quantized space via the codegen'd dot-product expansion:
  * - W_c = Σ d²(x, m_own) per cluster (within SS); W = Σ W_c
  * - B   = Σ_c n_c·‖m_c − g‖², g = truncated global mean
  * - Calinski-Harabasz reported as exact digit-string parts
  *   ch_num = B·(N−k), ch_den = W·(k−1) — the ratio is unbounded, so
  *   the gate hashes the rational's parts, not a capped quotient
  * - simplified silhouette (the centroid-distance variant used at
  *   scale): per point a = ⌊√d²_own⌋, b = ⌊√min_other d²⌋,
  *   s = 10⁶·(b−a) div max(a,b) (0 when both distances are 0);
  *   per-cluster truncated sign-split mean. ⌊√⌋ is exact — d² ≤ ~10⁹
  *   ≪ 2⁵³ — and clamped ±1 anyway as a guard.
  * The per-point cost is the same k-distance score the assignment
  * already paid; everything after is cluster-table sized. All sums
  * accumulate in DECIMAL(38,0) (W ≈ N·d²  passes BIGINT at ~10¹⁰
  * points).
  */
object ClusterValidity {

  /** Exact ⌊√x⌋ for long x (≪ 2⁵²), clamped: SQL string form. */
  private def sqrtSql(x: String): String = {
    val s = s"CAST(floor(sqrt(CAST($x AS DOUBLE))) AS BIGINT)"
    s"""(CASE WHEN $x <= 0 THEN 0L
       |  WHEN ($s + 1) * ($s + 1) <= $x THEN $s + 1
       |  WHEN $s * $s > $x THEN $s - 1
       |  ELSE $s END)""".stripMargin
  }

  /** DuckDB twin of [[sqrtSql]] — ONE definition for both oracles so a
    * clamp fix can never desynchronize an oracle from the engine. */
  private def sqrtDuckSql(x: String): String = {
    val s = s"CAST(floor(sqrt(CAST($x AS DOUBLE))) AS BIGINT)"
    s"""(CASE WHEN $x <= 0 THEN 0
       |  WHEN ($s + 1) * ($s + 1) <= $x THEN $s + 1
       |  WHEN $s * $s > $x THEN $s - 1
       |  ELSE $s END)""".stripMargin
  }

  private val truncMean = """(CASE WHEN __s < 0 THEN -1L ELSE 1L END)
    | * (abs(__s) div __n)""".stripMargin

  /** Shared fit: seeded assignment + truncated-mean centroid table,
    * both materialized once — [[validate]] and [[daviesBouldin]] score
    * against the SAME frames instead of re-deriving the corpus-scale
    * assignment twice. */
  private def clustering(points: DataFrame, idCol: String, vecCol: String,
                         k: Int): (DataFrame, DataFrame) = {
    val pts = points.select(col(idCol).cast("long").as("__id"),
        quantize(col(vecCol)).as("__e"))
      .withColumn("__nrm", dotQ(col("__e"), col("__e")))
      .localCheckpoint() // seeds and assignment share it
    val seeds = pts.filter(col("__id") < k)
      .select(col("__id").as("__sid"), col("__e").as("__c"),
        col("__nrm").as("__cnrm"))
    val assigned = pts.crossJoin(broadcast(seeds))
      .withColumn("__d2",
        col("__nrm") + col("__cnrm") - lit(2L) * dotQ(col("__e"), col("__c")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("__id").orderBy(col("__d2"), col("__sid"))))
      .filter(col("__rn") === 1)
      .select(col("__id"), col("__e"), col("__nrm"),
        col("__sid").as("__cid"))
      .localCheckpoint() // means AND re-scoring read it
    val means = assigned
      .select(col("__cid"), posexplode(col("__e")).as(Seq("__dim", "__v")))
      .groupBy("__cid", "__dim")
      .agg(count(lit(1)).as("__n"), sum("__v").as("__s"))
      .withColumn("__m", expr(truncMean))
      .groupBy(col("__cid").as("__mcid"), col("__n").as("__ncl"))
      .agg(expr("transform(sort_array(collect_list(struct(__dim, __m)))," +
        " x -> x.__m)").as("__m"))
      .withColumn("__mnrm", dotQ(col("__m"), col("__m")))
      .localCheckpoint()
    (assigned, means)
  }

  /** Validity rows (centroid, n_assigned, w_c, sil_permicro, ch_num,
    * ch_den) for points seeded-assigned to k centroids and scored
    * against the assignment's truncated means. */
  def validate(points: DataFrame, idCol: String, vecCol: String,
               k: Int): DataFrame = {
    val (assigned, means) = clustering(points, idCol, vecCol, k)
    val global = assigned
      .select(posexplode(col("__e")).as(Seq("__dim", "__v")))
      .groupBy("__dim")
      .agg(count(lit(1)).as("__n"), sum("__v").as("__s"))
      .withColumn("__g", expr(truncMean))
      .agg(expr("transform(sort_array(collect_list(struct(__dim, __g)))," +
        " x -> x.__g)").as("__g"),
        first(col("__n")).cast("decimal(38,0)").as("__N"))
      .withColumn("__gnrm", dotQ(col("__g"), col("__g")))
    // per-point a² (own mean) and b² (nearest other mean)
    val perPoint = assigned.crossJoin(broadcast(means))
      .withColumn("__d2m",
        col("__nrm") + col("__mnrm") - lit(2L) * dotQ(col("__e"), col("__m")))
      .groupBy(col("__id"), col("__cid"))
      .agg(min(when(col("__mcid") === col("__cid"), col("__d2m"))).as("a2"),
        min(when(col("__mcid") =!= col("__cid"), col("__d2m"))).as("b2"))
      .withColumn("__a", expr(sqrtSql("a2")))
      .withColumn("__b", expr(sqrtSql("b2")))
      .withColumn("__sil", expr(
        """CASE WHEN greatest(__a, __b) > 0 THEN
          |  (CASE WHEN __b < __a THEN -1L ELSE 1L END)
          |    * ((1000000 * abs(__b - __a)) div greatest(__a, __b))
          |  ELSE 0L END""".stripMargin))
    val perCluster = perPoint.groupBy(col("__cid"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n_assigned"),
        sum(col("a2").cast("decimal(38,0)")).as("w_c"),
        sum(col("__sil").cast("decimal(38,0)")).as("__ss"))
      .withColumn("sil_permicro", expr(
        """CAST((CASE WHEN __ss < 0 THEN -1L ELSE 1L END)
          | * (abs(__ss) div n_assigned) AS BIGINT)""".stripMargin))
    // CH parts from the cluster means vs the global mean
    val between = means.crossJoin(broadcast(global))
      .withColumn("__d2g",
        col("__mnrm") + col("__gnrm") - lit(2L) * dotQ(col("__m"), col("__g")))
      .agg(sum(col("__ncl").cast("decimal(38,0)")
        * col("__d2g").cast("decimal(38,0)")).as("__B"),
        first(col("__N")).as("__N"))
    val wTotal = perCluster.agg(sum(col("w_c")).as("__W"))
    val ch = between.crossJoin(broadcast(wTotal))
      .select(
        (col("__B") * (col("__N") - k)).cast("string").as("ch_num"),
        (col("__W") * (k - 1)).cast("string").as("ch_den"))
    perCluster.crossJoin(broadcast(ch))
      .select(col("__cid").as("centroid"),
        col("n_assigned").cast("long").as("n_assigned"),
        col("w_c").cast("string").as("w_c"),
        col("sil_permicro"), col("ch_num"), col("ch_den"))
  }

  /** Davies-Bouldin per cluster from the SAME validity rows: scatter
    * s_i = ⌊√(W_i div n_i)⌋ (milli), centroid separations d_ij =
    * ⌊√‖m_i−m_j‖²⌋, R_i = max_j 10⁶·(s_i+s_j) div d_ij, and the DB
    * index = truncated mean of R_i. Lower is better; everything runs
    * on the k-row cluster table (k² pairs — bounded forever). Same
    * truncated-mean centroid contract as [[validate]]. */
  def daviesBouldin(points: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    val (assigned, means) = clustering(points, idCol, vecCol, k)
    // within-SS per cluster straight off the shared frames (one scored
    // pass — no second assignment derivation)
    val base = assigned.join(broadcast(means),
        assigned("__cid") === means("__mcid"))
      .withColumn("__a2",
        col("__nrm") + col("__mnrm") - lit(2L) * dotQ(col("__e"), col("__m")))
      .groupBy(col("__cid").as("centroid"))
      .agg(count(lit(1)).as("n_assigned"),
        sum(col("__a2").cast("decimal(38,0)")).as("__w"))
    val scatter = base.join(means, base("centroid") === means("__mcid"))
      .select(col("centroid"), col("n_assigned"), col("__m"), col("__mnrm"),
        expr(sqrtSql("CAST(__w div n_assigned AS BIGINT)")).as("__si"))
      .localCheckpoint() // self-joined k×k
    val pairs = scatter.as("i").join(scatter.as("j"),
        col("i.centroid") =!= col("j.centroid"))
      .withColumn("__dij", expr(sqrtSql(
        "(i.__mnrm + j.__mnrm - 2 * graft_long_array_dot(i.__m, j.__m))")))
      .select(col("i.centroid").as("centroid"),
        col("i.n_assigned").as("n_assigned"),
        col("i.__si").as("__si"), col("j.__si").as("__sj"), col("__dij"))
    val ri = pairs
      .withColumn("__r", expr(
        """CASE WHEN __dij > 0
          |  THEN (1000000 * (__si + __sj)) div __dij
          |  ELSE CAST(NULL AS BIGINT) END""".stripMargin))
      .groupBy("centroid", "n_assigned")
      .agg(max(col("__r")).as("r_i"))
    val dbExact = ri.agg(
      expr("CAST(sum(r_i) div count(1) AS BIGINT)").as("db_permicro"))
    ri.crossJoin(broadcast(dbExact))
      .select(col("centroid"), col("n_assigned"), col("r_i"),
        col("db_permicro"))
  }

  // ---- query-map entries (hash-gated) ----

  /** Gated instance: score the k = 8 seed assignment over the
    * embeddings corpus — same seeds as kmeans_step, so the two gates
    * describe the same clustering. */
  def clusterValidityEmbeddings(spark: SparkSession, dir: String): DataFrame =
    validate(Tables.embeddings(spark, dir), "vec_id", "embedding", k = 8)

  /** Gated DB-index instance over the same clustering. */
  def daviesBouldinEmbeddings(spark: SparkSession, dir: String): DataFrame =
    daviesBouldin(Tables.embeddings(spark, dir), "vec_id", "embedding", k = 8)

  def daviesBouldinOracleSql: String = {
    val sq = sqrtDuckSql _
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS em
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, em,
       |    CAST(list_sum(list_transform(em, v -> v * v)) AS BIGINT) AS nrm
       |  FROM e
       |), c1 AS (
       |  SELECT vec_id AS sid, em AS cm, nrm AS cnrm FROM n WHERE vec_id < 8
       |), d AS (
       |  SELECT n.vec_id, n.em, n.nrm, c1.sid,
       |    n.nrm + c1.cnrm - 2 * CAST(list_sum(
       |      list_transform(generate_series(1, len(n.em)),
       |        i -> n.em[i] * c1.cm[i])) AS BIGINT) AS d2
       |  FROM n, c1
       |), asg AS (
       |  SELECT vec_id, em, nrm, sid AS cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d2, sid) AS rn FROM d) WHERE rn = 1
       |), mdim AS (
       |  SELECT cid, i AS dim, CAST(count(*) AS BIGINT) AS nn,
       |    CAST(sum(em[i]) AS HUGEINT) AS s
       |  FROM asg, unnest(generate_series(1, len(em))) t(i)
       |  GROUP BY cid, i
       |), m AS (
       |  SELECT cid AS mcid, nn AS ncl,
       |    list(CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
       |      * (abs(s) // nn) AS BIGINT) ORDER BY dim) AS mm
       |  FROM mdim GROUP BY cid, nn
       |), mn AS (
       |  SELECT mcid, ncl, mm,
       |    CAST(list_sum(list_transform(mm, v -> v * v)) AS BIGINT) AS mnrm
       |  FROM m
       |), wc AS (
       |  SELECT asg.cid, CAST(count(*) AS BIGINT) AS n_assigned,
       |    CAST(sum(asg.nrm + mn.mnrm - 2 * CAST(list_sum(
       |      list_transform(generate_series(1, len(asg.em)),
       |        i -> asg.em[i] * mn.mm[i])) AS BIGINT)) AS HUGEINT) AS w
       |  FROM asg JOIN mn ON mn.mcid = asg.cid
       |  GROUP BY asg.cid
       |), sc AS (
       |  SELECT wc.cid, wc.n_assigned, mn.mm, mn.mnrm,
       |    ${sq("CAST(wc.w // wc.n_assigned AS BIGINT)")} AS si
       |  FROM wc JOIN mn ON mn.mcid = wc.cid
       |), pairs AS (
       |  SELECT i.cid, i.n_assigned, i.si, j.si AS sj,
       |    ${sq(
      """(i.mnrm + j.mnrm - 2 * CAST(list_sum(
        |      list_transform(generate_series(1, len(i.mm)),
        |        x -> i.mm[x] * j.mm[x])) AS BIGINT))""".stripMargin)} AS dij
       |  FROM sc i JOIN sc j ON i.cid <> j.cid
       |), ri AS (
       |  SELECT cid, n_assigned,
       |    max(CASE WHEN dij > 0
       |      THEN (1000000 * (si + sj)) // dij END) AS r_i
       |  FROM pairs GROUP BY cid, n_assigned
       |), db AS (
       |  SELECT CAST(sum(r_i) // count(*) AS BIGINT) AS db_permicro FROM ri
       |)
       |SELECT ri.cid AS centroid, ri.n_assigned,
       |  CAST(ri.r_i AS BIGINT) AS r_i, db.db_permicro
       |FROM ri, db""".stripMargin
  }

  def oracleSql: String = {
    val sq = sqrtDuckSql _
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS em
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, em,
       |    CAST(list_sum(list_transform(em, v -> v * v)) AS BIGINT) AS nrm
       |  FROM e
       |), c1 AS (
       |  SELECT vec_id AS sid, em AS cm, nrm AS cnrm FROM n WHERE vec_id < 8
       |), d AS (
       |  SELECT n.vec_id, n.em, n.nrm, c1.sid,
       |    n.nrm + c1.cnrm - 2 * CAST(list_sum(
       |      list_transform(generate_series(1, len(n.em)),
       |        i -> n.em[i] * c1.cm[i])) AS BIGINT) AS d2
       |  FROM n, c1
       |), asg AS (
       |  SELECT vec_id, em, nrm, sid AS cid FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY d2, sid) AS rn FROM d) WHERE rn = 1
       |), mdim AS (
       |  SELECT cid, i AS dim, CAST(count(*) AS BIGINT) AS nn,
       |    CAST(sum(em[i]) AS HUGEINT) AS s
       |  FROM asg, unnest(generate_series(1, len(em))) t(i)
       |  GROUP BY cid, i
       |), m AS (
       |  SELECT cid AS mcid, nn AS ncl,
       |    list(CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
       |      * (abs(s) // nn) AS BIGINT) ORDER BY dim) AS mm
       |  FROM mdim GROUP BY cid, nn
       |), mn AS (
       |  SELECT mcid, ncl, mm,
       |    CAST(list_sum(list_transform(mm, v -> v * v)) AS BIGINT) AS mnrm
       |  FROM m
       |), gdim AS (
       |  SELECT i AS dim, CAST(count(*) AS BIGINT) AS nn,
       |    CAST(sum(em[i]) AS HUGEINT) AS s
       |  FROM n, unnest(generate_series(1, len(em))) t(i)
       |  GROUP BY i
       |), g AS (
       |  SELECT list(CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
       |      * (abs(s) // nn) AS BIGINT) ORDER BY dim) AS gm,
       |    CAST(max(nn) AS HUGEINT) AS bign
       |  FROM gdim
       |), pp AS (
       |  SELECT asg.vec_id, asg.cid,
       |    min(CASE WHEN mn.mcid = asg.cid THEN asg.nrm + mn.mnrm
       |      - 2 * CAST(list_sum(list_transform(
       |          generate_series(1, len(asg.em)),
       |          i -> asg.em[i] * mn.mm[i])) AS BIGINT) END) AS a2,
       |    min(CASE WHEN mn.mcid <> asg.cid THEN asg.nrm + mn.mnrm
       |      - 2 * CAST(list_sum(list_transform(
       |          generate_series(1, len(asg.em)),
       |          i -> asg.em[i] * mn.mm[i])) AS BIGINT) END) AS b2
       |  FROM asg, mn
       |  GROUP BY asg.vec_id, asg.cid
       |), sil AS (
       |  SELECT vec_id, cid, a2,
       |    CASE WHEN greatest(${sq("a2")}, ${sq("b2")}) > 0 THEN
       |      (CASE WHEN ${sq("b2")} < ${sq("a2")} THEN -1 ELSE 1 END)
       |        * ((1000000 * abs(CAST(${sq("b2")} AS BIGINT)
       |            - ${sq("a2")})) // greatest(${sq("a2")}, ${sq("b2")}))
       |      ELSE 0 END AS s
       |  FROM pp
       |), pc AS (
       |  SELECT cid, CAST(count(*) AS HUGEINT) AS n_assigned,
       |    CAST(sum(a2) AS HUGEINT) AS w_c,
       |    CAST(sum(s) AS HUGEINT) AS ss
       |  FROM sil GROUP BY cid
       |), btw AS (
       |  SELECT CAST(sum(CAST(ncl AS HUGEINT) * (mn.mnrm + g.gnrm2
       |    - 2 * CAST(list_sum(list_transform(
       |        generate_series(1, len(mn.mm)),
       |        i -> mn.mm[i] * g.gm[i])) AS BIGINT))) AS HUGEINT) AS b,
       |    max(g.bign) AS bign
       |  FROM mn, (SELECT gm, bign,
       |    CAST(list_sum(list_transform(gm, v -> v * v)) AS BIGINT) AS gnrm2
       |    FROM g) g
       |), tot AS (SELECT CAST(sum(w_c) AS HUGEINT) AS w FROM pc)
       |SELECT pc.cid AS centroid, CAST(pc.n_assigned AS BIGINT) AS n_assigned,
       |  CAST(pc.w_c AS VARCHAR) AS w_c,
       |  CAST((CASE WHEN pc.ss < 0 THEN -1 ELSE 1 END)
       |    * (abs(pc.ss) // pc.n_assigned) AS BIGINT) AS sil_permicro,
       |  CAST(btw.b * (btw.bign - 8) AS VARCHAR) AS ch_num,
       |  CAST(tot.w * 7 AS VARCHAR) AS ch_den
       |FROM pc, btw, tot""".stripMargin
  }
}

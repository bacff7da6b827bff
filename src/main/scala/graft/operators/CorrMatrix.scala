package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Full pairwise Pearson correlation matrix over a set of numeric
  * measures in ONE aggregate pass — the feature-screening matrix a
  * model-prep pipeline computes before encoder/selection stages (the
  * reference's tabular prep,
  * /root/reference/MachineLearning/Ray/tabular/, feeds engineered
  * numeric frames whose redundancy this screens;
  * [[GroupStats.corrSlope]] is the per-group single-pair form).
  *
  * All p(p−1)/2 pairs share one scan: the 2p moment sums and p(p−1)/2
  * cross sums are DECIMAL(38,0)-carried integer aggregates (values
  * quantized ×100 — exact for 2-decimal currency/rate columns;
  * DECIMAL38 head-room holds 10¹²-row corpora where BIGINT moment sums
  * overflow), melted to long form (col_x, col_y) and finished with the
  * [[GroupStats]] double formula — correlation is invariant to the
  * ×100 scaling, the only floats are one n-scaled ratio per pair
  * rounded once to micros, NULL on zero variance.
  *
  * Scale: one map-side-combined aggregate over the fact (15 columns of
  * partial sums), 6 output rows. Nothing else touches the corpus.
  */
object CorrMatrix {

  /** Pairwise correlations of ×100-quantized columns. Returns
    * (col_x, col_y, n, corr_micros), pairs in declaration order. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val d38 = "decimal(38,0)"
    val q = df.select(cols.zipWithIndex.map { case (c, i) =>
      expr(s"CAST(round($c * 100) AS $d38)").as(s"__v$i")
    }: _*)
    val moments =
      Seq(count(lit(1)).as("n")) ++
      cols.indices.map(i => sum(col(s"__v$i")).as(s"__s$i")) ++
      cols.indices.map(i =>
        sum(expr(s"__v$i * __v$i")).as(s"__ss$i")) ++
      cols.indices.combinations(2).map { case Seq(i, j) =>
        sum(expr(s"__v$i * __v$j")).as(s"__c${i}_$j")
      }.toSeq
    val s = q.agg(moments.head, moments.tail: _*)
    val structs = cols.indices.combinations(2).map { case Seq(i, j) =>
      s"""named_struct(
         |  'col_x', '${cols(i)}', 'col_y', '${cols(j)}',
         |  'sx', __s$i, 'sy', __s$j,
         |  'sxx', __ss$i, 'syy', __ss$j, 'sxy', __c${i}_$j)""".stripMargin
    }.mkString(",\n")
    s.select(col("n"), explode(expr(s"array($structs)")).as("__m"))
      .select(col("__m.col_x").as("col_x"), col("__m.col_y").as("col_y"),
        col("n"), col("__m.sx").as("__sx"), col("__m.sy").as("__sy"),
        col("__m.sxx").as("__sxx"), col("__m.syy").as("__syy"),
        col("__m.sxy").as("__sxy"))
      .withColumn("corr_micros", {
        val n = col("n").cast("double")
        def d(c: String) = col(c).cast("double")
        val vx = n * d("__sxx") - d("__sx") * d("__sx")
        val vy = n * d("__syy") - d("__sy") * d("__sy")
        when(vx > 0 && vy > 0,
          round((n * d("__sxy") - d("__sx") * d("__sy"))
            / sqrt(vx) / sqrt(vy) * lit(1e6)).cast("long"))
      })
      .select("col_x", "col_y", "n", "corr_micros")
  }

  // ---- query-map entry (hash-gated) ----

  private val gatedCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Gated instance: the 4×4 lineitem measure matrix (6 pairs). */
  def corrMatrixLineitem(spark: SparkSession, dir: String): DataFrame =
    corrMatrix(Tables.lineitem(spark, dir), gatedCols)

  def oracleSql: String = {
    val p = gatedCols.size
    val vals = gatedCols.zipWithIndex.map { case (c, i) =>
      s"CAST(round($c * 100) AS HUGEINT) AS v$i" }.mkString(",\n      ")
    val sums =
      (0 until p).map(i => s"CAST(sum(v$i) AS HUGEINT) AS s$i") ++
      (0 until p).map(i => s"CAST(sum(v$i * v$i) AS HUGEINT) AS ss$i") ++
      (0 until p).combinations(2).map { case Seq(i, j) =>
        s"CAST(sum(v$i * v$j) AS HUGEINT) AS c${i}_$j" }
    val selects = (0 until p).combinations(2).map { case Seq(i, j) =>
      val (vx, vy) =
        (s"CAST(n AS DOUBLE) * CAST(ss$i AS DOUBLE) - CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE)",
         s"CAST(n AS DOUBLE) * CAST(ss$j AS DOUBLE) - CAST(s$j AS DOUBLE) * CAST(s$j AS DOUBLE)")
      s"""SELECT '${gatedCols(i)}' AS col_x, '${gatedCols(j)}' AS col_y,
         |  n,
         |  CASE WHEN $vx > 0 AND $vy > 0
         |    THEN CAST(round((CAST(n AS DOUBLE) * CAST(c${i}_$j AS DOUBLE)
         |        - CAST(s$i AS DOUBLE) * CAST(s$j AS DOUBLE))
         |      / sqrt($vx) / sqrt($vy) * 1e6) AS BIGINT) END AS corr_micros
         |FROM s""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (
       |  SELECT
       |      $vals
       |  FROM lineitem
       |), s AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM q
       |)
       |$selects""".stripMargin
  }
}

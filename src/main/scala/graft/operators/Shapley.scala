package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** EXACT Shapley-value channel attribution — the game-theoretic
  * endpoint of the attribution family ([[Attribution]]'s first/last
  * touch are its two degenerate orderings; the reference explains
  * models with SHAP, /root/reference/MachineLearning/SHAP/
  * shap_demo_xgb.py, and this is the same Shapley axiom set applied to
  * marketing-style conversion credit): each channel's credit is its
  * average marginal contribution over all coalition orderings.
  *
  * With a BOUNDED channel set (the event-type domain, 4 touch
  * channels) the coalition lattice has 2⁴ = 16 cells and every
  * factorial weight |S|!·(c−1−|S|)! shares the denominator c! = 24 —
  * so Shapley values are EXACT INTEGERS in 1/24 conversion units, no
  * division anywhere (rarer than the permicro keys: not even
  * truncation). The fact is touched ONCE (per-user touched-mask +
  * converted flag); v(S) = conversions among users whose touched set
  * ⊆ S comes from a submask join on the 16-cell table; the marginal
  * sweep is 4·16 bounded rows. Efficiency axiom Σᵢ φᵢ = v(full) −
  * v(∅) holds bit-exactly and is spec-asserted.
  */
object Shapley {
  /** Touch channels in bit order; conversion event is excluded. */
  val Channels: Seq[String] = Seq("click", "view", "signup", "error")
  private val C = Channels.length
  private def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
  /** |S| → |S|!·(C−1−|S|)! — the Shapley weight numerator over C!. */
  val WeightNum: Seq[Long] = (0 until C).map(s => fact(s) * fact(C - 1 - s))
  val Denominator: Long = fact(C) // 24

  /** Per-channel (channel, shapley_x24, n_conv_total): exact Shapley
    * in 1/24 conversion units from per-user (maskCol, convCol). */
  def attribution(users: DataFrame, maskCol: String, convCol: String): DataFrame = {
    val spark = users.sparkSession
    import spark.implicits._
    val cells = users.groupBy(col(maskCol).cast("int").as("mask"))
      .agg(sum(when(col(convCol), 1L).otherwise(0L)).as("n_conv"))
      .localCheckpoint() // 16-row lattice table, reused by the sweep
    val coalitions = (0 until (1 << C)).map(_.toLong).toDF("s")
    // v(S): conversions among users whose touched set is a submask of S
    val v = coalitions.join(cells,
        expr("CAST(mask AS BIGINT) & ~s = 0"), "left")
      .groupBy(col("s"))
      .agg(coalesce(sum(col("n_conv")), lit(0L)).as("v"))
      .localCheckpoint() // 16 rows, probed twice per marginal
    val weights = WeightNum.zipWithIndex
      .map { case (w, s) => (s.toLong, w) }.toDF("ssize", "wnum")
    val channels = Channels.zipWithIndex
      .map { case (name, i) => (name, 1L << i) }.toDF("channel", "bit")
    // marginal sweep: for each channel i and coalition S without i,
    // wnum(|S|)·(v(S ∪ i) − v(S))
    val marg = channels.crossJoin(v.select(col("s"), col("v").as("v_s")))
      .filter(expr("s & bit = 0"))
      .join(v.select(col("s").as("s_with"), col("v").as("v_si")),
        expr("s_with = s | bit"))
      .withColumn("ssize", expr("bit_count(s)").cast("long"))
      .join(broadcast(weights), "ssize")
      .groupBy(col("channel"))
      .agg(sum(col("wnum") * (col("v_si") - col("v_s"))).as("shapley_x24"))
    val total = v.filter(col("s") === ((1L << C) - 1))
      .select(col("v").as("n_conv_total"))
    marg.crossJoin(broadcast(total))
  }

  // ---- query-map entry (hash-gated) ----

  /** Gated instance: users touched by click/view/signup/error events,
    * converting = has a purchase event. */
  def shapleyEvents(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        Channels.zipWithIndex.map { case (ch, i) =>
          max(when(col("event_type") === ch, 1L << i).otherwise(0L))
        }.reduce(_ + _).as("mask"),
        (sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) > 0L)
          .as("conv"))
    attribution(users, "mask", "conv")
  }

  def oracleSql: String = {
    val chanRows = Channels.zipWithIndex
      .map { case (ch, i) => s"('$ch', ${1L << i})" }.mkString(", ")
    val weightRows = WeightNum.zipWithIndex
      .map { case (w, s) => s"($s, $w)" }.mkString(", ")
    val maskExpr = Channels.zipWithIndex.map { case (ch, i) =>
      s"max(CASE WHEN event_type = '$ch' THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH users AS (
      |  SELECT user_id, $maskExpr AS mask,
      |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0 AS conv
      |  FROM events GROUP BY 1
      |), cells AS (
      |  SELECT mask, CAST(sum(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_conv
      |  FROM users GROUP BY 1
      |), coalitions AS (
      |  SELECT range AS s FROM range(0, ${1 << C})
      |), v AS (
      |  SELECT c.s, CAST(coalesce(sum(ce.n_conv), 0) AS BIGINT) AS v
      |  FROM coalitions c LEFT JOIN cells ce ON (ce.mask & ~c.s) = 0
      |  GROUP BY 1
      |), chans(channel, bit) AS (VALUES $chanRows),
      |weights(ssize, wnum) AS (VALUES $weightRows),
      |marg AS (
      |  SELECT ch.channel,
      |    CAST(sum(w.wnum * (vi.v - vs.v)) AS BIGINT) AS shapley_x24
      |  FROM chans ch
      |  JOIN v vs ON (vs.s & ch.bit) = 0
      |  JOIN v vi ON vi.s = (vs.s | ch.bit)
      |  JOIN weights w ON w.ssize = bit_count(vs.s)
      |  GROUP BY 1
      |), total AS (
      |  SELECT v AS n_conv_total FROM v WHERE s = ${(1 << C) - 1}
      |)
      |SELECT m.channel, m.shapley_x24, t.n_conv_total
      |FROM marg m CROSS JOIN total t""".stripMargin
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Train-fit / serve-transform feature computations from the reference's
  * repair-RL prep pipeline (/root/reference/MachineLearning/Ray/recsys/
  * generate_data.py) — the stateful transformations it fits on the train
  * split and replays on valid/test, re-expressed as distributed,
  * deterministic dataframe ops:
  *
  *  - [[groupEntropy]] — specialization entropy of a categorical
  *    distribution per group (generate_data.py:45-51, 641-652);
  *  - [[actorProfile]] — the technician feature block: mean production
  *    cents, success rate, action diversity, experience count + entropy
  *    in ONE aggregation pass (generate_data.py:734-756);
  *  - [[expandingLooMean]] — expanding mean of the target EXCLUDING the
  *    current row (the leakage-safe cumulative-average fit,
  *    generate_data.py:597-611);
  *  - [[expandingMode]] — most frequent PREVIOUS value per group
  *    (calculate_most_common_action, generate_data.py:515-549), done as
  *    a running `max(struct(cnt, rn, val))` window instead of the
  *    reference's transform('last') trick;
  *  - [[ordinalEncode]] — OrdinalEncoder semantics: categories sorted,
  *    codes 1..K fit on train only, unseen → K+1, null → 'NAN_NULL'
  *    (generate_data.py:1111-1152);
  *  - [[imputeMedian]] — median imputation fit on train, applied
  *    everywhere (generate_data.py:1174-1186);
  *  - [[groupSplit]] — GroupShuffleSplit semantics (generate_data.py:
  *    446-474): the SPLIT IS A FUNCTION OF THE GROUP KEY, so no group
  *    ever straddles splits — leakage-free by construction, no driver
  *    bookkeeping of id sets.
  *
  * Scale: every fit is a bounded aggregate (per-category counts, one
  * median, K ordinal codes); every transform is a broadcast join or a
  * per-key window. Entropy sums are rounded at 1e-6 so partial-agg
  * ordering cannot flap the float hash; all other outputs are exact
  * integers or exact integer ratios.
  */
object FeaturePipeline {

  import Sampling.{M, portableBucket}

  private def cents(c: Column) = round(c * 100, 0).cast("long")

  /** Shannon entropy (nats) of `catCol`'s distribution within each group:
    * H = ln(n) − Σ c·ln(c) / n, computed from per-category counts so the
    * reduction is two bounded aggregations. Rounded to 6 decimals — the
    * only float in the pipeline whose partial-sum order differs between
    * engines. */
  def groupEntropy(df: DataFrame, groupCol: String, catCol: String): DataFrame =
    df.groupBy(col(groupCol), col(catCol)).agg(count(lit(1)).as("__c"))
      .groupBy(col(groupCol))
      .agg(round(
        log(sum("__c")) -
          sum(col("__c") * log(col("__c"))) / sum("__c"), 6).as("entropy"))

  /** Per-actor profile: one aggregation pass computing mean cents (MTTR
    * analogue), success rate (fraction of positive-value events), action
    * diversity (distinct types), experience (event count) — then the
    * entropy block joined in. Mean/rate are exact-integer ÷ count, so
    * both engines produce the identical double. */
  def actorProfile(df: DataFrame, actorCol: String, typeCol: String,
                   valueCol: String): DataFrame = {
    val stats = df.groupBy(col(actorCol)).agg(
      count(lit(1)).as("experience"),
      (sum(cents(col(valueCol))) / count(lit(1))).as("mean_cents"),
      (sum(when(cents(col(valueCol)) > 0, 1L).otherwise(0L)) /
        count(lit(1))).as("success_rate"),
      count_distinct(col(typeCol)).as("diversity"))
    val ent = groupEntropy(df, actorCol, typeCol)
      .withColumnRenamed("entropy", "specialization")
    stats.join(ent, actorCol)
  }

  /** Expanding mean of `valueCol` cents per key, EXCLUDING the current
    * row — the cumulative-average-survival fit. Null on each key's first
    * row (no history), like the reference before its ffill. */
  def expandingLooMean(df: DataFrame, keyCol: String, orderCols: Seq[String],
                       valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("loo_cnt",
        coalesce(count(lit(1)).over(w), lit(0L)).cast("int"))
      .withColumn("loo_mean",
        sum(cents(col(valueCol))).over(w) / col("loo_cnt"))
  }

  /** Most frequent value of `catCol` among each row's PREDECESSORS in the
    * key's sequence; ties break to the value that reached the count most
    * recently (the reference's last-wins transform). One window pair:
    * cnt = running per-(key,val) count, then a running lexicographic max
    * of struct(cnt, rn, val) over rows before the current one. */
  def expandingMode(df: DataFrame, keyCol: String, orderCols: Seq[String],
                    catCol: String): DataFrame = {
    val ord = orderCols.map(col)
    val wSeq = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val wVal = Window.partitionBy(col(keyCol), col(catCol)).orderBy(ord: _*)
    df.withColumn("__cnt", row_number().over(wVal))
      .withColumn("__rn", row_number().over(wSeq))
      .withColumn("prev_mode",
        max(struct(col("__cnt"), col("__rn"), col(catCol)))
          .over(wSeq.rowsBetween(Window.unboundedPreceding, -1))
          .getField(catCol))
      .drop("__cnt", "__rn")
  }

  /** OrdinalEncoder fit on `train`, applied to `full`: categories of
    * `catCol` (nulls as 'NAN_NULL') sorted lexicographically get codes
    * 1..K; categories absent from train get K+1 (the reserved
    * unseen-category index; 0 stays free for padding). The code table is
    * K rows → broadcast; K itself rides along in the same tiny dim. */
  def ordinalEncode(full: DataFrame, train: DataFrame, catCol: String,
                    outCol: String): DataFrame = {
    val c = coalesce(col(catCol), lit("NAN_NULL"))
    // the unpartitioned row_number window is bounded by the category
    // cardinality K (same two-phase shape as StarSplit's surrogate keys)
    val codes = train.select(c.as("__cat")).distinct()
      .withColumn("__code",
        row_number().over(Window.orderBy(col("__cat"))).cast("long"))
    // K+1 as a one-row broadcast scalar: unseen categories (left-join
    // misses) must take it from the FIT, not from the joined row (which
    // is null exactly for them)
    val unseen = codes.agg((count(lit(1)) + 1).cast("long").as("__unseen"))
    full.withColumn("__cat", c)
      .join(broadcast(codes), Seq("__cat"), "left")
      .crossJoin(broadcast(unseen))
      .withColumn(outCol, coalesce(col("__code"), col("__unseen")))
      .drop("__cat", "__code", "__unseen")
  }

  /** Median (linear-interpolated, the SimpleImputer default) of the
    * non-missing TRAIN cents, used to fill missing values everywhere.
    * `missing` marks which rows count as absent. */
  def imputeMedian(full: DataFrame, trainPred: Column, missing: Column,
                   valueCol: String, outCol: String): DataFrame = {
    // exact interpolated percentile for the gate; the 100 TB path swaps
    // in the GK sketch (Sketches.quantiles) with the same call shape
    val c = cents(col(valueCol)).cast("double")
    val med = full.filter(trainPred && !missing)
      .agg(expr(s"percentile(round($valueCol * 100, 0), 0.5D)").as("__med"))
    full.crossJoin(broadcast(med))
      .withColumn(outCol, when(missing, col("__med")).otherwise(c))
      .drop("__med")
  }

  /** GroupShuffleSplit analogue: assign the whole GROUP via the portable
    * hash bucket, so leakage between splits is impossible by
    * construction (the reference maintains driver-side id sets and
    * asserts disjointness after the fact — generate_data.py:446-474). */
  def groupSplit(df: DataFrame, groupCol: String,
                 splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val bucket = portableBucket(col(groupCol))
    val cuts = splits.scanLeft(0.0)(_ + _._2).map(f => (f * M).toLong)
    val e = splits.init.zipWithIndex.foldRight(lit(splits.last._1): Column) {
      case (((name, _), i), acc) => when(bucket < cuts(i + 1), name).otherwise(acc)
    }
    df.withColumn("split", e)
  }

  // ---- query-map entries (hash-gated) ----

  def groupEntropyEvents(spark: SparkSession, dir: String): DataFrame =
    groupEntropy(Tables.events(spark, dir), "user_id", "event_type")
      .select("user_id", "entropy")

  def groupEntropyOracleSql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS c
      |  FROM events GROUP BY user_id, event_type)
      |SELECT user_id, round(ln(sum(c)) - sum(c*ln(c))/sum(c), 6) AS entropy
      |FROM c GROUP BY user_id""".stripMargin

  def actorProfileEvents(spark: SparkSession, dir: String): DataFrame =
    actorProfile(Tables.events(spark, dir), "user_id", "event_type", "value")
      .select("user_id", "experience", "mean_cents", "success_rate",
        "diversity", "specialization")

  def actorProfileOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type,
      |    CAST(round(value*100, 0) AS BIGINT) AS vc FROM events),
      |s AS (
      |  SELECT user_id, count(*) AS experience,
      |    CAST(sum(vc) AS DOUBLE) / count(*) AS mean_cents,
      |    CAST(sum(CASE WHEN vc > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |      / count(*) AS success_rate,
      |    count(DISTINCT event_type) AS diversity
      |  FROM e GROUP BY user_id),
      |c AS (
      |  SELECT user_id, event_type, CAST(count(*) AS DOUBLE) AS c
      |  FROM e GROUP BY user_id, event_type),
      |h AS (
      |  SELECT user_id, round(ln(sum(c)) - sum(c*ln(c))/sum(c), 6)
      |    AS specialization FROM c GROUP BY user_id)
      |SELECT s.user_id, s.experience, s.mean_cents, s.success_rate,
      |  s.diversity, h.specialization
      |FROM s JOIN h ON s.user_id = h.user_id""".stripMargin

  def expandingLooMeanEvents(spark: SparkSession, dir: String): DataFrame =
    expandingLooMean(Tables.events(spark, dir), "user_id",
      Seq("ts", "event_id"), "value")
      .select("user_id", "event_id", "loo_cnt", "loo_mean")

  def expandingLooMeanOracleSql: String =
    """SELECT user_id, event_id,
      |  CAST(count(*) OVER wp AS INT) AS loo_cnt,
      |  CAST(sum(CAST(round(value*100, 0) AS BIGINT)) OVER wp AS DOUBLE)
      |    / (count(*) OVER wp) AS loo_mean
      |FROM events
      |WINDOW wp AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)""".stripMargin

  def expandingModeEvents(spark: SparkSession, dir: String): DataFrame =
    expandingMode(Tables.events(spark, dir), "user_id",
      Seq("ts", "event_id"), "event_type")
      .select("user_id", "event_id", "prev_mode")

  def expandingModeOracleSql: String =
    """WITH c AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |      ORDER BY ts, event_id) AS cnt,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |m AS (
      |  SELECT user_id, event_id, ts,
      |    max({'cnt': cnt, 'rn': rn, 'val': event_type})
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS s
      |  FROM c)
      |SELECT user_id, event_id, s.val AS prev_mode FROM m""".stripMargin

  def ordinalEncodeCustomer(spark: SparkSession, dir: String): DataFrame = {
    val full = Tables.customer(spark, dir)
    val train = full.filter(portableBucket(col("c_custkey")) < (M * 8 / 10))
    ordinalEncode(full, train, "c_mktsegment", "seg_code")
      .select("c_custkey", "c_mktsegment", "seg_code")
  }

  def ordinalEncodeOracleSql: String =
    """WITH train AS (
      |  SELECT * FROM customer
      |  WHERE ((c_custkey % 100003) * 1103515245 + 12345) % 1000000 < 800000),
      |codes AS (
      |  SELECT cat, ROW_NUMBER() OVER (ORDER BY cat) AS code
      |  FROM (SELECT DISTINCT coalesce(c_mktsegment, 'NAN_NULL') AS cat
      |        FROM train)),
      |k AS (SELECT count(*) + 1 AS unseen FROM codes)
      |SELECT c.c_custkey, c.c_mktsegment,
      |  coalesce(codes.code, k.unseen) AS seg_code
      |FROM customer c
      |LEFT JOIN codes ON coalesce(c.c_mktsegment, 'NAN_NULL') = codes.cat
      |CROSS JOIN k""".stripMargin

  /** Synthetic missingness mask (event_id ≡ 0 mod 7) so the fit/transform
    * path is exercised on a table that has no real nulls — the mask is
    * part of the gated definition, the operator itself takes any
    * predicate. */
  def imputeMedianEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    imputeMedian(ev,
      trainPred = portableBucket(col("event_id")) < (M * 8 / 10),
      missing = col("event_id") % 7 === 0,
      valueCol = "value", outCol = "cents_imputed")
      .select("event_id", "cents_imputed")
  }

  def imputeMedianOracleSql: String =
    """WITH med AS (
      |  SELECT quantile_cont(CAST(round(value*100, 0) AS BIGINT), 0.5) AS m
      |  FROM events
      |  WHERE ((event_id % 100003) * 1103515245 + 12345) % 1000000 < 800000
      |    AND event_id % 7 <> 0)
      |SELECT event_id,
      |  CASE WHEN event_id % 7 = 0 THEN med.m
      |       ELSE CAST(round(value*100, 0) AS BIGINT) END AS cents_imputed
      |FROM events CROSS JOIN med""".stripMargin

  def groupSplitEvents(spark: SparkSession, dir: String): DataFrame =
    groupSplit(Tables.events(spark, dir), "user_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("event_id", "user_id", "split")

  def groupSplitOracleSql: String =
    """SELECT event_id, user_id,
      |  CASE WHEN ((user_id % 100003) * 1103515245 + 12345) % 1000000 < 800000
      |         THEN 'train'
      |       WHEN ((user_id % 100003) * 1103515245 + 12345) % 1000000 < 900000
      |         THEN 'valid'
      |       ELSE 'test' END AS split
      |FROM events""".stripMargin
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-dimension generator.
  *
  * Re-expresses /root/reference/DataEngineering/Python/dim_date_generator.py
  * (a pandas driver-side loop) as a fully distributed `sequence`+`explode`
  * projection: ISO year/week/day, Gregorian fields, fiscal calendar
  * (July–June, the reference's Q-JUN convention), Monday week starts,
  * Outlook-style week numbers and the `YYwwWW.D` work-week label.
  *
  * ISO year is derived as year(Thursday-of-week) — locale-free, no
  * week-based Java patterns (those are banned in Spark 3+).
  *
  * Scale: the generated range is one row per day — thousands of rows —
  * so this is driver-negligible and joins to facts as a broadcast dim.
  */
object DimDate {

  def generate(spark: SparkSession, start: String, end: String): DataFrame = {
    val days = spark.range(1)
      .select(explode(sequence(
        to_date(lit(start)), to_date(lit(end)), expr("interval 1 day"))).as("date"))

    val isoDay = weekday(col("date")) + 1 // 1=Monday..7=Sunday
    val thursday = date_add(col("date"), lit(4) - isoDay)
    val jan1 = make_date(year(col("date")), lit(1), lit(1))
    val nextJan1 = make_date(year(col("date")) + 1, lit(1), lit(1))
    val baseDay = date_sub(jan1, weekday(jan1))         // Monday on/before Jan 1
    val nextBaseDay = date_sub(nextJan1, weekday(nextJan1))
    val outlookBase = when(col("date") >= nextBaseDay, nextBaseDay).otherwise(baseDay)

    days
      .withColumn("date_key", date_format(col("date"), "yyyyMMdd").cast("int"))
      .withColumn("year", year(col("date")))
      .withColumn("month_number", month(col("date")))
      .withColumn("day", dayofmonth(col("date")))
      .withColumn("day_name", date_format(col("date"), "EEEE"))
      .withColumn("month_name", date_format(col("date"), "MMMM"))
      .withColumn("iso_day", isoDay)
      .withColumn("iso_week", weekofyear(col("date")))
      .withColumn("iso_year", year(thursday))
      .withColumn("monday_start_of_week",
        date_format(date_sub(col("date"), weekday(col("date"))), "yyyyMMdd").cast("int"))
      .withColumn("days_in_month", dayofmonth(last_day(col("date"))))
      .withColumn("day_of_year", dayofyear(col("date")))
      .withColumn("quarter", quarter(col("date")))
      .withColumn("is_weekday", (isoDay <= 5).cast("int"))
      .withColumn("is_weekend", (isoDay >= 6).cast("int"))
      .withColumn("fiscal_year",
        when(month(col("date")) > 6, year(col("date")) + 1).otherwise(year(col("date"))))
      .withColumn("fiscal_quarter", (((month(col("date")) + 5) % 12) / 3).cast("int") + 1)
      .withColumn("fiscal_year_quarter",
        concat(lit("Q"), col("fiscal_quarter"), lit("FY"),
               substring(col("fiscal_year").cast("string"), 3, 2)))
      .withColumn("outlook_week",
        (datediff(col("date"), outlookBase) / 7).cast("int") + 1)
      .withColumn("work_week",
        concat(substring(col("iso_year").cast("string"), 3, 2),
               lit("ww"), col("iso_week"), lit("."), col("iso_day")))
  }

  /** Query-map entry: the dimension over the test data's order-date span. */
  def dimDate(spark: SparkSession, dir: String): DataFrame =
    generate(spark, "1995-01-01", "2001-12-31")

  def oracleSql: String =
    """WITH days AS (
      |  SELECT unnest(generate_series(DATE '1995-01-01', DATE '2001-12-31',
      |                                INTERVAL 1 DAY))::DATE AS date
      |), base AS (
      |  SELECT date,
      |    isodow(date)::INT AS iso_day,
      |    date + (4 - isodow(date))::INT AS thursday,
      |    make_date(year(date)::INT, 1, 1) AS jan1,
      |    make_date(year(date)::INT + 1, 1, 1) AS next_jan1
      |  FROM days
      |), base2 AS (
      |  SELECT *,
      |    jan1 - (isodow(jan1) - 1)::INT AS base_day,
      |    next_jan1 - (isodow(next_jan1) - 1)::INT AS next_base_day
      |  FROM base
      |)
      |SELECT date,
      |  CAST(strftime(date, '%Y%m%d') AS INT) AS date_key,
      |  year(date)::INT AS year,
      |  month(date)::INT AS month_number,
      |  day(date)::INT AS day,
      |  dayname(date) AS day_name,
      |  monthname(date) AS month_name,
      |  iso_day,
      |  week(date)::INT AS iso_week,
      |  year(thursday)::INT AS iso_year,
      |  CAST(strftime(date - (iso_day - 1)::INT, '%Y%m%d') AS INT) AS monday_start_of_week,
      |  day(last_day(date))::INT AS days_in_month,
      |  dayofyear(date)::INT AS day_of_year,
      |  quarter(date)::INT AS quarter,
      |  CAST(iso_day <= 5 AS INT) AS is_weekday,
      |  CAST(iso_day >= 6 AS INT) AS is_weekend,
      |  CASE WHEN month(date) > 6 THEN year(date)::INT + 1 ELSE year(date)::INT END AS fiscal_year,
      |  ((month(date)::INT + 5) % 12) // 3 + 1 AS fiscal_quarter,
      |  'Q' || (((month(date)::INT + 5) % 12) // 3 + 1)
      |      || 'FY' || substr((CASE WHEN month(date) > 6 THEN year(date)::INT + 1
      |                              ELSE year(date)::INT END)::VARCHAR, 3, 2) AS fiscal_year_quarter,
      |  (date_diff('day', CASE WHEN date >= next_base_day THEN next_base_day ELSE base_day END,
      |             date) // 7)::INT + 1 AS outlook_week,
      |  substr(year(thursday)::VARCHAR, 3, 2) || 'ww' || week(date)::INT
      |      || '.' || iso_day AS work_week
      |FROM base2""".stripMargin
}

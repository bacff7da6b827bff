package graft

import graft.operators.{ColumnNames, Medallion, MergeUpsert, StarSplit}

/** Specs for the changeset-merge and bronze-normalization operators. */
class EtlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("toCamel handles snake, kebab, dots, spaces, already-camel") {
    assert(ColumnNames.toCamel("o_orderkey") == "oOrderkey")
    assert(ColumnNames.toCamel("precise-time.stamp") == "preciseTimeStamp")
    assert(ColumnNames.toCamel("Source File") == "sourceFile")
    assert(ColumnNames.toCamel("ALLCAPS") == "allcaps")
    assert(ColumnNames.toCamel("x") == "x")
  }

  test("merge with deletes: tombstone, delete-wins-by-seq, ghost no-op") {
    val target = Seq(
      (1L, "a", 10.0, 1), (2L, "b", 20.0, 1), (3L, "c", 30.0, 1)
    ).toDF("id", "name", "bal", "current_version")
    val changeset = Seq(
      (1L, "a", 99.0, false, 1), // stale update for id=1 ...
      (1L, "a", 10.0, true, 2),  // ... delete wins by seq
      (2L, "b", 21.0, false, 1), // plain update
      (7L, "g", 1.0, true, 1),   // delete of absent key: no-op
      (4L, "d", 40.0, false, 1)  // insert
    ).toDF("id", "name", "bal", "is_delete", "change_seq")
    val out = MergeUpsert.applyWithDeletes(target, changeset, Seq("id"),
        "change_seq", Seq("name", "bal"), "is_delete")
      .select("id", "bal", "current_version", "change_type")
      .as[(Long, Double, Int, String)].collect().toSet
    assert(out == Set(
      (1L, 10.0, 0, "deleted"),   // soft tombstone, no replacement row
      (2L, 20.0, 0, "expired"), (2L, 21.0, 1, "update_new"),
      (3L, 30.0, 1, "unchanged"),
      (4L, 40.0, 1, "insert")))   // ghost delete of id=7 emitted nothing
  }

  test("merge_upsert classifies insert/update/unchanged and dedups changeset") {
    val target = Seq(
      (1L, "a", 10.0, 1), (2L, "b", 20.0, 1), (3L, "c", 30.0, 1),
      (9L, "old", 5.0, 0) // pre-existing expired row must pass through
    ).toDF("id", "name", "bal", "current_version")
    val changeset = Seq(
      (1L, "a", 99.0, 1),   // stale update, must lose to seq=2
      (1L, "a", 11.0, 2),   // latest update for id=1
      (2L, "b", 20.0, 1),   // no-op
      (4L, "d", 40.0, 1)    // brand-new key
    ).toDF("id", "name", "bal", "change_seq")

    val out = MergeUpsert(target, changeset, Seq("id"), "change_seq", Seq("name", "bal"))
      .select("id", "bal", "current_version", "change_type")
      .as[(Long, Double, Int, String)].collect()
      .groupBy(r => (r._1, r._4)).view.mapValues(_.head).toMap

    assert(out((1L, "expired")) == (1L, 10.0, 0, "expired"))
    assert(out((1L, "update_new")) == (1L, 11.0, 1, "update_new"))
    assert(out((2L, "unchanged")) == (2L, 20.0, 1, "unchanged"))
    assert(out((3L, "unchanged")) == (3L, 30.0, 1, "unchanged"))
    assert(out((4L, "insert")) == (4L, 40.0, 1, "insert"))
    assert(out((9L, "unchanged")) == (9L, 5.0, 0, "unchanged"))
    assert(out.size == 6)
  }

  test("merge_upsert dataSkipping=false is lazy and value-identical") {
    val target = Seq(
      (1L, "a", 10.0, 1), (5L, "e", 50.0, 1), (9L, "z", 90.0, 1)
    ).toDF("id", "name", "bal", "current_version")
    val changeset = Seq((5L, "e", 55.0, 1)).toDF("id", "name", "bal", "change_seq")
    val lazyOut = MergeUpsert(target, changeset, Seq("id"), "change_seq",
      Seq("name", "bal"), dataSkipping = false)
    val eagerOut = MergeUpsert(target, changeset, Seq("id"), "change_seq",
      Seq("name", "bal"))
    val key = (r: (Long, Double, Int, String)) => (r._1, r._4)
    assert(
      lazyOut.select("id", "bal", "current_version", "change_type")
        .as[(Long, Double, Int, String)].collect().sortBy(key).toSeq ==
      eagerOut.select("id", "bal", "current_version", "change_type")
        .as[(Long, Double, Int, String)].collect().sortBy(key).toSeq)
  }

  test("merge_upsert with composite natural key and null-valued columns") {
    val target = Seq(
      (1L, "us", Some(10.0), 1), (1L, "eu", Some(20.0), 1)
    ).toDF("id", "region", "bal", "current_version")
    val changeset = Seq(
      (1L, "us", None: Option[Double], 1),  // value -> null: a real change
      (1L, "eu", Some(20.0), 1)             // no-op
    ).toDF("id", "region", "bal", "change_seq")
    val out = MergeUpsert(target, changeset, Seq("id", "region"), "change_seq", Seq("bal"))
      .select("id", "region", "current_version", "change_type")
      .as[(Long, String, Int, String)].collect().toSet
    assert(out == Set(
      (1L, "us", 0, "expired"), (1L, "us", 1, "update_new"),
      (1L, "eu", 1, "unchanged")))
  }

  test("bronze normalization ingests JSON-shaped raw data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bronze_json")
    java.nio.file.Files.write(dir.resolve("part_0.json"),
      ("""{"Order Id": 1, "total.price": 10.5, "CreatedDate": "2020-01-01"}""" + "\n" +
       """{"Order Id": 2, "total.price": 20.0, "CreatedDate": "2020-01-02"}""" + "\n" +
       """{"Order Id": 2, "total.price": 20.0, "CreatedDate": "2020-01-02"}""").getBytes)
    val raw = spark.read.json(dir.toString)
    val b = Medallion.bronzeNormalize(raw, dropCols = Seq("CreatedDate"), asOfDateKey = 20240101)
    assert(b.columns.toSeq == Seq("orderId", "totalPrice", "sourceFile",
      "currentVersion", "effectiveDate", "expirationDate"))
    val rows = b.select("orderId", "totalPrice", "sourceFile")
      .as[(Long, Double, String)].collect().sortBy(_._1)
    assert(rows.length == 2, "exact-dup raw row not deduped")
    assert(rows(0) == (1L, 10.5, "part_0.json"))
  }

  test("bronze normalization: camel names, lineage, housekeeping, dedup") {
    val b = Medallion.medallionBronzeOrders(spark, sfDir)
    assert(b.columns.toSeq == Seq("oOrderkey", "oCustkey", "oOrderstatus",
      "oTotalprice", "oOrderdate", "oOrderpriority", "sourceFile",
      "currentVersion", "effectiveDate", "expirationDate"))
    val row = b.limit(1).collect()(0)
    assert(row.getAs[String]("sourceFile") == "orders.parquet")
    assert(row.getAs[Int]("expirationDate") == Medallion.FarFuture)
  }

  test("star split: dense keys, FK integrity, lossless re-join, partitioning-stable") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority")
    val (dim, fact) = StarSplit.split(orders,
      Seq("o_orderstatus", "o_orderpriority"), "order_profile_sk")

    // keys are dense 1..n over the distinct attribute combos
    val keys = dim.select("order_profile_sk").collect().map(_.getLong(0)).sorted
    assert(keys.toSeq == (1L to keys.length).toSeq)
    assert(dim.count() ==
      orders.select("o_orderstatus", "o_orderpriority").distinct().count())

    // FK integrity + row preservation
    assert(fact.count() == orders.count())
    assert(fact.join(dim, Seq("order_profile_sk"), "left_anti").isEmpty,
      "dangling foreign key")

    // re-joining the dim reconstructs the original frame exactly
    val rejoined = fact.join(dim, "order_profile_sk")
      .select(orders.columns.map(col): _*)
    assert(rejoined.exceptAll(orders).isEmpty && orders.exceptAll(rejoined).isEmpty)

    // surrogate keys are partitioning-deterministic
    val (dim2, _) = StarSplit.split(orders.repartition(7),
      Seq("o_orderstatus", "o_orderpriority"), "order_profile_sk")
    assert(dim.collect().toSet == dim2.collect().toSet)
  }

  test("star split: NULL dim attributes keep their facts (null-safe join-back)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(
      (1L, Some("red"), 10.0), (2L, None, 20.0),
      (3L, Some("blue"), 30.0), (4L, None, 40.0))
      .toDF("id", "color", "amount")
    val (dim, fact) = StarSplit.split(df, Seq("color"), "color_sk")
    // the null combo is a dim row like any other, ranked last
    assert(dim.count() == 3)
    val nullKey = dim.filter(col("color").isNull).head().getAs[Long]("color_sk")
    assert(nullKey == 3L, "asc_nulls_last must rank the null combo last")
    // no fact row dropped; both null-attribute facts carry the null combo's key
    assert(fact.count() == 4)
    assert(fact.filter(col("color_sk") === nullKey)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    // lossless reconstruction including the null rows
    val back = fact.join(dim, "color_sk").select("id", "color", "amount")
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }
}

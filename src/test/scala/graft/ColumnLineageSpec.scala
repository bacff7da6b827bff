package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.plans.ColumnLineage

/** Contracts of the Catalyst column-lineage walker: aliases union
  * their inputs, joins/filters pass through, unions merge branches
  * positionally, explode descends from the generator input. */
class ColumnLineageSpec extends SparkSpec {
  import spark.implicits._

  private def writeTable(name: String, df: org.apache.spark.sql.DataFrame): String = {
    val p = Files.createTempDirectory("lineage").resolve(s"$name.parquet")
    df.write.parquet(p.toString)
    p.toString
  }

  test("project/filter/join: outputs trace to leaf columns, keys don't leak") {
    val a = writeTable("alpha", Seq((1L, 10L)).toDF("id", "v"))
    val b = writeTable("beta", Seq((1L, "x")).toDF("id", "tag"))
    val da = spark.read.parquet(a)
    val db = spark.read.parquet(b)
    val q = da.join(db, da("id") === db("id"))
      .filter(col("v") > 0)
      .select((col("v") * 2).as("v2"), col("tag"))
    assert(ColumnLineage.lineage(q) === Seq(
      ("tag", "beta", "tag"), ("v2", "alpha", "v")))
  }

  test("union merges branch lineage positionally") {
    val a = writeTable("lhs", Seq(1L).toDF("x"))
    val b = writeTable("rhs", Seq(2L).toDF("y"))
    val q = spark.read.parquet(a).select(col("x").as("v"))
      .union(spark.read.parquet(b).select(col("y").as("v")))
      .select((col("v") + 1).as("w"))
    assert(ColumnLineage.lineage(q) === Seq(
      ("w", "lhs", "x"), ("w", "rhs", "y")))
  }

  test("explode descends from the generator's input column") {
    val t = writeTable("docs", Seq((1L, "a b c")).toDF("id", "text"))
    val q = spark.read.parquet(t)
      .select(col("id"), explode(split(col("text"), " ")).as("token"))
    assert(ColumnLineage.lineage(q) === Seq(
      ("id", "docs", "id"), ("token", "docs", "text")))
  }

  test("aggregate + window: measures union every referenced input") {
    val t = writeTable("facts", Seq((1L, 2L, 3L)).toDF("g", "p", "q"))
    val q = spark.read.parquet(t)
      .groupBy(col("g"))
      .agg(sum(col("p") * col("q")).as("rev"))
    assert(ColumnLineage.lineage(q) === Seq(
      ("g", "facts", "g"), ("rev", "facts", "p"), ("rev", "facts", "q")))
  }
}

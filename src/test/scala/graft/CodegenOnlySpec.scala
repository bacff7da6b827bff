package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.{LongArrayDot, QuantizeVec}

/** Pins that the hand-written `doGenCode` templates actually COMPILE in
  * every nullability regime — with `factoryMode=CODEGEN_ONLY` a janino
  * failure throws instead of silently falling back to the interpreter.
  *
  * The regression this catches: `nullSafeCodeGen`'s non-nullable branch
  * never declares `ev.isNull` (it substitutes a `false` literal into
  * the RETURNED ExprCode), so a result template that mentions
  * `ev.isNull` bakes in an undeclared name whenever the expression
  * resolves non-nullable. `long_array_dot(v, v)` over a literal-built
  * array did exactly that: every k-means/ANN centroid-norm projection
  * logged `CompileException: "isNull_2" is not an rvalue` and ran
  * interpreted — correct results, hot path silently decompiled.
  */
class CodegenOnlySpec extends SparkSpec {

  private def withCodegenOnly[A](f: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try f
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def dot(a: Column, b: Column, nullAware: Boolean = false): Column =
    graft.functions.Native.call(
      if (nullAware) "graft_dot_na_test" else "graft_dot_test",
      exprs => LongArrayDot(exprs(0), exprs(1), nullAware), a, b)

  test("long_array_dot compiles over a NON-nullable column (self-dot)") {
    withCodegenOnly {
      val df = spark.range(3)
        .select(array(col("id"), col("id") * 2, lit(3L)).as("v"))
      val out = df.select(dot(col("v"), col("v")).as("d"))
        .collect().map(_.getLong(0)).sorted
      // v = [i, 2i, 3] → dot = 5i² + 9
      assert(out.toSeq == Seq(9L, 14L, 29L))
    }
  }

  test("long_array_dot compiles over a nullable column and a null row") {
    withCodegenOnly {
      val df = spark.range(3).select(
        when(col("id") =!= 1, array(col("id"), lit(2L))).as("v"))
      val out = df.select(dot(col("v"), col("v")).as("d")).collect()
      assert(out.count(_.isNullAt(0)) == 1)
      assert(out.filter(!_.isNullAt(0)).map(_.getLong(0)).sorted.toSeq ==
        Seq(4L, 8L))
    }
  }

  test("long_array_dot nullAware mode compiles and nulls a length mismatch") {
    withCodegenOnly {
      val df = spark.range(2).select(
        array(lit(1L), lit(2L)).as("a"),
        when(col("id") === 0, array(lit(3L), lit(4L)))
          .otherwise(array(lit(5L))).as("b"))
      val out = df.select(dot(col("a"), col("b"), nullAware = true).as("d"))
        .collect()
      assert(out.count(_.isNullAt(0)) == 1)
      assert(out.filter(!_.isNullAt(0)).map(_.getLong(0)).toSeq == Seq(11L))
    }
  }

  test("lcs_length compiles in both nullability regimes") {
    withCodegenOnly {
      // non-nullable: literal-built arrays
      val df = spark.range(2).select(
        array(lit("a"), lit("b"), lit("c")).as("p"),
        array(lit("a"), lit("c")).as("g"))
      val out = df.select(graft.functions.Native.call("graft_lcs_cg_test",
        exprs => graft.functions.LcsLength(exprs(0), exprs(1)),
        col("p"), col("g")).as("l")).collect().map(_.getLong(0))
      assert(out.toSeq == Seq(2L, 2L))
      // nullable input column with a null row
      val dfn = spark.range(3).select(
        when(col("id") =!= 1, array(lit("x"))).as("p"),
        array(lit("x")).as("g"))
      val outn = dfn.select(graft.functions.Native.call("graft_lcs_cg_test",
        exprs => graft.functions.LcsLength(exprs(0), exprs(1)),
        col("p"), col("g")).as("l")).collect()
      assert(outn.count(_.isNullAt(0)) == 1)
      assert(outn.filter(!_.isNullAt(0)).map(_.getLong(0)).toSeq ==
        Seq(1L, 1L))
    }
  }

  test("quantize compiles over a NON-nullable float array") {
    withCodegenOnly {
      val df = spark.range(3).select(
        array(col("id").cast("double"), lit(0.5)).as("v"))
      val out = df.select(graft.functions.Native.call("graft_quant_test",
          exprs => QuantizeVec(exprs.head, unit = false), col("v"))
          .as("q"))
        .collect().map(_.getSeq[Long](0))
      assert(out.forall(_.length == 2))
    }
  }
}

package graft

import graft.functions.{Hll, MixMod61}

class MixMod61Spec extends SparkSpec {
  import spark.implicits._

  private def reference(x: Long): Long = {
    val p = BigInt(Hll.P)
    val h1 = ((BigInt(Hll.A) * x + Hll.B) mod p).toLong
    val m1 = h1 ^ (h1 >>> 30)
    val h2 = ((BigInt(Hll.A2) * m1) mod p).toLong
    h2 ^ (h2 >>> 27)
  }

  test("mixer: primitive-long folding equals the BigInt reference") {
    val probes = (0L to 2000L) ++ (1L to 40L).map(i => (1L << 61) - i) ++
      (1L to 40L).map(i => i * 987654321098L) ++ Seq(Hll.P - 1, Hll.P, Hll.P + 1)
    probes.foreach { x =>
      assert(MixMod61.mix(x) === reference(x), s"x = $x")
    }
  }

  test("mixer: expression path equals the JVM path through codegen") {
    val df = ((0L to 500L) ++ (1L to 20L).map(i => (1L << 60) + i)).toDF("x")
    val got = df.select(graft.functions.Native.call("graft_mix_mod61",
        exprs => MixMod61(exprs.head),
        org.apache.spark.sql.functions.col("x")).as("h"))
      .as[Long].collect()
    val want = ((0L to 500L) ++ (1L to 20L).map(i => (1L << 60) + i))
      .map(MixMod61.mix)
    assert(got.toSeq === want)
  }
}

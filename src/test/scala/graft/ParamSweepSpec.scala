package graft

import org.apache.spark.sql.functions._
import graft.ml.ParamSweep

/** The sweep must train every grid point, mark exactly one winner with
  * the documented tie order, and be deterministic — the orchestration
  * contract; per-model quality is RandomForestSpec's job. */
class ParamSweepSpec extends SparkSpec {

  private lazy val sweep = ParamSweep.rfParamSweep(spark, sfDir).localCheckpoint()

  test("every grid point trains and reports sane metrics") {
    val rows = sweep.collect()
    assert(rows.length == 4)
    val pts = rows.map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pts == Set((10, 3), (10, 5), (20, 3), (20, 5)))
    // the planted signal is easy: every point must find it
    assert(rows.forall(_.getDouble(2) > 0.9), "a grid point missed the planted signal")
  }

  test("exactly one winner, and it attains the max AUC") {
    val best = sweep.filter(col("is_best") === 1).collect()
    assert(best.length == 1)
    val maxAuc = sweep.agg(max("auc")).head().getDouble(0)
    assert(best.head.getDouble(2) == maxAuc)
  }

  test("deterministic across runs despite concurrent execution") {
    val again = ParamSweep.rfParamSweep(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSet
    val first = sweep.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getInt(4))).toSet
    assert(again == first, "concurrent sweep is nondeterministic")
  }
}

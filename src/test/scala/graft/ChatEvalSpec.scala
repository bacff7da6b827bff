package graft

import org.apache.spark.sql.functions._
import graft.operators.{ChatTemplate, JsonFieldEval}

/** Chat templating + structured-output eval: byte-exact rendering
  * (role tokens, few-shot ordering, generation prompt) and the planted
  * defect classes of the JSON scorer. */
class ChatEvalSpec extends SparkSpec {
  import spark.implicits._

  test("render is byte-exact zephyr format incl. generation prompt") {
    val df = Seq(1).toDF("id").select(
      ChatTemplate.render(array(
        ChatTemplate.msg("system", lit("SYS")),
        ChatTemplate.msg("user", lit("hello\nworld"))),
        generationPrompt = true).as("p"),
      ChatTemplate.render(array(
        ChatTemplate.msg("system", lit("SYS")),
        ChatTemplate.msg("user", lit("U")),
        ChatTemplate.msg("assistant", lit("A"))),
        generationPrompt = false).as("t"))
    val r = df.head()
    assert(r.getString(0) ==
      "<|system|>\nSYS</s>\n<|user|>\nhello\nworld</s>\n<|assistant|>\n")
    assert(r.getString(1) ==
      "<|system|>\nSYS</s>\n<|user|>\nU</s>\n<|assistant|>\nA</s>\n")
  }

  test("chat_template: few-shot block precedes the user turn, 3 tasks per doc") {
    val out = ChatTemplate.chatTemplateDocs(spark, sfDir)
    val byTask = out.groupBy("task").count().as[(String, Long)].collect().toMap
    assert(byTask.keySet == Set("json_prediction", "json_accuracy", "sft_train"))
    assert(byTask.values.toSet.size == 1) // same doc count per task
    val p = out.filter($"task" === "json_prediction").limit(1)
      .select("prompt").as[String].head()
    // few-shot examples live INSIDE the system turn, in order, before user
    val sysEnd = p.indexOf("</s>\n<|user|>")
    assert(sysEnd > 0)
    val sys = p.substring(0, sysEnd)
    assert(sys.indexOf("Example 1:") > 0 &&
      sys.indexOf("Example 2:") > sys.indexOf("Example 1:"))
    assert(p.endsWith("<|assistant|>\n")) // generation prompt on
    val t = out.filter($"task" === "sft_train").limit(1)
      .select("prompt").as[String].head()
    assert(t.endsWith("</s>\n") && t.contains("<|assistant|>\nJSON Structure:\n"))
  }

  test("json_field_eval: planted malformed/wrong/missing classes score as specified") {
    // hand scoring over a tiny planted frame
    val df = Seq(
      // valid + both exact
      (0, """[{"Action":"Reboot","ChimeraType":"GPU"}]""", "Reboot", "GPU"),
      // malformed -> invalid, no field matches
      (0, """[{"Action":"Reb""", "Reboot", "GPU"),
      // valid, wrong action, chimera exact
      (1, """[{"Action":"Unclear","ChimeraType":"GPU"}]""", "Reboot", "GPU"),
      // valid, ChimeraType MISSING -> chimera never matches
      (1, """[{"Action":"Reboot"}]""", "Reboot", "GPU"))
      .toDF("eval_day", "y_pred", "gold_action", "gold_chimera")
    val got = JsonFieldEval.score(df, "eval_day", "y_pred",
        "gold_action", "gold_chimera")
      .as[(Int, String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(got((0, "action")) == ((2L, 1L, 1L, 500L)))
    assert(got((0, "chimera_type")) == ((2L, 1L, 1L, 500L)))
    assert(got((0, "all_fields")) == ((2L, 1L, 1L, 500L)))
    assert(got((1, "action")) == ((2L, 2L, 1L, 500L)))
    assert(got((1, "chimera_type")) == ((2L, 2L, 1L, 500L)))
    assert(got((1, "all_fields")) == ((2L, 2L, 0L, 0L)))
  }

  test("eval_experiment_delta: fixing the malformed class moves the right fields") {
    val out = JsonFieldEval.evalExperimentDeltaDocs(spark, sfDir)
      .as[(String, String, String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("action", "chimera_type", "all_fields"))
    out.values.foreach { case (_, a, b, nA, nB, accA, accB, d) =>
      assert(a == "base" && b == "candidate")
      assert(nA == nB) // same corpus, both variants score every doc
      assert(d == accB - accA)
      assert(accA >= 0 && accA <= 1000 && accB >= 0 && accB <= 1000)
    }
    // candidate fixed malformed outputs AND the missing-field class but
    // regressed a new wrong-Action class: chimera accuracy must IMPROVE
    // (mod-7 + mod-11 recovered, no new chimera defect)
    assert(out("chimera_type")._8 > 0L,
      "chimera_type delta must be positive for the candidate")
  }

  test("json_field_eval gated instance: every defect class fires, permille exact") {
    val out = JsonFieldEval.jsonFieldEvalDocs(spark, sfDir)
      .as[(Int, String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    // some invalid rows exist (the mod-7 truncation fires)
    assert(out.exists { case (_, _, n, nValid, _, _) => nValid < n })
    // all_fields never beats a single field; permille == 1000*match/n floor
    val byKey = out.map(r => (r._1, r._2) -> r).toMap
    out.filter(_._2 == "all_fields").foreach { case (d, _, n, _, m, p) =>
      assert(p == (1000L * m) / n)
      assert(m <= byKey((d, "action"))._5 && m <= byKey((d, "chimera_type"))._5)
    }
  }
}

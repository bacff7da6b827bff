package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multi-turn chat templating — the prompt-construction step of the
  * reference's production eval/SFT loop
  * (/root/reference/MachineLearning/Ray/zephyr/template_dataset.py:13-60
  * builds 3-turn system/user/assistant chat lists with few-shot example
  * blocks in the system turn; daily_eval.py:183-284 builds the 2-turn
  * inference variant and renders it with
  * `tokenizer.apply_chat_template(..., add_generation_prompt=True)`).
  *
  * The renderer is the zephyr chat format those scripts target:
  * `<|role|>\n{content}</s>\n` per message, plus a trailing
  * `<|assistant|>\n` generation prompt when requested. Rendering is one
  * codegen'd `transform` + `array_join` over a
  * `array<struct<role,content>>` column — map-side, zero shuffles,
  * which is what lets it run over a 100 TB prompt corpus as a plain
  * projection in whatever scan produced the rows.
  */
object ChatTemplate {

  /** Render a messages column (`array<struct<role:string,
    * content:string>>`) to the zephyr chat string; `generationPrompt`
    * appends the open assistant turn (daily_eval.py's
    * add_generation_prompt=True). */
  def render(messages: Column, generationPrompt: Boolean): Column = {
    val body = array_join(
      transform(messages, m => concat(
        lit("<|"), m.getField("role"), lit("|>\n"),
        m.getField("content"), lit("</s>\n"))), "")
    if (generationPrompt) concat(body, lit("<|assistant|>\n")) else body
  }

  /** A struct message, for composing arrays inline. */
  def msg(role: String, content: Column): Column =
    struct(lit(role).as("role"), content.as("content"))

  // ---- gated instance ----

  /** The two system instructions, with the few-shot example block
    * embedded in the system turn exactly as the reference does
    * (daily_eval.py:183-225: valid-option lists + "Example N" blocks
    * inside the system content, not as separate turns). Shortened but
    * structurally identical: task statement, option list, two few-shot
    * examples in fixed order. */
  val PredictSystem: String =
    "Analyze the ticket notes and produce a JSON structure with the " +
      "'Action' and 'ChimeraType' fields.\n\n" +
      "Valid 'Action' options: Reboot, Replace, Inspect\n\n" +
      "Example 1:\nTicket Notes: \"server blade froze\"\n" +
      "JSON Structure: [{\"Action\":\"Reboot\",\"ChimeraType\":\"Server Blade\"}]\n\n" +
      "Example 2:\nTicket Notes: \"bad network card\"\n" +
      "JSON Structure: [{\"Action\":\"Replace\",\"ChimeraType\":\"Network card\"}]"

  val AccuracySystem: String =
    "Evaluate the accuracy of the JSON against the ticket notes with a " +
      "binary score.\n\n" +
      "Example 1:\nTicket Notes: switchboard replaced\n" +
      "JSON: [{\"Action\":\"Replace\",\"ChimeraType\":\"Switchboard\"}]\n" +
      "Correct Score: 1\n\n" +
      "Example 2:\nTicket Notes: swapped the DIMMs\n" +
      "JSON: [{\"Action\":\"Replace\",\"ChimeraType\":\"Processor\"}]\n" +
      "Correct Score: 0"

  /** Deterministic gold JSON per doc (the corpus has no tickets; the
    * planted mapping doubles as [[JsonFieldEval]]'s gold). */
  private[operators] def goldAction(docId: Column): Column =
    element_at(array(lit("Reboot"), lit("Replace"), lit("Inspect")),
      (pmod(docId, lit(3)) + 1).cast("int"))

  private[operators] def goldJson(docId: Column, source: Column): Column =
    concat(lit("[{\"Action\":\""), goldAction(docId),
      lit("\",\"ChimeraType\":\""), source, lit("\"}]"))

  /** Three tasks per doc, mirroring the reference's concat of the
    * prediction + accuracy eval frames (daily_eval.py:277-284) plus the
    * 3-turn TRAINING template (template_dataset.py:17-55, assistant
    * turn carries the gold, no generation prompt). */
  def chatTemplateDocs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"))
      .withColumn("__gold", goldJson(col("doc_id"), col("source")))
    val userNotes = concat(lit("Ticket Notes:\n"), col("text"))
    val predict = docs.select(
      col("doc_id"), lit("json_prediction").as("task"),
      array(msg("system", lit(PredictSystem)),
        msg("user", userNotes)).as("__msgs"),
      lit(true).as("__gen"))
    val accuracy = docs.select(
      col("doc_id"), lit("json_accuracy").as("task"),
      array(msg("system", lit(AccuracySystem)),
        msg("user", concat(userNotes, lit("\n\nJSON Data:\n"), col("__gold"))))
        .as("__msgs"),
      lit(true).as("__gen"))
    val sft = docs.select(
      col("doc_id"), lit("sft_train").as("task"),
      array(msg("system", lit(PredictSystem)),
        msg("user", userNotes),
        msg("assistant", concat(lit("JSON Structure:\n"), col("__gold"))))
        .as("__msgs"),
      lit(false).as("__gen"))
    predict.unionByName(accuracy).unionByName(sft)
      .select(col("doc_id"), col("task"),
        size(col("__msgs")).as("n_msgs"),
        when(col("__gen"), render(col("__msgs"), generationPrompt = true))
          .otherwise(render(col("__msgs"), generationPrompt = false))
          .as("prompt"))
  }

  /** SQL-side few-shot/system constants: single-quote-escaped with
    * newlines as chr(10) splices so the oracle string is byte-identical
    * to the Scala literal. */
  private def sqlStr(s: String): String =
    "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"

  def oracleSql: String = {
    val gold = """'[{"Action":"' || CASE doc_id % 3 WHEN 0 THEN 'Reboot' WHEN 1 THEN 'Replace' ELSE 'Inspect' END || '","ChimeraType":"' || source || '"}]'"""
    def turn(role: String, content: String): String =
      s"'<|$role|>' || chr(10) || $content || '</s>' || chr(10)"
    val userNotes = "'Ticket Notes:' || chr(10) || text"
    s"""WITH base AS (
       |  SELECT doc_id, text, source, $gold AS gold FROM documents)
       |SELECT doc_id, 'json_prediction' AS task, CAST(2 AS INT) AS n_msgs,
       |  ${turn("system", sqlStr(PredictSystem))} || ${turn("user", userNotes)}
       |    || '<|assistant|>' || chr(10) AS prompt
       |FROM base
       |UNION ALL
       |SELECT doc_id, 'json_accuracy', CAST(2 AS INT),
       |  ${turn("system", sqlStr(AccuracySystem))}
       |    || ${turn("user", userNotes + " || chr(10) || chr(10) || 'JSON Data:' || chr(10) || gold")}
       |    || '<|assistant|>' || chr(10)
       |FROM base
       |UNION ALL
       |SELECT doc_id, 'sft_train', CAST(3 AS INT),
       |  ${turn("system", sqlStr(PredictSystem))} || ${turn("user", userNotes)}
       |    || ${turn("assistant", "'JSON Structure:' || chr(10) || gold")}
       |FROM base""".stripMargin
  }
}

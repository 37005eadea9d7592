package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Conversation/transcript assembly: turn a flat per-event stream into one
 * ordered multi-turn document per conversation key — the step that builds
 * SFT / chat-format training documents out of raw interaction logs
 * (events, support tickets, chat messages). The reference's per-case
 * re-nesting (clinical case flattener C2's inverse) is the same shape:
 * group → order within group → render one artifact per group.
 *
 * Scale shape: ONE shuffle on the conversation key; ordering happens
 * INSIDE each group via `array_sort` over collected structs (struct
 * comparison is field-order lexicographic, so (ts, id, line) sorts by
 * time with a deterministic id tiebreak — no global sort, no window).
 * A conversation longer than memory would need chunked assembly; real
 * chat logs are bounded per-conversation, so collect_list per key is the
 * honest scale form (same envelope as Spark's own collect_list).
 *
 * Determinism: the rendered line embeds no floats or timestamps — only
 * the event type and a JSON-extracted field — so the transcript string is
 * byte-stable across engines; ordering ties on (ts, event_id) are
 * impossible to observe in the output hash.
 */
object Dialog {

  /**
   * One row per `userCol`: `n_turns`, `n_chars`, and the rendered
   * newline-joined `transcript` of `type=k` lines ordered by
   * (`tsCol`, `idCol`).
   */
  def assembleTranscripts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      propsCol: String): DataFrame = {
    val line = concat_ws("=", col(typeCol),
      coalesce(get_json_object(col(propsCol), "$.k"), lit("?")))
    events
      .select(col(userCol).as("user_id"), col(tsCol).as("_ts"),
        col(idCol).as("_id"), line.as("_line"))
      .groupBy("user_id")
      .agg(
        count(lit(1)).cast("long").as("n_turns"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("_ts"), col("_id"), col("_line")))),
            x => x.getField("_line")),
          "\n").as("transcript"))
      .select(col("user_id"), col("n_turns"),
        length(col("transcript")).cast("long").as("n_chars"), col("transcript"))
  }
}

package graft.pipelines

import org.apache.spark.sql.SparkSession

/**
 * Config-driven step harness — the reference's shared pipeline shape
 * (SURVEY §3): `main(args)` → `load_config(yaml)` → step-gated execution,
 * where each build script declares named steps and the config's `steps`
 * list selects which run (cda_bq_etl/utils.py:32-94 `load_config`; every
 * BQ_Table_Building driver's `if step in steps` blocks).
 */
object StepRunner {

  final case class PipelineConfig(params: Map[String, String], steps: Seq[String]) {
    def param(key: String): String = params.getOrElse(key,
      throw new IllegalArgumentException(s"missing config param: $key"))
  }

  /**
   * Minimal YAML-subset parser for the reference's config shape: top-level
   * keys, one level of nested `key: value` params, and `- item` lists. No
   * external dependency; covers the ConfigFiles yaml structure of
   * scalar params + step lists.
   */
  def parseConfig(text: String): PipelineConfig = {
    val params = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val steps = scala.collection.mutable.ArrayBuffer.empty[String]
    var section: String = null
    text.linesIterator.foreach { raw =>
      val noComment = raw.takeWhile(_ != '#')
      val line = noComment.trim
      if (line.nonEmpty) {
        val indented = noComment.startsWith(" ") || noComment.startsWith("\t")
        if (!indented) {
          section = line.stripSuffix(":")
          if (line.contains(": ")) { // top-level scalar
            val Array(k, v) = line.split(": ", 2)
            params += k.trim -> unquote(v); section = null
          }
        } else if (line.startsWith("- ")) {
          val item = unquote(line.stripPrefix("- "))
          if (section == "steps") steps += item
          else params += s"$section[${steps.size}]" -> item
        } else if (line.contains(":")) {
          val Array(k, v) = line.split(":", 2)
          params += k.trim -> unquote(v.trim)
        }
      }
    }
    PipelineConfig(params.toMap, steps.toSeq)
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /**
   * Execute the registered steps the config selects, in registration order
   * (the reference runs in script order, gated by membership). Unknown
   * step names in the config are fatal — a typo'd step silently not
   * running is the failure mode this guards against.
   */
  def run(spark: SparkSession, config: PipelineConfig,
          registered: Seq[(String, (SparkSession, PipelineConfig) => Unit)]): Seq[String] = {
    val known = registered.map(_._1).toSet
    val unknown = config.steps.filterNot(known)
    require(unknown.isEmpty, s"config selects unknown steps: ${unknown.mkString(", ")}")
    val executed = scala.collection.mutable.ArrayBuffer.empty[String]
    registered.foreach { case (name, fn) =>
      if (config.steps.contains(name)) {
        val t0 = System.nanoTime()
        fn(spark, config)
        executed += name
        System.err.println(f"[step] $name finished in ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    executed.toSeq
  }
}

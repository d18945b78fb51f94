package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over a document corpus (SURVEY §7.1-9 extensions):
  * language ID, quality scoring, token counting, fingerprinting. All pure
  * builtin-expression plans (regexp_count / higher-order functions), fully
  * codegen'd — one narrow scan + per-row compute, embarrassingly parallel at any
  * scale; the only shuffles are the final per-language aggregations.
  */
object TextAnalysis {

  private def reCount(c: Column, pattern: String): Column =
    regexp_count(c, lit(pattern)).cast("long")

  /** n-gram-heuristic language ID: per-language marker counts (stopword
    * alternations; CJK code-point class for zh) with a fixed decision chain.
    * Deterministic — the oracle reproduces the same chain.
    */
  def langId(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(
        col("doc_id"),
        reCount(t, "[一-鿿]").as("zh_hits"),
        reCount(t, "\\b(the|and|of|to|is)\\b").as("en_hits"),
        reCount(t, "\\b(le|la|les|et|est)\\b").as("fr_hits"),
        reCount(t, "\\b(el|los|las|es|y)\\b").as("es_hits"),
        reCount(t, "\\b(der|die|das|und|ist)\\b").as("de_hits"),
        col("lang").as("actual_lang"))
      .withColumn("pred_lang",
        when(col("zh_hits") > 0, "zh")
          .when(col("fr_hits") > col("en_hits") && col("fr_hits") >= col("es_hits") &&
            col("fr_hits") >= col("de_hits"), "fr")
          .when(col("es_hits") > col("en_hits") && col("es_hits") >= col("de_hits"), "es")
          .when(col("de_hits") > col("en_hits"), "de")
          .otherwise("en"))
      .withColumn("correct", (col("pred_lang") === col("actual_lang")).cast("int"))
      .orderBy(col("doc_id"))
  }

  /** Quality scoring: length/punctuation/stopword/digit signals combined into a
    * deterministic [0,1] score and a low/medium/high bucket.
    */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(
        col("doc_id"),
        length(t).cast("long").as("n_chars"),
        size(Dedup.words(t)).cast("long").as("n_words"),
        reCount(t, "[.,!?;:]").as("n_punct"),
        reCount(t, "[0-9]").as("n_digits"),
        reCount(t, "\\b(the|a|of|and|to)\\b").as("n_stopwords"))
      .withColumn("stopword_ratio",
        col("n_stopwords").cast("double") / col("n_words").cast("double"))
      .withColumn("digit_ratio",
        col("n_digits").cast("double") / col("n_chars").cast("double"))
      .withColumn("score", expr(
        """0.5 * least(CAST(n_words AS DOUBLE) / CAST(80 AS DOUBLE), CAST(1 AS DOUBLE))
           + 0.3 * stopword_ratio * CAST(4 AS DOUBLE)
           + 0.2 * (CAST(1 AS DOUBLE) - digit_ratio)"""))
      .withColumn("bucket",
        when(col("score") >= 0.75, "high")
          .when(col("score") >= 0.5, "medium")
          .otherwise("low"))
      .orderBy(col("doc_id"))
  }

  /** Token counting: whitespace tokens and a BPE-ish segmentation
    * (letter-runs | digit-runs | single other non-space), aggregated per language.
    */
  def tokenStats(docs: DataFrame): DataFrame = {
    val t = col("text")
    val perDoc = docs.select(
      col("doc_id"), col("lang"),
      size(Dedup.words(t)).cast("long").as("ws_tokens"),
      reCount(t, "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]").as("bpe_tokens"))
    perDoc.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens"))
      .withColumn("avg_bpe_per_doc",
        col("total_bpe_tokens").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("lang"))
  }

  /** Winnowing-style document fingerprint: md5 over sliding word `n`-grams,
    * keep the `k` smallest distinct hashes (a bottom-k sketch), rendered as a
    * sorted comma-joined string. Equal fingerprints ⇒ near-dup candidates.
    */
  def fingerprint(docs: DataFrame, n: Int = 5, k: Int = 4): DataFrame = {
    val grams = Dedup.shingles(docs, n)
      .select(col("doc_id"), md5(col("gram")).as("h"))
    // bottom-k via array slice of the sorted distinct hash set — one aggregation,
    // no per-doc sort shuffle (collect_set dedups; array_sort orders).
    grams.groupBy(col("doc_id"))
      .agg(array_join(slice(array_sort(collect_set(col("h"))), 1, k), ",")
        .as("fingerprint"))
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
      .orderBy(col("doc_id"))
  }
}

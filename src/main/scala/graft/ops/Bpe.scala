package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** From-spec BYTE-PAIR-ENCODING tokenizer (Sennrich et al. 2016, the
  * algorithm behind every production subword vocabulary): train a fixed
  * number of merges on the corpus's word-frequency dictionary, then
  * tokenize by replaying the merges in rank order. Token counts — not
  * whitespace word counts — are what a training-data budget actually
  * meters, so the budget sampler gets a BPE variant (q38) next to its
  * word-count form (q36).
  *
  * Determinism is the design constraint (the t12 integer-exactness
  * discipline): pair counts are exact integer sums over the word dict,
  * the winning pair is argmax under the TOTAL order (count DESC, left
  * ASC, right ASC), and merge application is greedy left-to-right
  * non-overlapping — the same corpus yields the same merge table on any
  * partitioning, any engine. The DuckDB oracle replays the identical
  * training as unrolled SQL CTEs and must reproduce every merge.
  *
  * Symbol representation: a word's symbol sequence is ONE string with
  * each symbol wrapped in sentinel brackets U+0001 sym U+0002. Merging
  * pair (l, r) is then the literal replacement of `⟨l⟩⟨r⟩` by `⟨lr⟩`,
  * and because adjacent matches share NO characters, SQL replace()'s
  * universal left-to-right continue-after-match semantics IS exactly
  * BPE's greedy merge — identically in Spark and DuckDB. (A
  * single-separator encoding would make adjacent matches share their
  * delimiter and split even-length symbol runs differently from the
  * reference algorithm — measured and rejected.) Corpus words must not
  * contain the sentinel control characters; a deployment strips control
  * chars in the cleaning stage upstream of tokenization.
  *
  * Scale shape: the corpus is touched ONCE (word explode → frequency
  * dict, map-side partial agg); every merge iteration runs on the DICT
  * (vocabulary-bounded, ≪ corpus — the reason all BPE trainers work on
  * the frequency table), with a one-row argmax collect per merge (the
  * sanctioned scalar-read class; the merge decision is inherently
  * sequential). Tokenizing a corpus is a broadcast join against the
  * tokenized dict — per-doc counts never replay the merges per row.
  */
object Bpe {

  /** Symbol-open / symbol-close sentinels (see class doc). */
  val L = "\u0001"
  val R = "\u0002"

  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Word-frequency dictionary: (w, freq) via the corpus's standard
    * whitespace tokenization ([[Dedup.words]] — the t12/q36 discipline).
    */
  def wordDict(docs: DataFrame): DataFrame =
    docs.select(explode(Dedup.words(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Initial character representation: every char wrapped in ⟨⟩. */
  def charRep(w: Column): Column =
    concat(lit(L), array_join(split(w, ""), R + L), lit(R))

  /** One greedy merge of (l, r) applied to a bracket representation —
    * literal replace via a quoted regex (replaceAll's left-to-right
    * non-overlapping scan is the greedy BPE order; see class doc).
    */
  def applyMerge(rep: Column, l: String, r: String): Column =
    regexp_replace(rep,
      java.util.regex.Pattern.quote(L + l + R + L + r + R),
      java.util.regex.Matcher.quoteReplacement(L + l + r + R))

  /** Token count of a bracket representation: splitting the FULL string
    * on the inter-symbol boundary ⟩⟨ yields one element per symbol (the
    * outer brackets ride along harmlessly).
    */
  def repTokens(rep: Column): Column = size(split(rep, R + L)).cast("long")

  /** Train `numMerges` merges on the corpus. Each iteration: exact
    * integer pair counts over the (persisted) dict under the current
    * representation, argmax by (count DESC, left ASC, right ASC), one-row
    * collect, and the merge folded into the representation column as a
    * literal replace — the lineage stays `dict → k chained replaces`,
    * narrow and vocabulary-bounded. Stops early if no pair remains.
    */
  def trainMerges(docs: DataFrame, numMerges: Int): Seq[Merge] = {
    val dict = wordDict(docs)
      .withColumn("rep", charRep(col("w")))
      .select(col("freq"), col("rep"))
      .persist()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var cur = dict
      var k = 1
      var exhausted = false
      while (k <= numMerges && !exhausted) {
        val top = cur
          .select(col("freq"),
            split(expr("substring(rep, 2, length(rep) - 2)"), R + L).as("s"))
          .filter(size(col("s")) >= 2)
          .select(col("freq"), explode(expr(
            """transform(sequence(1, size(s) - 1), i ->
                 struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"""))
            .as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val (l, r, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += Merge(k, l, r, c)
          cur = cur.withColumn("rep", applyMerge(col("rep"), l, r))
          k += 1
        }
      }
      merges.toSeq
    } finally dict.unpersist()
  }

  /** The learned merge table as a DataFrame — t19's output contract. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.count))
      .toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy(col("merge_rank"))
  }

  /** BPE token count of a word under the learned merges: the char rep
    * with every merge replayed in rank order (a chain of codegen'd
    * literal replaces), then one split. Apply to the word DICT and join —
    * never per corpus row.
    */
  def tokenCount(w: Column, merges: Seq[Merge]): Column =
    repTokens(merges.foldLeft(charRep(w))((c, m) =>
      applyMerge(c, m.left, m.right)))
}

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

  /** The [[quality]] score as ONE column expression over the text — the
    * identical arithmetic (same operand order, same double casts) factored
    * out so composed pipelines (e01/e02) can PROJECT the score inline in
    * the same scan as their other per-row stages instead of computing
    * [[quality]] separately and joining it back by doc_id: the join
    * shuffles the corpus text twice for a value that is a pure per-row
    * function of it (guide §2.4 — remove shuffles outright). Callers
    * should wrap the result in a `Staged` fence when a filter will
    * reference it, or the pushed-down predicate re-derives the four
    * regexp counts per branch of the bucket CASE.
    */
  def scoreCol(t: Column): Column = {
    val nChars = length(t).cast("long")
    val nWords = size(Dedup.words(t)).cast("long")
    val nStopwords = reCount(t, "\\b(the|a|of|and|to)\\b")
    val nDigits = reCount(t, "[0-9]")
    val stopwordRatio = nStopwords.cast("double") / nWords.cast("double")
    val digitRatio = nDigits.cast("double") / nChars.cast("double")
    lit(0.5) * least(nWords.cast("double") / lit(80).cast("double"), lit(1).cast("double")) +
      lit(0.3) * stopwordRatio * lit(4).cast("double") +
      lit(0.2) * (lit(1).cast("double") - digitRatio)
  }

  /** [[quality]]'s low/medium/high bucket over an already-computed score
    * column (shared so the composed pipelines' inline projection cannot
    * drift from the registered t02 thresholds).
    */
  def bucketCol(score: Column): Column =
    when(score >= 0.75, "high")
      .when(score >= 0.5, "medium")
      .otherwise("low")

  /** The [[piiScrub]] masked text as ONE column expression (same rationale
    * as [[scoreCol]]: a pure per-row value belongs in the scan projection
    * of a composed pipeline, not behind a doc_id join).
    */
  def maskedCol(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, lit(emailRe), lit("<EMAIL>")),
        lit(phoneRe), lit("<PHONE>")),
      lit(ipv4Re), lit("<IP>"))

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

  /** PII regexes shared by the Spark plan and (verbatim) the DuckDB oracle —
    * deliberately restricted to constructs with identical semantics in
    * java.util.regex and RE2 (character classes, bounded repeats, ASCII \b):
    * the same pattern must count/replace identically in both engines.
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\b555-[0-9]{4}\\b" // NANP reserved test exchange
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII detection + scrubbing — the pre-training redaction pass: count and
    * mask e-mail addresses, phone numbers, and IPv4 literals. Pure per-row
    * regexp builtins (codegen'd, no UDF): one narrow scan, no shuffle at any
    * scale. Replacement order (e-mail → phone → IP) is fixed so the masked
    * text is deterministic; the patterns cannot overlap each other's
    * replacements (`<EMAIL>` etc. contain no pattern-matchable characters).
    */
  def piiScrub(docs: DataFrame): DataFrame = {
    val t = col("text")
    docs.select(
        col("doc_id"),
        reCount(t, emailRe).as("n_emails"),
        reCount(t, phoneRe).as("n_phones"),
        reCount(t, ipv4Re).as("n_ipv4"),
        regexp_replace(
          regexp_replace(
            regexp_replace(t, lit(emailRe), lit("<EMAIL>")),
            lit(phoneRe), lit("<PHONE>")),
          lit(ipv4Re), lit("<IP>")).as("masked"))
      .withColumn("has_pii",
        (col("n_emails") + col("n_phones") + col("n_ipv4") > 0).cast("long"))
      .orderBy(col("doc_id"))
  }

  /** Within-document repetition signals (the Gopher/MassiveText quality
    * rules): duplicate word / 2-gram / 3-gram fractions, integer-exact in
    * per-mille. Entirely per-row higher-order functions — zero shuffle,
    * fully codegen-compatible, embarrassingly parallel at 100 TB. The
    * `IF(n >= k, …, array())` guards matter: Spark's `sequence(1, 0)`
    * DESCENDS rather than returning empty, so an unguarded short document
    * would fabricate grams.
    */
  def repetition(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", Dedup.words(col("text")))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("g2", expr(
        """IF(n_words >= 2,
             transform(sequence(1, CAST(n_words AS INT) - 1), i ->
               concat(element_at(w, i), ' ', element_at(w, i + 1))),
             CAST(array() AS ARRAY<STRING>))"""))
      .withColumn("g3", expr(
        """IF(n_words >= 3,
             transform(sequence(1, CAST(n_words AS INT) - 2), i ->
               concat(element_at(w, i), ' ', element_at(w, i + 1), ' ',
                 element_at(w, i + 2))),
             CAST(array() AS ARRAY<STRING>))"""))
      .select(
        col("doc_id"),
        col("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct_words"),
        size(col("g2")).cast("long").as("n_2grams"),
        size(array_distinct(col("g2"))).cast("long").as("n_distinct_2grams"),
        size(col("g3")).cast("long").as("n_3grams"),
        size(array_distinct(col("g3"))).cast("long").as("n_distinct_3grams"))
      .withColumn("dup_word_mille", expr(
        "IF(n_words > 0, (n_words - n_distinct_words) * 1000 div n_words, 0L)"))
      .withColumn("dup_2gram_mille", expr(
        "IF(n_2grams > 0, (n_2grams - n_distinct_2grams) * 1000 div n_2grams, 0L)"))
      .withColumn("dup_3gram_mille", expr(
        "IF(n_3grams > 0, (n_3grams - n_distinct_3grams) * 1000 div n_3grams, 0L)"))
      .orderBy(col("doc_id"))

  /** Corpus-level boilerplate detection (the CCNet/C4 shared-paragraph rule,
    * shingle-granular because the corpus has no line structure): a distinct
    * word `n`-gram appearing in ≥ 1/`divisor` of all documents is
    * boilerplate; each document reports how much of it is made of such
    * grams. Plan shape chosen for 100 TB:
    *  - per-doc distinct grams come from `array_distinct` BEFORE the explode
    *    (no dedup shuffle);
    *  - document frequency is a groupBy(gram) — map-side partial aggregation
    *    collapses each task's rows before the one gram shuffle (never a
    *    window over a Zipf-skewed key — see t06);
    *  - the boilerplate gram set is PROVABLY bounded: Σdf = P (total
    *    doc-gram pairs), so |{df ≥ N/divisor}| ≤ divisor·P/N = divisor ×
    *    avg distinct grams per doc — independent of corpus row count.
    *    That bound justifies the explicit broadcast back onto the gram
    *    stream (a few MB at divisor 20 even for book-length documents);
    *  - the per-doc rollup is one more map-side-partial groupBy.
    */
  def boilerplate(docs: DataFrame, n: Int = 5, divisor: Int = 20): DataFrame = {
    val grams = Dedup.shingles(docs, n) // distinct (doc_id, gram) pairs
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val boiler = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") * divisor >= col("n_docs"))
      .select(col("gram"), lit(1L).as("is_boiler"))
    grams.join(broadcast(boiler), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        coalesce(sum(col("is_boiler")), lit(0L)).as("n_boiler"))
      .withColumn("boiler_mille", expr("n_boiler * 1000 div n_grams"))
      .orderBy(col("doc_id"))
  }

  /** Unigram language-model scoring (the CCNet-style LM quality filter with
    * a corpus-trained unigram model, kept in integer arithmetic so two
    * engines hash-match): every word's corpus frequency in parts-per-million
    * (`count(w)·1e6 div total_words`), then each document's mean over its
    * token OCCURRENCES — high = built from common words, low = rare-word
    * soup. Also reports the rarest word's ppm (the strongest single outlier
    * signal). Plan shape at 100 TB: the unigram "model" is a
    * map-side-partial groupBy(w) (never a window on the Zipf-skewed token
    * key — see t06), the model join back onto the token stream is an
    * AQE-skew-splittable equi-join, and the per-doc rollup partial-aggs
    * again; the totals scalar is a 1-row broadcast.
    */
  def unigramScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(Dedup.words(col("text"))).as("w"))
    val model = toks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val totals = model.agg(sum(col("cw")).as("total_words"))
    val scored = toks.join(model, "w")
      .crossJoin(broadcast(totals))
      .withColumn("freq_ppm", expr("cw * 1000000 div total_words"))
    scored.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        expr("sum(freq_ppm) div count(1)").as("avg_freq_ppm"),
        min(col("freq_ppm")).as("min_freq_ppm"),
        max(col("freq_ppm")).as("max_freq_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Bigram-LM fluency score — the CCNet-style perplexity filter one step
    * up from [[unigramScore]]: the corpus trains a conditional bigram model
    * (count(w1 w2) / count(w1 ·) in integer ppm — order sensitivity is what
    * a unigram model cannot see), and each document is scored by the mean /
    * min / max conditional probability of its own bigrams. Low avg = the
    * word ORDER is improbable even when the words are common — word salad,
    * shuffled scrapes, keyword stuffing.
    *
    * Integer-ppm arithmetic end to end (sum-then-divide, like t12), so the
    * oracle reproduces scores exactly. Plan shape at 100 TB: the bigram
    * stream partial-aggregates into the model (map-side combine on the
    * bigram key), context totals partial-aggregate off the MODEL (vocab-
    * bounded, never the corpus), and both the model join and the doc score
    * are AQE-skew-joinable equi-joins — never a window over a Zipf-skewed
    * token key (the t06 discipline). Docs under two words have no bigrams
    * and are excluded by construction.
    */
  def bigramScore(docs: DataFrame): DataFrame = {
    val bg = docs.select(col("doc_id"), Dedup.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(expr(
        """zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),
           (a, b) -> concat(a, ' ', b))""")).as("bg"))
    val model = bg.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
      .withColumn("w1", expr("split_part(bg, ' ', 1)"))
    val ctx = model.groupBy(col("w1")).agg(sum(col("cb")).as("c1"))
    val probs = model.join(ctx, "w1")
      .select(col("bg"), expr("cb * 1000000 div c1").as("p_ppm"))
    bg.join(probs, "bg")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        expr("sum(p_ppm) div count(1)").as("avg_p_ppm"),
        min(col("p_ppm")).as("min_p_ppm"),
        max(col("p_ppm")).as("max_p_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Supervised SOURCE classification — the fasttext-style provenance
    * classifier a training-data pipeline runs to detect mislabeled or
    * shifted content: an add-1-smoothed multinomial scorer trained on the
    * corpus's own source labels and applied to the held-out `isTest`
    * split (injectable, like [[graft.ops.Dedup.contamination]]'s isEval —
    * the caller must pick a split INDEPENDENT of the label, or held-out
    * sources are unlearnable by construction). Per word and source the smoothed likelihood
    * `(c(s,w) + 1) / (c(s) + V)` lives in integer ppm space (floor-div),
    * so per-doc scores are ORDER-INDEPENDENT long sums — the cross-engine
    * parity discipline of [[unigramScore]]; the additive-ppm objective
    * (Σ p rather than Σ log p) is a deliberate trade for that integer
    * parity, and the argmax resolves ties by (score desc, source asc).
    * Unseen (source, word) pairs contribute the source's smoothed base
    * `1 / (c(s) + V)` — accounted in closed form as
    * `(n_tokens − n_present) · base(s)`, never materialized per token.
    *
    * Plan at 100 TB: the model is a map-side-partial (source, word)
    * groupBy; scoring joins the token stream on the word key
    * (AQE-skew-joinable); the per-source table (cardinality = number of
    * provenance buckets) is the ONLY broadcast; the argmax window is per
    * test doc over that bounded source list, never a corpus-wide key.
    */
  def sourceClassifier(docs: DataFrame, isTest: Column): DataFrame = {
    def toks(d: DataFrame) = d.select(col("doc_id"), col("source"),
      explode(Dedup.words(col("text"))).as("w"))
    val tr = toks(docs.filter(!isTest))
    val te = toks(docs.filter(isTest))
    val vocab = tr.agg(countDistinct(col("w")).as("v"))
    val model = tr.groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("csw"))
    val bases = model.groupBy(col("source")).agg(sum(col("csw")).as("cs"))
      .crossJoin(broadcast(vocab))
      .select(col("source").as("m_source"),
        expr("1000000 div (cs + v)").as("base_ppm"),
        col("cs"), col("v"))
    val weights = model
      .join(bases, col("source") === col("m_source"))
      .select(col("m_source"), col("w"),
        expr("(csw + 1) * 1000000 div (cs + v)").as("w_ppm"))
    val present = te.join(weights, "w")
      .groupBy(col("doc_id"), col("m_source"))
      .agg(sum(col("w_ppm")).as("present_sum"),
        count(lit(1)).as("present_cnt"))
    val docTok = te.groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tokens"))
    val scores = docTok
      .crossJoin(broadcast(bases.select(col("m_source"), col("base_ppm"))))
      .join(present, Seq("doc_id", "m_source"), "left")
      .select(col("doc_id"), col("source"), col("m_source"), col("n_tokens"),
        (coalesce(col("present_sum"), lit(0L)) +
          (col("n_tokens") - coalesce(col("present_cnt"), lit(0L)))
            * col("base_ppm")).as("score_ppm"))
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_ppm").desc, col("m_source").asc)
    scores.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("source"), col("m_source").as("predicted"),
        col("n_tokens"), col("score_ppm"),
        when(col("m_source") === col("source"), 1L).otherwise(0L)
          .as("correct"))
      .orderBy(col("doc_id"))
  }

  /** Per-source corpus profile — the dataset-card rollup a training-data
    * pipeline publishes per provenance bucket: document/token volumes,
    * exact vocabulary size, integer-mille type-token ratio (lexical
    * diversity), language spread, and average document length. Plan shape
    * at 100 TB: the token stream partial-aggregates by (source, word)
    * BEFORE the per-source vocabulary count (both shuffles are map-side
    * combined groupBys on bounded-or-partial-agg'd keys; source cardinality
    * is small but nothing here relies on it), then joins per-source scalar
    * aggregates computed straight off the corpus scan.
    */
  def corpusProfile(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("source"),
      explode(Dedup.words(col("text"))).as("w"))
    val vocab = toks.groupBy(col("source"), col("w")).agg(count(lit(1)).as("cw"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("distinct_words"), sum(col("cw")).as("total_tokens"))
    val base = docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(length(col("text")).cast("long")).as("total_chars"))
    base.join(vocab, "source")
      .withColumn("avg_chars", expr("total_chars div n_docs"))
      .withColumn("ttr_mille", expr("distinct_words * 1000 div total_tokens"))
      .select(col("source"), col("n_docs"), col("n_langs"), col("total_chars"),
        col("avg_chars"), col("total_tokens"), col("distinct_words"),
        col("ttr_mille"))
      .orderBy(col("source"))
  }

  /** Document chunking — the documents → training-sequences step: fixed
    * `size`-word windows advancing by `size - overlap`, so consecutive
    * chunks share `overlap` words of context. A trailing fragment already
    * fully contained in the previous chunk (length ≤ overlap) is dropped —
    * except for single-chunk documents. Entirely per-row higher-order
    * functions + one LOCAL posexplode (rows multiply in the scan stage, no
    * shuffle): the shape that turns a 100 TB corpus into sequences without
    * moving anything but the chunks themselves.
    */
  def chunk(docs: DataFrame, size: Int = 40, overlap: Int = 10): DataFrame = {
    require(size > overlap && overlap >= 0, "need size > overlap >= 0")
    val stride = size - overlap
    docs
      .withColumn("w", Dedup.words(col("text")))
      .withColumn("nw", org.apache.spark.sql.functions.size(col("w")).cast("long"))
      .select(col("doc_id"), col("w"), col("nw"),
        posexplode(expr(
          s"""filter(transform(sequence(0L, nw - 1, $stride),
                s -> IF(s = 0 OR nw - s > $overlap, s, NULL)),
              x -> x IS NOT NULL)""")).as(Seq("chunk_idx", "start_word")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long"),
        col("start_word"),
        least(lit(size.toLong), col("nw") - col("start_word")).as("chunk_tokens"),
        expr(s"array_join(slice(w, CAST(start_word + 1 AS INT), $size), ' ')")
          .as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** SEQUENCE PACKING — the GPT-style step that turns variable-length
    * documents into fixed-length training rows: per (lang, shard), documents
    * are concatenated in deterministic hash order into one token stream and
    * the stream is cut at every `seqLen` tokens; a document straddling a cut
    * contributes a piece to each side (exactly the concat-then-chunk packing
    * GPT-2/T5 pipelines run, so no token is padded away and no sequence is
    * short). Output: one row per (document × packed sequence it touches)
    * with `take_from`/`take_n` — the slice of the document that lands in
    * that sequence — so a downstream writer can materialize the packed rows
    * with a join and never shuffles token arrays around.
    *
    * Scale: packing is inherently sequential IN THE STREAM ORDER, so the
    * corpus is salted into `shards` independent streams per lang (shard =
    * doc_id % shards — deterministic and oracle-computable, unlike a hash
    * salt) and each (lang, shard) packs in parallel; shard count scales
    * with the corpus, the per-task work is corpus/shards, and sequence ids
    * are (lang, shard, seq_idx) — exactly how production packers shard.
    * All arithmetic is integer (token counts, cumulative sums, floor
    * division), so the oracle matches hash-exactly.
    */
  def packSequences(docs: DataFrame, seqLen: Int = 128,
      shards: Int = 16): DataFrame = {
    val w = Window
      .partitionBy(col("lang"), col("shard"))
      .orderBy(col("skey").asc, col("doc_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("doc_id"), col("lang"),
        org.apache.spark.sql.functions.size(Dedup.words(col("text")))
          .cast("long").as("tokens"),
        md5(concat(lit("pk:"), col("doc_id").cast("string"))).as("skey"),
        (col("doc_id") % shards).as("shard"))
      .filter(col("tokens") > 0)
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("start", col("cum") - col("tokens"))
      .select(col("lang"), col("shard"), col("doc_id"), col("tokens"),
        col("start"),
        explode(expr(s"sequence(start div $seqLen, (cum - 1) div $seqLen)"))
          .as("seq_idx"))
      .select(col("lang"), col("shard"), col("seq_idx"), col("doc_id"),
        col("tokens").as("doc_tokens"),
        greatest(col("seq_idx") * seqLen - col("start"), lit(0L))
          .as("take_from"),
        (least((col("seq_idx") + 1) * seqLen, col("start") + col("tokens"))
          - greatest(col("seq_idx") * seqLen, col("start"))).as("take_n"))
      .orderBy(col("lang"), col("shard"), col("seq_idx"), col("doc_id"))
  }

  /** Winnowing-style document fingerprint: md5 over sliding word `n`-grams,
    * keep the `k` smallest distinct hashes (a bottom-k sketch), rendered as a
    * sorted comma-joined string. Equal fingerprints ⇒ near-dup candidates.
    */
  def fingerprint(docs: DataFrame, n: Int = 5, k: Int = 4): DataFrame = {
    // r13 (the t04 ×100-exponent audit): the former shingle EXPLODE +
    // groupBy(doc_id) collect_set carried every doc's FULL distinct-hash
    // set through a doc_id exchange before the bottom-k slice — N·L gram
    // hashes shuffled to keep k of them, the route's superlinear term.
    // The bottom-k sketch is a pure PER-ROW projection over the in-plan
    // shingle array (the MinHashBandSigs discipline — same bits, computed
    // where the text already sits): hash, sort, slice, join, all in the
    // scan stage; the grams are already distinct, so sorted hashes are the
    // distinct set. The filter reproduces the exploded form's row
    // universe (a doc under n words has no gram, hence no row) off the
    // words array alone, so the gram pipeline is inlined exactly once.
    // The only remaining exchange is the bucket_size window over the
    // ~130-byte fingerprint rows — linear, and skew-free outside genuine
    // duplicate piles.
    docs
      .withColumn("words", Dedup.words(col("text")))
      .filter(size(col("words")) >= n)
      .withColumn("grams", Dedup.shingleArray(n))
      .select(col("doc_id"),
        array_join(slice(array_sort(
          expr("transform(grams, g -> md5(g))")), 1, k), ",")
          .as("fingerprint"))
      .withColumn("bucket_size",
        count(lit(1)).over(Window.partitionBy(col("fingerprint"))))
      .orderBy(col("doc_id"))
  }
}

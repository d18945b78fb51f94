package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — the training-data
  * pipeline extensions beyond the reference's surface (SURVEY §7.1-9).
  *
  * Scale design: every operator is a pure declarative plan — shingle explosion and
  * hashing are codegen'd builtins (no UDFs in the hot path), the candidate
  * generation joins are equi-joins on hash/band keys (shuffle-partitionable by
  * key, no cross joins), and verification runs only on candidate pairs. At 100 TB
  * the gram→doc inverted index is the only large shuffle; frequent-gram capping
  * (`maxDocFreq`) bounds the worst-case join fan-out exactly like production
  * near-dup pipelines.
  */
object Dedup {

  /** Whitespace tokenization shared by all text ops. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles (1 row per distinct shingle per doc).
    * Built with transform/filter over an index sequence so the identical
    * expression is expressible in the DuckDB oracle.
    */
  def shingles(docs: DataFrame, n: Int): DataFrame = {
    val gramExpr =
      s"""array_distinct(filter(transform(sequence(1, size(words)), i ->
            CASE WHEN i + ${n - 1} <= size(words)
                 THEN ${(0 until n).map(j => s"element_at(words, i + $j)").mkString("concat_ws(' ', ", ", ", ")")}
            END), x -> x IS NOT NULL))"""
    docs
      .withColumn("words", words(col("text")))
      .select(col("doc_id"), explode(expr(gramExpr)).as("gram"))
  }

  /** Exact dedup by content hash (hash-groupBy; the canonical survivor is the
    * minimum id — deterministic and order-independent).
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("canonical_id"),
        array_join(transform(array_sort(collect_set(col("doc_id"))),
          x => x.cast("string")), ",").as("doc_ids"))
      .orderBy(col("content_hash"))

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    * gram-equijoin → per-pair intersection counts → |A∩B| / |A∪B|.
    * `maxDocFreq` drops grams shared by more than that many docs (bounds join
    * fan-out; standard at scale — a gram in half the corpus carries no signal).
    */
  def ngramJaccard(docs: DataFrame, n: Int, minJaccard: Double,
      maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val tri = shingles(docs, n)
    val filtered =
      if (maxDocFreq == Long.MaxValue) tri
      else {
        val freq = tri.groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDocFreq)
        tri.join(freq.select("gram"), Seq("gram"))
      }
    val sizes = filtered.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = filtered.as("a")
    val b = filtered.as("b")
    val inter = a.join(b, col("a.gram") === col("b.gram") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n", "n1"), "doc1")
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n", "n2"), "doc2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc1"), col("doc2"), col("inter"), col("n1"), col("n2"), col("jaccard"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** MinHash + LSH near-dup detection: k hash functions (min of md5 over salted
    * shingles — string min ≡ numeric min for fixed-width hex), banded into
    * k/bandSize bands; docs sharing any (band, signature) bucket become
    * candidates; candidates are verified with exact Jaccard ≥ `verifyThreshold`.
    *
    * Scale: signatures are 1 row per (doc, hash) — linear; the bucket join is an
    * equi-join on (band, sig); verification touches candidate pairs only. This is
    * the canonical shape of corpus-scale fuzzy dedup.
    */
  def minhashLsh(docs: DataFrame, n: Int = 3, numHashes: Int = 8,
      bandSize: Int = 4, verifyThreshold: Double = 0.1): DataFrame = {
    require(numHashes % bandSize == 0)
    val tri = shingles(docs, n)
    val hashed = tri
      .select(col("doc_id"), col("gram"),
        explode(expr(s"sequence(1, $numHashes)")).as("h"))
      .groupBy(col("doc_id"), col("h"))
      .agg(min(md5(concat(col("h").cast("string"), lit(":"), col("gram")))).as("m"))
    val bandSig = hashed
      .groupBy(col("doc_id"), ((col("h") - 1) / bandSize).cast("int").as("band"))
      .agg(md5(concat_ws("|",
        (0 until bandSize).map(p =>
          min(when((col("h") - 1) % bandSize === p, col("m")))): _*)).as("sig"))
    val a = bandSig.as("a")
    val b = bandSig.as("b")
    val cand = a.join(b, col("a.band") === col("b.band") &&
        col("a.sig") === col("b.sig") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc1"), col("b.doc_id").as("doc2"))
      .distinct()
    // verify candidates with exact Jaccard
    val sizes = tri.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val t1 = tri.withColumnRenamed("doc_id", "doc1")
    val t2 = tri.withColumnRenamed("doc_id", "doc2").withColumnRenamed("gram", "gram2")
    cand
      .join(t1, "doc1")
      .join(t2, col("gram") === col("gram2") && t2("doc2") === cand("doc2"))
      .groupBy(cand("doc1"), cand("doc2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("n", "n1"), "doc1")
      .join(sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("n", "n2"), "doc2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= verifyThreshold)
      .select(col("doc1"), col("doc2"), col("jaccard"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** 16-bit SimHash over word multiset: each word contributes ±1 per bit position
    * of the first 16 bits of md5(word); the sign of the per-bit sum is the
    * fingerprint bit (ties → 1). Docs sharing a fingerprint are near-dup
    * candidates (`bucket_size`).
    *
    * All arithmetic is integer/hex-digit decoding expressible identically in the
    * oracle; at scale this is a map + one aggregation by (doc, bit) + one by doc.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val wordRows = docs
      .withColumn("w", explode(words(col("text"))))
      .select(col("doc_id"), substring(md5(col("w")), 1, 4).as("hex4"))
    val bits = wordRows
      .select(col("doc_id"), col("hex4"),
        explode(expr("sequence(0, 15)")).as("b"))
      .withColumn("v",
        expr("instr('0123456789abcdef', substring(hex4, b div 4 + 1, 1)) - 1"))
      .withColumn("bit", expr(
        "(v div (CASE b % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("bit") * 2 - 1).as("s"))
    val sig = bits
      .groupBy(col("doc_id"))
      .agg(concat(
        (0 until 16).map(i =>
          max(when(col("b") === i,
            when(col("s") >= 0, lit("1")).otherwise(lit("0"))))): _*).as("simhash"))
    sig
      .withColumn("bucket_size", count(lit(1)).over(Window.partitionBy(col("simhash"))))
      .orderBy(col("doc_id"))
  }
}

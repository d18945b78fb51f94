package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Barrier.BarrierOps

/** Similarity search over an embedding column (`array<float>`), the
  * training-data-pipeline ANN surface (SURVEY §7.1-9).
  *
  * Numeric determinism: dot products are a sequential left fold over
  * element-wise double products (`aggregate(zip_with(...))`) — float→double
  * widening is exact (24+24 mantissa bits < 53) and the fold order is fixed, so
  * Spark and the DuckDB oracle produce bitwise-identical doubles.
  *
  * Scale: brute force is the O(Q·N) baseline (fine for re-ranking or small Q);
  * the IVF variant buckets vectors by a deterministic coarse quantizer so each
  * query probes ~N/2^dims candidates via an equi-join on the bucket key — the
  * same partition-pruning shape an ANN index gives a 1000-executor cluster.
  * Everything stays in codegen'd higher-order functions — no UDFs.
  */
object Similarity {

  /** Sequential-fold dot product of two float-array columns (as double) —
    * a native codegen'd expression (graft.functions.DotProductF32) with the
    * same fixed fold order as the HOF/oracle formulation.
    */
  def dot(a: String, b: String): Column =
    graft.functions.DotProductF32(col(a), col(b))

  def norm2(a: String): Column = sqrt(dot(a, a))

  def cosine(a: String, b: String): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Brute-force cosine top-k: for each query vector (`queryPred` selects the
    * query set), rank all candidates by (cosine desc, vec_id asc) and keep k.
    * Norms are precomputed once per vector (1 fold per pair instead of 3) —
    * same doubles, ~3× less HOF work.
    */
  def topkBruteForce(emb: DataFrame, queryPred: Column, k: Int): DataFrame = {
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm2("embedding").as("qnorm"))
    val c = emb.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
      col("label").as("cand_label"), norm2("embedding").as("cnorm"))
    val scored = q.join(c, col("query_id") =!= col("cand_id"))
      .withColumn("cosine", dot("qe", "ce") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cand_label"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Deterministic coarse quantizer: sign bits of the first `dims` components →
    * bucket id in [0, 2^dims). The scale path: vectors are hash-partitioned by
    * bucket, so a query only joins its own bucket's partition.
    */
  def bucketOf(e: String, dims: Int): Column = {
    val terms = (1 to dims).map(j =>
      s"(CASE WHEN element_at($e, $j) > CAST(0 AS FLOAT) THEN ${1 << (j - 1)} ELSE 0 END)")
    expr(terms.mkString(" + "))
  }

  /** IVF-style ANN: probe only the query's own coarse bucket, rank within it.
    * Approximate by construction (recall < 1 vs brute force); the approximation
    * is deterministic, so the oracle reproduces it exactly.
    */
  def topkIvf(emb: DataFrame, queryPred: Column, k: Int, dims: Int = 4): DataFrame = {
    val bucketed = emb.withColumn("bucket", bucketOf("embedding", dims))
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("bucket"), norm2("embedding").as("qnorm"))
    val c = bucketed.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("bucket"), norm2("embedding").as("cnorm"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", dot("qe", "ce") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket").cast("long").as("bucket"),
        col("rank").cast("long").as("rank"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Multi-probe IVF: each query probes its own coarse bucket PLUS every
    * Hamming-1 neighbor (one sign bit flipped) — the standard IVF recall
    * lever: a vector near a quantization boundary sits in an adjacent
    * bucket, and flipping the uncertain bit finds it. The probe set explodes
    * on the (tiny) query side into `dims + 1` rows, so candidate generation
    * stays an EQUI-join on the bucket id — the corpus side still shuffles
    * (or stays partitioned) by bucket exactly as single-probe IVF does.
    */
  def topkIvfMultiProbe(emb: DataFrame, queryPred: Column, k: Int,
      dims: Int = 4): DataFrame = {
    val bucketed = emb.withColumn("bucket", bucketOf("embedding", dims))
    val masks = 0 +: (0 until dims).map(1 << _)
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("bucket").as("qbucket"), norm2("embedding").as("qnorm"))
      .withColumn("mask", explode(lit(masks.toArray)))
      .withColumn("bucket", expr("qbucket ^ mask"))
    val c = bucketed.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("bucket"), norm2("embedding").as("cnorm"))
    // probe buckets are distinct per query, so each candidate matches at most
    // one probe row — no dedup needed before ranking
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", dot("qe", "ce") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF with DATA-DERIVED, LLOYD-REFINED centroids — the real inverted-file
    * shape (the sign-bit [[bucketOf]] quantizer partitions space blindly;
    * centroids adapt to the data): the `nCentroids` vectors with the
    * smallest vec_ids serve as a deterministic centroid sample (the standard
    * "sample, don't train" bootstrap), every vector is assigned to its
    * maximum-inner-product centroid (ties → smallest centroid id), and ONE
    * k-means (Lloyd) refinement recomputes each centroid as the mean of its
    * assigned vectors before the final assignment that the probe join uses.
    *
    * The Lloyd step is made ORDER-INDEPENDENT — and therefore both
    * bit-reproducible and map-side-combinable — by summing in integer space:
    * each float component is quantized to floor(x·2²⁰) (exact: a float
    * scaled by a power of two loses no mantissa bits in a double, and floor
    * is integral), per-(centroid, component) LONG sums commute however tasks
    * interleave, and the refined component is the double quotient
    * sum / (count·2²⁰). A double summation would depend on reduction order;
    * this is the quantized-mean Lloyd step production pipelines run so that
    * retrained centroids are identical across cluster layouts. The oracle
    * mirrors the quantization bit-for-bit.
    *
    * Scale: centroid tables are K rows — collapsed to one cid-sorted
    * candidate array and broadcast; each assignment is a pure map-side
    * projection (native `argmax_dot` — no N×K fan-out, NO shuffle; r10,
    * formerly a crossJoin + max_by aggregate whose exchange carried the
    * vector payload); the Lloyd
    * sums aggregate N·dim rows into K·dim partial-combined groups; the probe
    * join shuffles (or stays partitioned) by centroid id exactly like the
    * other IVF variants. Deterministic by construction, so the oracle
    * reproduces assignment AND refinement bit-for-bit.
    */
  /** Shared coarse stage of s06/s08: deterministic seed sample → one
    * quantized-integer Lloyd round → final assignment. Returns (assigned:
    * vec_id/bucket/embedding, refined: cid/centroid array<double>).
    */
  private def refinedAssignment(emb: DataFrame,
      nCentroids: Int): (DataFrame, DataFrame) = {
    val quant = 1048576L // 2^20: float mantissa fits a double at this scale
    val seeds = emb.orderBy(col("vec_id").asc).limit(nCentroids)
      .select(col("vec_id").as("cid"), col("embedding").as("centroid"))
    // MAP-SIDE assignment (r10): the K-row codebook collapses to ONE
    // cid-sorted candidate array, broadcast, and the native argmax_dot
    // picks each vector's cell as a pure projection — the former
    // crossJoin → groupBy(max_by) form fanned out N·K rows and shuffled
    // them WITH the vector payload (first(embedding)); at corpus scale
    // that exchange is N·K·vectorBytes for an aggregation whose result
    // is computable where the vector already sits. Bitwise-identical
    // (same fold arithmetic, strict-> over cid-ascending = min-cid ties).
    val seedCands = seeds.groupBy()
      .agg(expr("array_sort(collect_list(struct(cid, centroid)))").as("cands"))
    val seedAssigned = emb.crossJoin(broadcast(seedCands))
      .select(col("vec_id"),
        graft.functions.ArgmaxDot(col("embedding"), col("cands"),
          halfNorm = false).as("bucket"),
        col("embedding"))
    // one Lloyd round: quantized per-(bucket, component) integer sums …
    val compSums = seedAssigned
      .select(col("bucket"), posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("bucket"), col("i"),
        floor(col("x").cast("double") * quant).as("qx"))
      .groupBy(col("bucket"), col("i"))
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("cnt"))
    // … reassembled into the refined centroid array in component order
    val refined = compSums
      .withColumn("c", col("sq").cast("double") / (col("cnt") * quant).cast("double"))
      .groupBy(col("bucket"))
      .agg(expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)")
        .as("centroid"))
      .select(col("bucket").as("cid"), col("centroid"))
      // barriered (r19): the K-row centroid table is consumed by MANY
      // independent subtrees downstream (the final assignment broadcast
      // here, geometry head() reads, probe scoring, LUT builds, residual
      // joins) and each consumer re-ran the seed-sample + Lloyd-round
      // shuffle over the corpus. K rows — materializing is free; the
      // corpus-sized `assigned` frame stays lazy (a checkpoint of it
      // would materialize the vector payload).
      .barriered
    // final assignment against the refined centroids — same map-side
    // argmax_dot projection (float vector · double centroid fold, the
    // arithmetic the oracle mirrors)
    val refCands = refined.groupBy()
      .agg(expr("array_sort(collect_list(struct(cid, centroid)))").as("cands"))
    val assigned = emb.crossJoin(broadcast(refCands))
      .select(col("vec_id"),
        graft.functions.ArgmaxDot(col("embedding"), col("cands"),
          halfNorm = false).as("bucket"),
        col("embedding"))
    (assigned, refined)
  }

  def topkIvfCentroids(emb: DataFrame, queryPred: Column, k: Int,
      nCentroids: Int = 8): DataFrame = {
    val (assigned, _) = refinedAssignment(emb, nCentroids)
    val q = assigned.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("bucket"), norm2("embedding").as("qnorm"))
    val c = assigned.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("bucket"), norm2("embedding").as("cnorm"))
    val scoredPairs = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", dot("qe", "ce") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    scoredPairs
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket").cast("long").as("bucket"),
        col("rank").cast("long").as("rank"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** PRODUCT-QUANTIZATION ANN (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011) — the memory-bounded path real
    * 100 TB vector search runs: the vector splits into `subspaces`
    * sub-vectors, each sub-space learns a tiny `codebookSize`-entry
    * codebook (deterministic seed sample + ONE quantized-integer Lloyd
    * refinement — [[topkIvfCentroids]]'s exact discipline, per sub-space),
    * and every vector is stored as `subspaces` small codes. A candidate
    * then costs `subspaces` bytes instead of dims·4 — at a billion vectors
    * the difference between codes-in-RAM and vectors-on-disk.
    *
    * Query time is ASYMMETRIC DISTANCE (ADC): the un-quantized query builds
    * a (sub-space × code) inner-product lookup table against the codebooks
    * — Q·M·K tiny rows, broadcast — and each candidate's score is the
    * fixed-order sum of its M table hits. Per candidate: M lookups + M
    * adds, never a dims-length dot product; the only shuffle is the
    * (query, candidate) partial-aggregated sum and the per-query top-k.
    *
    * Encoding assigns each sub-vector to argmin-L2 centroid via the
    * monotone form max(⟨sv,c⟩ − ½⟨c,c⟩) (ties → smallest code id). Every
    * arithmetic step — seed assignment, the 2²⁰-quantized Lloyd sums, the
    * refined-codebook fold, the m-ordered ADC sum — is fixed-order and
    * integer-anchored, so the DuckDB oracle reproduces scores bitwise.
    *
    * Split (r10, verdict item 1) into [[buildPqIndex]] (training — ingest/
    * compaction cadence) and [[topkPqAgainstIndex]] (bounded query-time
    * ADC); [[topkPq]] below composes them for the self-contained
    * hash-checked form.
    */
  /** Mixed float/double fixed-fold dot — native codegen'd expression
    * (graft.functions.DotProductFD), numerically identical to the former
    * `aggregate(zip_with(..., CAST·CAST), 0d, +)` HOF form and to the
    * oracle's list_reduce mirror (r10: the HOF lambda evaluated
    * interpreted per element — the dominant cost of the quantizer
    * assignment/ADC stages).
    */
  private def pqDotFD(a: String, b: String): Column =
    graft.functions.DotProductFD(col(a), col(b))

  private def pqSubSplit(df: DataFrame, subspaces: Int, sub: Int): DataFrame =
    df.select(col("vec_id"), posexplode(expr(
      s"""transform(sequence(0, ${subspaces - 1}),
            mm -> slice(embedding, mm * $sub + 1, $sub))"""))
      .as(Seq("m", "sv")))

  /** PERSISTED PQ index build — [[topkPq]]'s training stage factored out so
    * it runs at INGEST/COMPACTION cadence, not per query (the r9 verdict's
    * last near-linear route: in-query codebook training is O(N·M·K) before
    * any probe — fatal when the same index serves thousands of queries).
    * Same discipline as [[graft.ops.Dedup.buildEmbedIndex]]: the build is
    * deterministic (seed sample → one 2²⁰-quantized Lloyd round → final
    * assignment), so a rebuilt index is bit-identical, and the quantizer
    * geometry (`subspaces`/`codebook_size`/`dims`) is persisted AS COLUMNS —
    * codes are only meaningful under the codebooks that produced them, and
    * [[topkPqAgainstIndex]] validates the triple at read time exactly like
    * `embedDedupAgainstIndex`'s planes guard.
    *
    * Returns (codebooks: m/cid/cent + geometry, codes: vec_id/codes) —
    * M·K tiny rows and one DENSE code array per vector (codes[m] = the
    * assigned centroid's position in sub-space m's cid-sorted codebook):
    * the codes-in-RAM, vectors-on-disk memory shape PQ exists for, N×M
    * small ints total.
    */
  def buildPqIndex(emb: DataFrame, subspaces: Int = 16, codebookSize: Int = 16,
      dims: Int = 64): (DataFrame, DataFrame) = {
    val sub = dims / subspaces
    val quant = 1048576L // 2^20, same exact-quantization argument as IVF
    val svecs = pqSubSplit(emb, subspaces, sub)
    val seeds = pqSubSplit(emb.orderBy(col("vec_id").asc).limit(codebookSize),
        subspaces, sub)
      .select(col("m"), col("vec_id").as("cid"), col("sv").as("cent"))
    // per-(vec, sub-space) assignment as a map-side argmax_dot projection
    // (halfNorm: the argmin-L2 monotone form max⟨sv,c⟩ − ½⟨c,c⟩): the M
    // per-sub-space codebooks collapse to M cid-sorted candidate arrays,
    // broadcast; no N·M·K fan-out, no shuffle (formerly groupBy(max_by)
    // carrying first(sv) through the exchange). returnIndex picks the
    // dense 0..K−1 position instead of the cid label — same winner, same
    // ties (position order = cid order in a cid-sorted array).
    def assign(cents: DataFrame, returnIndex: Boolean = false): DataFrame = {
      val byM = cents.groupBy(col("m"))
        .agg(expr("array_sort(collect_list(struct(cid, cent)))").as("cands"))
      svecs.join(broadcast(byM), Seq("m"))
        .select(col("vec_id"), col("m"),
          graft.functions.ArgmaxDot(col("sv"), col("cands"),
            halfNorm = true, returnIndex = returnIndex).as("code"),
          col("sv"))
    }
    // one Lloyd round per sub-space, in integer space (order-independent)
    val sums = assign(seeds)
      .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("i", "x")))
      .select(col("m"), col("code"), col("i"),
        floor(col("x").cast("double") * quant).as("qx"))
      .groupBy(col("m"), col("code"), col("i"))
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("cnt"))
    val refined = sums
      .withColumn("c",
        col("sq").cast("double") / (col("cnt") * quant).cast("double"))
      .groupBy(col("m"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)")
        .as("cent"))
      .select(col("m"), col("code").as("cid"), col("cent"))
      // barriered (r19): M·K rows consumed by the codes assignment here
      // AND by every downstream reader of the returned codebook table
      // (geometry head(), append's byM broadcast, the query-time LUTs,
      // drift's byM) — each re-ran the seed/Lloyd pipeline without it
      .barriered
    // codes[m] = the assigned centroid's POSITION in sub-space m's
    // cid-sorted codebook — N×M small ints, the paper's actual memory
    // shape, scored by `pq_adc_score` with zero explode/shuffle at query
    // time. The build pays ONE narrow groupBy (vec_id, m, code triples)
    // to pivot, at ingest cadence.
    val codes = assign(refined, returnIndex = true)
      .groupBy(col("vec_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(m, code))), s -> s.code)")
        .as("codes"))
    (refined
       .withColumn("subspaces", lit(subspaces))
       .withColumn("codebook_size", lit(codebookSize))
       .withColumn("dims", lit(dims)),
     codes)
  }

  /** Validate a persisted codebook table's geometry columns against the
    * caller's parameters — a mismatched reader would slice sub-vectors at
    * the wrong offsets and silently score garbage, the exact failure class
    * `embedDedupAgainstIndex`'s planes guard exists for. One-row scalar
    * read, same sanctioned class as the ingest max-id lookups.
    */
  private def requireGeometry(codebooks: DataFrame, subspaces: Int,
      codebookSize: Int, dims: Int): Unit =
    if (codebooks.columns.contains("subspaces"))
      codebooks.select(col("subspaces"), col("codebook_size"), col("dims"))
        .head(1).foreach { r =>
          val (is, ik, id) = (r.getInt(0), r.getInt(1), r.getInt(2))
          require(is == subspaces && ik == codebookSize && id == dims,
            s"PQ index was built with (subspaces=$is, codebookSize=$ik, " +
              s"dims=$id) but caller passed ($subspaces, $codebookSize, " +
              s"$dims); sub-vector slicing would silently misalign")
        }

  /** QUERY-TIME PQ ANN against a persisted [[buildPqIndex]]: the ADC stage
    * of [[topkPq]] alone — per query a (sub-space × code) lookup table
    * (M·K tiny doubles, flattened per query and broadcast) and per
    * candidate M dense-code array reads + M adds in fixed m-order (native
    * `pq_adc_score` over the codes-as-array layout — a pure projection;
    * the corpus-side codes never explode and nothing shuffles before the
    * per-query top-k). No training, no vector-width joins — the bounded
    * per-query cost that lets one index amortize over every query between
    * rebuilds. Bit-identical to [[topkPq]] on the corpus the index was
    * built from (OpsSpec parity).
    */
  def topkPqAgainstIndex(queries: DataFrame, codebooks: DataFrame,
      codes: DataFrame, k: Int, subspaces: Int = 16, codebookSize: Int = 16,
      dims: Int = 64): DataFrame = {
    val sub = dims / subspaces
    requireGeometry(codebooks, subspaces, codebookSize, dims)
    val refined = codebooks.select(col("m"), col("cid"), col("cent"))
    // ADC lookup tables: one row per (query, sub-space, code) carrying the
    // query-centroid inner product AND the centroid's self-product, so the
    // candidate score can be the RECONSTRUCTION COSINE ⟨q,recon⟩/‖recon‖
    // (the exact ranking s01 uses, up to quantization — an unnormalized
    // inner product would just rank high-norm candidates first). ‖q‖ is
    // constant per query and cannot change its own ranking.
    // Tables are built per (query, sub-space) as ARRAYS in the codebook's
    // cid-sorted candidate order (the same order [[buildPqIndex]]'s dense
    // codes index), then flattened to one (p, n) pair of array<array<double>>
    // per query and broadcast. Scoring is then a pure projection over the
    // dense codes layout — native `pq_adc_score`: M array reads + M adds
    // per candidate, both sums folded m-ascending (bitwise-identical to
    // the former row-form join + collect_list/array_sort/fold aggregate,
    // whose N·M·Q join fan-out and per-group sort dominated this path).
    val byM = refined
      .groupBy(col("m"))
      .agg(expr("array_sort(collect_list(struct(cid, cent)))").as("cands"))
    val qm = pqSubSplit(queries, subspaces, sub)
      .select(col("vec_id").as("query_id"), col("m"), col("sv").as("qsv"))
      .join(broadcast(byM), Seq("m"))
      .select(col("query_id"), col("m"),
        transform(col("cands"), c =>
          graft.functions.DotProductFD(col("qsv"), c.getField("cent")))
          .as("parr"),
        transform(col("cands"), c =>
          graft.functions.DotProductFD(c.getField("cent"), c.getField("cent")))
          .as("narr"))
    val lutQ = qm.groupBy(col("query_id"))
      .agg(
        expr("transform(array_sort(collect_list(struct(m, parr, narr))), s -> s.parr)")
          .as("p"),
        expr("transform(array_sort(collect_list(struct(m, parr, narr))), s -> s.narr)")
          .as("n"))
    val scored = codes.crossJoin(broadcast(lutQ))
      .filter(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"),
        graft.functions.PqAdcScore(col("codes"), col("p"), col("n")).as("adc"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("cand_id"),
        col("adc").as("adc_score"))
      .orderBy(col("query_id"), col("rank"))
  }

  def topkPq(emb: DataFrame, queryPred: Column, k: Int,
      subspaces: Int = 16, codebookSize: Int = 16, dims: Int = 64): DataFrame = {
    val (codebooks, codes) = buildPqIndex(emb, subspaces, codebookSize, dims)
    topkPqAgainstIndex(emb.filter(queryPred), codebooks, codes, k,
      subspaces, codebookSize, dims)
  }

  /** INCREMENTAL PQ index APPEND — code new arrivals against the EXISTING
    * codebooks, no retraining (the production index-maintenance cadence:
    * codebooks retrain at compaction, arrivals between rebuilds are
    * assigned under the frozen quantizer — FAISS's `add` vs `train`
    * split). Geometry is read FROM the codebook table (self-describing
    * index, one-row scalar read — planes-guard class), so an
    * ingest-cadence rebuild that re-sizes the quantizer is honored
    * automatically. The whole append is a map-side projection per vector
    * (broadcast candidate arrays + native `argmax_dot`) ending in the one
    * narrow (vec_id, m, code) pivot — cost linear in the BATCH, constant
    * in the corpus the index already covers.
    *
    * Identical assignment math to [[buildPqIndex]]'s final pass: appending
    * a vector the build already saw reproduces its code array bitwise
    * (OpsSpec parity), which is what makes the append/rebuild cadence
    * safe — a rebuild changes codebooks, never the meaning of a code.
    */
  def appendToPqIndex(newVecs: DataFrame, codebooks: DataFrame): DataFrame = {
    val g = codebooks.select(col("subspaces"), col("dims")).head()
    val (subspaces, dims) = (g.getInt(0), g.getInt(1))
    val sub = dims / subspaces
    val byM = codebooks.select(col("m"), col("cid"), col("cent"))
      .groupBy(col("m"))
      .agg(expr("array_sort(collect_list(struct(cid, cent)))").as("cands"))
    pqSubSplit(newVecs, subspaces, sub)
      .join(broadcast(byM), Seq("m"))
      .select(col("vec_id"), col("m"),
        graft.functions.ArgmaxDot(col("sv"), col("cands"),
          halfNorm = true, returnIndex = true).as("code"))
      .groupBy(col("vec_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(m, code))), s -> s.code)")
        .as("codes"))
  }

  /** Read a persisted PQ index root's CODES — the highest MARKED
    * compacted generation (`codes_g<G>/`, [[compactPqIndex]]) or the
    * build's base `codes/` when none, plus the batch-partitioned
    * `codes_appended/` delta ([[graft.streaming.LogStream
    * .pqIndexAppendArrivals]]) ABOVE the generation's recorded horizon
    * (batch_id pruned at the partition level, then dropped — it exists
    * for idempotent replay, not for readers). One union,
    * schema-identical sides: queries against the index see appended
    * vectors as candidates the moment their batch commits, and a
    * compaction flip is atomic-by-marker — no state anywhere but the
    * parquet tables themselves.
    */
  def readPqCodes(spark: org.apache.spark.sql.SparkSession,
      indexPath: String): DataFrame = {
    val fs = IndexFs.fs(spark, indexPath)
    val (gen, horizon) = currentCodesGeneration(fs, indexPath)
    val base = gen match {
      case Some(g) => spark.read.parquet(s"$indexPath/$GenPrefix$g")
      case None    => spark.read.parquet(s"$indexPath/codes")
    }
    val delta = s"$indexPath/codes_appended"
    // a fully-GC'd delta dir has no partitions left — reading it would
    // fail schema inference, and there is nothing live to union anyway
    val hasLive = IndexFs.childNames(fs, delta)
      .exists(_.startsWith("batch_id="))
    if (hasLive) {
      val app = spark.read.parquet(delta)
        .filter(col("batch_id") > horizon) // partition-pruned
        .drop("batch_id")
      base.unionByName(app)
    } else base
  }

  private val GenPrefix = "codes_g"
  private val GenMarker = "_GRAFT_PQ_GEN"
  private val CompactLock = "_GRAFT_PQ_COMPACT.lock"

  /** Separator for token-suffixed STAGING dirs (`codes_g3__<token>`,
    * `v-00000002__<token>`): anchored \d+ name regexes never match a
    * staged name, so staging is invisible to every reader until the
    * holder-verified rename publishes it under the committed name.
    */
  private[ops] val StageSep = "__"

  /** Highest MARKED codes generation under the index root, with the append
    * horizon its marker records (−1 when none — base `codes/` serves, all
    * appended batches are live). An unmarked generation dir (torn
    * compaction) is invisible, exactly the fact-table commit protocol.
    */
  private def currentCodesGeneration(
      fs: org.apache.hadoop.fs.FileSystem,
      indexPath: String): (Option[Long], Long) = {
    listGenerations(fs, indexPath).lastOption match {
      case Some((g, h)) => (Some(g), h)
      case None         => (None, -1L)
    }
  }

  /** (generation, horizon) pairs for every MARKED generation, ascending.
    * A torn/garbled marker reads as None ([[IndexFs.readMarkerLong]]) —
    * the generation stays invisible rather than crashing the read path.
    */
  private def listGenerations(fs: org.apache.hadoop.fs.FileSystem,
      indexPath: String): Seq[(Long, Long)] = {
    val Gen = (GenPrefix + "(\\d+)").r
    IndexFs.childNames(fs, indexPath)
      .flatMap {
        case Gen(g) =>
          IndexFs.readMarkerLong(fs, s"$indexPath/$GenPrefix$g/$GenMarker")
            .map(g.toLong -> _)
        case _ => None
      }.sortBy(_._1)
  }

  /** COMPACT a PQ index's codes — fold the streaming append delta
    * ([[graft.streaming.LogStream.pqIndexAppendArrivals]]'s
    * `codes_appended/batch_id=N/` partitions) into one right-sized codes
    * GENERATION, so the per-query union stops re-listing an ever-growing
    * batch tail (the small-file problem, index edition). No retraining —
    * codes are merged bytes, codebooks untouched; retraining is
    * [[buildPqIndex]] when [[pqIndexDrift]] says so.
    *
    * Commit protocol = the fact-table compaction's marker discipline
    * (`ingest.Compaction`): the merged codes land in `codes_g<G+1>/`,
    * then a `_GRAFT_PQ_GEN` marker (recording the highest appended
    * batch_id absorbed) is written AFTER the data. [[readPqCodes]] serves
    * the highest MARKED generation plus appended batches ABOVE its
    * horizon — a torn compaction is invisible, and there is no instant at
    * which a code row is absent or double-counted. Superseded generations
    * and absorbed append partitions are GC'd by the NEXT run
    * (current-plus-previous retention — an in-flight reader that resolved
    * just before the flip is still scanning them).
    *
    * The horizon assumes ONE append-stream lineage (monotone batch ids per
    * checkpoint — the same assumption the delta's replay idempotence
    * rests on); a re-checkpointed stream needs a fresh index root or a
    * rebuild.
    *
    * CONCURRENCY: compaction is guarded by an atomic claim-lock at the
    * index root (`_GRAFT_PQ_COMPACT.lock`, `ingest.Ingest.tryClaim`'s
    * create-if-absent protocol via [[IndexFs.tryClaim]]) carrying a unique
    * HOLDER TOKEN, so two maintenance jobs cannot race the generation id.
    * The LOSER no-ops and returns the currently committed generation (0
    * when only base `codes/` serves) — compaction is idempotent
    * maintenance, the winner is doing the work. While the holder works, a
    * daemon HEARTBEAT refreshes the lock, so a live holder is never
    * classified stale no matter how long the merge runs; a lock untouched
    * for `lockTimeoutMs` with no MARKED generation newer than the loser
    * observed is therefore a genuinely crashed holder: its torn staging
    * dirs and lock are removed and the claim retried. The merged codes are
    * staged under a token-suffixed dir and RENAMED into the generation dir
    * only after re-verifying ownership — a holder that lost its claim
    * (paused past the timeout, then stolen) aborts cleanly instead of
    * interleaving files with the stealer's write — and the marker is
    * published by tmp+rename ([[IndexFs.commitSmallString]]), so readers
    * never observe a torn marker. All filesystem moves go through the
    * Hadoop `FileSystem` API ([[IndexFs]]), so the index root may live on
    * `hdfs://`/`s3a://` as well as local disk; on object stores without
    * atomic create-if-absent the claim itself is advisory, but the
    * token-verify + staged-rename still prevents a lost race from
    * committing mixed data (see [[IndexFs.tryClaim]]).
    * Returns the committed generation id.
    */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String,
      lockTimeoutMs: Long = 10 * 60 * 1000L): Long = {
    val fs = IndexFs.fs(spark, indexPath)
    val lock = s"$indexPath/$CompactLock"
    val token = java.util.UUID.randomUUID().toString
    val gensAtEntry = listGenerations(fs, indexPath)
    def current(): Long =
      listGenerations(fs, indexPath).lastOption.map(_._1).getOrElse(0L)
    if (!IndexFs.tryClaim(fs, lock, token)) {
      // lock held: a live concurrent compactor owns the root — no-op —
      // unless the lock is STALE with no newer marked generation (a
      // crashed holder; live holders heartbeat), in which case steal:
      // torn dirs (committed-name and staging) + lock removed
      val stale = IndexFs.mtime(fs, lock)
        .forall(System.currentTimeMillis() - _ > lockTimeoutMs)
      val progressed =
        listGenerations(fs, indexPath).lastOption.map(_._1) !=
          gensAtEntry.lastOption.map(_._1)
      if (stale && !progressed) {
        val torn = gensAtEntry.lastOption.map(_._1).getOrElse(0L) + 1L
        // marker re-checked at deletion time: a generation the holder
        // committed between our progress check and here is NOT torn
        val tornDir = s"$indexPath/$GenPrefix$torn"
        if (!IndexFs.exists(fs, s"$tornDir/$GenMarker"))
          IndexFs.rmTree(fs, tornDir)
        IndexFs.childNames(fs, indexPath)
          .filter(_.startsWith(s"$GenPrefix$torn$StageSep"))
          .foreach(n => IndexFs.rmTree(fs, s"$indexPath/$n"))
        IndexFs.release(fs, lock)
        if (!IndexFs.tryClaim(fs, lock, token)) return current()
      } else return current()
    }
    try IndexFs.withHeartbeat(fs, lock, token, lockTimeoutMs / 4) {
      val gens = listGenerations(fs, indexPath)
      val (baseDf, prevHorizon) = gens.lastOption match {
        case Some((g, h)) =>
          (spark.read.parquet(s"$indexPath/$GenPrefix$g"), h)
        case None => (spark.read.parquet(s"$indexPath/codes"), -1L)
      }
      // horizon = highest appended batch DIRECTORY at merge start: batches
      // landing during the merge have higher ids and stay live in the delta
      val delta = s"$indexPath/codes_appended"
      val B = "batch_id=(\\d+)".r
      val liveBatches: Seq[Long] = IndexFs.childNames(fs, delta).flatMap {
        case B(b) => Some(b.toLong); case _ => None
      }
      val horizon = (liveBatches.filter(_ > prevHorizon) :+ prevHorizon).max
      val merged =
        if (horizon > prevHorizon)
          baseDf.unionByName(spark.read.parquet(delta)
            .filter(col("batch_id") > prevHorizon &&
              col("batch_id") <= horizon)
            .drop("batch_id"))
        else baseDf
      val next = gens.lastOption.map(_._1).getOrElse(0L) + 1L
      val genDir = s"$indexPath/$GenPrefix$next"
      // stage under a token-suffixed name (invisible to the generation
      // regex), then verify ownership and rename — two writers can never
      // interleave files in one committed dir
      val stage = s"$genDir$StageSep$token"
      merged.write.mode("overwrite").parquet(stage)
      // ownership verified FIRST: only the live holder may reclaim an
      // unmarked genDir (a torn predecessor's garbage — it would be in
      // `gens` if marked) so the publishing rename cannot be blocked;
      // a stolen claim must not touch the stealer's in-progress dir.
      // Re-verified BETWEEN the destructive rmTree and the rename, and
      // again before the marker commit (r12 advice): a holder paused past
      // the stale timeout right after the first check could otherwise
      // delete a stealer's freshly renamed (not-yet-marked) generation
      // and publish its stale merge over it. The checks shrink that
      // window to single-operation width; the residual (a pause INSIDE
      // the rmTree→rename pair) is documented with the advisory-claim
      // caveat in docs/PLANS.md — it can discard a stealer's newer fold
      // (re-foldable, idempotent), never mix files or lose source data.
      val published = IndexFs.ownsClaim(fs, lock, token) && {
        IndexFs.rmTree(fs, genDir)
        IndexFs.ownsClaim(fs, lock, token) &&
        IndexFs.rename(fs, stage, genDir) &&
        IndexFs.ownsClaim(fs, lock, token)
      }
      if (!published) {
        // claim stolen mid-merge (or a racer committed first): abort —
        // our staging dir is ours to discard, the committed state is
        // whatever the current holder published. (If the rename itself
        // landed but the post-rename ownership check failed, genDir is
        // left UNMARKED — invisible to readers, reclaimed as torn garbage
        // by the next holder.)
        IndexFs.rmTree(fs, stage)
        current()
      } else {
        // marker AFTER the data — the atomic flip readers key on
        IndexFs.commitSmallString(fs, s"$genDir/$GenMarker", s"$horizon\n")
        // GC: everything SUPERSEDED BEFORE this run — generations below the
        // previous one, and append partitions at or below the PREVIOUS
        // horizon. This run's predecessors survive one more cycle for
        // in-flight readers.
        gens.dropRight(1).foreach { case (g, _) =>
          IndexFs.rmTree(fs, s"$indexPath/$GenPrefix$g") }
        // base `codes/` is the BUILD's artifact and is never GC'd here: a
        // RETRAIN (new codebooks) must land in a fresh index root (or clear
        // codes_g*/codes_appended first) — codes are only meaningful under
        // the codebooks that produced them, and stale generations would
        // silently shadow a re-written codes/ otherwise.
        liveBatches.filter(_ <= prevHorizon).foreach { b =>
          IndexFs.rmTree(fs, s"$delta/batch_id=$b") }
        next
      }
    } finally IndexFs.releaseIfOwner(fs, lock, token)
  }

  /** PQ index QUANTIZATION-DRIFT metric — the REBUILD TRIGGER for the
    * train/append cadence: per cohort (caller-labeled, e.g. trained vs
    * appended-since-training), the mean squared reconstruction error
    * ‖x − x̂‖² of the frozen quantizer over the vectors it now codes. A
    * drifting corpus (appended vectors from a different distribution)
    * shows a rising appended-cohort mean vs the trained cohort's — the
    * signal that the codebooks no longer fit and a rebuild is due
    * (Jégou et al.'s quantization-error objective, monitored instead of
    * minimized).
    *
    * Exactly-reproducible aggregation: sub-space decomposition gives
    * ‖x − x̂‖² = Σ_m ‖x_m − ĉ_m‖², and each per-(vector, sub-space) term
    * ⟨x_m,x_m⟩ − 2⟨x_m,ĉ_m⟩ + ⟨ĉ_m,ĉ_m⟩ (fixed-fold `dot_fd` products) is
    * floor-quantized to a 2²⁰ integer BEFORE the cohort sum — integer
    * addition is order-independent, so the mean needs no per-vector
    * collect/sort fold and one hash aggregate finishes the job (the same
    * exactness discipline as the quantized-Lloyd means). Map-side
    * everywhere: codes join by vec_id, codebooks broadcast.
    */
  def pqIndexDrift(emb: DataFrame, codebooks: DataFrame, codes: DataFrame,
      cohort: Column): DataFrame = {
    val g = codebooks.select(col("subspaces"), col("dims")).head()
    val (subspaces, dims) = (g.getInt(0), g.getInt(1))
    val sub = dims / subspaces
    val quant = 1048576L // 2^20
    val byM = codebooks.select(col("m"), col("cid"), col("cent"))
      .groupBy(col("m"))
      .agg(expr("array_sort(collect_list(struct(cid, cent)))").as("cands"))
    // sub-split inline so the cohort label rides the scan — no self-join
    val terms = emb.select(col("vec_id"), cohort.as("cohort"),
        posexplode(expr(
          s"""transform(sequence(0, ${subspaces - 1}),
                mm -> slice(embedding, mm * $sub + 1, $sub))"""))
          .as(Seq("m", "sv")))
      .join(codes, Seq("vec_id"))
      .join(broadcast(byM), Seq("m"))
      // ĉ_m = the coded centroid: cands is cid-sorted and codes[m] is the
      // POSITION in that order (buildPqIndex's dense layout contract)
      .withColumn("cm", expr("cands[codes[m]].cent"))
      .select(col("vec_id"), col("cohort"),
        floor((graft.functions.DotProductFD(col("sv"), col("sv"))
          - graft.functions.DotProductFD(col("sv"), col("cm")) * 2
          + graft.functions.DotProductFD(col("cm"), col("cm")))
          * quant).cast("long").as("qterm"))
    terms.groupBy(col("cohort"))
      .agg((count(lit(1)) / subspaces).cast("long").as("n_vecs"),
        (sum(col("qterm")).cast("double")
          / ((count(lit(1)) / subspaces) * quant)).as("mean_err"))
      .orderBy(col("cohort"))
  }

  /** IVF-PQ QUANTIZATION-DRIFT — [[pqIndexDrift]] over RESIDUAL space,
    * the rebuild trigger for the [[appendToIvfPqIndex]] cadence: since
    * x̂ = c[bucket] + r̂, the reconstruction identity
    * ‖x − x̂‖² = ‖r − r̂‖² reduces IVFADC drift to the flat metric on
    * residuals, so the per-cohort aggregation (2²⁰-quantized terms, one
    * hash aggregate) is shared verbatim. The bucket comes from the CODES
    * table, not re-derived — drift must measure the quantizer AS
    * PERSISTED, including any stale cell assignments an old append made.
    * The residual projection is Staged-fenced: inlined into the
    * sub-space transform it would re-evaluate the 64-element zip_with
    * once per sub-space ([[graft.functions.Staged]]'s lambda-re-eval
    * class).
    */
  def ivfPqIndexDrift(emb: DataFrame, centroids: DataFrame,
      codebooks: DataFrame, codes: DataFrame, cohort: Column): DataFrame = {
    val g = centroids.select(col("subspaces"), col("dims")).head()
    val resid = emb.select(col("vec_id"), cohort.as("cohort"),
        col("embedding"))
      .join(codes.select(col("vec_id"), col("bucket")), Seq("vec_id"))
      .join(broadcast(
          centroids.select(col("cid").as("bucket"), col("centroid"))),
        Seq("bucket"))
      .select(col("vec_id"), col("cohort"),
        graft.functions.Staged(expr(
          "zip_with(embedding, centroid, (x, y) -> CAST(x AS DOUBLE) - y)"))
          .as("embedding"))
    pqIndexDrift(resid,
      codebooks.withColumn("subspaces", lit(g.getInt(0)))
        .withColumn("dims", lit(g.getInt(1))),
      codes.select(col("vec_id"), col("codes")), col("cohort"))
  }

  // ---- versioned index ROOTS: the drift→rebuild edge, closed ----------

  private val RootMarker = "_GRAFT_PQ_ROOT"
  private val RootDirRe = "v-(\\d{8})".r

  /** Resolve a VERSIONED PQ index container: the highest `v-<N>/` child
    * carrying its `_GRAFT_PQ_ROOT` marker (written AFTER the index data —
    * the same torn-write-invisible discipline as the codes generations),
    * or None when the path holds no committed version. Listing goes
    * through [[IndexFs]], so the container may live on `hdfs://`/`s3a://`.
    */
  def currentPqRoot(spark: org.apache.spark.sql.SparkSession,
      rootsPath: String): Option[String] = {
    val fs = IndexFs.fs(spark, rootsPath)
    IndexFs.childNames(fs, rootsPath).flatMap {
      case RootDirRe(n)
        if IndexFs.exists(fs, s"$rootsPath/v-$n/$RootMarker") =>
        Some(n.toLong)
      case _ => None
    }.maxOption.map(v => f"$rootsPath/v-$v%08d")
  }

  /** An index path a READER should scan: the current committed version of
    * a versioned container, or the path itself when it is a plain index
    * root (codebooks/codes directly under it — the pre-rebuild layout).
    * Streams re-resolve per micro-batch, so a rebuild flip routes live
    * queries to the new quantizer without restart.
    */
  def resolvePqIndexPath(spark: org.apache.spark.sql.SparkSession,
      path: String): String =
    currentPqRoot(spark, path).getOrElse(path)

  /** BUILD a PQ index into the container's NEXT version and commit it by
    * marker — the write side of the versioned-root flip. Claim-locked
    * (`v-<N>.lock`, [[IndexFs.tryClaim]]): a concurrent maintainer
    * no-ops with None; a stale lock (crashed holder, no marker landed)
    * is stolen with its torn version dir, the fact-table protocol.
    * Returns the committed version id.
    *
    * `emb` must be the corpus the new index should COVER — including any
    * vectors appended to the previous version's root (the rebuild retrains
    * the quantizer on everything it will serve). Vectors a live stream
    * appends to the OLD root between the snapshot and the flip are closed
    * separately by [[carryOverAppended]], which the drift-rebuild entries
    * invoke after the commit.
    */
  def commitPqRoot(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, rootsPath: String, subspaces: Int = 16,
      codebookSize: Int = 16, dims: Int = 64,
      lockTimeoutMs: Long = 10 * 60 * 1000L): Option[Long] =
    commitNextRoot(IndexFs.fs(spark, rootsPath), rootsPath, lockTimeoutMs) {
      vdir =>
        val (cb, codes) = buildPqIndex(emb, subspaces, codebookSize, dims)
        // Overwrite reclaims a torn dir from a crashed pre-lock attempt
        cb.write.mode("overwrite").parquet(s"$vdir/codebooks")
        codes.write.mode("overwrite").parquet(s"$vdir/codes")
    }

  /** The shared versioned-root commit protocol: claim the next version's
    * lock with a holder token, heartbeat it while `write` runs into a
    * token-suffixed STAGING dir, re-verify ownership, rename into the
    * version dir, marker AFTER the data (tmp+rename —
    * [[IndexFs.commitSmallString]]), release-if-owner. Stale-lock steal
    * (now reliable: live holders heartbeat, so stale ⇒ crashed) and
    * loser-no-op semantics as documented on [[commitPqRoot]]; a holder
    * whose claim was stolen mid-build aborts with None and discards its
    * own staging dir — two builders can never interleave one version dir.
    */
  private def commitNextRoot(fs: org.apache.hadoop.fs.FileSystem,
      rootsPath: String, lockTimeoutMs: Long)(
      write: String => Unit): Option[Long] = {
    val versions = IndexFs.childNames(fs, rootsPath).flatMap {
      case RootDirRe(n) => Some(n.toLong); case _ => None
    }
    val marked = versions.filter(v =>
      IndexFs.exists(fs, f"$rootsPath/v-$v%08d/$RootMarker"))
    val next = (marked :+ 0L).max + 1
    val vdir = f"$rootsPath/v-$next%08d"
    val vname = f"v-$next%08d"
    val lock = s"$vdir.lock"
    val token = java.util.UUID.randomUUID().toString
    if (!IndexFs.tryClaim(fs, lock, token)) {
      val stale = IndexFs.mtime(fs, lock)
        .forall(System.currentTimeMillis() - _ > lockTimeoutMs)
      if (!stale || IndexFs.exists(fs, s"$vdir/$RootMarker")) return None
      IndexFs.rmTree(fs, vdir) // crashed holder's torn version
      IndexFs.childNames(fs, rootsPath)
        .filter(_.startsWith(s"$vname$StageSep"))
        .foreach(n => IndexFs.rmTree(fs, s"$rootsPath/$n"))
      IndexFs.release(fs, lock)
      if (!IndexFs.tryClaim(fs, lock, token)) return None
    }
    try IndexFs.withHeartbeat(fs, lock, token, lockTimeoutMs / 4) {
      if (IndexFs.exists(fs, s"$vdir/$RootMarker")) None
      else {
        val stage = s"$vdir$StageSep$token"
        write(stage)
        // ownership verified FIRST; only the live holder reclaims an
        // unmarked vdir (a torn predecessor's garbage — a marked one
        // short-circuited above) and renames its staging into place.
        // Re-verified around the rename and before the marker (r12
        // advice — see compactPqIndex's publish block for the race and
        // residual analysis); a failed late check leaves vdir unmarked,
        // which the next holder reclaims as torn garbage.
        val published = IndexFs.ownsClaim(fs, lock, token) && {
          IndexFs.rmTree(fs, vdir)
          IndexFs.ownsClaim(fs, lock, token) &&
          IndexFs.rename(fs, stage, vdir) &&
          IndexFs.ownsClaim(fs, lock, token)
        }
        if (!published) {
          IndexFs.rmTree(fs, stage)
          None
        } else {
          IndexFs.commitSmallString(fs, s"$vdir/$RootMarker", "1\n")
          Some(next)
        }
      }
    } finally IndexFs.releaseIfOwner(fs, lock, token)
  }

  /** GC superseded container VERSIONS, keeping the newest `keep` MARKED
    * versions — default 2: the current one plus one grace predecessor, so
    * an in-flight reader that resolved just before a flip finishes its
    * scan (the same one-grace-cycle discipline as the codes-generation and
    * learned-delta GC). Without this a long-lived container accumulates
    * one full index copy per rebuild. Unmarked dirs are never touched
    * (they are a committer's staging/torn state — the claim protocol owns
    * them), and deletion of versions strictly below the kept window cannot
    * affect the resolver (it picks the highest marked version). Deleting
    * is idempotent, so concurrent GCs need no lock. Returns the number of
    * versions removed.
    */
  def gcPqRootVersions(spark: org.apache.spark.sql.SparkSession,
      rootsPath: String, keep: Int = 2): Int = {
    require(keep >= 1, "must keep at least the current version")
    val fs = IndexFs.fs(spark, rootsPath)
    val marked = IndexFs.childNames(fs, rootsPath).flatMap {
      case RootDirRe(n)
        if IndexFs.exists(fs, s"$rootsPath/v-$n/$RootMarker") =>
        Some(n.toLong)
      case _ => None
    }.sorted
    val doomed = marked.dropRight(keep)
    doomed.foreach(v => IndexFs.rmTree(fs, f"$rootsPath/v-$v%08d"))
    doomed.size
  }

  /** [[commitPqRoot]] for the deployed IVFADC route: coarse centroids,
    * residual codebooks, and codes land under `v-<N>/` (`centroids/`,
    * `codebooks/`, `codes/`) and flip by marker. The codes-generation
    * machinery ([[readPqCodes]], [[compactPqIndex]]) is schema-agnostic —
    * the bucket column rides the same union/merge paths — so the full
    * append/compact/monitor cadence applies to an IVF-PQ root unchanged.
    */
  def commitIvfPqRoot(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, rootsPath: String, nCells: Int = 8,
      subspaces: Int = 16, codebookSize: Int = 16, dims: Int = 64,
      lockTimeoutMs: Long = 10 * 60 * 1000L): Option[Long] =
    commitNextRoot(IndexFs.fs(spark, rootsPath), rootsPath, lockTimeoutMs) {
      vdir =>
        val (ct, cb, codes) =
          buildIvfPqIndex(emb, nCells, subspaces, codebookSize, dims)
        ct.write.mode("overwrite").parquet(s"$vdir/centroids")
        cb.write.mode("overwrite").parquet(s"$vdir/codebooks")
        codes.write.mode("overwrite").parquet(s"$vdir/codes")
    }

  /** [[pqIndexDrift]] over a PERSISTED root with the cohorts DERIVED from
    * the root itself: trained = vec_id present in the build's base
    * `codes/` (never GC'd — it IS the training-time corpus snapshot),
    * appended = everything else the index now serves (the
    * `codes_appended/` delta and compacted generations). No side
    * metadata: the root already records which vectors the quantizer was
    * fitted to.
    */
  def pqRootDrift(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, indexPath: String): DataFrame = {
    val codebooks = spark.read.parquet(s"$indexPath/codebooks")
    val trained = spark.read.parquet(s"$indexPath/codes")
      .select(col("vec_id")).withColumn("is_trained", lit(true))
    pqIndexDrift(emb.join(trained, Seq("vec_id"), "left"), codebooks,
      readPqCodes(spark, indexPath),
      when(col("is_trained"), lit("trained")).otherwise(lit("appended")))
  }

  /** The MONITOR→REBUILD edge, closed: read the per-cohort drift of the
    * container's current version ([[pqRootDrift]] — s12's metric over the
    * persisted tables), and when the appended cohort's mean quantization
    * error exceeds the trained cohort's by `driftFactor`, retrain into a
    * fresh version and flip readers by marker ([[commitPqRoot]] — the
    * FAISS train/add/rebuild cadence with the decision automated).
    * A container with no committed version cold-starts one (the initial
    * build IS the degenerate rebuild). Returns the new version id, None
    * when drift has not tripped (or a concurrent maintainer holds the
    * claim). Geometry follows the live root — a rebuild re-fits the
    * codebooks, it does not silently re-shape them. After the flip,
    * [[carryOverAppended]] re-codes any vectors a live append stream wrote
    * to the OLD root's delta that the new base missed (the in-flight
    * window), so nothing the old version served vanishes from the new one.
    *
    * The drift read is a ≤2-row driver-side scalar collect (sanctioned
    * class); everything heavy stays declarative.
    */
  def rebuildPqRootIfDrifted(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, rootsPath: String,
      driftFactor: Double = 1.25): Option[Long] =
    currentPqRoot(spark, rootsPath) match {
      case None => commitPqRoot(spark, emb, rootsPath)
      case Some(root) =>
        val byCohort = pqRootDrift(spark, emb, root).collect()
          .map(r => r.getString(0) -> r.getDouble(2)).toMap
        val tripped = byCohort.get("appended").exists(a =>
          byCohort.get("trained").exists(t => a > t * driftFactor))
        if (!tripped) None
        else {
          val g = spark.read.parquet(s"$root/codebooks")
            .select(col("subspaces"), col("codebook_size"), col("dims"))
            .head()
          val v = commitPqRoot(spark, emb, rootsPath,
            g.getInt(0), g.getInt(1), g.getInt(2))
          v.foreach(n =>
            carryOverAppended(spark, emb, root, f"$rootsPath/v-$n%08d"))
          v
        }
    }

  /** Close the REBUILD's in-flight append window: vectors the OLD
    * version's `codes_appended/` delta serves that the NEW version's base
    * `codes/` does NOT cover (appended by a live stream between the
    * rebuild's corpus snapshot and the marker flip) are RE-CODED under the
    * new version's quantizer — coarse re-assignment included when the new
    * root is IVF-PQ — and written into the new version's `codes_appended/`
    * with their ORIGINAL batch ids preserved. Preserving ids keeps the
    * append stream's idempotent-replay contract intact across the flip: a
    * redelivered batch re-codes the same vectors under the same (new)
    * codebooks deterministically, so its overwrite is bit-identical to the
    * carried partition.
    *
    * `embCurrent` is the embedding source for the re-code — pass the live
    * corpus table (the same table the drift monitors join against
    * appended codes, so the architecture already guarantees appended
    * vectors land there). A vector in the old delta but absent from
    * `embCurrent` cannot be re-coded and is dropped (left-semi) — with a
    * snapshot-frozen `embCurrent`, either call this again with a fresh
    * read after the flip, or quiesce append streams during rebuild.
    *
    * Cost ∝ the in-flight window (a few micro-batches), not the corpus:
    * the anti-join's build side is the delta, the re-code is
    * [[appendToPqIndex]]'s map-side projection.
    */
  def carryOverAppended(spark: org.apache.spark.sql.SparkSession,
      embCurrent: DataFrame, oldRoot: String, newRoot: String): Unit = {
    val fs = IndexFs.fs(spark, oldRoot)
    val delta = s"$oldRoot/codes_appended"
    val hasLive = IndexFs.childNames(fs, delta)
      .exists(_.startsWith("batch_id="))
    if (!hasLive) return
    // anti-join against everything the new root SERVES (base + compacted
    // generations + already-carried/streamed appends — readPqCodes), not
    // just the build's base: a second carry pass is then a no-op instead
    // of duplicating rows
    val newServed = readPqCodes(spark, newRoot).select(col("vec_id"))
    // one row per missed vector, first batch that carried it (an append
    // stream writes each arrival once; min is the deterministic tiebreak)
    val missing = spark.read.parquet(delta)
      .groupBy(col("vec_id"))
      .agg(min(col("batch_id")).cast("long").as("batch_id"))
      .join(newServed, Seq("vec_id"), "left_anti")
    val vecs = embCurrent.join(missing.select(col("vec_id")),
      Seq("vec_id"), "left_semi")
    val codebooks = spark.read.parquet(s"$newRoot/codebooks")
    val recoded =
      if (IndexFs.exists(fs, s"$newRoot/centroids"))
        appendToIvfPqIndex(vecs,
          spark.read.parquet(s"$newRoot/centroids"), codebooks)
      else appendToPqIndex(vecs, codebooks)
    recoded.join(missing, Seq("vec_id"))
      .write.partitionBy("batch_id").mode("append")
      .parquet(s"$newRoot/codes_appended")
  }

  /** [[pqRootDrift]] for an IVF-PQ root: residual-space drift
    * ([[ivfPqIndexDrift]]) with cohorts derived from the root's base
    * `codes/` snapshot, over base + appended codes ([[readPqCodes]] —
    * schema-agnostic, the bucket column rides the union).
    */
  def ivfPqRootDrift(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, indexPath: String): DataFrame = {
    val centroids = spark.read.parquet(s"$indexPath/centroids")
    val codebooks = spark.read.parquet(s"$indexPath/codebooks")
    val trained = spark.read.parquet(s"$indexPath/codes")
      .select(col("vec_id")).withColumn("is_trained", lit(true))
    ivfPqIndexDrift(emb.join(trained, Seq("vec_id"), "left"), centroids,
      codebooks, readPqCodes(spark, indexPath),
      when(col("is_trained"), lit("trained")).otherwise(lit("appended")))
  }

  /** [[rebuildPqRootIfDrifted]] for the IVFADC route, with the coarse
    * quantizer GROWN with the corpus on rebuild: n_cells scales to keep
    * the expected cell size of the PREVIOUS training run (the IVFADC
    * deployment regime — constant per-query probed candidates as the
    * corpus grows; Jégou et al. §IV, and the property the s10 scale-probe
    * row demonstrates). Residual sub-space geometry follows the live root
    * unchanged. Counts are two driver-side scalars (sanctioned class).
    */
  def rebuildIvfPqRootIfDrifted(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, rootsPath: String,
      driftFactor: Double = 1.25): Option[Long] =
    currentPqRoot(spark, rootsPath) match {
      case None => commitIvfPqRoot(spark, emb, rootsPath)
      case Some(root) =>
        val byCohort = ivfPqRootDrift(spark, emb, root).collect()
          .map(r => r.getString(0) -> r.getDouble(2)).toMap
        val tripped = byCohort.get("appended").exists(a =>
          byCohort.get("trained").exists(t => a > t * driftFactor))
        if (!tripped) None
        else {
          val g = spark.read.parquet(s"$root/centroids")
            .select(col("n_cells"), col("subspaces"),
              col("codebook_size"), col("dims")).head()
          val nTrained = spark.read.parquet(s"$root/codes").count()
          val n = emb.count()
          val cellSize = math.max(1L, nTrained / g.getInt(0))
          val nCells = math.max(g.getInt(0),
            math.ceil(n.toDouble / cellSize).toInt)
          val v = commitIvfPqRoot(spark, emb, rootsPath, nCells,
            g.getInt(1), g.getInt(2), g.getInt(3))
          v.foreach(n2 =>
            carryOverAppended(spark, emb, root, f"$rootsPath/v-$n2%08d"))
          v
        }
    }

  /** IVF-PQ (IVFADC, Jégou et al. 2011 §IV) — the composition production
    * billion-scale ANN actually deploys: [[refinedAssignment]]'s coarse
    * cells PRUNE the candidate set (each query probes its `nprobe` best
    * cells — an equi-join on the cell id, so candidate generation touches
    * ~nprobe/nCells of the corpus), and a RESIDUAL product quantizer ranks
    * within the probed cells (codebooks learned on x − centroid[cell],
    * where quantization error is small, instead of on raw vectors — the
    * reason IVFADC beats flat PQ at equal bits).
    *
    * The ranking score is the reconstruction cosine of c + r̂:
    * ⟨q, c + r̂⟩ / ‖c + r̂‖, where every term is TABLE-DRIVEN — per
    * (query, cell): ⟨q, c⟩; per (query, m, code): ⟨q_m, r̂⟩; per (cell):
    * ‖c‖²; per (cell, m, code): ⟨c_m, r̂⟩; per (m, code): ‖r̂‖² — because
    * sub-space decomposition makes ‖c+r̂‖² = ‖c‖² + Σ_m(2⟨c_m,r̂_m⟩ +
    * ‖r̂_m‖²) exactly. All tables are tiny (≤ cells·M·K rows) and
    * broadcast; per candidate the work is M lookups and fixed-order adds.
    * Nothing vector-width ever joins the candidate side.
    *
    * The last stage is the standard IVFADC SHORTLIST + EXACT RE-RANK:
    * codes alone cannot separate near-ties, so the top-8 ADC candidates
    * per query (and only those) are re-scored with the true cosine — at
    * scale the step that touches full vectors for ~8 rows per query
    * instead of the probed population (measured recall@3 0.51 vs the
    * exact baseline, above every other s-family approximation).
    *
    * Deterministic end to end (same quantized-Lloyd + fixed-fold
    * discipline as s06/s07), so the oracle reproduces cell assignment,
    * residual codebooks, ADC scores, and the re-rank bitwise.
    *
    * Split (r10, verdict item 1) into [[buildIvfPqIndex]] (training) and
    * [[topkIvfPqAgainstIndex]] (bounded query-time probe+ADC+re-rank);
    * [[topkIvfPq]] composes them for the self-contained hash-checked form.
    */
  /** PERSISTED IVF-PQ index build — [[topkIvfPq]]'s training stage
    * ([[refinedAssignment]] coarse cells + residual product quantizer)
    * factored to ingest/compaction cadence, same r10 split as
    * [[buildPqIndex]]. Returns (centroids: cid/centroid + geometry,
    * codebooks: m/cid/cent residual codebooks, codes: vec_id/bucket/codes
    * — the dense position-array layout, as in [[buildPqIndex]]).
    * The FULL quantizer geometry — n_cells included, because probe-cell
    * ids are only meaningful under the coarse quantizer that assigned
    * them — rides the centroid table as columns for the read-time guard.
    */
  def buildIvfPqIndex(emb: DataFrame, nCells: Int = 8, subspaces: Int = 16,
      codebookSize: Int = 16,
      dims: Int = 64): (DataFrame, DataFrame, DataFrame) = {
    val sub = dims / subspaces
    val quant = 1048576L
    def dotFD(a: String, b: String) = pqDotFD(a, b)
    val (assigned, centroids) = refinedAssignment(emb, nCells)
    // residuals r = x − c[cell]: float minus double, both exact in double
    val resid = assigned.join(
        broadcast(centroids.select(col("cid").as("bucket"), col("centroid"))),
        Seq("bucket"))
      .select(col("vec_id"), col("bucket"),
        expr("zip_with(embedding, centroid, (x, y) -> CAST(x AS DOUBLE) - y)")
          .as("r"))
    def subSplitR(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("bucket"), posexplode(expr(
        s"""transform(sequence(0, ${subspaces - 1}),
              mm -> slice(r, mm * $sub + 1, $sub))"""))
        .as(Seq("m", "sv")))
    val rsv = subSplitR(resid)
    val seeds = subSplitR(resid.orderBy(col("vec_id").asc).limit(codebookSize))
      .select(col("m"), col("vec_id").as("cid"), col("sv").as("cent"))
    // map-side residual assignment, as in buildPqIndex.assign
    def assignR(cents: DataFrame, returnIndex: Boolean = false): DataFrame = {
      val byM = cents.groupBy(col("m"))
        .agg(expr("array_sort(collect_list(struct(cid, cent)))").as("cands"))
      rsv.join(broadcast(byM), Seq("m"))
        .select(col("vec_id"), col("bucket"), col("m"),
          graft.functions.ArgmaxDot(col("sv"), col("cands"),
            halfNorm = true, returnIndex = returnIndex).as("code"),
          col("sv"))
    }
    val sums = assignR(seeds)
      .select(col("m"), col("code"), posexplode(col("sv")).as(Seq("i", "x")))
      .select(col("m"), col("code"), col("i"),
        floor(col("x") * quant).as("qx"))
      .groupBy(col("m"), col("code"), col("i"))
      .agg(sum(col("qx")).as("sq"), count(lit(1)).as("cnt"))
    val refinedCb = sums
      .withColumn("c",
        col("sq").cast("double") / (col("cnt") * quant).cast("double"))
      .groupBy(col("m"), col("code"))
      .agg(expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)")
        .as("cent"))
      .select(col("m"), col("code").as("cid"), col("cent"))
      // barriered (r19): same rationale as buildPqIndex's codebook — M·K
      // rows read by the codes assignment, the append path, the query
      // LUTs, and drift; each re-ran the residual seed/Lloyd pipeline
      .barriered
    // dense residual codes (r10): one position array per vector, bucket
    // carried alongside — the same flat layout as buildPqIndex, scored by
    // pq_table_sum lookups within the probed cells
    val codes = assignR(refinedCb, returnIndex = true)
      .groupBy(col("vec_id"), col("bucket"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(m, code))), s -> s.code)")
        .as("codes"))
    (centroids.select(col("cid"), col("centroid"))
       .withColumn("n_cells", lit(nCells))
       .withColumn("subspaces", lit(subspaces))
       .withColumn("codebook_size", lit(codebookSize))
       .withColumn("dims", lit(dims)),
     refinedCb, codes)
  }

  /** INCREMENTAL IVF-PQ index APPEND — the IVFADC deployment's
    * add-without-train path ([[appendToPqIndex]]'s discipline on the
    * coarse+residual quantizer pair): each arriving vector is
    * coarse-assigned to its cell under the FROZEN centroids (broadcast
    * candidate array + `argmax_dot`, plain-dot criterion — exactly
    * [[refinedAssignment]]'s final pass), its residual x − c[cell] is
    * coded under the FROZEN residual codebooks (half-norm criterion —
    * exactly [[buildIvfPqIndex]]'s final pass), and one dense
    * (vec_id, bucket, codes) row comes out, union-compatible with the
    * build's codes table. Geometry follows the centroid table's persisted
    * columns. Map-side end to end; linear in the batch, constant in the
    * indexed corpus. Appending a vector the build saw reproduces its row
    * bitwise (OpsSpec parity) — the append/rebuild cadence contract.
    *
    * Drift monitoring for this index is [[pqIndexDrift]] over residual
    * space: feed it the residuals as `embedding` (x − centroid[bucket])
    * with the residual codebooks — the reconstruction identity
    * ‖x − (c + r̂)‖² = ‖r − r̂‖² makes the flat metric exact here too.
    */
  def appendToIvfPqIndex(newVecs: DataFrame, centroids: DataFrame,
      codebooks: DataFrame): DataFrame = {
    val g = centroids.select(col("subspaces"), col("dims")).head()
    val (subspaces, dims) = (g.getInt(0), g.getInt(1))
    val sub = dims / subspaces
    val cents = centroids.select(col("cid"), col("centroid"))
    val cCands = cents.groupBy()
      .agg(expr("array_sort(collect_list(struct(cid, centroid)))").as("cands"))
    val assigned = newVecs.crossJoin(broadcast(cCands))
      .select(col("vec_id"),
        graft.functions.ArgmaxDot(col("embedding"), col("cands"),
          halfNorm = false).as("bucket"),
        col("embedding"))
    val resid = assigned.join(
        broadcast(cents.select(col("cid").as("bucket"), col("centroid"))),
        Seq("bucket"))
      .select(col("vec_id"), col("bucket"),
        expr("zip_with(embedding, centroid, (x, y) -> CAST(x AS DOUBLE) - y)")
          .as("r"))
    val rsv = resid.select(col("vec_id"), col("bucket"), posexplode(expr(
        s"""transform(sequence(0, ${subspaces - 1}),
              mm -> slice(r, mm * $sub + 1, $sub))"""))
      .as(Seq("m", "sv")))
    val byM = codebooks.select(col("m"), col("cid"), col("cent"))
      .groupBy(col("m"))
      .agg(expr("array_sort(collect_list(struct(cid, cent)))").as("cands"))
    rsv.join(broadcast(byM), Seq("m"))
      .select(col("vec_id"), col("bucket"), col("m"),
        graft.functions.ArgmaxDot(col("sv"), col("cands"),
          halfNorm = true, returnIndex = true).as("code"))
      .groupBy(col("vec_id"), col("bucket"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(m, code))), s -> s.code)")
        .as("codes"))
  }

  /** QUERY-TIME IVF-PQ ANN against a persisted [[buildIvfPqIndex]]: cell
    * probing, table-driven ADC, shortlist, and the exact re-rank — every
    * per-query/per-cell table is ≤ cells·M·K doubles, flattened and
    * broadcast; the dense codes join against the broadcast probes is the
    * only corpus-touching work (bucket + one M-int array per row, pruned
    * to the probed cells, scored by two `pq_table_sum` projections — no
    * M-row fan-out, no per-pair sort/fold aggregate);
    * the re-rank fetches full vectors from `corpus` for
    * ~shortlist rows per query by id (the vectors-on-disk access pattern
    * IVFADC deploys with). No training in the query path — bit-identical
    * to [[topkIvfPq]] on the corpus the index was built from.
    */
  def topkIvfPqAgainstIndex(queries0: DataFrame, corpus: DataFrame,
      centroids0: DataFrame, codebooks: DataFrame, codes: DataFrame, k: Int,
      nCells: Int = 8, subspaces: Int = 16, codebookSize: Int = 16,
      nprobe: Int = 3, dims: Int = 64): DataFrame = {
    val sub = dims / subspaces
    def dotFD(a: String, b: String) = pqDotFD(a, b)
    // geometry guard (planes-guard discipline): n_cells beyond the PQ triple
    if (centroids0.columns.contains("n_cells"))
      centroids0.select(col("n_cells"), col("subspaces"),
        col("codebook_size"), col("dims")).head(1).foreach { r =>
          val (ic, is, ik, id) =
            (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
          require(ic == nCells && is == subspaces && ik == codebookSize &&
              id == dims,
            s"IVF-PQ index was built with (nCells=$ic, subspaces=$is, " +
              s"codebookSize=$ik, dims=$id) but caller passed ($nCells, " +
              s"$subspaces, $codebookSize, $dims); cell ids and sub-vector " +
              "slicing would silently misalign")
        }
    val centroids = centroids0.select(col("cid"), col("centroid"))
    val refinedCb = codebooks.select(col("m"), col("cid"), col("cent"))
    val queries = queries0
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // probe the nprobe best cells by ⟨q, c⟩ (ties → smaller cell id)
    val cellScores = queries.crossJoin(
        broadcast(centroids.select(col("cid").as("bucket"), col("centroid"))))
      .select(col("query_id"), col("bucket"),
        dotFD("qe", "centroid").as("qc"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("qc").desc, col("bucket").asc)
    val probes = cellScores.withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("bucket"), col("qc"))
    // Query/cell lookup TABLES in the dense layout (r10): the per-m
    // cid-sorted residual codebooks define one shared candidate order for
    // codes, the per-QUERY p-table p[m][code] = ⟨q_m, r̂⟩, and the
    // per-CELL w-table w[m][code] = 2⟨c_m, r̂⟩ + ‖r̂‖² (the decomposition
    // term ‖c+r̂‖² = ‖c‖² + Σ_m w). Scoring is then two pq_table_sum
    // projections per candidate — the former shape joined (query,m,code)
    // and (bucket,m,code) row-tables onto an M-row-per-pair fan-out and
    // paid a collect_list/array_sort/interpreted fold per pair.
    val byM = refinedCb.groupBy(col("m"))
      .agg(expr("array_sort(collect_list(struct(cid, cent)))").as("cands"))
    val lutP = queries
      .select(col("query_id"), posexplode(expr(
        s"""transform(sequence(0, ${subspaces - 1}),
              mm -> slice(qe, mm * $sub + 1, $sub))"""))
        .as(Seq("m", "qsv")))
      .join(broadcast(byM), Seq("m"))
      .select(col("query_id"), col("m"),
        transform(col("cands"), c =>
          graft.functions.DotProductFD(col("qsv"), c.getField("cent")))
          .as("parr"))
      .groupBy(col("query_id"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(m, parr))), s -> s.parr)")
        .as("p"))
    val wB = centroids.select(col("cid").as("bucket"), col("centroid"))
      .select(col("bucket"), posexplode(expr(
        s"""transform(sequence(0, ${subspaces - 1}),
              mm -> slice(centroid, mm * $sub + 1, $sub))"""))
        .as(Seq("m", "cm")))
      .join(broadcast(byM), Seq("m"))
      .select(col("bucket"), col("m"),
        transform(col("cands"), c =>
          graft.functions.DotProductFD(col("cm"), c.getField("cent")) * 2
            + graft.functions.DotProductFD(c.getField("cent"),
                c.getField("cent")))
          .as("warr"))
      .groupBy(col("bucket"))
      .agg(expr(
        "transform(array_sort(collect_list(struct(m, warr))), s -> s.warr)")
        .as("w"))
    val cb2 = centroids.select(col("cid").as("bucket"),
      dotFD("centroid", "centroid").as("c2"))
    // ----- candidates: only vectors in probed cells, scored by projection
    val scored = codes.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(lutP), Seq("query_id"))
      .join(broadcast(wB), Seq("bucket"))
      .join(broadcast(cb2), Seq("bucket"))
      .select(col("query_id"), col("vec_id"),
        ((col("qc") + graft.functions.PqTableSum(col("codes"), col("p")))
          / sqrt(col("c2")
            + graft.functions.PqTableSum(col("codes"), col("w"))))
          .as("adc"))
    // ADC shortlist, then EXACT re-rank — the standard IVFADC last stage:
    // codes alone cannot separate near-ties, so the top `shortlist` ADC
    // candidates (and ONLY those — a handful of vector fetches per query)
    // are re-scored with the true cosine. At scale this is the step that
    // touches full vectors for ~shortlist rows per query instead of the
    // whole probed population.
    val shortlist = math.max(k, 8)
    val slW = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    val short = scored.withColumn("slr", row_number().over(slW))
      .filter(col("slr") <= shortlist)
      .select(col("query_id"), col("vec_id").as("cand_id"))
    val qv = queries0
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm2("embedding").as("qnorm"))
    val cv = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), norm2("embedding").as("cnorm"))
    val rescored = short.join(qv, Seq("query_id")).join(cv, Seq("cand_id"))
      .withColumn("cosine", dot("qe", "ce") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    rescored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  def topkIvfPq(emb: DataFrame, queryPred: Column, k: Int,
      nCells: Int = 8, subspaces: Int = 16, codebookSize: Int = 16,
      nprobe: Int = 3, dims: Int = 64): DataFrame = {
    val (centroids, codebooks, codes) =
      buildIvfPqIndex(emb, nCells, subspaces, codebookSize, dims)
    topkIvfPqAgainstIndex(emb.filter(queryPred), emb, centroids, codebooks,
      codes, k, nCells, subspaces, codebookSize, nprobe, dims)
  }

  /** Random-hyperplane LSH bucketing: bit i of the bucket is the sign of
    * ⟨v, h_i⟩ for `planes` fixed pseudo-random hyperplanes. Hyperplane
    * components are exact integer-derived doubles
    * ((((i·37 + j·101 + i·j·53) mod 1009) mod 17 − 8) / 8 — every plane
    * index a genuinely distinct hyperplane, see
    * [[graft.functions.HyperplaneBucket]]), so the projection folds are
    * bitwise reproducible in the oracle. Complements [[bucketOf]] (IVF coarse
    * quantizer): angular buckets instead of axis-aligned sign buckets.
    *
    * A native codegen'd expression ([[graft.functions.HyperplaneBucket]]):
    * one primitive loop per row instead of a planes×dims CASE/CAST expression
    * tree, same fixed fold order as the oracle mirror.
    */
  def hyperplaneBucket(e: String, planes: Int, dims: Int = 64): Column =
    graft.functions.HyperplaneBucket(col(e), planes, dims)

  /** LSH-bucketed ANN: probe the query's hyperplane bucket, rank within it —
    * the angular-hash scale path (bucket join instead of all-pairs).
    */
  def topkLsh(emb: DataFrame, queryPred: Column, k: Int,
      planes: Int = 4): DataFrame = {
    val bucketed = emb.withColumn("bucket",
      hyperplaneBucket("embedding", planes))
    val q = bucketed.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("bucket"), norm2("embedding").as("qnorm"))
    val c = bucketed.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), col("bucket"), norm2("embedding").as("cnorm"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", dot("qe", "ce") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket").cast("long").as("bucket"),
        col("rank").cast("long").as("rank"), col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** SCALAR-QUANTIZED (SQ8) top-k — the third compression point on the
    * family's memory/accuracy frontier (float32 brute → SQ8 → PQ): every
    * vector compresses 4× to one uint8 per dimension under a per-dim
    * affine quantizer (code = ⌊(v − mn_d) · 255 / (mx_d − mn_d)⌋, the
    * faiss ScalarQuantizer recipe), and scoring is the INTEGER dot of the
    * code arrays — the MIPS objective (maximum inner product), the other
    * standard retrieval target next to cosine, and being all-integer it
    * is exact across engines with no float-fold discipline needed at all.
    * Candidates come from the s03 hyperplane-bucket blocking (equi-join,
    * never all-pairs); the per-dim mn/mx table is ONE aggregated row
    * broadcast to both sides (the bounded-build class). A constant
    * dimension (mx = mn) quantizes to 0 — it carries no signal and must
    * not divide by zero. Ties break (score DESC, cand_id ASC).
    *
    * At 100 TB the quantizer (128 doubles) is trained once at ingest
    * cadence and the codes are the stored column — the scan reads 64
    * bytes/vector instead of 256, and the integer dot is SIMD-friendly;
    * here both sides quantize in-plan so the oracle checks the whole
    * recipe end to end.
    */
  def topkSq8(emb: DataFrame, queryPred: Column, k: Int,
      planes: Int = 4): DataFrame = {
    val nn = emb.filter(col("embedding").isNotNull)
    val dims = 64
    // per-dim corpus min/max: one row, two float arrays
    val aggs =
      (1 to dims).map(i => min(element_at(col("embedding"), i)).as(s"mn$i")) ++
        (1 to dims).map(i => max(element_at(col("embedding"), i)).as(s"mx$i"))
    val mmx = nn.agg(aggs.head, aggs.tail: _*)
      .select(
        array((1 to dims).map(i => col(s"mn$i")): _*).as("mn"),
        array((1 to dims).map(i => col(s"mx$i")): _*).as("mx"))
    val q8 = expr(
      s"""transform(sequence(1, $dims), i ->
            IF(element_at(mx, i) > element_at(mn, i),
               CAST(floor((CAST(element_at(embedding, i) AS DOUBLE)
                           - CAST(element_at(mn, i) AS DOUBLE)) * 255.0D
                          / (CAST(element_at(mx, i) AS DOUBLE)
                             - CAST(element_at(mn, i) AS DOUBLE))) AS BIGINT),
               0L))""")
    val coded = nn.crossJoin(broadcast(mmx))
      .select(col("vec_id"), col("embedding"),
        hyperplaneBucket("embedding", planes).as("bucket"), q8.as("codes"))
    val q = coded.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("bucket"),
        col("codes").as("qc"))
    val c = coded.select(col("vec_id").as("cand_id"), col("bucket"),
      col("codes").as("cc"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("score",
        expr("aggregate(zip_with(qc, cc, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** The SQ8 per-dim affine code transform under a (broadcast) quantizer
    * row carrying `mn`/`mx` double arrays — the faiss ScalarQuantizer
    * recipe with the out-of-range CLAMP the frozen-append lifecycle
    * needs: a vector appended AFTER the quantizer froze may fall outside
    * the training min/max, and its code must saturate at 0/255 (exactly
    * what faiss does), not leave uint8 range. For vectors inside the
    * range the clamp is the identity, so [[topkSq8]]'s in-plan form
    * (quantizer trained on the full set) is unaffected by it.
    */
  private def sq8Codes(dims: Int): Column = expr(
    s"""transform(sequence(1, $dims), i ->
          IF(element_at(mx, i) > element_at(mn, i),
             greatest(0L, least(255L,
               CAST(floor((CAST(element_at(embedding, i) AS DOUBLE)
                           - element_at(mn, i)) * 255.0D
                          / (element_at(mx, i) - element_at(mn, i))) AS BIGINT))),
             0L))""")

  /** Train an SQ8 quantizer + code the corpus over GROWN banded blocking
    * (r15 verdict item 3 — the s09-s16 treatment for the SQ8
    * representation): returns (quantizer, codes).
    *
    * The QUANTIZER is one row — per-dim corpus min/max as double arrays —
    * plus the index's full self-describing geometry (planes, tables,
    * dims, hp_family) and `sq_quant_id`, a deterministic content hash of
    * the min/max tables (xxhash64 over both arrays). Every code row
    * carries the same `sq_quant_id`: integer codes are only comparable
    * under the affine map that produced them, so a reader that scored
    * codes from one quantizer against queries quantized under another
    * would return confidently WRONG neighbors with no error anywhere —
    * the hp_family silent-failure class with worse symptoms (not zero
    * recall: wrong ranking). [[requireSqQuant]] closes it the same way.
    *
    * CODES are one row per (vector, table): ex_id, band, key (hyperplane
    * bucket over plane indices [t·planes, (t+1)·planes) — the
    * buildEmbedIndexBanded discipline, so candidate generation is
    * equi-join-only at constant expected bucket size when `planes` grows
    * with the corpus), codes (64 × uint8-in-BIGINT), sq_quant_id. At
    * 100 TB the codes column is the stored scan — 64 bytes/vector against
    * float32's 256 — and the quantizer broadcast is one row.
    */
  def buildSq8Index(corpus: DataFrame, planes: Int, tables: Int = 4,
      dims: Int = 64): (DataFrame, DataFrame) = {
    val nn = corpus.filter(col("embedding").isNotNull)
    val aggs =
      (1 to dims).map(i =>
        min(element_at(col("embedding"), i)).cast("double").as(s"mn$i")) ++
        (1 to dims).map(i =>
          max(element_at(col("embedding"), i)).cast("double").as(s"mx$i"))
    val quantizer = nn.agg(aggs.head, aggs.tail: _*)
      .select(
        array((1 to dims).map(i => col(s"mn$i")): _*).as("mn"),
        array((1 to dims).map(i => col(s"mx$i")): _*).as("mx"))
      .withColumn("sq_quant_id", xxhash64(col("mn"), col("mx")))
      .withColumn("planes", lit(planes))
      .withColumn("tables", lit(tables))
      .withColumn("dims", lit(dims))
      .withColumn("hp_family", lit(graft.functions.HyperplaneBucket.Family))
    val codes = codeUnderQuantizer(nn, quantizer)
    (quantizer, codes)
  }

  /** Code + band `vectors` UNDER an existing quantizer row (its min/max,
    * its geometry, its `sq_quant_id`) — the build's own coding step and
    * the FROZEN-append path are the same function, so appended codes are
    * bit-compatible with the base by construction. The quantizer is ONE
    * row: it is read driver-side in a single scalar read (the geometry /
    * family-gate class — the same `.head()` that already validates
    * hp_family) and its min/max tables enter the plan as FOLDED LITERAL
    * arrays, so the coding stage is pure codegen over the vector scan —
    * no broadcast exchange, no nested-loop join, nothing to re-read per
    * partition. Doubles round-trip bit-exactly through the literal.
    */
  def codeUnderQuantizer(vectors: DataFrame, quantizer: DataFrame): DataFrame = {
    val g = quantizer
      .select(col("planes"), col("tables"), col("dims"), col("hp_family"),
        col("mn"), col("mx"), col("sq_quant_id"))
      .head()
    require(g.getInt(3) == graft.functions.HyperplaneBucket.Family,
      s"SQ8 quantizer was built under hyperplane coefficient family ${g.getInt(3)} " +
        s"but this code computes family ${graft.functions.HyperplaneBucket.Family}: " +
        "banded keys would never collide. Rebuild the root.")
    val (planes, tables, dims) = (g.getInt(0), g.getInt(1), g.getInt(2))
    val mn = g.getSeq[Double](4)
    val mx = g.getSeq[Double](5)
    val quantId = g.getLong(6)
    val nn = vectors.filter(col("embedding").isNotNull)
    nn.withColumn("mn", typedLit(mn))
      .withColumn("mx", typedLit(mx))
      .select(col("vec_id").as("ex_id"), lit(quantId).as("sq_quant_id"),
        sq8Codes(dims).as("codes"),
        posexplode(array((0 until tables).map(t =>
          graft.functions.HyperplaneBucket(col("embedding"), planes, dims,
            t * planes)): _*)).as(Seq("band", "key")))
  }

  /** The quantizer-identity gate (the [[graft.ops.Dedup]] `requireFamily`
    * pattern for the SQ8 space): persisted codes are only scorable under
    * the EXACT quantizer that produced them — a mismatched (or pre-stamp)
    * codes table passes every schema check yet its integer dots rank
    * candidates under a different affine map, silently returning wrong
    * neighbors. Fail loudly and force the documented rebuild. One-row
    * scalar reads on both sides.
    */
  def requireSqQuant(codes: DataFrame, quantizer: DataFrame): Unit = {
    require(codes.columns.contains("sq_quant_id"),
      "SQ8 codes have no sq_quant_id column: they were persisted before " +
        "the quantizer stamp, so nothing proves which min/max table coded " +
        "them — scoring them under this root's quantizer could silently " +
        "rank wrong neighbors. Rebuild the root (commitSq8Root).")
    val want = quantizer.select(col("sq_quant_id")).head().getLong(0)
    codes.select(col("sq_quant_id")).head(1).foreach { r =>
      val got = if (r.isNullAt(0)) -1L else r.getLong(0)
      require(got == want,
        s"SQ8 codes were quantized under quantizer $got but this root's " +
          s"quantizer is $want: integer scores across different affine " +
          "maps are not comparable — the reader would silently return " +
          "wrong neighbors. Rebuild the root (commitSq8Root), or resolve " +
          "the version these codes belong to.")
    }
  }

  /** Top-k MIPS over a PERSISTED SQ8 index: queries are quantized and
    * banded UNDER THE INDEX's quantizer and geometry (never a default —
    * [[codeUnderQuantizer]] reads both from the quantizer row), candidates
    * come from same-(band, key) equi-joins across the T tables with
    * multi-table collisions collapsed by a distinct on the deterministic
    * (query, candidate) pair BEFORE scoring (ids only on the wide shuffle),
    * and scoring is the all-integer code dot. Output is the s17 contract:
    * (query_id, rank, cand_id, score), ties (score DESC, cand_id ASC).
    */
  def topkSq8AgainstIndex(queries: DataFrame, quantizer: DataFrame,
      codes: DataFrame, k: Int): DataFrame = {
    requireSqQuant(codes, quantizer)
    val q = codeUnderQuantizer(queries, quantizer)
      .select(col("ex_id").as("query_id"), col("band"), col("key"),
        col("codes").as("qc"))
    // candidate ids via the banded equi-join, deduped across tables while
    // the rows are still narrow; codes re-attach once per side
    val cand = q.select(col("query_id"), col("band"), col("key"))
      .join(codes.select(col("ex_id").as("cand_id"), col("band"), col("key")),
        Seq("band", "key"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"))
      .distinct()
    val qCodes = q.select(col("query_id"), col("qc")).distinct()
    val cCodes = codes
      .select(col("ex_id").as("cand_id"), col("codes").as("cc"))
      .distinct()
    val scored = cand
      .join(qCodes, Seq("query_id"))
      .join(cCodes, Seq("cand_id"))
      .withColumn("score",
        expr("aggregate(zip_with(qc, cc, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("score"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** [[commitPqRoot]] for the SQ8 representation: quantizer + banded codes
    * land under `v-<N>/` (`quantizer/`, `codes/`) and flip by marker; the
    * same claim-lock/heartbeat/stage-rename protocol, so SQ8 roots get
    * rebuild flips, loser-no-op, and torn-dir reclamation for free.
    * `planes` is the caller's GROWN geometry (footer rule — sizing is the
    * ingest-cadence maintainer's decision, recorded in the quantizer row
    * and followed by every reader).
    */
  def commitSq8Root(spark: org.apache.spark.sql.SparkSession,
      emb: DataFrame, rootsPath: String, planes: Int, tables: Int = 4,
      dims: Int = 64, lockTimeoutMs: Long = 10 * 60 * 1000L): Option[Long] =
    commitNextRoot(IndexFs.fs(spark, rootsPath), rootsPath, lockTimeoutMs) {
      vdir =>
        val (quantizer, codes) = buildSq8Index(emb, planes, tables, dims)
        quantizer.write.mode("overwrite").parquet(s"$vdir/quantizer")
        codes.write.mode("overwrite").parquet(s"$vdir/codes")
    }

  /** FROZEN append to a committed SQ8 root: arrivals are coded and banded
    * under the root's persisted quantizer (min/max NEVER refit — refitting
    * would silently re-map every stored code; that is a rebuild,
    * [[commitSq8Root]] into the next version) and land as the next
    * `codes_appended/batch_id=N/` partition — the pq delta layout — so
    * [[readPqCodes]]'s generation view serves base + appends unchanged
    * (and [[compactPqIndex]], being schema-agnostic, folds SQ8 deltas
    * too). Returns the committed batch id.
    */
  def sq8IndexAppend(spark: org.apache.spark.sql.SparkSession,
      arrivals: DataFrame, indexPath: String): Long = {
    val fs = IndexFs.fs(spark, indexPath)
    val delta = s"$indexPath/codes_appended"
    val next = IndexFs.childNames(fs, delta)
      .collect { case n if n.startsWith("batch_id=") =>
        n.stripPrefix("batch_id=").toLong }
      .foldLeft(-1L)(math.max) + 1
    val quantizer = spark.read.parquet(s"$indexPath/quantizer")
    codeUnderQuantizer(arrivals, quantizer)
      .write.mode("overwrite").parquet(s"$delta/batch_id=$next")
    next
  }

  /** SQ8 SATURATION monitor — the rebuild trigger for the
    * [[sq8IndexAppend]] cadence (r16 verdict item 4: the PQ family
    * prices drift via reconstruction error, but an affine per-dim
    * quantizer degrades differently): a vector appended after the
    * quantizer froze may fall OUTSIDE the trained min/max, and
    * [[codeUnderQuantizer]]'s clamp saturates those dims to 0/255
    * silently — scores stay plausible while the code loses the dim's
    * information entirely. This measures the clamp's engagement rate per
    * cohort: a dim counts as clipped iff its value lies strictly outside
    * [mn, mx] (the exact condition under which the clamp is not the
    * identity). Output (the s12 two-row contract): per cohort
    * (n_vecs, clipped_dims, sat_mille = clipped·1000 div (n_vecs·dims),
    * verdict = rebuild iff sat_mille ≥ `rebuildMille`) — integer
    * per-mille, cross-engine exact.
    *
    * Plan shape: the quantizer is ONE row, read driver-side (the
    * geometry-gate scalar-read class) with min/max folded as plan
    * literals — the whole monitor is one scan + one 2-group hash
    * aggregate; no joins, no broadcast. At 100 TB the monitor costs one
    * pass over the append cohort (pass `emb` pre-filtered to arrivals
    * since the last rebuild; the registered s19 runs both cohorts so the
    * trained baseline is in the same artifact).
    */
  def sq8SaturationMonitor(emb: DataFrame, quantizer: DataFrame,
      cohort: Column, rebuildMille: Long = 5L): DataFrame = {
    val g = quantizer.select(col("dims"), col("mn"), col("mx")).head()
    val dims = g.getInt(0)
    val mn = g.getSeq[Double](1)
    val mx = g.getSeq[Double](2)
    val nn = emb.filter(col("embedding").isNotNull)
    nn.withColumn("mn", typedLit(mn))
      .withColumn("mx", typedLit(mx))
      .select(cohort.as("cohort"), expr(
        s"""aggregate(sequence(1, $dims), 0L, (acc, i) ->
              acc + IF(CAST(element_at(embedding, i) AS DOUBLE)
                         < element_at(mn, i)
                       OR CAST(element_at(embedding, i) AS DOUBLE)
                         > element_at(mx, i), 1L, 0L))""").as("clipped"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("clipped")).as("clipped_dims"))
      .withColumn("sat_mille",
        expr(s"clipped_dims * 1000 div (n_vecs * $dims)"))
      .withColumn("verdict",
        when(col("sat_mille") >= rebuildMille, lit("rebuild"))
          .otherwise(lit("ok")))
      .select(col("cohort"), col("n_vecs"), col("clipped_dims"),
        col("sat_mille"), col("verdict"))
      .orderBy(col("cohort"))
  }

  /** Embedding-cosine near-duplicate pairs: all (i < j) pairs with cosine ≥
    * `minCosine`. The all-pairs form is the exactness baseline; at scale the same
    * output is produced by LSH/IVF blocking + this verification on candidates.
    */
  def nearDupPairs(emb: DataFrame, minCosine: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("e1"),
      norm2("embedding").as("n1"))
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("e2"),
      norm2("embedding").as("n2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("cosine", dot("e1", "e2") / (col("n1") * col("n2")))
      .filter(col("cosine") >= minCosine)
      .select(col("id1"), col("id2"), col("cosine"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Multi-band (multi-probe) LSH ANN: `bands` independent hyperplane bands
    * of `planesPerBand` planes each, taken as bit-slices of ONE
    * `bands × planesPerBand`-plane bucket (computed once per vector by the
    * native expression). A candidate matches a query if they collide in ANY
    * band — the OR over bands recovers neighbors a single `planes`-bit bucket
    * splits apart (the same banding trade MinHash-LSH uses): per-band
    * collision prob is (1−θ/π)^p, overall 1−(1−(1−θ/π)^p)^B. Candidates are
    * the union of per-band EQUI-joins (each shuffles by its band key — never
    * all-pairs), deduped per (query, candidate), then exact-cosine ranked.
    */
  def topkLshBands(emb: DataFrame, queryPred: Column, k: Int,
      planesPerBand: Int = 4, bands: Int = 2): DataFrame = {
    val mask = (1 << planesPerBand) - 1
    val bucketed = emb.withColumn("b_all",
      hyperplaneBucket("embedding", planesPerBand * bands))
    def bandCol(i: Int): Column =
      shiftright(col("b_all"), i * planesPerBand).bitwiseAND(lit(mask))
    val withBands = (0 until bands).foldLeft(bucketed)((d, i) =>
      d.withColumn(s"band$i", bandCol(i)))
    // Candidate generation carries ONLY the id pair: the per-band joins and
    // the (query_id, cand_id) dedup shuffle 2 longs per row instead of two
    // 64-float embeddings + norms (~16× narrower on the widest shuffles in
    // the plan). Vectors re-join AFTER the dedup, each side once by id (no
    // broadcast hint: the query set is not bounded by construction; AQE
    // broadcasts at runtime when it actually is small).
    val q = withBands.filter(queryPred)
      .select(col("vec_id").as("query_id"),
        struct((0 until bands).map(i => col(s"band$i")): _*).as("qbands"))
    val c = withBands
      .select(col("vec_id").as("cand_id"),
        struct((0 until bands).map(i => col(s"band$i")): _*).as("cbands"))
    val perBand = (0 until bands).map { i =>
      q.withColumn("bkey", col("qbands")(s"band$i"))
        .join(c.withColumn("bkey", col("cbands")(s"band$i")), Seq("bkey"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"))
    }
    val pairs = perBand.reduce(_ unionByName _)
      .dropDuplicates("query_id", "cand_id")
    val qvec = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        norm2("embedding").as("qnorm"))
    val cvec = emb.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), norm2("embedding").as("cnorm"))
    val candidates = pairs
      .join(qvec, Seq("query_id"))
      .join(cvec, Seq("cand_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id").asc)
    candidates
      .withColumn("cosine", dot("qe", "ce") / (col("qnorm") * col("cnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("cand_id"), col("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** LSH-blocked near-duplicate pairs — the scale path for [[nearDupPairs]]:
    * candidates are only same-hyperplane-bucket pairs (an EQUI-join on the
    * bucket id, so the pair generation shuffles by bucket instead of
    * all-pairs), each verified by exact cosine ≥ `minCosine`. Same output
    * schema as the baseline; recall is bounded by the bucket collision
    * probability (1 − θ/π per plane for angle θ), the standard LSH trade —
    * the oracle mirrors the SAME blocking, so correctness is exact on the
    * blocked candidate set.
    */
  def nearDupPairsLsh(emb: DataFrame, minCosine: Double,
      planes: Int = 4): DataFrame = {
    val bucketed = emb.withColumn("bucket",
      hyperplaneBucket("embedding", planes))
    val a = bucketed.select(col("bucket"), col("vec_id").as("id1"),
      col("embedding").as("e1"), norm2("embedding").as("n1"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id2"),
      col("embedding").as("e2"), norm2("embedding").as("n2"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", dot("e1", "e2") / (col("n1") * col("n2")))
      .filter(col("cosine") >= minCosine)
      .select(col("id1"), col("id2"), col("cosine"))
      .orderBy(col("id1"), col("id2"))
  }

  /** SEMANTIC dedup (Abbas et al., "SemDeDup", 2023): cluster the corpus's
    * embeddings, then dedup ONLY within clusters — the published recipe for
    * pruning semantically-redundant (not byte-identical) training data at
    * web scale. Clustering reuses s06's deterministic machinery
    * ([[refinedAssignment]]: seed sample → one 2²⁰-quantized Lloyd round →
    * final assignment), so the oracle reproduces the partition bit-for-bit.
    *
    * Within a cluster, (x, y) are semantic duplicates when cosine ≥
    * `minCosine`. The keep policy is the paper's: rank cluster members by
    * similarity-to-centroid ASCENDING (ties → smaller vec_id) and keep
    * low-rank items — the far-from-centroid "edge" examples carry the most
    * marginal information. An item is `removed` exactly when SOME
    * duplicate-neighbor ranks before it (a one-pass dominance rule: no
    * sequential scan, no iteration — the deliberately parallel variant of
    * the paper's greedy sweep, which only compares against *surviving*
    * predecessors and therefore removes slightly less; at dedup thresholds
    * duplicate-neighborhoods are near-cliques and the two rules agree).
    *
    * Scale: this is SemDeDup's design point — candidate generation is
    * cluster-blocked, O(Σ nc²) pairs instead of O(N²), with `nCentroids`
    * grown ~N/⟨cluster⟩ at corpus scale (the paper runs 50k clusters for
    * 5B embeddings); the K-row centroid table is the only broadcast, pair
    * generation is an equi-join shuffling by cluster id, and the dominance
    * verdict is a per-item aggregation over its own neighbors.
    */
  def semanticDedup(emb: DataFrame, minCosine: Double,
      nCentroids: Int = 8): DataFrame = {
    val (assigned, refined) = refinedAssignment(emb, nCentroids)
    // similarity to own (refined, double-valued) centroid: the same fixed
    // float·double fold refinedAssignment scores with, normalized (native
    // DotProductFD since r10 — x*x over doubles IS the double·double fold)
    val cdot: Column =
      graft.functions.DotProductFD(col("embedding"), col("centroid"))
    val cnorm: Column =
      sqrt(graft.functions.DotProductFD(col("centroid"), col("centroid")))
    val members = assigned
      .join(broadcast(refined.withColumnRenamed("cid", "bucket")), Seq("bucket"))
      .select(col("vec_id"), col("bucket"), col("embedding"),
        (cdot / (norm2("embedding") * cnorm)).as("centroid_cos"))
    val x = members.select(col("bucket"), col("vec_id").as("a_id"),
      col("embedding").as("ae"), norm2("embedding").as("an"),
      col("centroid_cos").as("a_cc"))
    val y = members.select(col("bucket"), col("vec_id").as("b_id"),
      col("embedding").as("be"), norm2("embedding").as("bn"),
      col("centroid_cos").as("b_cc"))
    val pairs = x.join(y, Seq("bucket"))
      .filter(col("a_id") =!= col("b_id"))
      .filter(dot("ae", "be") / (col("an") * col("bn")) >= minCosine)
      .select(col("a_id"), col("a_cc"), col("b_id"), col("b_cc"))
    val verdicts = pairs
      .groupBy(col("a_id"))
      .agg(count(lit(1)).as("n_dups"),
        min(when(col("b_cc") < col("a_cc")
            || (col("b_cc") === col("a_cc") && col("b_id") < col("a_id")),
          struct(col("b_cc"), col("b_id")))).as("dom"))
    members
      .join(verdicts.withColumnRenamed("a_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"),
        col("centroid_cos"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        when(col("dom").isNotNull, "removed").otherwise("kept").as("action"),
        col("dom.b_id").as("removed_by"))
      .orderBy(col("vec_id"))
  }

  /** Persistable index for INCREMENTAL SemDeDup ([[semDedupAgainstIndex]]):
    * the cluster structure [[semanticDedup]] derives, split into its two
    * natural tables — `centroids` (cid, centroid: the K-row assignment
    * table, broadcast at read time) and `members` (ex_id, cell, ex_e: each
    * corpus vector with its cell precomputed, so arrivals compare only
    * within their assigned cell). The same ingest/compaction-cadence
    * persistence contract as the text/media/embedding indexes
    * ([[graft.ops.Dedup.buildCorpusIndex]] family). Determinism: the cells
    * are [[refinedAssignment]]'s — seed sample, one 2²⁰-quantized Lloyd
    * round, final assignment — so a rebuilt index is bit-identical and the
    * oracle reproduces it.
    */
  def buildSemIndex(corpus: DataFrame,
      nCentroids: Int = 8): (DataFrame, DataFrame) = {
    val (assigned, refined) = refinedAssignment(corpus, nCentroids)
    (refined.select(col("cid"), col("centroid")),
      assigned.select(col("vec_id").as("ex_id"),
        col("bucket").as("cell"), col("embedding").as("ex_e")))
  }

  /** INCREMENTAL SemDeDup — the d16 batch recipe run against a persisted
    * [[buildSemIndex]], completing the incremental-against-the-warehouse
    * family (text d11, media, embedding d17, span d20) for semantic
    * pruning: each arrival is assigned to its maximum-inner-product
    * centroid (a broadcast of the K-row centroid table — never a corpus
    * scan), compared by exact cosine ONLY against the persisted members of
    * that cell (equi-join on the cell id — SemDeDup's cluster blocking,
    * O(cell) candidates per arrival instead of O(corpus)), and receives one
    * verdict: `prune` (some member already covers it semantically — cosine
    * ≥ `minCosine`; the best match by (cosine desc, ex_id asc) is
    * reported), `keep`, or `invalid` for a null/wrong-dimension embedding
    * (which must not pass as novel content — the media path's `unhashable`
    * discipline). Zero driver/state-store state: the streaming entry
    * ([[graft.streaming.LogStream.dedupSemArrivals]]) re-reads the
    * persisted index per micro-batch, the scale-correct stream-static
    * shape.
    */
  def semDedupAgainstIndex(incoming: DataFrame, centroids: DataFrame,
      members: DataFrame, minCosine: Double, dims: Int = 64): DataFrame = {
    val valid = incoming.filter(col("embedding").isNotNull &&
      size(col("embedding")) === dims)
    // same float·double fold as refinedAssignment's final assignment, so an
    // arrival lands in exactly the cell a rebuild would put it in — the
    // same map-side argmax_dot projection (no per-arrival fan-out/shuffle)
    val cellCands = centroids.groupBy()
      .agg(expr("array_sort(collect_list(struct(cid, centroid)))").as("cands"))
    val assigned = valid.crossJoin(broadcast(cellCands))
      .select(col("vec_id"),
        graft.functions.ArgmaxDot(col("embedding"), col("cands"),
          halfNorm = false).as("cell"),
        col("embedding").as("e"))
    val best = assigned.join(members, Seq("cell"))
      .withColumn("cosine", dot("e", "ex_e")
        / (sqrt(dot("e", "e")) * sqrt(dot("ex_e", "ex_e"))))
      .filter(col("cosine") >= minCosine)
      .groupBy(col("vec_id"))
      .agg(min(struct(negate(col("cosine")).as("nc"), col("ex_id"))).as("m"))
      .select(col("vec_id"), col("m.ex_id").as("match_id"),
        negate(col("m.nc")).as("cosine"))
    incoming.select(col("vec_id"), col("embedding"))
      .join(assigned.select(col("vec_id"), col("cell")), Seq("vec_id"), "left")
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("embedding").isNull || size(col("embedding")) =!= dims,
          "invalid")
          .when(col("match_id").isNotNull, "prune")
          .otherwise("keep").as("verdict"),
        col("cell").cast("long").as("cell"),
        col("match_id"), col("cosine"))
      .orderBy(col("vec_id"))
  }
}

package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scaling-exponent probe (round-8 verdict item): every bench number
  * is captured at one scale factor, so a constant that dominates at sf0.1
  * (a codebook build, an index construction) is indistinguishable from
  * per-row cost that would explode at 100 TB. This main runs the headline
  * d/s/t family representatives at 1× and R× (default 10×) of the same base
  * corpus and reports the observed scaling exponent per query
  * (`ln(tR/t1) / ln(R)`): ≈1 = linear in corpus, ≪1 = constant-dominated
  * (the constant will amortize away at scale), ≫1 = superlinear (a
  * candidate-generation or join shape that will NOT survive 100 TB).
  *
  * Corpus expansion preserves the DUPLICATE STRUCTURE of the base corpus
  * rather than multiplying it: each replica r of a document gets every word
  * salted with r, so grams/fingerprints/minhash keys are disjoint ACROSS
  * replicas while the within-replica near-dup relations (the planted pairs
  * the d-family finds) repeat identically in each replica — total key
  * cardinality grows R×, per-key load stays constant, which is how a real
  * corpus grows. Embedding replicas are deterministically perturbed per
  * (id, r, dim) so vector count grows R× without creating degenerate
  * identical-vector pile-ups in one LSH bucket/IVF cell. Replica 0 is the
  * base corpus verbatim.
  *
  * The probe materializes both corpora to parquet FIRST (generation cost is
  * not measurement), symlinks the untouched tables, and then times the
  * REGISTERED queries — the exact plans the bench and correctness gates
  * run — with Bench's median-of-3 + load-gate methodology. Output: one JSON
  * artifact (default `bench/scale_probe_r8.json`); no registry changes.
  */
object ScaleProbe {

  /** Representatives per family: exact-hash, gram inverted index, MinHash
    * bands, SimHash bands, connected components; LSH-band / IVF / IVF-PQ
    * ANN; per-row text scans and the chunking explode; and (r9, verdict
    * item 6) the composed/semantic routes — e05's two perceptual near-dup
    * joins + single fused components run, and d22's broadcast-assign +
    * within-cell equi-join — plus (r9 cont.) the cross-codec audio corpus
    * e07 and the incremental audio-dedup route d23, whose asset tables
    * derive 1:1 from the replicated documents so the planted codec/dup/
    * truncation branches redistribute but stay valid at any doc_id.
    * Under replica salting e05's planted duplicate
    * pairs land on sibling replicas (doc_id·R + r keeps the doc_id%10
    * plant relation within each original document's replica group), so the
    * pair count grows R× while per-band load stays bounded — the corpus
    * growth a real ingest sees.
    */
  private val probes = Seq(
    "d01_dedup_exact", "d02_ngram_jaccard", "d03_minhash_lsh",
    "d08_simhash64_neardup", "d09_dedup_clusters",
    "s04_topk_lsh_bands", "s06_topk_ivf_centroids", "s08_topk_ivfpq",
    "s09_topk_pq_index", "s10_topk_ivfpq_index",
    // r10 maintenance family: s11/s13 price subset-training + frozen
    // append in-plan (the s08 contrast class); s12/s14 are corpus-wide
    // monitoring aggregates — expected ~linear BY DESIGN (one scan),
    // probed so the artifact states that rather than implies it
    "s11_topk_pq_append", "s12_pq_drift", "s13_topk_ivfpq_append",
    "s14_ivfpq_drift",
    // r12: the versioned-root production route (resolver + generation
    // read), probed against the pre-committed containers
    "s15_topk_pq_root", "s16_topk_ivfpq_root",
    // r15: the SQ8 compression point (integer-dot MIPS over bucket-blocked
    // candidates; quantizer = one aggregated row broadcast)
    "s17_topk_sq8",
    // r16: the SQ8 DEPLOYMENT route — persisted versioned root at grown
    // banded geometry, frozen-append delta, quantizer-identity gate; the
    // root is prebuilt untimed per scale so the row prices resolve + query
    "s18_topk_sq8_rooted",
    // r17: the SQ8 rebuild trigger — a one-scan monitoring aggregate over
    // the rooted quantizer (the s12/s14 class: ~linear by design, probed
    // so the artifact states it)
    "s19_sq8_saturation",
    // r12: d18's one-gram-shuffle substring spans, probed at ×R alongside
    // the other dedup representatives (the r11 ×100 run covered s09-s14
    // only; the verdict asked for the dedup families' exponents too)
    "d18_duplicated_spans",
    "t01_langid", "t04_fingerprint", "t12_unigram_lm", "t14_chunking",
    "e05_multimodal_corpus", "d22_semdedup_incremental",
    // r17: e05 from a PERSISTED feature root + arrivals-only decode (the
    // decode-once lifecycle) — the root is prebuilt untimed per scale, so
    // the row prices the incremental composition a real pipeline pays per
    // run, against e05's decode-everything contrast
    "e09_multimodal_incremental",
    // r13: d26 is d22 at the DEPLOYMENT geometry (nCentroids ∝ corpus,
    // constant cell size) — probed against a pre-built sem index at both
    // scales, so its row prices the per-batch incremental cost between
    // retrains (the d22 row keeps pricing the fixed-8-cell contrast)
    "d26_semdedup_grown",
    // r13: the self-learning replay entries — each row prices one full
    // replay lifecycle (base index build + three learning batch bodies),
    // the cost shape of the ingest gate itself rather than a single query
    "d24_learning_dedup", "d25_learning_embed_dedup",
    "d27_learning_media_dedup", "d28_learning_sem_dedup",
    // r13: the static embed-incremental route at its REGISTERED fixed
    // 4-plane geometry — the oracle-pinned contrast the grown-plane d25
    // row is priced against (the d22-vs-d26 pairing for the hyperplane
    // space)
    "d17_embed_dedup_incremental",
    // r13: the recall-preserving grown route — 4 tables of grown planes —
    // and the same route as the self-learning ingest gate
    "d29_embed_dedup_banded", "d30_learning_banded_dedup",
    // r13: the decontamination ingest gate — arrival shingles + one
    // gram equi-join against the eval-gram index; under replica salting
    // both sides grow ∝ R at constant eval FRACTION (replica 0 of every
    // doc lands in the % 100 = 0 class), so the row prices the full
    // gate at a growing benchmark set, not just arrival growth
    "t18_contamination_incremental",
    // r13: the composed admission pipeline — all three per-arrival gates
    // (text dedup, banded embed dedup, contamination) in one pass
    "e08_admission_pipeline",
    // r14: corpus-wide near-dup at the deployment geometry (grown planes
    // × 4 tables, df-capped self-join) — the batch sibling of d29, priced
    // against d06's fixed-plane quadratic trend
    "d31_embed_neardup_banded",
    // r16 (r15 verdict item 8): the two labeled CONTRASTS not already in
    // this list — probing them every round keeps the BENCH_NOTES contrast
    // table's exponents citable to the CURRENT round's artifact instead
    // of silently going stale (d17/d22 were probed already; with these
    // two, all four contrast pairs re-measure each run and the artifact's
    // `contrast_pairs` section pairs each one against its sibling)
    "d06_embed_neardup_lsh", "d16_semantic_dedup",
    "e07_audio_corpus", "d23_audio_dedup_incremental",
    // r15: the new families — URL exact/near dedup (canonical-key group
    // by + df-capped token-bigram index; under replica salting doc_ids
    // are distinct per replica so the URL space grows ∝ R while alias
    // classes stay within-replica), BPE training (corpus scanned once
    // into the dict; vocabulary grows ∝ R under salting — the dict-loop
    // cost is the thing probed), and the per-row stbl walk
    "d32_url_dedup", "d33_url_neardup", "t19_bpe_merges",
    // r16: production-merge-count BPE — the corpus pass grows with R, the
    // capped-dict trainer is bounded by contract (cap binds at ×100 and
    // logs; BpeProbe carries the flat-in-k evidence, this row the
    // flat-in-corpus evidence)
    "t21_bpe_merges_scaled",
    // r17: BPE APPLICATION under the 256-merge model — the native
    // O(1)-plan-depth route; the corpus pass (dict build) grows with R,
    // per-word application cost is k- and corpus-independent
    "t22_bpe_tokenize_scaled",
    // r18: application under the LOADED model root — prices the full
    // lifecycle a 100 TB tokenize actually runs (train once per corpus
    // into the session root, then load + apply); the root build happens
    // on the first of the three runs only, so the MEDIAN is the load+
    // apply path
    "t23_bpe_tokenize_rooted",
    // r18: video near-dup from the sample-table fingerprint — the d33
    // token machinery (df-capped inverted index, equi-join candidates)
    // over per-track descriptors; decode is per-row in the scan stage
    "d36_video_neardup",
    // r19: the same token machinery over FRAGMENTED (DASH/CMAF) bytes —
    // the m22 walker in the scan stage, re-segmentation-invariant tokens
    "d39_dash_neardup",
    // r19: the broadcast/HLS packaging family — the 13818-1 cell walk in
    // the scan stage (m25), and re-mux near-dup over its per-stream
    // content descriptors (d40)
    "m25_mpegts_inventory", "d40_ts_remux_neardup",
    "m21_mp4_sample_tables",
    // r16: the fragmented-MP4 inventory — m21's class (per-row walk in
    // the scan stage, linear by design) — and the universal dispatch
    // over a mixed flat/fragmented corpus (both walkers per row; the
    // wrong-class one refuses in its first box-header pass)
    "m22_mp4_fragment_tables", "m23_mp4_inventory",
    // r17: the admission stream's media decoration row (m23's dispatch
    // + per-asset aggregates in ONE scan-stage projection) — the
    // per-arrival video inventory cost a crawl ingest pays at admission
    "m24_media_assets_mp4",
    // r15: the URL frontier replay — one full learning lifecycle (base
    // frontier build + three batch bodies), the d24 row's shape for the
    // cheapest modality (exact key joins, no banding)
    "d34_learning_url_dedup",
    // r16: the near-URL learning gate — d34's lifecycle over the gram
    // index (df cap recomputed per batch; under replica salting the gram
    // space grows ∝ R while within-replica alias classes repeat, so hot
    // grams cross the cap exactly as a growing crawl's boilerplate does)
    "d35_learning_url_neardup",
    // r19: the video lifecycle rows, each priced as one full lifecycle
    // (the d24/d35 convention — construction is timed): d37 = corpus
    // index build + arrivals decode + gram equi-join gate; d38 = base
    // build + three learning batch bodies on the descriptor space; e10 =
    // the tiered admission composition (gate + sizing decoration from
    // one decode)
    "d37_video_dedup_incremental", "d38_learning_video_dedup",
    "e10_video_admission",
    // r15 (r14 verdict item 7): the e08 admission pipeline driven through
    // the STREAM's own micro-batch body against PERSISTED indexes — not a
    // registered query; `run` special-cases it to one AvailableNow
    // trigger over the pre-written arrival cohort (indexes + arrivals
    // built untimed per scale), so the row prices exactly the per-batch
    // cost a production ingest pays per trigger. The batch entry's 0.22
    // exponent measures the in-plan composition; this row proves the
    // stream body matches it.
    "e08_admission_stream")

  private def loadavg(): Double =
    try java.nio.file.Files.readString(Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  private def rmTree(p: Path): Unit = {
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "bench/scale_probe_r10.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")

    // ---- corpus build (NOT timed) ----
    val base = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_scale_probe")
    val dir1 = base.resolve("x1")
    val dirR = base.resolve(s"x$mult")
    rmTree(base)
    Files.createDirectories(dir1)
    Files.createDirectories(dirR)
    for (t <- tables) { // 1×: the base corpus verbatim
      Files.createSymbolicLink(dir1.resolve(s"$t.parquet"),
        Paths.get(sfDir, s"$t.parquet"))
    }
    for (t <- tables if t != "documents" && t != "embeddings") {
      Files.createSymbolicLink(dirR.resolve(s"$t.parquet"),
        Paths.get(sfDir, s"$t.parquet"))
    }
    // documents ×R: replica words salted with r (keys disjoint across
    // replicas; within-replica duplicate structure identical to the base)
    Tables.documents(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(mult - 1))).as("r"))
      .select(
        (col("doc_id") * mult + col("r")).as("doc_id"),
        when(col("r") === 0, col("text"))
          .otherwise(expr("array_join(transform(split(text, ' '), w -> concat(w, r)), ' ')"))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(dirR.resolve("documents.parquet").toString)
    // embeddings ×R: deterministic small perturbation per (vec_id, r, dim)
    Tables.embeddings(spark, sfDir)
      .select(col("*"), explode(sequence(lit(0), lit(mult - 1))).as("r"))
      .select(
        (col("vec_id") * mult + col("r")).as("vec_id"),
        when(col("r") === 0, col("embedding"))
          .otherwise(expr(
            "transform(embedding, (v, i) -> CAST(v + pmod(hash(vec_id, r, i), 100) * 1e-4 AS FLOAT))"))
          .as("embedding"),
        col("label"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(dirR.resolve("embeddings.parquet").toString)
    // persisted ANN indexes (r10 split): built UNTIMED at both scales so the
    // s09/s10 rows price query-time cost alone — the cost a production user
    // pays per query between ingest-cadence index rebuilds. The registered
    // queries detect and read these tables (EntryOps.topkPqIndexed contract);
    // every build step is order-independent (quantized-integer Lloyd), so the
    // probed results are bit-identical to the in-plan s07/s08 forms.
    // The ×R rebuild GROWS the coarse quantizer with the corpus (n_cells =
    // 8·R, constant expected cell size) — the IVFADC deployment regime
    // (Jégou et al. §IV; the SemDeDup scaladoc documents the same
    // nCentroids ∝ N growth): per-query candidates = nprobe·cellSize stay
    // CONSTANT as the corpus grows, which is the property the s10 probe
    // row exists to demonstrate. The readers follow the index's persisted
    // geometry columns (EntryOps.topkIvfPqIndexed), not a default.
    // Index prebuild is only needed when an s-family route is selected —
    // a dev-loop or family-focused run (SPARK_GRAFT_SCALE_ONLY without
    // s-queries) skips four quantizer trainings per scale
    val selectedSet = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val needsIndexes = selectedSet.forall(_.exists(_.startsWith("s")))
    for ((d, m) <- Seq((dir1, 1), (dirR, mult)) if needsIndexes) {
      val e = Tables.embeddings(spark, d.toString)
      val (cb, codes) = graft.ops.Similarity.buildPqIndex(e)
      cb.write.mode("overwrite").parquet(d.resolve("pq_codebooks.parquet").toString)
      codes.write.mode("overwrite").parquet(d.resolve("pq_codes.parquet").toString)
      val (ict, icb, icodes) =
        graft.ops.Similarity.buildIvfPqIndex(e, nCells = 8 * m)
      ict.write.mode("overwrite").parquet(d.resolve("ivfpq_centroids.parquet").toString)
      icb.write.mode("overwrite").parquet(d.resolve("ivfpq_codebooks.parquet").toString)
      icodes.write.mode("overwrite").parquet(d.resolve("ivfpq_codes.parquet").toString)
      // versioned containers for the s15/s16 production-route entries —
      // committed UNTIMED at both scales, IVF geometry grown with the
      // corpus exactly as the flat overlay above
      graft.ops.Similarity.commitPqRoot(spark, e,
        d.resolve("pq_roots").toString)
      graft.ops.Similarity.commitIvfPqRoot(spark, e,
        d.resolve("ivfpq_roots").toString, nCells = 8 * m)
      // s18's SQ8 root — same fixture as the entry/oracle, planes grown
      // per scale through the footer rule inside the fixture itself
      EntryOps.sq8RootFixture(spark, d.toString,
        d.resolve("sq_roots").toString)
    }
    // d26's grown-geometry sem index (r13): same corpus + K formula as the
    // entry's fallback and the oracle — max(8, ceil(N/48)), the
    // constant-cell-size deployment regime — built UNTIMED at both scales
    // so the probe row measures the per-batch incremental cost alone (a
    // retrain is a rebuild operation, priced by its own lifecycle, not by
    // every query between rebuilds)
    val needsSem = selectedSet.forall(_.contains("d26_semdedup_grown"))
    for (d <- Seq(dir1, dirR) if needsSem) {
      val full = Tables.embeddings(spark, d.toString)
      val corpus = full.filter(col("vec_id") % 10 =!= 0)
      // K from the SAME footer rule as the d26 entry fallback and the
      // oracle — floor(9·N/10) (r15 advice item 4: sizing the prebuild
      // from corpus.count() could differ from that rule by one at a K
      // boundary and silently diverge the prebuilt geometry)
      val n = graft.ops.ParquetMeta.rowCountOrScan(spark,
        d.resolve("embeddings.parquet").toString, full.count()) * 9L / 10L
      val k = math.max(8L, (n + 47L) / 48L).toInt
      val (ct, mm) = graft.ops.Similarity.buildSemIndex(corpus, k)
      ct.write.mode("overwrite").parquet(d.resolve("sem_centroids.parquet").toString)
      mm.write.mode("overwrite").parquet(d.resolve("sem_members.parquet").toString)
      System.err.println(s"[scale-probe] sem index prebuilt (untimed) at $d with K=$k")
    }

    // e09's media feature root: base-cohort hashes + features decoded
    // ONCE per scale, untimed (ingest-cadence maintenance) — the probe
    // row prices the arrivals-only decode + composition
    val needsMediaFeat = selectedSet.forall(_.contains("e09_multimodal_incremental"))
    for (d <- Seq(dir1, dirR) if needsMediaFeat) {
      EntryOps.mediaFeatureRootFixture(spark, d.toString,
        d.resolve("media_features").toString)
      System.err.println(s"[scale-probe] media feature root prebuilt (untimed) at $d")
    }

    // e08 streaming fixture: persisted gate indexes + arrival cohort per
    // scale, built UNTIMED (index builds are ingest-cadence maintenance;
    // the probe row prices the per-trigger stream body alone)
    val needsAdmission = selectedSet.forall(_.contains("e08_admission_stream"))
    val admissionRoots = scala.collection.mutable.Map.empty[String, String]
    for (d <- Seq(dir1, dirR) if needsAdmission) {
      val root = d.resolve("admission_idx").toString
      EntryOps.admissionStreamFixture(spark, d.toString, root)
      admissionRoots(d.toString) = root
      System.err.println(s"[scale-probe] admission fixture prebuilt (untimed) at $root")
    }

    // ---- measurement (Bench methodology: warmup, load gate, median of 3) ----
    // One full AvailableNow trigger of the admission STREAM against the
    // persisted fixture: the timed region is exactly one micro-batch of
    // LogStream.admissionArrivals (fresh checkpoint/out per run, so every
    // run replays the batch rather than resuming past it).
    def runAdmissionStream(dir: String): Double = {
      val root = admissionRoots(dir)
      val scratch = Files.createTempDirectory("graft_adm_probe")
      val arrivals = spark.readStream
        .schema(spark.read.parquet(s"$root/arrivals").schema)
        .parquet(s"$root/arrivals")
      val t0 = System.nanoTime()
      try {
        val q = graft.streaming.LogStream.admissionArrivals(arrivals,
          s"$root/text", s"$root/emb", s"$root/eval",
          scratch.resolve("out").toString,
          scratch.resolve("chk").toString)
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[scale-probe] e08_admission_stream failed: ${e.getMessage}")
        -1.0
      } finally {
        spark.catalog.clearCache()
        rmTree(scratch)
      }
    }
    def run(name: String, dir: String): Double = {
      if (name == "e08_admission_stream") return runAdmissionStream(dir)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[scale-probe] $name failed: ${e.getMessage}")
        return -1.0
      }
      finally spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    val quiet = sys.env.getOrElse("SPARK_GRAFT_QUIET_LOAD", "1.0").toDouble
    val ownLoad = cpus.toDouble / 5.0
    var budgetMs = sys.env.getOrElse("SPARK_GRAFT_QUIET_BUDGET_SEC", "300").toLong * 1000L
    def gate(): Unit =
      while (loadavg() > quiet + ownLoad && budgetMs > 0) {
        Thread.sleep(5000L); budgetMs -= 5000L
      }
    // TRUE AMBIENT stamp (r17 verdict item 6): taken BEFORE the probe's
    // own warmup jobs spin up, so no own-load allowance applies to it —
    // the r17 x100 artifact launched at loadavg 17.58 yet self-described
    // load_caveat:false because every caveat input was measured behind
    // the `quiet + cpus/5` allowance, which masks exactly the ambient
    // load it should flag. gate_load is now this pre-own-jobs reading
    // and the caveat is wired to it below.
    val gateLoad = loadavg()
    // warmup both corpora's parquet footers + codegen
    Tables.documents(spark, dir1.toString).limit(10)
      .write.mode("overwrite").format("noop").save()
    Tables.documents(spark, dirR.toString).limit(10)
      .write.mode("overwrite").format("noop").save()
    // SPARK_GRAFT_SCALE_ONLY=a,b,c re-probes a subset during development;
    // the shipped artifact is always a full run
    val selected = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
      .fold(probes)(s => probes.filter(s.contains))
    val rows = selected.map { name =>
      gate()
      // ambient load stamped per scale block (r16 verdict item 5: a scale
      // artifact must be self-describing about its window the way Bench
      // is — a reader judges each row's noise exposure from the artifact)
      val load1 = loadavg()
      val r1 = Seq(run(name, dir1.toString), run(name, dir1.toString), run(name, dir1.toString))
      gate()
      val loadR = loadavg()
      val rR = Seq(run(name, dirR.toString), run(name, dirR.toString), run(name, dirR.toString))
      val t1 = if (r1.exists(_ < 0)) -1.0 else r1.sorted.apply(1)
      val tR = if (rR.exists(_ < 0)) -1.0 else rR.sorted.apply(1)
      val exp = if (t1 > 0 && tR > 0) math.log(tR / t1) / math.log(mult.toDouble) else Double.NaN
      // min-of-3 is the cross-run noise floor (Bench's sum_of_min rationale):
      // a co-tenant burst inflates a median but cannot inflate the min of
      // three spaced runs, so the min-based exponent is the one to read on
      // a bursty host — the artifact carries both.
      val m1 = if (r1.exists(_ < 0)) -1.0 else r1.min
      val mR = if (rR.exists(_ < 0)) -1.0 else rR.min
      val expMin = if (m1 > 0 && mR > 0) math.log(mR / m1) / math.log(mult.toDouble) else Double.NaN
      System.err.println(
        f"[scale-probe] $name%-24s t1=$t1%.2f t$mult=$tR%.2f exp=$exp%.2f " +
          f"min1=$m1%.2f min$mult=$mR%.2f exp_min=$expMin%.2f " +
          f"load=($load1%.2f, $loadR%.2f)")
      (name, t1, tR, exp, r1, rR, m1, mR, expMin, load1, loadR)
    }
    def r3(v: Double): String =
      if (v.isNaN) "null"
      else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val body = rows.map { case (n, t1, tR, e, r1, rR, m1, mR, eMin, l1, lR) =>
      s""""$n":{"t1":${r3(t1)},"t$mult":${r3(tR)},"exponent":${r3(e)},""" +
        s""""min_1x":${r3(m1)},"min_${mult}x":${r3(mR)},"exponent_min":${r3(eMin)},""" +
        s""""load_1x":${r3(l1)},"load_${mult}x":${r3(lR)},""" +
        s""""runs_1x":[${r1.map(r3).mkString(",")}],"runs_${mult}x":[${rR.map(r3).mkString(",")}]}"""
    }.mkString("{", ",", "}")
    // the self-indictment: true when the probe LAUNCHED hot (gate_load is
    // the pre-own-SPARK-jobs ambient — r17 verdict item 6; the +1.0 is
    // one core of the probe's OWN sbt-compile/JVM-startup residue in the
    // 1-minute average, measured 1.5-1.9 on an otherwise idle host —
    // far below the co-tenant signatures this flag exists for) or any
    // row measured above the per-row gate (budget exhausted) — the
    // reader then prefers exponent_min, which a co-tenant burst cannot
    // inflate
    val loadCaveat = gateLoad > quiet + 1.0 ||
      rows.exists(r => r._10 > quiet + ownLoad || r._11 > quiet + ownLoad)
    val maxLoad = (rows.map(_._10) ++ rows.map(_._11) ++ Seq(0.0)).max
    val sfName = new java.io.File(sfDir).getName
    // r15 verdict item 8: when a run measured BOTH ends of a labeled
    // contrast pair, pair their exponents side by side — the BENCH_NOTES
    // contrast table cites this section, so its numbers are re-derived
    // from the current round's measurements by construction
    val byName = rows.map(r => r._1 -> r).toMap
    val pairBody = SparkEntry.contrasts.toSeq.sorted.flatMap {
      case (c, s) =>
        for (rc <- byName.get(c); rs <- byName.get(s)) yield
          s""""$c":{"sibling":"$s","contrast_exponent":${r3(rc._4)},""" +
            s""""contrast_exponent_min":${r3(rc._9)},""" +
            s""""sibling_exponent":${r3(rs._4)},""" +
            s""""sibling_exponent_min":${r3(rs._9)}}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"sf":"$sfName","mult":$mult,"gate_load":$gateLoad,""" +
        s""""load_caveat":$loadCaveat,"max_row_load":${r3(maxLoad)},""" +
        s""""stat":"median_of_3","contrasts":${SparkEntry.contrastsJson},""" +
        s""""contrast_pairs":$pairBody,"queries":$body}"""
    Files.createDirectories(Paths.get(out).toAbsolutePath.getParent)
    Files.writeString(Paths.get(out), json + "\n")
    println(json)
    spark.stop()
  }
}

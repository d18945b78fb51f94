package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{Ingest, Warehouse}
import graft.parse.{ApacheParser, AuthfailParser, MailParser, ParseResult}

/** Structured Streaming ingest (reference §2.7: continuous per-line stdin pipes,
  * `apache_access.py:94`, `authfail.py:69`, one-message-per-process `maillog.py:141`).
  *
  * Spark-first shape: `readStream.text(dir)` / `binaryFile` file sources stand in
  * for the stdin pipes (at cluster scale the same transforms run off Kafka);
  * `foreachBatch` reuses the exact batch parse + write logic, turning the
  * reference's per-row transactions into one append per micro-batch.
  * `Trigger.AvailableNow` gives catch-up-then-stop batch-equivalent runs.
  */
object LogStream {

  private def run(
      parsed: DataFrame => ParseResult,
      lines: DataFrame,
      warehouse: Warehouse,
      table: String,
      checkpoint: String
  ): StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // batchId threads through to overwrite-by-batchId idempotent appends:
        // a redelivered micro-batch rewrites its own partitions, not duplicates
        val res = parsed(batch)
        Ingest.appendEvents(res.events, warehouse, table, batchId)
        Ingest.appendDeadLetters(res.deadLetters, warehouse, batchId)
      }
      .start()

  /** Apache access-log directory stream → `apache_access` table. */
  def apache(spark: SparkSession, dir: String, warehouse: Warehouse,
      checkpoint: String): StreamingQuery =
    run(ApacheParser.parse, spark.readStream.text(dir), warehouse,
      "apache_access", checkpoint)

  /** sshd journal directory stream → `authfail` table. */
  def authfail(spark: SparkSession, dir: String, warehouse: Warehouse,
      checkpoint: String): StreamingQuery =
    run(AuthfailParser.parse, spark.readStream.text(dir), warehouse,
      "authfail", checkpoint)

  /** Raw RFC-5322 message directory stream → contacts upsert + inbox + tocc
    * (reference maillog.py:66-104: per-address N+1 lookups and per-row inserts
    * become one MERGE + two appends per micro-batch).
    */
  def maillog(spark: SparkSession, dir: String, warehouse: Warehouse,
      checkpoint: String): StreamingQuery =
    spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(dir)
      .select(col("content"), col("modificationTime"))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestMailBatch(batch, warehouse, batchId)
      }
      .start()

  /** Media asset directory stream → decoded-feature table: the streaming
    * MULTIMODAL ingest path. Every native decoder (container sniff, GIF
    * still/animation, baseline JPEG, WAV PCM) runs per-row inside the
    * micro-batch's scan
    * stage — payloads never leave the stage; the parquet sink receives only
    * the small per-asset feature rows. One format-dispatch projection:
    * `format` reports which decoder claimed the payload, and the
    * family-specific stats ride in nullable columns (exactly the
    * wide-feature-table layout a training pipeline lands media into).
    */
  def mediaAssets(spark: SparkSession, dir: String, outDir: String,
      checkpoint: String): StreamingQuery = {
    import org.apache.spark.sql.types._
    val arrivals = spark.readStream.format("binaryFile")
      .schema(StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType))))
      .load(dir)
      .select(col("path"), col("length").as("n_bytes"), col("content"))
    mediaDecorations(arrivals, Seq("path", "n_bytes"))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** The media decoration PROJECTION shared by [[mediaAssets]]' micro-batch
    * scan stage and the m24 batch replay — one dataflow, two drivers, so
    * the streaming and batch inventories agree by construction
    * (StreamingSpec cross-checks them on a mixed fixture). Every decoder
    * runs per-row on `content` inside the scan stage; `keep` names the
    * caller's passthrough columns (stream: path + n_bytes; batch replay:
    * asset_id).
    *
    * r17 adds VIDEO to the admission stream (r16 verdict item 2): both
    * MP4 walkers — [[graft.functions.Mp4SampleTables]] for flat files,
    * [[graft.functions.Mp4FragmentTables]] for DASH/CMAF fragmented
    * streams — run in the same projection (the m23 dispatch: the
    * wrong-class walker refuses at its first top-level box pass, so the
    * second walker costs one header scan, never a media-byte pass), and
    * the per-asset transcode-sizing aggregates land as nullable columns:
    * `stream_class` (flat/fragmented/null), `mp4_tracks`, `mp4_samples`,
    * `mp4_duration_ms` (max across tracks), `mp4_bytes`. A crawl
    * admission stream can now size a transcode fleet at admission time,
    * not in a later batch sweep.
    */
  def mediaDecorations(assets: DataFrame, keep: Seq[String]): DataFrame = {
    val decoded = assets
      .select(keep.map(col) ++ Seq(
        graft.functions.MediaDims(col("content")).as("dims"),
        graft.functions.GifAnimFeatures(col("content")).as("gif"),
        graft.functions.JpegFeatures(col("content")).as("jpg"),
        graft.functions.WavFeatures(col("content")).as("wav"),
        graft.functions.FlacFeatures(col("content")).as("flac"),
        graft.functions.Mp4SampleTables(col("content")).as("mp4s"),
        graft.functions.Mp4FragmentTables(col("content")).as("mp4f")): _*)
      // the class that decoded picks the track rows; the common subset of
      // the two walkers' track schemas is what the per-asset aggregates
      // need (size(NULL)/aggregate(NULL, …) are NULL, so refused and
      // non-MP4 assets carry NULL inventory — never a plausible zero)
      .withColumn("mp4trk", expr(
        """CASE WHEN mp4s.tracks IS NOT NULL THEN
             transform(mp4s.tracks, t -> struct(
               t.sample_count AS sample_count, t.duration_ms AS duration_ms,
               t.total_bytes AS total_bytes))
           ELSE
             transform(mp4f.tracks, t -> struct(
               t.sample_count AS sample_count, t.duration_ms AS duration_ms,
               t.total_bytes AS total_bytes))
           END"""))
    decoded.select(
      keep.map(col) ++ Seq(
        when(col("wav.format") === "wav", lit("wav"))
          .when(col("flac.format") === "flac", lit("flac"))
          .when(col("gif.format") === "gif", lit("gif"))
          .when(col("jpg.format") === "jpeg", lit("jpeg"))
          .when(col("mp4s.format") === "mp4", lit("mp4"))
          .otherwise(col("dims.format")).as("format"),
        coalesce(col("gif.width"), col("jpg.width"), col("dims.width")).as("width"),
        coalesce(col("gif.height"), col("jpg.height"), col("dims.height")).as("height"),
        col("gif.n_frames").as("n_frames"),
        coalesce(col("gif.sum_r"), col("jpg.sum_r")).as("sum_r"),
        coalesce(col("gif.sum_g"), col("jpg.sum_g")).as("sum_g"),
        coalesce(col("gif.sum_b"), col("jpg.sum_b")).as("sum_b"),
        coalesce(col("wav.channels"), col("flac.channels")).as("channels"),
        coalesce(col("wav.n_frames"), col("flac.n_samples")).as("audio_frames"),
        coalesce(col("wav.sum_ch0"), col("flac.sum_ch0")).as("sum_ch0"),
        coalesce(col("wav.peak_abs"), col("flac.peak_abs")).as("peak_abs"),
        when(col("mp4s.tracks").isNotNull, lit("flat"))
          .when(col("mp4f.tracks").isNotNull, lit("fragmented"))
          .as("stream_class"),
        // size(NULL) is -1 under the default legacy flag — gate it
        when(col("mp4trk").isNotNull, size(col("mp4trk")).cast("long"))
          .as("mp4_tracks"),
        // Cross-track sums saturate to NULL instead of wrapping (r17
        // ADVICE) — the shared guarded fold, semantics documented at
        // [[graft.functions.F.saturatingTrackSum]]
        graft.functions.F.saturatingTrackSum("mp4trk", "sample_count")
          .as("mp4_samples"),
        expr("aggregate(mp4trk, CAST(0 AS BIGINT), (a, t) -> greatest(a, t.duration_ms))")
          .as("mp4_duration_ms"),
        graft.functions.F.saturatingTrackSum("mp4trk", "total_bytes")
          .as("mp4_bytes")): _*)
  }

  /** STREAMING incremental dedup against the WAREHOUSE — the production
    * shape of the d11 batch operator: arrivals stream → per micro-batch,
    * join the PERSISTED corpus dedup index ([[graft.ops.Dedup
    * .buildCorpusIndex]]: md5 + packed SimHash-64, one row per corpus doc,
    * refreshed by ingest/compaction) → exact / near / new verdicts land in
    * a verdict sink partitioned by batch id for idempotent replay.
    *
    * The index path is re-read INSIDE foreachBatch, so every micro-batch
    * sees the corpus as of ITS OWN planning time — files appended to the
    * index between batches (new ingest, a compaction rewrite) are picked
    * up with no query restart, which a static-side join would miss.
    *
    * State is bounded at exactly zero: no stateful operator exists in the
    * plan (offsets in the checkpoint are the only carried state) — the
    * corpus lives in the warehouse, not the state store, so a year-long
    * run holds nothing in memory between triggers. Contrast
    * [[graft.ops.Dedup.streamingSimhashNearDup]], which pairs arrivals
    * against ARRIVALS within an event-time horizon and must carry (and
    * evict) per-bucket state; this operator answers the other production
    * question — "is this arrival already in my corpus?" — and the verdicts
    * match [[graft.ops.Dedup.dedupAgainst]] batch-for-batch by
    * construction (both run [[graft.ops.Dedup.dedupAgainstIndex]]).
    */
  def dedupArrivals(arrivals: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, maxHamming: Int = 3): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts = graft.ops.Dedup
          .dedupAgainstIndex(batch, spark.read.parquet(indexPath), maxHamming)
          .withColumn("batch_id", lit(batchId))
        // replayed micro-batch overwrites its own partition, not duplicates
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try verdicts.write.mode("overwrite").partitionBy("batch_id")
          .parquet(outPath)
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** STREAMING decontamination gate — [[dedupArrivals]]' shape for the
    * train/eval contamination check ([[graft.ops.Dedup
    * .contaminationGateAgainstIndex]]): arriving training documents
    * shingle in their own micro-batch and join the PERSISTED eval-gram
    * index ([[graft.ops.Dedup.buildEvalGramIndex]], re-read per batch —
    * an eval-set release is picked up without restart) for
    * `contaminated` / `clean` verdicts with the worst-offender evidence
    * columns. No learning loop by design: the knowledge side is the
    * FROZEN benchmark set, which changes by release, never by ingest.
    * Zero state-store state; verdicts land batch-partitioned for
    * idempotent replay.
    */
  def contaminationArrivals(arrivals: DataFrame, indexPath: String,
      outPath: String, checkpoint: String, n: Int = 8,
      minShared: Long = 1): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts = graft.ops.Dedup.contaminationGateAgainstIndex(
          batch, spark.read.parquet(indexPath), n, minShared)
          .withColumn("batch_id", lit(batchId))
        withDynamicOverwrite(spark) {
          verdicts.write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** STREAMING admission pipeline — the e08 decision table as the ingest
    * gate it exists to be ([[graft.ops.Dedup.admitAgainstIndexes]], shared
    * verbatim with the registered batch form): each arriving
    * `(doc_id, text, embedding)` micro-batch runs all three gates against
    * the three PERSISTED indexes (corpus text index, banded embed index,
    * eval-gram index — each re-read per batch, so ingest-cadence index
    * refreshes and eval-set releases land without restart) and its
    * severity-precedence decisions land batch-partitioned for idempotent
    * replay. The batch is barriered ONCE: it feeds three gate subtrees in
    * one action (the multi-reference class). Zero state-store state.
    */
  def admissionArrivals(arrivals: DataFrame, textIndexPath: String,
      embIndexPath: String, evalIndexPath: String, outPath: String,
      checkpoint: String, maxHamming: Int = 3, minCosine: Double = 0.9,
      n: Int = 8): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val decisions = graft.ops.Dedup.admitAgainstIndexes(
          graft.ops.Barrier.barrier(batch),
          spark.read.parquet(textIndexPath),
          spark.read.parquet(embIndexPath),
          spark.read.parquet(evalIndexPath),
          maxHamming, minCosine, n)
          .withColumn("batch_id", lit(batchId))
        withDynamicOverwrite(spark) {
          decisions.write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** Dynamic-partition-overwrite scope: a replayed micro-batch must rewrite
    * only its OWN `batch_id=N` partition, never truncate siblings.
    */
  private def withDynamicOverwrite[A](spark: SparkSession)(f: => A): A = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try f
    finally prev.foreach(
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
  }

  /** The SELF-LEARNING text-dedup micro-batch BODY — the single
    * implementation [[dedupLearningArrivals]] runs per trigger and the
    * registered batch-replay query (d24, `EntryOps.dedupLearningReplay`)
    * drives under the oracle, so the stream's verdicts and the
    * hash-checked ones cannot drift: verdicts come from base + learned
    * batches STRICTLY BELOW `batchId`
    * ([[graft.ops.Dedup.readCorpusIndex]] — the replay-exactness
    * contract), and docs judged `new` write their own index rows to
    * `<root>/learned/batch_id=N` (dynamic partition overwrite —
    * idempotent on redelivery). Returns the barriered verdict table;
    * the learned-rows write has already happened when it returns.
    */
  def dedupLearningTextBatch(batch: DataFrame, indexRoot: String,
      batchId: Long, maxHamming: Int = 3): DataFrame = {
    val spark = batch.sparkSession
    // verdicts feed TWO actions (the learned-rows write and the caller's
    // verdict write) — barrier the tiny verdict table so the index join
    // runs once (multi-action class, the fence's home turf)
    val verdicts = graft.ops.Barrier.barrier(graft.ops.Dedup
      .dedupAgainstIndex(batch,
        graft.ops.Dedup.readCorpusIndex(spark, indexRoot,
          beforeBatch = batchId), maxHamming))
    val learned = graft.ops.Dedup.buildCorpusIndex(
      batch.join(verdicts.filter(col("verdict") === "new")
        .select(col("doc_id")), Seq("doc_id")))
      .withColumn("batch_id", lit(batchId))
    withDynamicOverwrite(spark) {
      learned.write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$indexRoot/learned")
    }
    verdicts
  }

  /** SELF-LEARNING streaming dedup — [[dedupArrivals]] plus the missing
    * half of the incremental loop: docs judged `new` write their OWN index
    * rows (`<root>/learned/batch_id=N`, batch-partitioned for idempotent
    * replay), so a later batch's duplicate of an earlier batch's novel doc
    * is caught — the static-index stream keeps yielding `keep` for every
    * copy of content the base corpus has never seen. Knowledge is
    * per-batch MONOTONE and replay-exact: batch b's verdicts read base +
    * learned batches STRICTLY BELOW b
    * ([[graft.ops.Dedup.readCorpusIndex]]), so a redelivered batch never
    * sees its own rows and reproduces its verdicts bitwise. Within one
    * micro-batch, arrivals are still only compared against prior
    * knowledge (two novel duplicates in the SAME batch both read `new` —
    * intra-batch self-dedup is the batch operators' job, d01/d08 class);
    * the learned rows carry the same ~24 bytes/doc as the base index, so
    * the stream's state is still nothing but parquet. Zero state-store
    * state; a compaction folding `learned/` into `base/` at ingest
    * cadence follows the [[graft.ops.Similarity.compactPqIndex]] marker
    * protocol if the batch tail ever dominates listing cost. The per-batch
    * body is [[dedupLearningTextBatch]] — shared with the d24 registered
    * replay, so the streamed route is itself oracle-hash-checked.
    */
  def dedupLearningArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String,
      maxHamming: Int = 3): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts =
          dedupLearningTextBatch(batch, indexRoot, batchId, maxHamming)
        withDynamicOverwrite(spark) {
          verdicts.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** The SELF-LEARNING URL-dedup micro-batch BODY — the crawl FRONTIER
    * loop, [[dedupLearningTextBatch]]'s contract for the URL modality
    * (shared with the d34 registered replay,
    * `EntryOps.dedupLearningUrlReplay`): arriving (doc_id, raw_url) rows
    * canonicalize in their own scan stage, verdicts come from the
    * frontier STRICTLY BELOW `batchId`
    * ([[graft.ops.Dedup.readUrlIndex]] — replay-exact), and `new` URLs
    * write their first-seen frontier rows to `<root>/learned/batch_id=N`
    * — so a later batch's re-discovery of an earlier batch's novel URL is
    * `dup`, the property a crawl frontier exists for. `invalid`
    * (unparseable) arrivals are never learned. Intra-batch: two arrivals
    * sharing a canonical URL in ONE batch both read `new` and learn one
    * frontier row (min doc_id) — prior-knowledge-only, the whole learning
    * family's contract. Zero state-store state.
    */
  def dedupLearningUrlBatch(batch: DataFrame, indexRoot: String,
      batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    val verdicts = graft.ops.Barrier.barrier(graft.ops.Dedup
      .urlDedupAgainstIndex(batch,
        graft.ops.Dedup.readUrlIndex(spark, indexRoot,
          beforeBatch = batchId)))
    val learned = graft.ops.Dedup.buildUrlIndex(
      verdicts.filter(col("verdict") === "new")
        .select(col("doc_id"), col("url")))
      .withColumn("batch_id", lit(batchId))
    withDynamicOverwrite(spark) {
      learned.write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$indexRoot/learned")
    }
    verdicts
  }

  /** SELF-LEARNING URL dedup stream — [[dedupLearningArrivals]]' contract
    * for the crawl frontier: per-trigger micro-batches through
    * [[dedupLearningUrlBatch]], verdicts batch-partitioned for idempotent
    * replay. Zero state-store state.
    */
  def dedupLearningUrlArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts = dedupLearningUrlBatch(batch, indexRoot, batchId)
        withDynamicOverwrite(spark) {
          verdicts.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** The SELF-LEARNING NEAR-URL-dedup micro-batch BODY —
    * [[dedupLearningUrlBatch]]'s contract for the d33 gram space (shared
    * with the d35 registered replay, `EntryOps.dedupLearningUrlNearReplay`):
    * a crawl that mutates one query param per fetch defeats the exact
    * frontier, so this gate verdicts arrivals against the persisted
    * token-bigram index STRICTLY BELOW `batchId`
    * ([[graft.ops.Dedup.readUrlGramIndex]] — replay-exact) via
    * [[graft.ops.Dedup.urlNearDedupAgainstIndex]] (df-capped candidate
    * grams, exact-Jaccard verify, deterministic best match), and `new`
    * URLs learn their OWN gram rows into `<root>/learned/batch_id=N` —
    * so a later batch's near-alias of an earlier batch's novel URL is
    * `dup` through learned rows alone. `invalid` arrivals are never
    * learned; intra-batch near-aliases both read `new`
    * (prior-knowledge-only, the family contract). Zero state-store state.
    */
  def dedupLearningUrlNearBatch(batch: DataFrame, indexRoot: String,
      batchId: Long, minJaccard: Double = 0.4,
      maxDocFreq: Long = 64): DataFrame = {
    val spark = batch.sparkSession
    val verdicts = graft.ops.Barrier.barrier(graft.ops.Dedup
      .urlNearDedupAgainstIndex(batch,
        graft.ops.Dedup.readUrlGramIndex(spark, indexRoot,
          beforeBatch = batchId),
        minJaccard, maxDocFreq))
    val learned = graft.ops.Dedup.buildUrlGramIndex(
      verdicts.filter(col("verdict") === "new")
        .select(col("doc_id"), col("url")))
      .withColumn("batch_id", lit(batchId))
    withDynamicOverwrite(spark) {
      learned.write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$indexRoot/learned")
    }
    verdicts
  }

  /** SELF-LEARNING NEAR-URL dedup stream — [[dedupLearningUrlArrivals]]'
    * contract for the gram space: per-trigger micro-batches through
    * [[dedupLearningUrlNearBatch]], verdicts batch-partitioned for
    * idempotent replay. Zero state-store state.
    */
  def dedupLearningUrlNearArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String, minJaccard: Double = 0.4,
      maxDocFreq: Long = 64): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts = dedupLearningUrlNearBatch(batch, indexRoot, batchId,
          minJaccard, maxDocFreq)
        withDynamicOverwrite(spark) {
          verdicts.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** Per-micro-batch body of the self-learning VIDEO near-dup gate (shared
    * with the d38 registered replay, `EntryOps.dedupLearningVideoReplay` —
    * the SEVENTH learning modality): arriving MP4 payloads decode IN THE
    * BATCH SCAN STAGE (native `mp4_sample_tables` — payloads never leave
    * it) into d36's layout-free descriptor text, verdict against the
    * persisted descriptor gram index STRICTLY BELOW `batchId`
    * ([[graft.ops.Dedup.readVideoGramIndex]] — replay-exact) via
    * [[graft.ops.Dedup.videoNearDedupAgainstIndex]] (df-capped candidate
    * grams, exact-Jaccard verify, deterministic best match), and `new`
    * assets learn their OWN gram rows into `<root>/learned/batch_id=N` —
    * so a later batch's re-mux of an earlier batch's novel upload is
    * `dup` through learned rows alone. Refused decodes are `invalid`,
    * never learned; intra-batch re-muxes both read `new`
    * (prior-knowledge-only, the family contract). Zero state-store state.
    */
  def dedupLearningVideoBatch(batch: DataFrame, indexRoot: String,
      batchId: Long, minJaccard: Double = 0.4,
      maxDocFreq: Long = 64): DataFrame = {
    val spark = batch.sparkSession
    val decoded = batch
      .select(col("asset_id").as("doc_id"),
        graft.functions.Staged(
          graft.functions.Mp4SampleTables(col("payload"))).as("f"))
      .select(col("doc_id"),
        when(col("f.tracks").isNotNull,
          graft.functions.F.videoDescriptorText("f.tracks")).as("text"))
    val verdicts = graft.ops.Barrier.barrier(graft.ops.Dedup
      .videoNearDedupAgainstIndex(decoded,
        graft.ops.Dedup.readVideoGramIndex(spark, indexRoot,
          beforeBatch = batchId),
        minJaccard, maxDocFreq))
    val learned = graft.ops.Dedup.buildVideoGramIndex(
      verdicts.filter(col("verdict") === "new")
        .select(col("doc_id"), col("text")))
      .withColumn("batch_id", lit(batchId))
    withDynamicOverwrite(spark) {
      learned.write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$indexRoot/learned")
    }
    verdicts
  }

  /** SELF-LEARNING VIDEO near-dup stream —
    * [[dedupLearningUrlNearArrivals]]' contract for the video modality:
    * per-trigger micro-batches of (asset_id, payload) through
    * [[dedupLearningVideoBatch]], verdicts batch-partitioned for
    * idempotent replay. Zero state-store state.
    */
  def dedupLearningVideoArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String, minJaccard: Double = 0.4,
      maxDocFreq: Long = 64): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts = dedupLearningVideoBatch(batch, indexRoot, batchId,
          minJaccard, maxDocFreq)
        withDynamicOverwrite(spark) {
          verdicts.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** STREAMING media dedup against the warehouse — [[dedupArrivals]]' shape
    * for IMAGES: arriving payloads hash in the micro-batch scan stage
    * (native `ppm_dhash`; payloads never leave it), then join the PERSISTED
    * perceptual-hash index ([[graft.ops.Dedup.buildMediaIndex]], re-read
    * per batch so corpus growth is visible without restart) for
    * exact / near / new verdicts ([[graft.ops.Dedup
    * .mediaDedupAgainstIndex]]: banded candidates under the band-frequency
    * cap, codegen'd Hamming). Zero state-store state; verdicts land
    * batch-partitioned for idempotent replay.
    */
  def dedupImageArrivals(arrivals: DataFrame, indexPath: String,
      outPath: String, checkpoint: String,
      maxHamming: Int = 3): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val hashed = batch.select(col("path").as("asset_id"),
          graft.functions.PpmDHash(col("content")).as("dhash"))
        val verdicts = graft.ops.Dedup.mediaDedupAgainstIndex(
          hashed, spark.read.parquet(indexPath), maxHamming)
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try verdicts.write.mode("overwrite").partitionBy("batch_id")
          .parquet(outPath)
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** SELF-LEARNING media dedup — [[dedupLearningArrivals]]' contract for
    * perceptual-hash spaces: arriving payloads hash ONCE in the scan
    * stage (the `hash` column — `ppm_dhash` for images,
    * `coalesce(wav_dhash, flac_dhash)` for cross-codec audio; barriered
    * so decode feeds the verdict join AND the learned rows from one
    * evaluation), verdicts come from base + learned batches strictly
    * below this one ([[graft.ops.Dedup.readMediaIndex]] — replay-exact),
    * and `new` HASHABLE assets write their (ex_id, dhash) row to the
    * `learned/` delta so the next batch's re-upload of a novel asset is
    * caught. `unhashable` arrivals are never learned — a refusal is not
    * knowledge. Zero state-store state. Contract: the base index's
    * `ex_id` must be STRING-typed (learned rows key on arrival paths,
    * and the union is by name AND type).
    */
  def dedupLearningMediaArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String, hash: Column,
      maxHamming: Int = 3): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts =
          dedupLearningMediaBatch(batch, indexRoot, batchId, hash, maxHamming)
        withDynamicOverwrite(spark) {
          verdicts.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** The SELF-LEARNING media-dedup micro-batch BODY —
    * [[dedupLearningTextBatch]]'s contract for perceptual-hash spaces,
    * shared between [[dedupLearningMediaArrivals]] and the d27 registered
    * replay (`EntryOps.dedupLearningMediaReplay`): payloads hash ONCE in
    * the scan stage (barriered — decode feeds the verdict join AND the
    * learned rows from one evaluation), verdicts come from base + learned
    * batches strictly below `batchId`
    * ([[graft.ops.Dedup.readMediaIndex]]), and `new` HASHABLE assets
    * learn their (ex_id, dhash) row; `unhashable` arrivals never do — a
    * refusal is not knowledge. Returns the barriered verdict table; the
    * learned write has already happened.
    */
  def dedupLearningMediaBatch(batch: DataFrame, indexRoot: String,
      batchId: Long, hash: Column, maxHamming: Int = 3): DataFrame = {
    val spark = batch.sparkSession
    val hashed = graft.ops.Barrier.barrier(
      batch.select(col("path").as("asset_id"), hash.as("dhash")))
    val verdicts = graft.ops.Barrier.barrier(graft.ops.Dedup
      .mediaDedupAgainstIndex(hashed,
        graft.ops.Dedup.readMediaIndex(spark, indexRoot,
          beforeBatch = batchId), maxHamming))
    val learned = hashed
      .join(verdicts.filter(col("verdict") === "new")
        .select(col("asset_id")), Seq("asset_id"))
      .filter(col("dhash").isNotNull)
      .select(col("asset_id").as("ex_id"), col("dhash"))
      .withColumn("batch_id", lit(batchId))
    withDynamicOverwrite(spark) {
      learned.write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$indexRoot/learned")
    }
    verdicts
  }

  /** STREAMING cross-codec AUDIO dedup against the warehouse —
    * [[dedupImageArrivals]]' shape for recordings: arriving payloads hash
    * in the micro-batch scan stage through ONE perceptual space
    * (`coalesce(wav_dhash, flac_dhash)` — a wrong-magic decode refuses in
    * O(1), and FLAC's losslessness makes a WAV and a FLAC of the same
    * recording hash identically, so the codec an uploader chose cannot
    * hide a duplicate), then join the PERSISTED index (re-read per batch)
    * for exact / near / new / `unhashable` verdicts. Zero state-store
    * state; verdicts land batch-partitioned for idempotent replay.
    */
  def dedupAudioArrivals(arrivals: DataFrame, indexPath: String,
      outPath: String, checkpoint: String,
      maxHamming: Int = 3): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val hashed = batch.select(col("path").as("asset_id"),
          coalesce(
            graft.functions.WavDHash(col("content")),
            graft.functions.FlacDHash(col("content"))).as("dhash"))
        val verdicts = graft.ops.Dedup.mediaDedupAgainstIndex(
          hashed, spark.read.parquet(indexPath), maxHamming)
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try verdicts.write.mode("overwrite").partitionBy("batch_id")
          .parquet(outPath)
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** STREAMING duplicated-substring check against the warehouse — the
    * fourth member of the incremental family (text hashes
    * [[dedupArrivals]], images [[dedupImageArrivals]], embeddings
    * [[dedupEmbedArrivals]], substrings here): each arriving document's
    * positional grams join the PERSISTED distinct-gram index
    * ([[graft.ops.Dedup.buildGramIndex]], re-read per batch so corpus
    * growth is visible without restart), and runs of corpus-known grams
    * merge to spans ([[graft.ops.Dedup.spanCheckAgainstIndex]]) — the
    * ingest-time ExactSubstr gate. Span rows land batch-partitioned for
    * idempotent replay; zero state-store state.
    */
  /** SELF-LEARNING substring check — [[dedupLearningArrivals]]' contract
    * for the gram index, the FIFTH and last member of the learning
    * family: every arrival's FIRST-SEEN grams (anti-joined against base +
    * earlier learned batches, so the one-row-per-gram invariant
    * [[graft.ops.Dedup.spanCheckAgainstIndex]]'s run merging depends on
    * holds globally, at arrival-bounded cost) land in the `learned/`
    * delta — a later arrival quoting an earlier arrival's content gets
    * its span flagged, which the static-index stream cannot see. Batch b
    * reads base + learned strictly below b
    * ([[graft.ops.Dedup.readGramIndex]] — replay-exact). Zero
    * state-store state.
    */
  def spanCheckLearningArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String, n: Int = 5): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val idx = graft.ops.Dedup.readGramIndex(spark, indexRoot,
          beforeBatch = batchId)
        val spans = graft.ops.Dedup.spanCheckAgainstIndex(batch, idx, n)
          .withColumn("batch_id", lit(batchId))
        val novelGrams = graft.ops.Dedup.buildGramIndex(batch, n)
          .join(idx, Seq("gram"), "left_anti")
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try {
          novelGrams.write.mode("overwrite").partitionBy("batch_id")
            .parquet(s"$indexRoot/learned")
          spans.write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        } finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  def spanCheckArrivals(arrivals: DataFrame, indexPath: String,
      outPath: String, checkpoint: String, n: Int = 5): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val spans = graft.ops.Dedup.spanCheckAgainstIndex(
          batch, spark.read.parquet(indexPath), n)
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try spans.write.mode("overwrite").partitionBy("batch_id")
          .parquet(outPath)
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** STREAMING embedding dedup against the warehouse — the third modality
    * of the incremental family (text [[dedupArrivals]], images
    * [[dedupImageArrivals]], embeddings here): arriving vectors join the
    * PERSISTED LSH-bucketed index ([[graft.ops.Dedup.buildEmbedIndex]],
    * re-read per batch) on the bucket key and verify by exact cosine
    * ([[graft.ops.Dedup.embedDedupAgainstIndex]]). near / new / invalid
    * verdicts land batch-partitioned for idempotent replay; zero
    * state-store state. `planes` must match the value the index was built
    * with ([[graft.ops.Dedup.buildEmbedIndex]] persists it, and the batch
    * body validates it per micro-batch — a mismatch fails loudly instead of
    * silently bucketing every arrival into `new`).
    */
  def dedupEmbedArrivals(arrivals: DataFrame, indexPath: String,
      outPath: String, checkpoint: String,
      minCosine: Double = 0.9, planes: Int = 4): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts = graft.ops.Dedup.embedDedupAgainstIndex(
          batch, spark.read.parquet(indexPath), minCosine, planes)
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try verdicts.write.mode("overwrite").partitionBy("batch_id")
          .parquet(outPath)
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** SELF-LEARNING embedding dedup — [[dedupLearningArrivals]]' contract
    * for the vector modality: verdicts come from base + learned batches
    * strictly below this one ([[graft.ops.Dedup.readEmbedIndex]] —
    * replay-exact), and `new` VALID vectors write their own bucketed
    * index rows to the `learned/` delta (bucketed with the planes value
    * read FROM the index — self-describing, so an index rebuilt with a
    * different quantizer re-buckets the stream's learning without a
    * restart). `invalid` arrivals are never learned. Zero state-store
    * state.
    */
  def dedupLearningEmbedArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String,
      minCosine: Double = 0.9): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts =
          dedupLearningEmbedBatch(batch, indexRoot, batchId, minCosine)
        withDynamicOverwrite(spark) {
          verdicts.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** SELF-LEARNING BANDED embedding dedup — [[dedupLearningEmbedArrivals]]
    * with [[graft.ops.Dedup.embedDedupAgainstIndexBanded]] as the verdict
    * join: the recall-preserving grown-geometry route (4 tables of grown
    * planes, d29) run as the ingest gate, with `new` VALID vectors
    * learning their T banded rows into `<root>/learned/batch_id=N`.
    * Geometry follows the index on BOTH sides (the verdict join and the
    * learned-row banding), so a retrained index re-bands the stream
    * without restart. Zero state-store state; replay-exact.
    */
  def dedupLearningBandedArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String,
      minCosine: Double = 0.9): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts =
          dedupLearningBandedBatch(batch, indexRoot, batchId, minCosine)
        withDynamicOverwrite(spark) {
          verdicts.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** The SELF-LEARNING BANDED embedding-dedup micro-batch BODY — shared
    * between [[dedupLearningBandedArrivals]] and the d30 registered
    * replay (`EntryOps.dedupLearningBandedReplay`): knowledge strictly
    * below `batchId` ([[graft.ops.Dedup.readEmbedIndex]] — the banded
    * schema rides the same base ∪ learned-below-b layout), verdicts from
    * the banded join, `new` valid vectors banded under the INDEX's
    * geometry (planes/tables columns — the one-row scalar read class)
    * into the learned delta. Returns the barriered verdict table; the
    * learned write has already happened. The verdict join enforces the
    * coefficient-family gate (Dedup.requireFamily) BEFORE any learned row
    * is written: an index keyed under a different hyperplane family fails
    * the whole micro-batch loudly instead of silently learning every
    * arrival as `new`.
    */
  def dedupLearningBandedBatch(batch: DataFrame, indexRoot: String,
      batchId: Long, minCosine: Double = 0.9): DataFrame = {
    val spark = batch.sparkSession
    val idx = graft.ops.Dedup.readEmbedIndex(spark, indexRoot,
      beforeBatch = batchId)
    val hasDims = idx.columns.contains("dims")
    val geo = idx.select(col("planes") +: col("tables") +:
      (if (hasDims) Seq(col("dims")) else Nil): _*).head()
    val verdicts = graft.ops.Barrier.barrier(graft.ops.Dedup
      .embedDedupAgainstIndexBanded(batch, idx, minCosine))
    val learned = graft.ops.Dedup.buildEmbedIndexBanded(
      batch.join(verdicts.filter(col("verdict") === "new")
        .select(col("vec_id")), Seq("vec_id")),
      planes = geo.getInt(0), tables = geo.getInt(1),
      dims = if (hasDims) geo.getInt(2) else 64)
      .withColumn("batch_id", lit(batchId))
    withDynamicOverwrite(spark) {
      learned.write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$indexRoot/learned")
    }
    verdicts
  }

  /** The SELF-LEARNING embedding-dedup micro-batch BODY —
    * [[dedupLearningTextBatch]]'s contract for the vector modality, shared
    * between [[dedupLearningEmbedArrivals]] and the d25 registered replay
    * (`EntryOps.dedupLearningEmbedReplay`): knowledge strictly below
    * `batchId` ([[graft.ops.Dedup.readEmbedIndex]]), planes followed FROM
    * the index (one-row scalar read, planes-guard class), `new` VALID
    * vectors learned into `<root>/learned/batch_id=N`. Returns the
    * barriered verdict table; the learned write has already happened.
    * The verdict join enforces the coefficient-family gate
    * (Dedup.requireFamily) before the learned write — see
    * [[dedupLearningBandedBatch]].
    */
  def dedupLearningEmbedBatch(batch: DataFrame, indexRoot: String,
      batchId: Long, minCosine: Double = 0.9): DataFrame = {
    val spark = batch.sparkSession
    val idx = graft.ops.Dedup.readEmbedIndex(spark, indexRoot,
      beforeBatch = batchId)
    val hasDims = idx.columns.contains("dims")
    val geo = idx.select(col("planes") +:
      (if (hasDims) Seq(col("dims")) else Nil): _*).head()
    val planes = geo.getInt(0)
    val dims = if (hasDims) geo.getInt(1) else 64
    val verdicts = graft.ops.Barrier.barrier(graft.ops.Dedup
      .embedDedupAgainstIndex(batch, idx, minCosine, planes, dims))
    val learned = graft.ops.Dedup.buildEmbedIndex(
      batch.join(verdicts.filter(col("verdict") === "new")
        .select(col("vec_id")), Seq("vec_id")), planes, dims)
      .withColumn("batch_id", lit(batchId))
    withDynamicOverwrite(spark) {
      learned.write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$indexRoot/learned")
    }
    verdicts
  }

  /** STREAMING incremental SemDeDup against the warehouse — the semantic
    * member of the incremental family (text [[dedupArrivals]], images
    * [[dedupImageArrivals]], embeddings [[dedupEmbedArrivals]], substrings
    * [[spanCheckArrivals]]): the PERSISTED cluster index
    * ([[graft.ops.Similarity.buildSemIndex]] — `centroids/` and `members/`
    * under one root, re-read per batch so a re-clustered corpus is visible
    * without restart); each arriving vector assigns to its nearest
    * centroid (a broadcast of the K-row table) and compares by exact
    * cosine only within that cell
    * ([[graft.ops.Similarity.semDedupAgainstIndex]]). prune / keep /
    * invalid verdicts land batch-partitioned for idempotent replay; zero
    * state-store state.
    */
  def dedupSemArrivals(arrivals: DataFrame, indexPath: String,
      outPath: String, checkpoint: String,
      minCosine: Double = 0.9): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts = graft.ops.Similarity.semDedupAgainstIndex(
          batch, spark.read.parquet(s"$indexPath/centroids"),
          spark.read.parquet(s"$indexPath/members"), minCosine)
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try verdicts.write.mode("overwrite").partitionBy("batch_id")
          .parquet(outPath)
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** SELF-LEARNING incremental SemDeDup — [[dedupLearningArrivals]]'
    * contract for the semantic modality, closing the learning loop on the
    * LAST member of the incremental family: `keep` arrivals join their
    * assigned cell's member set (`members/learned/batch_id=N` under the
    * index root), so a later arrival semantically covered by an earlier
    * KEPT arrival is pruned against it — the static-members stream keeps
    * admitting every paraphrase of novel content. Batch b reads
    * `members/base` + learned batches strictly below b
    * ([[graft.ops.Dedup.readSemMembers]] — replay-exact); centroids stay
    * frozen (a cell set only changes at retrain, which is a rebuild), so
    * learning never re-clusters. `invalid` arrivals are never learned.
    * Zero state-store state.
    */
  def dedupLearningSemArrivals(arrivals: DataFrame, indexRoot: String,
      outPath: String, checkpoint: String,
      minCosine: Double = 0.9): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val verdicts =
          dedupLearningSemBatch(batch, indexRoot, batchId, minCosine)
        withDynamicOverwrite(spark) {
          verdicts.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite").partitionBy("batch_id")
            .parquet(outPath)
        }
      }
      .start()

  /** The SELF-LEARNING semantic-dedup micro-batch BODY —
    * [[dedupLearningTextBatch]]'s contract for the semantic modality,
    * shared between [[dedupLearningSemArrivals]] and the d28 registered
    * replay (`EntryOps.dedupLearningSemReplay`): verdicts come from the
    * frozen centroid table plus members/base + learned batches strictly
    * below `batchId` ([[graft.ops.Dedup.readSemMembers]] — replay-exact),
    * and `keep` arrivals learn their (ex_id, cell, ex_e) member row so a
    * later paraphrase is pruned against them; `invalid` arrivals never
    * do. Returns the barriered verdict table; the learned write has
    * already happened.
    */
  def dedupLearningSemBatch(batch: DataFrame, indexRoot: String,
      batchId: Long, minCosine: Double = 0.9): DataFrame = {
    val spark = batch.sparkSession
    val verdicts = graft.ops.Barrier.barrier(graft.ops.Similarity
      .semDedupAgainstIndex(batch,
        spark.read.parquet(s"$indexRoot/centroids"),
        graft.ops.Dedup.readSemMembers(spark, indexRoot,
          beforeBatch = batchId), minCosine))
    val learned = batch
      .join(verdicts.filter(col("verdict") === "keep")
        .select(col("vec_id"), col("cell")), Seq("vec_id"))
      .select(col("vec_id").as("ex_id"), col("cell"),
        col("embedding").as("ex_e"))
      .withColumn("batch_id", lit(batchId))
    withDynamicOverwrite(spark) {
      learned.write.mode("overwrite").partitionBy("batch_id")
        .parquet(s"$indexRoot/members/learned")
    }
    verdicts
  }

  /** STREAMING PQ-index APPEND — the INGEST side of the ANN index's
    * maintenance cadence ([[graft.ops.Similarity.appendToPqIndex]] as a
    * stream): each arriving vector is coded under the index's FROZEN
    * codebooks (re-read per batch, geometry followed from the index — a
    * compaction-cadence retrain is honored without restart) and its dense
    * code row lands batch-partitioned under `codes_appended/` for
    * idempotent replay. Zero state-store state; the whole batch is one
    * map-side assignment (broadcast candidate arrays + `argmax_dot`) plus
    * the narrow per-vector pivot — cost linear in the batch, constant in
    * the corpus the index covers. Readers
    * ([[graft.ops.Similarity.readPqCodes]] — [[annArrivals]] uses it) see
    * appended vectors as candidates from the next micro-batch on; the
    * DRIFT metric ([[graft.ops.Similarity.pqIndexDrift]]) over the same
    * tables decides when the append debt forces a retrain. Cross-batch
    * duplicate vec_ids are the caller's upstream dedup concern, exactly
    * as in the row-append ingest family.
    */
  def pqIndexAppendArrivals(arrivals: DataFrame, indexPath: String,
      checkpoint: String): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // per-batch root resolution: under a versioned container a
        // drift-triggered rebuild flips this stream to the new quantizer
        // (and its own append delta) without restart
        val root = graft.ops.Similarity.resolvePqIndexPath(spark, indexPath)
        val coded = graft.ops.Similarity.appendToPqIndex(
          batch, spark.read.parquet(s"$root/codebooks"))
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try coded.write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$root/codes_appended")
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** STREAMING ANN against the warehouse — the query-side counterpart of
    * the incremental dedup family (r10, completing the verdict's item-8
    * symmetry): each arriving vector gets its top-k corpus neighbors from
    * the PERSISTED PQ index ([[graft.ops.Similarity.buildPqIndex]] —
    * `codebooks/` and `codes/` under one root, re-read per batch so an
    * ingest-cadence index rebuild is visible without restart). Per
    * micro-batch the batch's ADC lookup table builds against the broadcast
    * codebooks and every candidate costs M table hits
    * ([[graft.ops.Similarity.topkPqAgainstIndex]] — no training, no
    * vector-width joins in the hot path); the persisted geometry columns
    * The quantizer geometry is read FROM the index per batch (the index
    * is self-describing — one-row scalar read, planes-guard class), so an
    * ingest-cadence rebuild that re-sizes the quantizer is honored by the
    * running stream exactly like corpus growth, instead of tripping a
    * caller-parameter guard. Results land batch-partitioned for
    * idempotent replay; zero state-store state.
    */
  def annArrivals(arrivals: DataFrame, indexPath: String, outPath: String,
      checkpoint: String, k: Int = 3): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // versioned containers resolve per batch (resolvePqIndexPath): a
        // drift-triggered rebuild routes queries to the new root next batch
        val root = graft.ops.Similarity.resolvePqIndexPath(spark, indexPath)
        val codebooks = spark.read.parquet(s"$root/codebooks")
        val g = codebooks.select(col("subspaces"), col("codebook_size"),
          col("dims")).head()
        val neighbors = graft.ops.Similarity.topkPqAgainstIndex(
          batch, codebooks,
          graft.ops.Similarity.readPqCodes(spark, root), k,
          g.getInt(0), g.getInt(1), g.getInt(2))
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try neighbors.write.mode("overwrite").partitionBy("batch_id")
          .parquet(outPath)
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** [[pqIndexAppendArrivals]] for an IVF-PQ index root: arrivals are
    * coarse-assigned AND residual-coded under the root's frozen quantizer
    * pair ([[graft.ops.Similarity.appendToIvfPqIndex]] — the same
    * map-side broadcast/argmax shape, bucket + dense code array per row)
    * and land batch-partitioned under `codes_appended/` for idempotent
    * replay. The generation machinery is schema-agnostic, so compaction
    * and readers ([[graft.ops.Similarity.readPqCodes]]) serve the merged
    * view unchanged; versioned containers resolve per batch, so a
    * drift-triggered rebuild ([[graft.ops.Similarity
    * .rebuildIvfPqRootIfDrifted]]) flips this stream to the new quantizer
    * — and its grown coarse geometry — without restart.
    */
  def ivfPqIndexAppendArrivals(arrivals: DataFrame, indexPath: String,
      checkpoint: String): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val root = graft.ops.Similarity.resolvePqIndexPath(spark, indexPath)
        val coded = graft.ops.Similarity.appendToIvfPqIndex(batch,
          spark.read.parquet(s"$root/centroids"),
          spark.read.parquet(s"$root/codebooks"))
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try coded.write.mode("overwrite").partitionBy("batch_id")
          .parquet(s"$root/codes_appended")
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** [[annArrivals]] through the deployed IVFADC route: per micro-batch,
    * cell probing + table-driven ADC + shortlist against the persisted
    * index, exact re-rank against `corpusPath`'s full vectors (IVFADC's
    * vectors-on-disk access pattern — the index stores codes, the corpus
    * table stores the few full rows the re-rank touches; appended vectors
    * are re-rankable once their full rows land in the corpus table, the
    * same ingest step that feeds the append stream). Geometry follows
    * the index; versioned containers resolve per batch, so a rebuild —
    * including a grown coarse quantizer — routes queries next batch.
    */
  def annIvfArrivals(arrivals: DataFrame, indexPath: String,
      corpusPath: String, outPath: String, checkpoint: String,
      k: Int = 3, nprobe: Int = 3): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val root = graft.ops.Similarity.resolvePqIndexPath(spark, indexPath)
        val centroids = spark.read.parquet(s"$root/centroids")
        val g = centroids.select(col("n_cells"), col("subspaces"),
          col("codebook_size"), col("dims")).head()
        val neighbors = graft.ops.Similarity.topkIvfPqAgainstIndex(
          batch, spark.read.parquet(corpusPath),
          centroids, spark.read.parquet(s"$root/codebooks"),
          graft.ops.Similarity.readPqCodes(spark, root), k,
          g.getInt(0), g.getInt(1), g.getInt(2), nprobe, g.getInt(3))
          .withColumn("batch_id", lit(batchId))
        val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try neighbors.write.mode("overwrite").partitionBy("batch_id")
          .parquet(outPath)
        finally prev.foreach(
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", _))
      }
      .start()

  /** Batch-shared maillog ingest body. `batch` needs columns
    * (content binary, modificationTime timestamp).
    *
    * Idempotence: message ids continue from the max id of OTHER batches
    * (`batch_id != batchId`), and the inbox/tocc writes overwrite this batch's
    * own partitions — so a redelivered micro-batch reproduces the same ids and
    * row counts instead of appending duplicates. Contacts are replay-safe via
    * the upsert's anti-join.
    */
  def ingestMailBatch(batch: DataFrame, warehouse: Warehouse,
      batchId: Long = 0L): Unit = {
    val spark = batch.sparkSession
    // cache the ONE-parse frame: dead letters + the events pipeline below
    // are separate actions, and without this each would re-run the RFC-5322
    // UDF over every message
    val raw = MailParser.parseRaw(batch).cache()
    val res = MailParser.fromRaw(raw)
    // reference parity: a message process_input would raise on is NOT
    // ingested (maillog.py:159-164) — it lands in dead_letters instead
    Ingest.appendDeadLetters(res.deadLetters, warehouse, batchId)
    val parsed = res.events
    try {
      val addrs = parsed
        .select(explode(concat(
          array(struct(col("sender_name").as("_1"), col("sender_email").as("_2"))),
          col("recipients"))).as("a"))
        .select(col("a._1").as("realname"), col("a._2").as("email_address"))
      val contacts = Ingest.upsertContacts(addrs, warehouse)

      // arrival timestamp = now() at insert (maillog.py:97)
      val maxMsgId = if (tableExists(spark, warehouse.path("inbox")))
        warehouse.inbox(spark).filter(col("batch_id") =!= batchId)
          .agg(coalesce(max(col("id")), lit(0L)))
          .collect()(0).getLong(0)
      else 0L

      // distributed ordered indexer — no single-partition row_number window
      val keyed = graft.ops.OrderedIndex.withOrderedId(parsed,
          Seq(col("modificationTime"), col("sender_email")), "id",
          offset = maxMsgId)
        .cache()
      keyed.count()

      val inboxRows = keyed
        .withColumn("timestamp_now", current_timestamp())
        .join(broadcast(contacts),
          keyed("sender_name") === contacts("realname") &&
            keyed("sender_email") === contacts("email_address"))
        .select(keyed("id"), col("timestamp_now").as("timestamp"),
          substring(keyed("subject"), 1, 2048).as("subject"),
          contacts("id").as("sender_id"), keyed("size"), keyed("date"))
      Ingest.appendEvents(inboxRows, warehouse, "inbox", batchId)

      // per-message first-occurrence recipient dedup (maillog.py:88-94) — the
      // contact-id identity dedup maps to distinct contact ids per message.
      val tocc = keyed
        .select(col("id").as("msg_id"), explode(col("recipients")).as("r"))
        .join(broadcast(contacts),
          col("r._1") === contacts("realname") &&
            col("r._2") === contacts("email_address"))
        .select(col("msg_id"), contacts("id").as("contact_id"))
        .distinct()
      Ingest.idempotentAppend(tocc, warehouse, "inbox_tocc", batchId)
      keyed.unpersist()
    } finally raw.unpersist()
  }

  private def tableExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }
}

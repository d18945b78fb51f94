package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProductF32, DotProductFD, HyperplaneBucket, MinHashBandSigs, ParseStrArray, Reencode, SimHash16}

/** SparkSessionExtensions entry point exposing the engine's native Catalyst
  * expressions to SQL users:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT reencode(ua), simhash16(text), dot_f32(a, b) FROM ...")
  * }}}
  *
  * Also registrable via `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Declared argument count per function, enforced before the builder runs
    * so `SELECT zorder_key(x)` fails analysis with the standard
    * WRONG_NUM_ARGS message instead of an IndexOutOfBoundsException.
    */
  private val arities: Map[String, Int] = Map(
    "reencode" -> 1, "simhash16" -> 1, "dot_f32" -> 2, "dot_fd" -> 2,
    "minhash_band_sigs" -> 3, "inet_sort_key" -> 1, "parse_str_array" -> 1,
    "simhash64" -> 1, "media_dims" -> 1, "ppm_features" -> 1, "ppm_dhash" -> 1,
    "png_features" -> 1, "gif_features" -> 1, "gif_anim_features" -> 1,
    "gif_frame_stats" -> 1, "wav_features" -> 1, "wav_dhash" -> 1, "mpeg_features" -> 1, "mp4_features" -> 1, "mp4_sample_tables" -> 1, "mp4_fragment_tables" -> 1, "mpegts_tables" -> 1, "jpeg_features" -> 1, "jpeg_dhash" -> 1, "zorder_key" -> 2,
    "mpeg_l1_samples" -> 1, "flac_features" -> 1, "flac_dhash" -> 1,
    "bmp_features" -> 1,
    "hyperplane_bucket" -> 3, "pq_table_sum" -> 2, "pq_adc_score" -> 3,
    "argmax_dot" -> 4, "url_canonicalize" -> 1, "bpe_apply" -> 2)

  /** Functions with OPTIONAL trailing arguments: any arity in the set is
    * accepted on top of the base `arities` entry (which stays the
    * minimum, for the error message).
    */
  private val optionalArities: Map[String, Set[Int]] = Map(
    "hyperplane_bucket" -> Set(3, 4))

  private def checkArity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    (args: Seq[Expression]) => {
      val ok = args.length == n ||
        optionalArities.get(name).exists(_.contains(args.length))
      // a function with optional trailing args reports its full accepted
      // arity set ("3 or 4"), not just the base — a 5-arg call answered
      // with "expected 3" misdirects the caller who legitimately passed 4
      val expected = optionalArities.get(name)
        .map(s => (s + n).toSeq.sorted.mkString(" or "))
        .getOrElse(n.toString)
      if (!ok)
        throw new org.apache.spark.sql.AnalysisException(
          "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          Map(
            "functionName" -> s"`$name`",
            "expectedNum" -> expected,
            "actualNum" -> args.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"),
          None)
      build(args)
    }

  private val raw: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("reencode"),
        info("reencode", "reencode(str) - repairs latin-1/UTF-8 mojibake"),
        (args: Seq[Expression]) => Reencode(args.head)),
      (FunctionIdentifier("simhash16"),
        info("simhash16", "simhash16(text) - 16-bit SimHash of the word multiset"),
        (args: Seq[Expression]) => SimHash16(args.head)),
      (FunctionIdentifier("dot_f32"),
        info("dot_f32", "dot_f32(a, b) - double dot product of float arrays"),
        (args: Seq[Expression]) => DotProductF32(args.head, args(1))),
      (FunctionIdentifier("dot_fd"),
        info("dot_fd",
          "dot_fd(a, b) - fixed-fold double dot of float/double arrays"),
        (args: Seq[Expression]) => DotProductFD(args.head, args(1))),
      (FunctionIdentifier("minhash_band_sigs"),
        info("minhash_band_sigs",
          "minhash_band_sigs(grams, k, bandSize) - banded MinHash signatures"),
        (args: Seq[Expression]) => {
          val k = args(1).eval().asInstanceOf[Int]
          val bs = args(2).eval().asInstanceOf[Int]
          MinHashBandSigs(args.head, k, bs)
        }),
      (FunctionIdentifier("inet_sort_key"),
        info("inet_sort_key",
          "inet_sort_key(ip) - PostgreSQL-INET-order binary sort key for IPv4/IPv6 text"),
        (args: Seq[Expression]) => graft.functions.InetSortKey(args.head)),
      (FunctionIdentifier("parse_str_array"),
        info("parse_str_array",
          "parse_str_array(str) - parse a quoted-string-array log literal (JSON + \\xhh escapes)"),
        (args: Seq[Expression]) => ParseStrArray(args.head)),
      (FunctionIdentifier("simhash64"),
        info("simhash64", "simhash64(text) - 64-bit SimHash of the word multiset (long)"),
        (args: Seq[Expression]) => graft.functions.SimHash64(args.head)),
      (FunctionIdentifier("media_dims"),
        info("media_dims",
          "media_dims(payload) - struct(format, width, height) sniffed from PNG/GIF/BMP/JPEG header bytes"),
        (args: Seq[Expression]) => graft.functions.MediaDims(args.head)),
      (FunctionIdentifier("ppm_features"),
        info("ppm_features",
          "ppm_features(payload) - struct(format, width, height, maxval, n_pixels, sum_r, sum_g, sum_b) decoded from binary netpbm (P6/P5) bytes"),
        (args: Seq[Expression]) => graft.functions.PpmFeatures(args.head)),
      (FunctionIdentifier("ppm_dhash"),
        info("ppm_dhash",
          "ppm_dhash(payload) - 64-char difference-hash bitstring of a decoded netpbm raster (9x8 grayscale gradient signs); NULL on refusal"),
        (args: Seq[Expression]) => graft.functions.PpmDHash(args.head)),
      (FunctionIdentifier("png_features"),
        info("png_features",
          "png_features(payload) - struct(format, width, height, color_type, n_pixels, sum_r, sum_g, sum_b) decoded from PNG bytes (JDK zlib inflate + scanline unfilter)"),
        (args: Seq[Expression]) => graft.functions.PngFeatures(args.head)),
      (FunctionIdentifier("gif_features"),
        info("gif_features",
          "gif_features(payload) - struct(format, width, height, palette_size, n_pixels, sum_r, sum_g, sum_b) decoded from GIF bytes (from-spec LZW decompressor)"),
        (args: Seq[Expression]) => graft.functions.GifFeatures(args.head)),
      (FunctionIdentifier("gif_anim_features"),
        info("gif_anim_features",
          "gif_anim_features(payload) - struct(format, width, height, n_frames, n_pixels, sum_r, sum_g, sum_b) over ALL frames of a (possibly animated) GIF"),
        (args: Seq[Expression]) => graft.functions.GifAnimFeatures(args.head)),
      (FunctionIdentifier("gif_frame_stats"),
        info("gif_frame_stats",
          "gif_frame_stats(payload) - array of per-frame struct(frame_idx, left, top, width, height, n_pixels, sum_r, sum_g, sum_b) for a (possibly animated) GIF"),
        (args: Seq[Expression]) => graft.functions.GifFrameStats(args.head)),
      (FunctionIdentifier("wav_dhash"),
        info("wav_dhash",
          "wav_dhash(payload) - 64-char energy-gradient hash bitstring of decoded RIFF/WAVE PCM (65 time windows); NULL on refusal"),
        (args: Seq[Expression]) => graft.functions.WavDHash(args.head)),
      (FunctionIdentifier("wav_features"),
        info("wav_features",
          "wav_features(payload) - struct(format, channels, sample_rate, bits, n_frames, sum_ch0, sum_ch1, peak_abs) decoded from RIFF/WAVE PCM bytes"),
        (args: Seq[Expression]) => graft.functions.WavFeatures(args.head)),
      (FunctionIdentifier("mpeg_features"),
        info("mpeg_features",
          "mpeg_features(payload) - struct(format, version, layer, sample_rate, channels, n_frames, total_samples, duration_ms, avg_bitrate_kbps) from an MPEG audio frame-header walk (ID3-aware, no codec)"),
        (args: Seq[Expression]) => graft.functions.MpegFeatures(args.head)),
      (FunctionIdentifier("mp4_features"),
        info("mp4_features",
          "mp4_features(payload) - struct(format, brand, timescale, duration_ms, track_count, video_tracks, audio_tracks) from an ISO-BMFF box walk (mdat skipped by size, no codec)"),
        (args: Seq[Expression]) => graft.functions.Mp4Features(args.head)),
      (FunctionIdentifier("mp4_sample_tables"),
        info("mp4_sample_tables",
          "mp4_sample_tables(payload) - struct(format, brand, tracks: array<struct<trak_idx, handler, timescale, sample_count, duration_ms, total_bytes, avg_sample_bytes, chunk_count>>) from an ISO-BMFF stbl walk (stsz/stts/stsc/stco/co64; refuses fragmented moof streams and contradictory tables)"),
        (args: Seq[Expression]) => graft.functions.Mp4SampleTables(args.head)),
      (FunctionIdentifier("mp4_fragment_tables"),
        info("mp4_fragment_tables",
          "mp4_fragment_tables(payload) - struct(format, brand, tracks: array<struct<track_id, handler, timescale, fragment_count, sample_count, duration_ms, total_bytes, avg_sample_bytes>>) from a fragmented ISO-BMFF moof/traf/trun walk with trex/tfhd default resolution (refuses unfragmented files, contradictory trun flags, non-increasing fragment sequence numbers, undeclared track ids, exhausted default chains, out-of-file data spans)"),
        (args: Seq[Expression]) => graft.functions.Mp4FragmentTables(args.head)),
      (FunctionIdentifier("mpegts_tables"),
        info("mpegts_tables",
          "mpegts_tables(payload) - struct(streams: array<struct<pid, stream_type, pes_count, payload_bytes, duration_ms, avg_pes_bytes>>) from an ISO/IEC 13818-1 transport-stream walk (188-byte cells, PAT->PMT->PES; PTS-derived durations at the 90 kHz clock; refuses lost sync, reserved AFC, missing/overrun PSI, bad PES start codes, duplicate elementary PIDs; CRC not validated — inventory, not integrity)"),
        (args: Seq[Expression]) => graft.functions.MpegTsTables(args.head)),
      (FunctionIdentifier("jpeg_features"),
        info("jpeg_features",
          "jpeg_features(payload) - struct(format, width, height, components, n_pixels, sum_r, sum_g, sum_b) decoded from baseline JPEG bytes (from-spec T.81 Huffman + IDCT, honest refusal on progressive/arithmetic/12-bit)"),
        (args: Seq[Expression]) => graft.functions.JpegFeatures(args.head)),
      (FunctionIdentifier("jpeg_dhash"),
        info("jpeg_dhash",
          "jpeg_dhash(payload) - 64-char difference-hash bitstring of a decoded baseline JPEG (9x8 grayscale gradient signs, PpmDHash's construction); NULL on refusal"),
        (args: Seq[Expression]) => graft.functions.JpegDHash(args.head)),
      (FunctionIdentifier("mpeg_l1_samples"),
        info("mpeg_l1_samples",
          "mpeg_l1_samples(payload) - struct(format, layer, sample_rate, channels, n_frames, n_samples, sum_q24) decoded from MPEG-1 Audio Layer I bytes (from-spec ISO 11172-3 subband requantization; Layer II/III refuse honestly)"),
        (args: Seq[Expression]) => graft.functions.MpegL1Samples(args.head)),
      (FunctionIdentifier("flac_features"),
        info("flac_features",
          "flac_features(payload) - struct(format, sample_rate, channels, bits, n_blocks, n_samples, sum_ch0, sum_ch1, peak_abs) decoded from FLAC bytes (from-spec RFC 9639: Rice residuals, fixed/LPC predictors, stereo decorrelation; lossless exact PCM)"),
        (args: Seq[Expression]) => graft.functions.FlacFeatures(args.head)),
      (FunctionIdentifier("flac_dhash"),
        info("flac_dhash",
          "flac_dhash(payload) - 64-char energy-gradient difference-hash bitstring over FLAC-decoded PCM (WavDHash's construction; lossless, so a WAV of the same recording hashes identically); NULL on refusal"),
        (args: Seq[Expression]) => graft.functions.FlacDHash(args.head)),
      (FunctionIdentifier("bmp_features"),
        info("bmp_features",
          "bmp_features(payload) - struct(format, width, height, maxval, n_pixels, sum_r, sum_g, sum_b) decoded from uncompressed BMP bytes (BI_RGB 24-bit and 8-bit palette; honest refusal on RLE/bitfields/other DIB headers)"),
        (args: Seq[Expression]) => graft.functions.BmpFeatures(args.head)),
      (FunctionIdentifier("zorder_key"),
        info("zorder_key",
          "zorder_key(a, b) - 64-bit Morton interleave of two longs (multi-column clustering key)"),
        (args: Seq[Expression]) => graft.functions.ZOrderKey(args(0), args(1))),
      (FunctionIdentifier("hyperplane_bucket"),
        info("hyperplane_bucket",
          "hyperplane_bucket(vec, planes, dims[, offset]) - random-hyperplane " +
            "LSH bucket; offset shifts the plane indices (table t of a " +
            "banded index keys on offset t*planes)"),
        (args: Seq[Expression]) => {
          val planes = args(1).eval().asInstanceOf[Int]
          val dims = args(2).eval().asInstanceOf[Int]
          val offset =
            if (args.length > 3) args(3).eval().asInstanceOf[Int] else 0
          HyperplaneBucket(args.head, planes, dims, offset)
        }),
      (FunctionIdentifier("bpe_apply"),
        info("bpe_apply",
          "bpe_apply(word, model_root) - BPE tokens of word under the " +
            "PERSISTED model at model_root (a literal path; resolved at " +
            "plan time through graft.ops.Bpe.loadBpeModel's content-hash/" +
            "family/rank gates, then folded into the plan as the single " +
            "BpeApply reference object — per-word cost independent of " +
            "model size)"),
        (args: Seq[Expression]) => {
          require(args(1).foldable,
            "bpe_apply: model_root must be a literal path — the model is " +
              "resolved once at plan time, never per row")
          val root = args(1).eval() match {
            case null => throw new IllegalArgumentException(
              "bpe_apply: model_root must not be NULL")
            case s => s.toString
          }
          val spark = org.apache.spark.sql.SparkSession.active
          graft.functions.BpeApply(args.head,
            graft.ops.Bpe.loadBpeModel(spark, root)._2
              .map(m => (m.left, m.right)))
        }),
      (FunctionIdentifier("url_canonicalize"),
        info("url_canonicalize",
          "url_canonicalize(url) - RFC 3986 canonical form: scheme/host case-fold, default-port drop, dot-segment resolution, sorted query params, fragment drop; NULL on unparseable input"),
        (args: Seq[Expression]) => graft.functions.UrlCanonicalize(args.head)),
      (FunctionIdentifier("pq_table_sum"),
        info("pq_table_sum",
          "pq_table_sum(codes, table) - sum of table[m][codes[m]] over m (dense-code ADC building block; NaN on out-of-range codes)"),
        (args: Seq[Expression]) =>
          graft.functions.PqTableSum(args(0), args(1))),
      (FunctionIdentifier("pq_adc_score"),
        info("pq_adc_score",
          "pq_adc_score(codes, p, n) - flat-PQ reconstruction-cosine ADC score over the dense code layout"),
        (args: Seq[Expression]) =>
          graft.functions.PqAdcScore(args(0), args(1), args(2))),
      (FunctionIdentifier("argmax_dot"),
        info("argmax_dot",
          "argmax_dot(vec, cands, half_norm, return_index) - cid (or position, with return_index) of the candidate maximizing dot(vec, cent) [- norm2/2 with half_norm]; candidates as array<struct<cid,cent>>, min-cid ties"),
        (args: Seq[Expression]) => {
          val halfNorm = args(2).eval().asInstanceOf[Boolean]
          val returnIndex = args(3).eval().asInstanceOf[Boolean]
          graft.functions.ArgmaxDot(args(0), args(1), halfNorm, returnIndex)
        }))

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    raw.map { case (id, inf, build) =>
      (id, inf, checkArity(id.funcName, arities(id.funcName))(build))
    }

  /** Register the same functions into an already-created session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}

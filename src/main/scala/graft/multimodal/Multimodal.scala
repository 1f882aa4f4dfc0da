package graft.multimodal

import graft.{GraftSession, QueryDef, QueryRegistry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.F — multimodal column plumbing for LLM-data pipelines.
  *
  * Media payloads are opaque `binary` columns + typed metadata, processed
  * per-partition so decode libraries (not present in this container — the
  * decoder below is a clearly-marked deterministic fake) amortize their init
  * across a batch. The Spark-side contract — schema, binary transport,
  * partition-parallel decode, metadata extraction — is real and tested.
  */
object Multimodal extends QueryRegistry {

  /** A media record as a pipeline would carry it: payload + typed metadata. */
  final case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  final case class DecodedMeta(doc_id: Long, width: Int, height: Int, channels: Int)

  /** STUB decoder — stands in for an image library (none in this
    * container). Deterministic fake: "dimensions" derived from payload
    * bytes. A real deployment swaps only this function; the partition-wise
    * plumbing around it is unchanged. */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    val n = payload.length
    (n % 64 + 1, n % 48 + 1, 3)
  }

  /** Partition-parallel decode of a binary media column: the mapPartitions
    * shape lets a real decoder init once per partition (the Scala analogue
    * of `mapInPandas` batch decoding). */
  def decodeMeta(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real decoders would initialize native resources here, once
        it.map { case (id, bytes) =>
          val (w, h, c) = fakeDecode(bytes)
          DecodedMeta(id, w, h, c)
        }
      }
      .toDF()
  }

  /** Build a deterministic binary media column from documents (UTF-8 bytes
    * of the first 64 chars) — the transport shape of a real corpus. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    GraftSession.table(s, dir, "documents")
      .select(col("doc_id"), lit("image/fake").as("media_type"),
        substring(col("text"), 1, 64).cast("binary").as("payload"))

  // --- m_binary_meta: binary payload + metadata extraction, SQL-checkable
  // (byte length, content hash, fake dimensions are all byte-derived).
  def mBinaryMeta(s: SparkSession, dir: String): DataFrame =
    GraftSession.table(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 64).as("head"))
      .select(
        col("doc_id"),
        length(col("head").cast("binary")).cast("long").as("n_bytes"),
        md5(col("head")).as("content_md5"),
        (length(col("head").cast("binary")).cast("long") % 64 + 1).as("fake_width"),
        (length(col("head").cast("binary")).cast("long") % 48 + 1).as("fake_height"))
      .orderBy("doc_id")

  private val mBinaryMetaSql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS n_bytes,
      |  md5(substr(text, 1, 64)) AS content_md5,
      |  CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) % 64 + 1 AS fake_width,
      |  CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) % 48 + 1 AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin

  final case class FramePatch(
      doc_id: Long, frame: Int, patch: Int, feature: Long)

  /** Full media pipeline shape: decode → frame-sample → patchify →
    * feature-extract, as one partition-parallel pass (decoder init amortized
    * per partition). Frame count and features are deterministic functions of
    * the payload bytes (STUB kernels — a real deployment swaps only the
    * kernel bodies; batch shape, schema and partitioning are the real
    * contract). Every frame yields 4 patches. */
  def framePipeline(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val n = bytes.length.toLong
          val frames = (n % 7 + 1).toInt // fake frame-sampler
          for {
            f <- 0 until frames
            p <- 0 until 4
          } yield FramePatch(id, f, p, (n * (f + 1) + 31L * p) % 997L)
        }
      }
      .toDF()
  }

  // --- m_media_pipeline: per-document frame/patch/feature rollup of the
  // pipeline above; the fake kernels are arithmetic on byte length, so the
  // oracle states them in closed SQL form.
  def mMediaPipeline(s: SparkSession, dir: String): DataFrame =
    framePipeline(s, mediaTable(s, dir))
      .groupBy("doc_id")
      .agg(
        (max("frame") + 1).cast("long").as("n_frames"),
        count(lit(1)).as("n_patches"),
        sum("feature").as("feature_sum"))
      .orderBy("doc_id")

  private val mMediaPipelineSql =
    """WITH m AS (SELECT doc_id,
      |    CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS n
      |  FROM documents),
      |f1 AS (SELECT doc_id, n, unnest(generate_series(0, n % 7)) AS f FROM m),
      |fp AS (SELECT doc_id, f, p, (n * (f + 1) + 31 * p) % 997 AS feature
      |  FROM (SELECT doc_id, n, f, unnest(generate_series(0, 3)) AS p FROM f1))
      |SELECT doc_id, CAST(MAX(f) + 1 AS BIGINT) AS n_frames, COUNT(*) AS n_patches,
      |  CAST(SUM(feature) AS BIGINT) AS feature_sum
      |FROM fp GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // --- m_frame_dedup: cross-video duplicate-FRAME detection — the video
  // analogue of document dedup: fingerprint every sampled frame (STUB
  // perceptual hash: content-derived arithmetic standing in for a pHash
  // kernel), group identical fingerprints corpus-wide, keep the lowest
  // doc. At scale this is one map stage + one hash aggregation on the
  // fingerprint — no pairwise comparison.
  def mFrameDedup(s: SparkSession, dir: String): DataFrame = {
    val base = GraftSession.table(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 64).as("head"))
      .select(col("doc_id"),
        length(col("head").cast("binary")).cast("long").as("n"),
        (length(col("head")) -
          length(regexp_replace(col("head"), "[aeiou]", ""))).cast("long").as("v"))
    base
      .select(col("doc_id"), col("v"),
        explode(sequence(lit(0L), col("n") % 7)).as("f"))
      .select(col("doc_id"), ((col("v") * 13 + col("f") * 7) % 101).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_doc"), count(lit(1)).as("n_copies"))
      .orderBy("fp")
  }

  private val mFrameDedupSql =
    """WITH m AS (SELECT doc_id,
      |    CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS n,
      |    CAST(length(substr(text, 1, 64)) -
      |      length(regexp_replace(substr(text, 1, 64), '[aeiou]', '', 'g')) AS BIGINT) AS v
      |  FROM documents),
      |fr AS (SELECT doc_id, (v * 13 + f * 7) % 101 AS fp
      |  FROM (SELECT doc_id, v, unnest(generate_series(0, n % 7)) AS f FROM m))
      |SELECT fp, MIN(doc_id) AS keep_doc, COUNT(*) AS n_copies
      |FROM fr GROUP BY fp ORDER BY fp""".stripMargin

  // --- m_pack_shards: WebDataset-style shard planning — assign media
  // records (in stable doc_id order, per modality: shards never mix
  // modalities) to ~4 KB tar shards by the byte offset each record starts
  // at under continuous concatenation, and emit the shard MANIFEST a
  // dataloader consumes (item count, byte size, doc range). The byte
  // cumsum is a TWO-PASS distributed prefix sum (same shape as
  // TextOps.xPack): window within (media_type, bucket) sub-shards — bucket
  // is a monotone doc_id range — then broadcast-join each bucket's
  // starting offset from the tiny per-bucket totals. Parallelism scales
  // with data volume, not the 3 modalities: a `partitionBy(media_type)`
  // window would push ALL of one modality's bytes through one task's sort
  // at 100 TB. Each shard's contents are then written by exactly one task.
  def mPackShards(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val modality = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
    val m = GraftSession.table(s, dir, "documents").select(
      col("doc_id"), modality.as("media_type"),
      length(substring(col("text"), 1, 64).cast("binary")).cast("long").as("n_bytes"))
      .withColumn("bkt", floor(col("doc_id") / 1024L))
    val wLocal = Window.partitionBy("media_type", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOffset = Window.partitionBy("media_type").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = m.groupBy("media_type", "bkt")
      .agg(sum("n_bytes").as("bkt_bytes"))
      .withColumn("off", coalesce(sum(col("bkt_bytes")).over(wOffset), lit(0L)))
      .select("media_type", "bkt", "off")
    m.withColumn("run_local", sum(col("n_bytes")).over(wLocal))
      .join(broadcast(offsets), Seq("media_type", "bkt"))
      .withColumn("shard_id",
        floor((col("run_local") + col("off") - col("n_bytes")) / 4096L))
      .groupBy("media_type", "shard_id")
      .agg(count(lit(1)).as("n_items"), sum("n_bytes").as("shard_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("media_type", "shard_id")
  }

  private val mPackShardsSql =
    """WITH m AS (SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS n_bytes
      |  FROM documents),
      |r AS (SELECT media_type, doc_id, n_bytes,
      |    (CAST(SUM(n_bytes) OVER (PARTITION BY media_type ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |     - n_bytes) // 4096 AS shard_id
      |  FROM m)
      |SELECT media_type, shard_id, COUNT(*) AS n_items,
      |  CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // --- m_tar_offsets: WebDataset-style random-access index — for every
  // media item, its shard and byte offset within the shard, the manifest a
  // training data-loader uses to seek straight to an item without reading
  // the shard head. Same (media_type, doc_id-bucket) TWO-PASS prefix sum
  // as m_pack_shards (pass 1 windows inside parallel sub-shards, pass 2
  // broadcasts tiny bucket offsets), so building the index for a 100 TB
  // media corpus is one bounded-window pass, never a per-modality
  // single-task sort. Pure integer arithmetic — the oracle states the
  // single-window formulation and hashes exactly.
  def mTarOffsets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val modality = when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video")
    val m = GraftSession.table(s, dir, "documents").select(
      col("doc_id"), modality.as("media_type"),
      length(substring(col("text"), 1, 64).cast("binary")).cast("long").as("n_bytes"))
      .withColumn("bkt", floor(col("doc_id") / 1024L))
    val wLocal = Window.partitionBy("media_type", "bkt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wOffset = Window.partitionBy("media_type").orderBy("bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = m.groupBy("media_type", "bkt")
      .agg(sum("n_bytes").as("bkt_bytes"))
      .withColumn("off", coalesce(sum(col("bkt_bytes")).over(wOffset), lit(0L)))
      .select("media_type", "bkt", "off")
    m.withColumn("run_local", sum(col("n_bytes")).over(wLocal))
      .join(broadcast(offsets), Seq("media_type", "bkt"))
      .withColumn("before", col("run_local") + col("off") - col("n_bytes"))
      .select(col("doc_id"), col("media_type"),
        // integer `div`, not floor(double /): double division is exact only
        // below 2^53 cumulative bytes, which a 100 TB shard stream exceeds
        expr("before div 4096").as("shard_id"),
        (col("before") % 4096L).as("offset_bytes"),
        col("n_bytes"))
      .orderBy("doc_id")
  }

  private val mTarOffsetsSql =
    """WITH m AS (SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image'
      |         WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
      |    CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS n_bytes
      |  FROM documents),
      |r AS (SELECT doc_id, media_type, n_bytes,
      |    CAST(SUM(n_bytes) OVER (PARTITION BY media_type ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |     - n_bytes AS bef
      |  FROM m)
      |SELECT doc_id, media_type, bef // 4096 AS shard_id,
      |  bef % 4096 AS offset_bytes, n_bytes
      |FROM r ORDER BY doc_id""".stripMargin

  // --- m_scene_split: scene segmentation over frame sequences — the video
  // curation step that cuts a clip where consecutive frame fingerprints
  // jump (hamming > threshold), then emits per-scene manifests. Frames are
  // documents role-played as video frames (video = doc_id % 50, frame
  // order = doc_id; fingerprint = md5-derived 64-bit of the frame head,
  // the same cross-engine hash recipe as d_simhash). One window pass per
  // video — lag + running sum of cut flags IS the segmentation — and video
  // count grows with the corpus, so window parallelism scales. The real
  // pHash would slot into the fingerprint expression unchanged.
  def mSceneSplit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hx = md5(substring(col("text"), 1, 32).cast("binary"))
    def hexByte(i: Int) = substring(hx, i, 2)
    val lo = conv(concat(hexByte(23), hexByte(21), hexByte(19), hexByte(17)), 16, 10).cast("long")
    val hi = conv(concat(hexByte(31), hexByte(29), hexByte(27), hexByte(25)), 16, 10).cast("long")
    val frames = GraftSession.table(s, dir, "documents")
      .select((col("doc_id") % 50).as("video_id"), col("doc_id").as("frame_no"),
        shiftleft(hi, 32).bitwiseOR(lo).as("fp"))
    val w = Window.partitionBy("video_id").orderBy("frame_no")
    frames
      .withColumn("prev_fp", lag("fp", 1).over(w))
      .withColumn("cut", when(col("prev_fp").isNull ||
        bit_count(col("fp").bitwiseXOR(col("prev_fp"))) > 40, 1L).otherwise(0L))
      .withColumn("scene_id", sum("cut").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("video_id", "scene_id")
      .agg(count(lit(1)).as("n_frames"),
        min("frame_no").as("first_frame"), max("frame_no").as("last_frame"))
      .orderBy("video_id", "scene_id")
  }

  private val mSceneSplitSql = {
    val h64 = "CAST(md5_number_lower(substr(text, 1, 32))::HUGEINT - CASE WHEN " +
      "md5_number_lower(substr(text, 1, 32)) >= 9223372036854775808 THEN " +
      "18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS BIGINT)"
    s"""WITH f AS (SELECT doc_id % 50 AS video_id, doc_id AS frame_no, $h64 AS fp
       |  FROM documents),
       |l AS (SELECT video_id, frame_no, fp,
       |    lag(fp) OVER (PARTITION BY video_id ORDER BY frame_no) AS prev_fp
       |  FROM f),
       |c AS (SELECT video_id, frame_no,
       |    CASE WHEN prev_fp IS NULL OR bit_count(xor(fp, prev_fp)) > 40
       |      THEN 1 ELSE 0 END AS cut
       |  FROM l),
       |sc AS (SELECT video_id, frame_no,
       |    CAST(SUM(cut) OVER (PARTITION BY video_id ORDER BY frame_no
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS scene_id
       |  FROM c)
       |SELECT video_id, scene_id, COUNT(*) AS n_frames,
       |  MIN(frame_no) AS first_frame, MAX(frame_no) AS last_frame
       |FROM sc GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // --- m_caption_pairs: image-text pair construction (CLIP/LLaVA-style
  // training prep): every media payload joined to its caption document,
  // gated by caption quality (length band + language allowlist), with a
  // deterministic hash-based train/val split — the split must be a pure
  // function of the pair key so re-runs and late-arriving media land in
  // the same split at any scale. The join is keyed 1:1 on doc_id (at
  // scale: co-partitioned or broadcast per the smaller side); everything
  // else is per-row projection, no extra shuffle.
  def mCaptionPairs(s: SparkSession, dir: String): DataFrame = {
    val media = mediaTable(s, dir)
    val captions = GraftSession.table(s, dir, "documents")
      .filter(col("lang").isin("en", "de", "fr", "es") &&
        col("n_chars").between(100, 20000))
      .select(col("doc_id"), col("lang"), col("text"))
    media.join(captions, "doc_id")
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("caption_chars"),
        length(col("payload")).cast("long").as("payload_bytes"),
        md5(concat(col("payload").cast("string"), lit("|"), col("text")))
          .as("pair_md5"),
        when(pmod(col("doc_id") * 2654435761L, lit(100)) < 95, "train")
          .otherwise("val").as("split"))
      .orderBy("doc_id")
  }

  private val mCaptionPairsSql =
    """SELECT doc_id, lang, CAST(length(text) AS BIGINT) AS caption_chars,
      |  CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS payload_bytes,
      |  md5(substr(text, 1, 64) || '|' || text) AS pair_md5,
      |  CASE WHEN (doc_id * 2654435761) % 100 < 95 THEN 'train' ELSE 'val' END AS split
      |FROM documents
      |WHERE lang IN ('en', 'de', 'fr', 'es') AND n_chars BETWEEN 100 AND 20000
      |ORDER BY doc_id""".stripMargin

  // --- m_audio_windows: fixed-duration audio windowing with an energy
  // gate — the VAD / silence-trim shape of an audio curation pass. The
  // "signal" is a STUB (code points of the 64-char payload head stand in
  // for PCM samples; a real deployment swaps only the sample source), but
  // the Spark contract is the real one: per-row window explode (O(duration)
  // rows, no shuffle until the presentation sort), per-window integer
  // energy, and a deterministic voiced flag both engines compute exactly.
  // The energy is 8 explicit codegen'd per-char terms, NOT a
  // split/filter/aggregate HOF chain: the lambda chain is CodegenFallback
  // and allocates per char — the round-9 re-sweep (post count()-fix, which
  // had been eliminating this very expression) measured the HOF version at
  // x39 for 10x data from allocation/GC pressure alone.
  // Cross-engine stability of the stub signal: Spark's ascii() returns the
  // first UTF-8 BYTE (signed — negative on multi-byte chars) while DuckDB's
  // returns the Unicode code point, so energy only sums chars in the
  // printable-ASCII band [' ', '~'], where the two agree exactly — on any
  // corpus, not just ASCII testdata. The empty-head edge is filtered out
  // explicitly (Spark's sequence(0, -1) would emit [0, -1] where the
  // oracle's w*8 < length(head) emits nothing).
  def mAudioWindows(s: SparkSession, dir: String): DataFrame =
    GraftSession.table(s, dir, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 64).as("head"))
      .filter(length(col("head")) > 0)
      .select(col("doc_id"), col("head"),
        explode(expr("sequence(0, cast(ceil(length(head) / 8.0) as int) - 1)")).as("w"))
      .select(col("doc_id"), col("w").cast("long").as("w"),
        (0 until 8).map(j =>
            expr(s"CAST(CASE WHEN substring(head, w * 8 + ${j + 1}, 1) " +
              s"BETWEEN ' ' AND '~' " +
              s"THEN ascii(substring(head, w * 8 + ${j + 1}, 1)) " +
              "ELSE 0 END AS BIGINT)"))
          .reduce(_ + _).as("energy"))
      .withColumn("voiced", col("energy") > 400L)
      .orderBy("doc_id", "w")

  private val mAudioWindowsSql =
    """SELECT doc_id, w, energy, energy > 400 AS voiced FROM (
      |  SELECT doc_id, CAST(w AS BIGINT) AS w,
      |    CAST(COALESCE(list_sum(list_transform(
      |      list_filter(string_split(substr(head, w * 8 + 1, 8), ''),
      |        c -> c >= ' ' AND c <= '~'),
      |      c -> ascii(c))), 0) AS BIGINT) AS energy
      |  FROM (SELECT doc_id, substr(text, 1, 64) AS head FROM documents),
      |    (SELECT unnest(range(0, 8)) AS w)
      |  WHERE w * 8 < length(head))
      |ORDER BY doc_id, w""".stripMargin

  // --- m_modality_mix: per-(modality, language) corpus composition —
  // docs, payload bytes, and each cell's share of total bytes: the
  // balance report a multimodal mixture plan starts from (the c_mixture
  // family's modality-aware sibling). Modality is the deterministic
  // doc_id % 3 role-play used across this family; the aggregate is one
  // map-side-combinable hash agg with |modalities|·|langs| output and a
  // 1-row broadcast total — O(1) output at any corpus size.
  def mModalityMix(s: SparkSession, dir: String): DataFrame = {
    val m = GraftSession.table(s, dir, "documents")
      .select(
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("modality"),
        col("lang"),
        length(substring(col("text"), 1, 64).cast("binary")).cast("long").as("b"))
    val per = m.groupBy("modality", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("b").as("n_bytes"))
    val tot = per.agg(sum("n_bytes").cast("double").as("total_bytes"))
    per.crossJoin(broadcast(tot))
      .select(col("modality"), col("lang"), col("n_docs"), col("n_bytes"),
        round(col("n_bytes").cast("double") / col("total_bytes"), 6).as("byte_share"))
      .orderBy("modality", "lang")
  }

  private val mModalityMixSql =
    """WITH m AS (SELECT
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |    lang, CAST(octet_length(encode(substr(text, 1, 64))) AS BIGINT) AS b
      |  FROM documents),
      |p AS (SELECT modality, lang, COUNT(*) AS n_docs, CAST(SUM(b) AS BIGINT) AS n_bytes
      |  FROM m GROUP BY 1, 2),
      |t AS (SELECT CAST(SUM(n_bytes) AS DOUBLE) AS total_bytes FROM p)
      |SELECT modality, lang, n_docs, n_bytes,
      |  round(CAST(n_bytes AS DOUBLE) / total_bytes, 6) AS byte_share
      |FROM p, t ORDER BY modality, lang""".stripMargin

  // --- m_phash_dedup: perceptual-hash NEAR-duplicate detection over the
  // binary media column — the Hamming-distance analogue of m_frame_dedup's
  // exact fingerprint grouping (the aHash family: per-cell "luma"
  // thresholded against the payload-wide mean, packed into a 64-bit
  // signature). The STUB luma kernel is position-salted byte arithmetic
  // standing in for a real decode+downscale — a deployment swaps only the
  // kernel; the signature packing, banding and verify are unchanged.
  // Pairs within Hamming distance 3 are found by the Manku 6-block /
  // choose-3 pigeonhole ([[graft.dedup.HammingBlocks]]: exhaustive for
  // hd<=3, candidate keys carry ~32 signature bits so accidental
  // collisions scale as ~20*n^2/2^32, not n^2/2^16 — the d_simhash
  // contract). Scale shape: one map stage for signatures, a single-column
  // equi-join on the packed combo key for candidates, integer bit_count
  // verify — no pairwise scan outside shared-key buckets. The oracle
  // states the same pair semantics via the equivalent-output 4x16 banding
  // (cheapest exhaustive form at oracle scale).
  def mPhashDedup(s: SparkSession, dir: String): DataFrame = {
    val base = GraftSession.table(s, dir, "documents")
      .select(col("doc_id"), rpad(substring(col("text"), 1, 64), 64, " ").as("head"))
    // STUB luma kernel: cell i's brightness = (code(char_i) * (2i-1)) % 251.
    // The position salt decorrelates cells of unrelated payloads; identical
    // payload prefixes still yield identical lumas, so near-identical
    // payloads land within the Hamming threshold.
    val lumas = (1 to 64).map(i =>
      (ascii(substring(col("head"), i, 1)) * lit(2 * i - 1)) % 251)
    val withL = base.select(
      col("doc_id") +: lumas.zipWithIndex.map { case (c, i) => c.as(s"l$i") }: _*)
    val tot = (0 until 64).map(i => col(s"l$i")).reduce(_ + _)
    // bit i = 1 iff 64*luma_i > sum(lumas): the mean threshold stated in
    // integer-exact form (no division — bit-identical in both engines)
    def bit(i: Int) = when(col(s"l$i") * 64 > col("tot"), 1).otherwise(0)
    val bands = (0 until 4).map(c =>
      (0 until 16).map(j => bit(c * 16 + j) * lit(1 << j)).reduce(_ + _).as(s"band$c"))
    // pack the four 16-bit bands into ONE 64-bit signature (bit 63 via the
    // long shift is Long's sign bit — harmless: only xor/bit_count touch it)
    val sh = (0 until 4).map(c => shiftleft(col(s"band$c").cast("long"), c * 16))
      .reduce(_.bitwiseOR(_))
    val sigs = withL.withColumn("tot", tot)
      .select(col("doc_id") +: bands: _*)
      .select(col("doc_id"), sh.as("sh"))
    // cached: two self-join sides of a 64-bit-wide bit-packing projection
    // would otherwise duplicate a very wide codegen stage (d_simhash's rule)
    val chunks = sigs
      .select(col("doc_id"), col("sh"),
        explode(graft.dedup.HammingBlocks.comboKeys(col("sh"))).as("ck"))
      .cache()
    val pairs = chunks.select(col("doc_id").as("da"), col("sh").as("sha"), col("ck"))
      .join(chunks.select(col("doc_id").as("db"), col("sh").as("shb"), col("ck")),
        Seq("ck"))
      .filter(col("da") < col("db"))
      .select("da", "db", "sha", "shb").distinct()
      .withColumn("hd", bit_count(col("sha").bitwiseXOR(col("shb"))).cast("long"))
      .filter(col("hd") <= 3)
    pairs.select(col("da").as("doc_a"), col("db").as("doc_b"), col("hd"))
      .orderBy("doc_a", "doc_b")
  }

  /** pHash oracle, generated: DuckDB recomputes the identical salted lumas
    * (`unicode` == Spark `ascii` on this ASCII corpus), the integer mean
    * threshold, the four 16-bit bands, the pigeonhole self-join and the
    * bit_count Hamming verify. */
  private val mPhashDedupSql: String = {
    val lumaDefs = (1 to 64).map(i =>
      s"(unicode(substr(head, $i, 1)) * ${2 * i - 1}) % 251 AS l${i - 1}")
      .mkString(", ")
    val totExpr = (0 until 64).map(i => s"l$i").mkString(" + ")
    def bandExpr(c: Int) = (0 until 16).map { j =>
      s"CASE WHEN l${c * 16 + j} * 64 > tot THEN ${1 << j} ELSE 0 END"
    }.mkString(" + ")
    val bandDefs = (0 until 4).map(c => s"${bandExpr(c)} AS band$c").mkString(", ")
    val hdExpr = "bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) " +
      "+ bit_count(xor(a2, b2)) + bit_count(xor(a3, b3))"
    s"""WITH d AS (SELECT doc_id, rpad(substr(text, 1, 64), 64, ' ') AS head
       |  FROM documents),
       |l AS (SELECT doc_id, $lumaDefs FROM d),
       |t AS (SELECT *, $totExpr AS tot FROM l),
       |s AS (SELECT doc_id, $bandDefs FROM t),
       |c AS (SELECT doc_id, band0, band1, band2, band3, unnest([0, 1, 2, 3]) AS ci
       |  FROM s),
       |cx AS (SELECT doc_id, band0, band1, band2, band3, ci,
       |    CASE ci WHEN 0 THEN band0 WHEN 1 THEN band1 WHEN 2 THEN band2
       |      ELSE band3 END AS cv
       |  FROM c),
       |p AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db,
       |    a.band0 AS a0, a.band1 AS a1, a.band2 AS a2, a.band3 AS a3,
       |    b.band0 AS b0, b.band1 AS b1, b.band2 AS b2, b.band3 AS b3
       |  FROM cx a JOIN cx b ON a.ci = b.ci AND a.cv = b.cv AND a.doc_id < b.doc_id)
       |SELECT da AS doc_a, db AS doc_b, CAST($hdExpr AS BIGINT) AS hd
       |FROM p WHERE $hdExpr <= 3 ORDER BY 1, 2""".stripMargin
  }

  // --- m_channel_stats: dataset normalization constants — the per-modality
  // (n, Σx, Σx²) moments a training pipeline computes ONCE over the corpus
  // to fix its normalize(mean, std) transform. The per-row kernel is the
  // codegen'd byte_sum/byte_sumsq expression pair over the binary payload
  // (a HOF chain here would be CodegenFallback and allocate per row — the
  // m_audio_windows lesson); the shuffle carries one 4-long row per
  // modality. Moments stay exact BIGINTs end-to-end; only the final
  // presentation mean divides. The oracle states the same moments per
  // character codepoint — identical to bytes only while every payload is
  // ASCII (the UTF-8 ⊇ ASCII identity). That invariant is CHECKED, not
  // assumed: the assert_true filter below fails the job on the first
  // non-ASCII prefix (char count ≠ byte count) instead of silently
  // drifting from the oracle's per-codepoint moments.
  def mChannelStats(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    GraftSession.table(s, dir, "documents")
      .select(
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("modality"),
        substring(col("text"), 1, 64).as("prefix"))
      // assert_true yields NULL on pass (isNull keeps every row) and
      // THROWS on a non-ASCII prefix; as a filter it cannot be pruned
      .where(assert_true(
        length(col("prefix")) === octet_length(col("prefix")),
        lit("m_channel_stats: non-ASCII payload — byte moments no longer " +
          "equal the oracle's codepoint moments")).isNull)
      .select(col("modality"), col("prefix").cast("binary").as("payload"))
      .select(col("modality"),
        length(col("payload")).cast("long").as("n"),
        expr("byte_sum(payload)").as("s1"),
        expr("byte_sumsq(payload)").as("s2"))
      .groupBy("modality")
      .agg(count(lit(1)).as("n_media"),
        sum("n").as("n_samples"),
        sum("s1").as("sum_val"),
        sum("s2").as("sum_sq"))
      .select(col("modality"), col("n_media"), col("n_samples"),
        col("sum_val"), col("sum_sq"),
        round(col("sum_val").cast("double") / col("n_samples").cast("double"), 6)
          .as("mean_val"))
      .orderBy("modality")
  }

  private val mChannelStatsSql =
    """WITH m AS (SELECT
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |    substr(text, 1, 64) AS p
      |  FROM documents),
      |b AS (SELECT modality, CAST(length(p) AS BIGINT) AS n,
      |    CASE WHEN p = '' THEN 0
      |         ELSE CAST(list_sum(list_transform(string_split(p, ''), x -> unicode(x))) AS BIGINT) END AS s1,
      |    CASE WHEN p = '' THEN 0
      |         ELSE CAST(list_sum(list_transform(string_split(p, ''), x -> unicode(x) * unicode(x))) AS BIGINT) END AS s2
      |  FROM m)
      |SELECT modality, COUNT(*) AS n_media, CAST(SUM(n) AS BIGINT) AS n_samples,
      |  CAST(SUM(s1) AS BIGINT) AS sum_val, CAST(SUM(s2) AS BIGINT) AS sum_sq,
      |  round(CAST(SUM(s1) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) AS mean_val
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  override val all: Seq[QueryDef] = Seq(
    QueryDef("m_channel_stats", mChannelStats, Some(mChannelStatsSql)),
    QueryDef("m_modality_mix", mModalityMix, Some(mModalityMixSql)),
    QueryDef("m_audio_windows", mAudioWindows, Some(mAudioWindowsSql)),
    QueryDef("m_caption_pairs", mCaptionPairs, Some(mCaptionPairsSql)),
    QueryDef("m_scene_split", mSceneSplit, Some(mSceneSplitSql)),
    QueryDef("m_binary_meta", mBinaryMeta, Some(mBinaryMetaSql)),
    QueryDef("m_media_pipeline", mMediaPipeline, Some(mMediaPipelineSql)),
    QueryDef("m_frame_dedup", mFrameDedup, Some(mFrameDedupSql)),
    QueryDef("m_phash_dedup", mPhashDedup, Some(mPhashDedupSql)),
    QueryDef("m_pack_shards", mPackShards, Some(mPackShardsSql)),
    QueryDef("m_tar_offsets", mTarOffsets, Some(mTarOffsetsSql)))
}

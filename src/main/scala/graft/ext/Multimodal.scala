package graft.ext

import graft.{Query, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * as opaque BINARY columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The actual codecs (JPEG decode, audio resample, video frame-grab)
  * are NOT in this container, so the decode kernels are STUBBED with
  * deterministic fakes — clearly marked below — while everything
  * Spark-side is real and tested: the schema shape, the binary column
  * flow, the `mapPartitions` batch execution (the JVM twin of
  * `mapInPandas`: one iterator per partition so a real codec would
  * amortize model/codec init per batch, not per row), partitioning, and
  * the feature-vector hand-off into the similarity operators.
  */
object Multimodal {

  final case class Asset(asset_id: Long, modality: String, content: Array[Byte])
  final case class ImageFeatures(asset_id: Long, width: Int, height: Int,
      channels: Int, features: Array[Float])
  final case class FrameSample(asset_id: Long, frame_index: Int,
      frame_bytes: Array[Byte])

  /** Deterministic synthetic assets derived from the documents table —
    * stand-ins for real blobs so the pipeline is runnable anywhere. */
  def syntheticAssets(docs: DataFrame): Dataset[Asset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val modality = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      Asset(id, modality, text.getBytes("UTF-8"))
    }
  }

  // ======================================================= STUB KERNELS
  // STUB: a real implementation decodes the codec (e.g. via TwelveMonkeys
  // / javacv); this deterministic fake derives plausible values from the
  // bytes so shapes, determinism, and plumbing are testable.
  private def stubDecodeImage(content: Array[Byte]): (Int, Int, Int) = {
    val h = java.util.Arrays.hashCode(content)
    (64 + math.abs(h % 512), 64 + math.abs((h / 512) % 512), 3)
  }

  // STUB: stands in for an embedding model; real path would batch-invoke
  // an ONNX/JNI session per partition.
  private def stubFeatures(content: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    Array.tabulate(dim) { i =>
      val d = md.digest(content ++ Array(i.toByte))
      (java.nio.ByteBuffer.wrap(d, 0, 4).getInt.toFloat / Int.MaxValue)
    }
  }
  // =====================================================================

  /** Batched image decode + feature extraction: one iterator per
    * partition (codec/model init amortizes across the batch, exactly the
    * `mapInPandas` batch shape). */
  def decodeAndFeaturize(assets: Dataset[Asset], dim: Int = 16): Dataset[ImageFeatures] = {
    implicit val enc = Encoders.product[ImageFeatures]
    assets.mapPartitions { batch =>
      // per-partition (NOT per-row) setup would open the codec here
      batch.map { a =>
        val (w, h, c) = stubDecodeImage(a.content)
        ImageFeatures(a.asset_id, w, h, c, stubFeatures(a.content, dim))
      }
    }
  }

  /** Resize: scale the decoded dimensions and downsample the payload.
    * STUB: a real implementation invokes the codec's scaler; this keeps
    * every `step`-th byte — deterministic, shape-correct, and preserves
    * the metadata contract (target dims recorded, aspect policy
    * explicit). */
  def resize(feats: Dataset[ImageFeatures], assets: Dataset[Asset],
      targetW: Int, targetH: Int): Dataset[ImageFeatures] = {
    val spark = feats.sparkSession
    import spark.implicits._
    feats.joinWith(assets, feats("asset_id") === assets("asset_id"))
      .mapPartitions { batch =>
        batch.map { case (f, a) =>
          val step = math.max(1, (f.width.toLong * f.height /
            (targetW.toLong * targetH)).toInt)
          val down = a.content.grouped(step).map(_.head).toArray // STUB scaler
          ImageFeatures(f.asset_id, targetW, targetH, f.channels,
            stubFeatures(down, f.features.length))
        }
      }
  }

  /** Frame sampling for video assets: emit every `stride`-th frame
    * (STUB frames = byte slices; a real codec seeks keyframes). */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 8,
      maxFrames: Int = 4): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    assets.filter(_.modality == "video").flatMap { a =>
      val nFrames = math.max(1, a.content.length / stride)
      (0 until math.min(maxFrames, nFrames)).map { i =>
        val from = i * stride
        FrameSample(a.asset_id, i,
          a.content.slice(from, math.min(from + stride, a.content.length)))
      }
    }
  }

  def queries: Seq[Query] = Seq(
    // ---------------------------------------------------------------- q40
    Query(
      "q40_multimodal_meta",
      (s, d) => {
        val assets = syntheticAssets(Tables.documents(s, d)).toDF()
        assets.select(col("asset_id"), col("modality"),
          octet_length(col("content")).cast("long").as("n_bytes"),
          md5(col("content")).as("fingerprint"))
          .orderBy(col("asset_id"))
      },
      Some("""
        SELECT doc_id AS asset_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS modality,
          CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
          MD5(text) AS fingerprint
        FROM documents ORDER BY asset_id"""),
      "typed metadata over opaque binary assets (octet length + content fingerprint)"),

    // ---------------------------------------------------------------- q41
    // Oracle-checked since r3: the projected columns derive from the
    // stub decoder's `java.util.Arrays.hashCode` over the UTF-8 bytes
    // (h=1; h=31*h+b with 32-bit wrap), which DuckDB reproduces as a
    // `list_reduce` fold over the ASCII codepoints — plus Java's
    // truncating (not flooring) integer division for the height term.
    // The float feature VALUES stay spec-pinned (MultimodalSpec
    // determinism test); this oracle pins the decode metadata exactly.
    Query(
      "q41_image_features",
      (s, d) => {
        val feats = decodeAndFeaturize(syntheticAssets(Tables.documents(s, d)))
        feats.toDF().select(col("asset_id"), col("width"), col("height"),
          col("channels"), size(col("features")).as("dim"))
          .orderBy(col("asset_id"))
      },
      Some("""
        WITH fold AS (
          SELECT doc_id AS asset_id,
            list_reduce(list_prepend(CAST(1 AS BIGINT),
              [CAST(unicode(text[i]) AS BIGINT)
               FOR i IN range(1, LENGTH(text) + 1)]),
              (h, b) -> (31 * h + b) % 4294967296) AS hu
          FROM documents),
        sh AS (
          SELECT asset_id,
            CASE WHEN hu >= 2147483648 THEN hu - 4294967296 ELSE hu END AS h
          FROM fold)
        SELECT asset_id,
          CAST(64 + ABS(h % 512) AS INT) AS width,
          CAST(64 + ABS((CASE WHEN h < 0 THEN -((-h) // 512)
                              ELSE h // 512 END) % 512) AS INT) AS height,
          CAST(3 AS INT) AS channels,
          CAST(16 AS INT) AS dim
        FROM sh ORDER BY asset_id"""),
      "batched binary decode + feature extraction via mapPartitions (stubbed codec, real plumbing)"),

    // ---------------------------------------------------------------- q79
    // Frame sampling IS oracle-checkable: the stub "decoder" slices the
    // binary payload deterministically, and the corpus text is pure
    // ASCII, so DuckDB's 1-based VARCHAR slice reproduces the byte
    // slices exactly (LENGTH == OCTET_LENGTH) and md5 agrees.
    Query(
      "q79_frame_sample",
      (s, d) => {
        val frames = sampleFrames(
          syntheticAssets(Tables.documents(s, d)), stride = 8, maxFrames = 4)
        frames.toDF().select(col("asset_id"),
          col("frame_index").cast("long").as("frame_index"),
          octet_length(col("frame_bytes")).cast("long").as("n_bytes"),
          md5(col("frame_bytes")).as("fingerprint"))
          .orderBy(col("asset_id"), col("frame_index"))
      },
      Some("""
        WITH v AS (
          SELECT doc_id AS asset_id, text AS t FROM documents
          WHERE doc_id % 3 = 2),
        f AS (
          SELECT asset_id, t,
            UNNEST(range(0, LEAST(4, GREATEST(1, LENGTH(t) // 8)))) AS fi
          FROM v)
        SELECT asset_id, CAST(fi AS BIGINT) AS frame_index,
          CAST(LENGTH(t[fi*8+1 : LEAST(fi*8+8, LENGTH(t))]) AS BIGINT) AS n_bytes,
          MD5(t[fi*8+1 : LEAST(fi*8+8, LENGTH(t))]) AS fingerprint
        FROM f ORDER BY asset_id, frame_index"""),
      "video frame sampling (every 8th-byte stub frame, max 4) with per-frame fingerprints"),

    // --------------------------------------------------------------- q149
    // Perceptual average-hash (aHash) over the image assets: the
    // "decode + resize to 8x8" step is stubbed as a deterministic
    // 64-point downsample of the payload bytes (position i reads byte
    // 1 + floor(i*len/64) — a real thumbnail for a byte stream), then
    // the REAL perceptual-hash algebra runs as narrow columnar
    // expressions: bit_i = pixel_i*64 > sum(pixels) (strict integer
    // compare, no float mean), packed into four 16-bit bands so the
    // full 64-bit hash never touches the int64 sign bit. Near-identical
    // payloads get near-identical hashes — the property q150's
    // Hamming join exploits. Per-row bounded-array HOFs: no shuffle,
    // no UDF; the whole hash is one projection over the scan.
    Query(
      "q149_phash_bands",
      (s, d) => {
        cachedPhashBands(s, d)
          .withColumn("popcnt", expr(
            "cast(bit_count(band0) + bit_count(band1) + bit_count(band2) + bit_count(band3) as int)"))
          .select(col("asset_id"), col("band0"), col("band1"),
            col("band2"), col("band3"), col("popcnt"))
          .orderBy(col("asset_id"))
      },
      Some(s"""
        $phashSqlCtes
        SELECT asset_id, band0, band1, band2, band3,
          CAST(bit_count(band0) + bit_count(band1) + bit_count(band2)
               + bit_count(band3) AS INT) AS popcnt
        FROM bands ORDER BY asset_id"""),
      "perceptual average-hash: stub 64-point thumbnail, real integer hash algebra in 4 16-bit bands"),

    // --------------------------------------------------------------- q150
    // Perceptual near-duplicate image pairs via BANDED Hamming join:
    // candidates are pairs sharing at least one of the four 16-bit
    // hash bands (pigeonhole: every pair with Hamming distance <= 3
    // is guaranteed caught; 4..16 is LSH-style best-effort recall),
    // verified with the exact popcount distance and kept at <= 16.
    // The scale shape is the image-dedup standard: the join key is
    // (band_index, band_value) — corpus-linear candidate generation,
    // never an all-pairs cosine/hamming matrix; the exact distance
    // runs on candidates only.
    Query(
      "q150_phash_neardup",
      (s, d) => {
        val bands = cachedPhashBands(s, d)
        val long = bands.select(col("asset_id"),
          posexplode(array(col("band0"), col("band1"), col("band2"),
            col("band3"))).as(Seq("b", "v")))
        val cand = long.as("x").join(long.as("y"),
            col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
              col("x.asset_id") < col("y.asset_id"))
          .select(col("x.asset_id").as("asset_a"),
            col("y.asset_id").as("asset_b"))
          .distinct()
        cand
          .join(bands.as("ha"), col("asset_a") === col("ha.asset_id"))
          .join(bands.as("hb"), col("asset_b") === col("hb.asset_id"))
          .withColumn("hamming", expr(
            """cast(bit_count(ha.band0 ^ hb.band0) + bit_count(ha.band1 ^ hb.band1)
               + bit_count(ha.band2 ^ hb.band2) + bit_count(ha.band3 ^ hb.band3) as int)"""))
          .filter(col("hamming") <= 16)
          .select(col("asset_a"), col("asset_b"), col("hamming"))
          .orderBy(col("asset_a"), col("asset_b"))
      },
      Some(s"""
        $phashSqlCtes,
        long AS (
          SELECT asset_id, UNNEST([0, 1, 2, 3]) AS b,
            UNNEST([band0, band1, band2, band3]) AS v
          FROM bands),
        cand AS (
          SELECT DISTINCT x.asset_id AS asset_a, y.asset_id AS asset_b
          FROM long x JOIN long y
            ON x.b = y.b AND x.v = y.v AND x.asset_id < y.asset_id)
        SELECT asset_a, asset_b,
          CAST(bit_count(xor(ha.band0, hb.band0)) + bit_count(xor(ha.band1, hb.band1))
               + bit_count(xor(ha.band2, hb.band2)) + bit_count(xor(ha.band3, hb.band3))
               AS INT) AS hamming
        FROM cand
        JOIN bands ha ON asset_a = ha.asset_id
        JOIN bands hb ON asset_b = hb.asset_id
        WHERE bit_count(xor(ha.band0, hb.band0)) + bit_count(xor(ha.band1, hb.band1))
              + bit_count(xor(ha.band2, hb.band2)) + bit_count(xor(ha.band3, hb.band3)) <= 16
        ORDER BY asset_a, asset_b"""),
      "banded Hamming near-dup join over perceptual hashes: (band, value) candidates, exact popcount verify"),

    // --------------------------------------------------------------- q153
    // Audio feature extraction over the audio-modality assets — the
    // missing third modality (images: q41/q149, video: q79). The PCM
    // "decode" is STUBBED deterministically (sample_p = (byte_p*131 +
    // p*17) mod 256 - 128 — a synthetic signed-8-bit waveform with sign
    // structure), while the signal algebra on top is real and exact:
    // 64-sample framing, per-frame energy Σs², zero-crossing counting
    // via one lag window over (asset, position), peak amplitude, an
    // all-integer mean-square (energy·1e6 div n — exact in both
    // engines, no float RMS), and loudest-frame selection (max energy,
    // ties to the earliest frame — the snippet a real pipeline would
    // cut). Scale shape: samples explode corpus-linearly and aggregate
    // in two narrow integer groupBys; the only sort is the per-asset
    // lag window, which is how sample-adjacent analysis must
    // distribute anyway. Overflow bound: energy·1e6 ≤ n·1.6e10 stays
    // in int64 below ~5e8 samples per asset.
    Query(
      "q153_audio_features",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val samp = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 1)
          .select(col("doc_id").as("asset_id"),
            expr("cast(text as binary)").as("tb"),
            length(col("text")).cast("long").as("n"))
          // binary substring: O(1) byte reads (the q149 lesson); the
          // HOF is interpreted but referenced exactly once per row
          .select(col("asset_id"), posexplode(expr(
            """transform(sequence(cast(0 as bigint), n - 1),
               i -> (ascii(cast(substring(tb, cast(i + 1 as int), 1) as string)) * 131
                     + i * 17) % 256 - 128)""")).as(Seq("p", "s")))
          .select(col("asset_id"), col("p").cast("long").as("p"), col("s"))
        val w = Window.partitionBy(col("asset_id")).orderBy(col("p"))
        val fr = samp
          .withColumn("prev_s", lag(col("s"), 1).over(w))
          .withColumn("zx",
            when(col("prev_s").isNull, lit(0L))
              .when((col("s") >= 0) =!= (col("prev_s") >= 0), lit(1L))
              .otherwise(lit(0L)))
          .groupBy(col("asset_id"), (col("p") / 64).cast("long").as("frame"))
          .agg(count(lit(1)).as("nf"), sum(col("s") * col("s")).as("energy"),
            sum(col("zx")).as("zc"), max(abs(col("s"))).as("pk"))
        val ag = fr.groupBy(col("asset_id"))
          .agg(sum(col("nf")).as("n_samples"),
            count(lit(1)).as("n_frames"),
            sum(col("zc")).as("zero_crossings"),
            sum(col("energy")).as("total_energy"),
            max(col("pk")).cast("int").as("peak_amp"))
        val loud = fr.groupBy(col("asset_id")).agg(max(col("energy")).as("me"))
          .join(fr, Seq("asset_id"))
          .filter(col("energy") === col("me"))
          .groupBy(col("asset_id")).agg(min(col("frame")).as("loudest_frame"))
        ag.join(loud, Seq("asset_id"))
          .select(col("asset_id"), col("n_samples"), col("n_frames"),
            col("zero_crossings"), col("total_energy"), col("peak_amp"),
            expr("total_energy * 1000000 div n_samples").as("mean_square_micro"),
            col("loudest_frame"))
          .orderBy(col("asset_id"))
      },
      Some("""
        WITH a AS (
          SELECT doc_id AS asset_id, text FROM documents WHERE doc_id % 3 = 1),
        sm AS (
          SELECT asset_id,
            unnest(range(0, LENGTH(text))) AS p,
            unnest([(unicode(text[CAST(i + 1 AS INT)]) * 131 + i * 17) % 256 - 128
                    FOR i IN range(0, LENGTH(text))]) AS s
          FROM a),
        x AS (
          SELECT asset_id, p, s, p // 64 AS frame,
            CASE WHEN lag(s) OVER (PARTITION BY asset_id ORDER BY p) IS NULL THEN 0
                 WHEN (s >= 0) != (lag(s) OVER (PARTITION BY asset_id ORDER BY p) >= 0) THEN 1
                 ELSE 0 END AS zx
          FROM sm),
        fr AS (
          SELECT asset_id, frame, COUNT(*) AS nf, SUM(s * s) AS energy,
                 SUM(zx) AS zc, MAX(ABS(s)) AS pk
          FROM x GROUP BY asset_id, frame),
        mx AS (SELECT asset_id, MAX(energy) AS me FROM fr GROUP BY asset_id),
        ld AS (
          SELECT fr.asset_id, MIN(frame) AS loudest_frame
          FROM fr JOIN mx USING (asset_id) WHERE energy = me
          GROUP BY fr.asset_id),
        ag AS (
          SELECT asset_id,
            CAST(SUM(nf) AS BIGINT) AS n_samples,
            CAST(COUNT(*) AS BIGINT) AS n_frames,
            CAST(SUM(zc) AS BIGINT) AS zero_crossings,
            CAST(SUM(energy) AS BIGINT) AS total_energy,
            CAST(MAX(pk) AS INT) AS peak_amp
          FROM fr GROUP BY asset_id)
        SELECT ag.asset_id, n_samples, n_frames, zero_crossings, total_energy,
          peak_amp,
          CAST(total_energy * 1000000 // n_samples AS BIGINT) AS mean_square_micro,
          CAST(loudest_frame AS BIGINT) AS loudest_frame
        FROM ag JOIN ld ON ag.asset_id = ld.asset_id
        ORDER BY ag.asset_id"""),
      "audio features over stub PCM: framed energy, zero crossings, peak, integer mean-square, loudest frame"))

  /** The aHash band table shared by q149/q150: image-modality assets
    * (doc_id % 3 == 0, matching [[syntheticAssets]]) hashed to four
    * 16-bit integer bands. Pure ASCII payloads make the byte reads
    * reproducible as DuckDB VARCHAR indexing.
    *
    * Two shape decisions matter here, found the hard way (first cut
    * burned 400+ s of one core at sf0.1):
    *  - the thumbnail reads bytes through a BINARY substring, not a
    *    string one — `UTF8String.substring` walks UTF-8 boundaries so
    *    each of the 64 reads is O(position); the binary slice is O(1).
    *  - `repartition(asset_id)` between building (px, tot) and
    *    extracting the bands is a materialization barrier, not just a
    *    parallelism spreader: without it CollapseProject inlines the
    *    whole 64-element `px` transform into every one of the 64
    *    `element_at` references below (HOFs are interpreted, with no
    *    common-subexpression elimination), multiplying the work ~64×.
    *    The exchange pays one tiny shuffle (rows of id + 64 longs) to
    *    evaluate `px`/`tot` exactly once, and spreads the hash work
    *    across tasks — the scan itself is one small file = one task.
    *    In q150 the four self-references to this frame share the
    *    identical exchange subtree, so ReuseExchange computes it once. */
  private def phashBands(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("asset_id"),
        expr("cast(text as binary)").as("tb"),
        length(col("text")).cast("long").as("n"))
      .select(col("asset_id"), expr(
        """transform(sequence(0, 63),
           i -> cast(ascii(cast(substring(tb, cast(1 + (cast(i as bigint) * n) div 64 as int), 1) as string)) as bigint))""")
        .as("px"))
      .withColumn("tot", expr("aggregate(px, cast(0 as bigint), (a, x) -> a + x)"))
      .repartition(col("asset_id"))
      .select(col("asset_id"), bandExpr(0).as("band0"), bandExpr(1).as("band1"),
        bandExpr(2).as("band2"), bandExpr(3).as("band3"))

  private def bandExpr(b: Int) = expr(
    s"""aggregate(transform(sequence(0, 15),
        j -> case when element_at(px, cast(j + 1 + ${16 * b} as int)) * 64 > tot
             then shiftleft(cast(1 as bigint), j) else cast(0 as bigint) end),
        cast(0 as bigint), (a, x) -> a + x)""")

  /** One cached band table per session, keyed by sf dir (the q35
    * shingle-cache pattern): q150 references the frame four times
    * (two explode branches + two verify joins), and without a cache
    * each broadcast build re-executes the interpreted-HOF hash stage —
    * measured 20 s vs ~2 s at sf0.1. Five longs per image asset,
    * MEMORY_AND_DISK so it spills, not OOMs; a new dir evicts the old
    * entry. */
  private val bandCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, (String, DataFrame)]()
  private def cachedPhashBands(s: SparkSession, d: String): DataFrame =
    bandCache.compute(s, (_, prev) => prev match {
      case (`d`, df) => (d, df)
      case other =>
        if (other != null) other._2.unpersist()
        (d, phashBands(Tables.documents(s, d))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    })._2

  /** DuckDB twin of [[phashBands]] (shared CTE prefix for q149/q150). */
  private val phashSqlCtes = """
        WITH img AS (
          SELECT doc_id AS asset_id, text, CAST(LENGTH(text) AS BIGINT) AS n
          FROM documents WHERE doc_id % 3 = 0),
        pxt AS (
          SELECT asset_id,
            [CAST(unicode(text[CAST(1 + (i * n) // 64 AS INT)]) AS BIGINT)
             FOR i IN range(0, 64)] AS px
          FROM img),
        btt AS (
          SELECT asset_id, px, CAST(list_sum(px) AS BIGINT) AS tot FROM pxt),
        bits AS (
          SELECT asset_id,
            list_transform(px, x -> CASE WHEN x * 64 > tot
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bits
          FROM btt),
        bands AS (
          SELECT asset_id,
            CAST(list_sum(list_transform(range(0, 16),
              j -> bits[CAST(j + 1 AS INT)] * (CAST(1 AS BIGINT) << CAST(j AS INT)))) AS BIGINT) AS band0,
            CAST(list_sum(list_transform(range(0, 16),
              j -> bits[CAST(j + 17 AS INT)] * (CAST(1 AS BIGINT) << CAST(j AS INT)))) AS BIGINT) AS band1,
            CAST(list_sum(list_transform(range(0, 16),
              j -> bits[CAST(j + 33 AS INT)] * (CAST(1 AS BIGINT) << CAST(j AS INT)))) AS BIGINT) AS band2,
            CAST(list_sum(list_transform(range(0, 16),
              j -> bits[CAST(j + 49 AS INT)] * (CAST(1 AS BIGINT) << CAST(j AS INT)))) AS BIGINT) AS band3
          FROM bits)"""
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ChFunctions._

/** Multimodal-column plumbing: media (image/audio/video) as opaque
  * `binary` payloads with typed metadata, processed by per-partition
  * batch functions — the Scala analogue of `mapInPandas` batch UDFs.
  *
  * Decode paths, by codec availability:
  *  - **Images are decoded for real** ([[decodeImages]]): the JDK's
  *    javax.imageio handles PNG/JPEG/BMP/GIF with no external
  *    dependency — dimensions, channels, luminance stats and an 8×8
  *    pooled signature per payload, undecodable rows quarantined
  *    (the S8 posture) instead of poisoning the batch.
  *  - **Audio (WAV/PCM) is decoded for real too** ([[decodeAudioRow]]):
  *    javax.sound.sampled is the JDK's built-in RIFF/WAVE codec. The
  *    oracled endpoint ([[audioFeatures]]) synthesizes deterministic
  *    PCM payloads from row-derived parameters, runs them through the
  *    REAL codec, and the DuckDB oracle verifies the decoded features
  *    against the construction arithmetic's closed forms — an
  *    end-to-end codec round-trip check.
  *  - **Multi-frame video containers are decoded for real where the
  *    JDK has a codec** ([[decodeVideoRow]]): animated GIF is the one
  *    motion format javax.imageio both writes and reads, and the
  *    oracled endpoint ([[videoFrameFeatures]]) runs synthesized
  *    multi-frame payloads through the genuine container/LZW/palette
  *    pipeline with closed-form-checked frame statistics. Formats
  *    needing external codecs (MP4/H.264 …) keep a clearly-marked
  *    deterministic stub ([[FakeDecode]]) / byte-window kernels
  *    ([[frameSample]]) — the per-partition batch shape is identical,
  *    which is what matters for the 100 TB design: payloads stay
  *    distributed, only metadata/features shuffle, decode cost is
  *    linear per partition with no driver involvement.
  */
object Multimodal {

  /** Typed rows for the per-partition decode path. */
  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           channels: Int, feature_sum: Long)

  /** ===== STUB ===== Deterministic fake media decode: derives "image"
    * metadata and a feature from the raw bytes. A real deployment swaps
    * this single function for an actual codec (e.g. javax.imageio /
    * ffmpeg bindings) — the Spark plumbing is unchanged. */
  object FakeDecode {
    def decode(r: MediaRow): MediaFeatures = {
      val n = r.payload.length
      val sum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
      MediaFeatures(r.doc_id,
        width = 64 + (sum % 512).toInt,
        height = 64 + (n % 512),
        channels = 3,
        feature_sum = sum)
    }
  }

  /** Binary-column metadata — the oracled plumbing query: documents
    * carried as utf-8 binary payloads with byte-accurate metadata.
    * Everything codegen'd; the binary never leaves the executor except
    * as this projected metadata. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        encode(col("text"), "utf-8").as("payload"),
        col("source"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("digest"),
        lit("text/plain;charset=utf-8").as("content_type"),
        col("source"))
      .orderBy("doc_id")

  case class Frame(doc_id: Long, frame_idx: Int, frame_offset: Int,
                   frame_len: Int, frame_sum: Long)

  /** Frame sampling over the binary payload: fixed-size byte windows
    * (`frameBytes`) on a `stride`, keeping every `every`-th frame — the
    * video-frame-extraction shape (decode-and-keep-1-in-N) with the
    * decode kernel reduced to a byte sum (no codecs in this container;
    * a real deployment computes per-frame features here). Runs in the
    * same per-partition batch form as [[decodeFeatures]]: payload bytes
    * never leave the executor, only per-frame metadata/features shuffle
    * — at 100 TB the output is frames/every × metadata, not media. */
  def frameSample(spark: SparkSession, dir: String, frameBytes: Int = 32,
                  stride: Int = 24, every: Int = 2): DataFrame = {
    require(frameBytes > stride, "frames must overlap: frameBytes > stride")
    // a frame is emitted while at least (frameBytes - stride) bytes of
    // payload lie at or after its start offset — every emitted frame
    // carries at least that many bytes (a shorter tail is already
    // covered by its predecessor's overlap). Derived from the
    // parameters, not a constant, so tuned calls size correctly.
    val minNew = frameBytes - stride
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[MediaRow]
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.payload.length
        val kMax = math.max((n - minNew) / stride, 0)
        (0 to kMax).iterator.filter(_ % every == 0).map { k =>
          val o = k * stride
          val end = math.min(o + frameBytes, n)
          var s = 0L
          var i = o
          while (i < end) { s += r.payload(i) & 0xff; i += 1 }
          Frame(r.doc_id, k, o, end - o, s)
        }
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  /** Fixed-size binary chunking of the media payload: each document's
    * bytes split into `chunkBytes` pieces with offset, length, and a
    * per-chunk digest — the bounded-object plumbing for moving
    * GB-scale media through a blob store (max object size, ranged
    * reads, resumable transfer) while Spark tracks only chunk
    * metadata. The last chunk is partial; reassembly in index order is
    * byte-exact (asserted in OperatorsSpec via digest equality).
    *
    * Scale: per-row explode bounded at payload/chunkBytes rows, each
    * row carrying at most `chunkBytes` of binary — no row ever exceeds
    * the bound, which is what keeps shuffle blocks and memory
    * per-record flat no matter how large the source media is. The
    * DuckDB oracle mirrors byte arithmetic on the utf-8 text (ASCII
    * corpus: char ops == byte ops, same equivalence frameSample's
    * oracle uses). */
  /** Default chunk size, shared with the DuckDB oracle text in
    * SparkEntry so retuning cannot desynchronize the gate. */
  val DefaultChunkBytes = 64

  def binaryChunks(spark: SparkSession, dir: String,
                   chunkBytes: Int = DefaultChunkBytes): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, greatest((length(payload) - 1) div $chunkBytes, 0))," +
          s" i -> substring(payload, i * $chunkBytes + 1, $chunkBytes))")))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        (col("pos").cast("long") * chunkBytes).as("chunk_offset"),
        length(col("col")).as("chunk_len"),
        md5(col("col")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")

  /** One decoded image row: real dimensions/bands from the codec, an
    * exact integer luminance sum (ITU-R BT.601 in 1000-unit fixed
    * point: 299R+587G+114B — deterministic, no float accumulation),
    * and an 8×8 average-pooled grayscale signature (the resize /
    * feature-extract step, usable directly for perceptual near-dup
    * hashing). `ok=false` rows are the quarantine lane: payload not
    * decodable as an image, zeroed features. */
  case class ImageFeatures(doc_id: Long, ok: Boolean, width: Int,
                           height: Int, channels: Int, luma_sum: Long,
                           signature: Array[Long])

  /** REAL image decode over a binary media frame — javax.imageio (in
    * every JDK, no external codec): per-partition batch iteration, one
    * reusable raster buffer per row, only fixed-width features leave
    * the executor. Deterministic: integer pixel arithmetic only, and
    * the 8×8 pooling uses exact per-cell integer averages (floor), so
    * any partitioning yields bit-identical rows. Undecodable payloads
    * surface as `ok=false` quarantine rows — decode errors are data,
    * not exceptions (one corrupt object must not kill a 100 TB scan).
    *
    * Spec-only (ImageDecodeSpec, on in-memory PNG/JPEG/BMP fixtures):
    * the driver's fixture corpus has text payloads, and no DuckDB
    * oracle can re-decode an image — the same structural
    * un-oracle-ability as the streaming sinks. */
  def decodeImages(media: Dataset[MediaRow], pool: Int = 8): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec lookup is per-JVM; per-partition we only pay stream setup
      it.map { r =>
        // explicit memory-cache stream: ImageIO.read(InputStream) would
        // route through createImageInputStream and (useCache default)
        // spill every payload to a temp file first — see decodeVideoRow
        val img =
          try Option(javax.imageio.ImageIO.read(
            new javax.imageio.stream.MemoryCacheImageInputStream(
              new java.io.ByteArrayInputStream(r.payload))))
          // NonFatal, not just IOException: JDK readers throw
          // RuntimeExceptions on corrupt payloads (CMMException on a
          // bad ICC profile, ArrayIndexOutOfBounds on a malformed GIF
          // header) — any of them is quarantine data, not a task death
          catch { case scala.util.control.NonFatal(_) => None }
        img match {
          case None =>
            ImageFeatures(r.doc_id, ok = false, 0, 0, 0, 0L, Array.fill(pool * pool)(0L))
          case Some(im) =>
            val w = im.getWidth
            val h = im.getHeight
            val channels = im.getRaster.getNumBands
            var luma = 0L
            val sig = Array.fill(pool * pool)(0L)
            val cnt = Array.fill(pool * pool)(0L)
            // bulk row reads into one reused buffer: per-pixel
            // getRGB(x,y) pays a ColorModel conversion call per pixel
            // (~10-30× slower on megapixel media), identical ARGB out
            val rowBuf = new Array[Int](w)
            var y = 0
            while (y < h) {
              im.getRGB(0, y, w, 1, rowBuf, 0, w) // sRGB regardless of storage
              var x = 0
              while (x < w) {
                val rgb = rowBuf(x)
                val l = 299L * ((rgb >> 16) & 0xff) +
                  587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                luma += l
                val cell = (y * pool / h) * pool + (x * pool / w)
                sig(cell) += l
                cnt(cell) += 1L
                x += 1
              }
              y += 1
            }
            var i = 0
            while (i < sig.length) {
              if (cnt(i) > 0) sig(i) = sig(i) / cnt(i)
              i += 1
            }
            ImageFeatures(r.doc_id, ok = true, w, h, channels, luma, sig)
        }
      }
    }
  }

  case class ImageHash(doc_id: Long, ahash: Long)

  /** Perceptual average-hash from the decoded 8×8 signature: bit i set
    * iff cell i's pooled luminance ≥ the signature mean — the classic
    * aHash, invariant to resolution (pooling) and to lossy re-encoding
    * (JPEG noise rarely crosses the per-cell mean). Integer-only, so
    * the hash is deterministic and engine-reproducible. */
  def imageHashes(feats: Dataset[ImageFeatures]): Dataset[ImageHash] = {
    import feats.sparkSession.implicits._
    feats.filter(_.ok).map { f =>
      // the hash is one bit per signature cell: past 64 cells `1L << i`
      // wraps (shift mod 64) and unrelated cells would silently alias
      // into the same bit — reject rather than corrupt
      require(f.signature.length <= 64,
        s"aHash holds at most 64 signature cells (pool <= 8), got ${f.signature.length}")
      val avg = f.signature.sum / f.signature.length
      var h = 0L
      var i = 0
      while (i < f.signature.length) {
        if (f.signature(i) >= avg) h |= (1L << i)
        i += 1
      }
      ImageHash(f.doc_id, h)
    }
  }

  /** Perceptual image near-duplicates — the multimodal member of the
    * dedup suite (exact digest / MinHash / SimHash / embedding cosine
    * for text, THIS for images): decode → aHash → candidate pairs by
    * 8-bit band collision → exact hamming verify.
    *
    * Same LSH discipline as the text near-dup family: banding the
    * 64-bit hash into 8×8-bit keys makes the candidate step an
    * EQUI-join (hash-partitionable at 100 TB — never an all-pairs
    * scan), and the pigeonhole bound makes recall EXACT, not
    * probabilistic: two hashes within hamming distance 7 differ in at
    * most 7 bands, so at least one of the 8 bands collides — every
    * true pair with `maxHamming` ≤ 7 is guaranteed a candidate.
    * Verification is one popcount per candidate.
    *
    * The band self-join runs over DISTINCT hashes, not documents:
    * web-scale image corpora are dominated by identical-hash clusters
    * (blank/solid placeholder images all hash to the same value), and
    * a doc-level band join would shuffle O(cluster²) candidate rows
    * PER BAND for them. At hash level the join cost is bounded by the
    * distinct-hash collision structure; identical-hash doc pairs come
    * from a plain output-bounded equi-join on the hash, and cross-hash
    * survivors expand to doc pairs only after the hamming filter —
    * everything past the distinct is proportional to the RESULT. */
  def imageNearDupPairs(media: Dataset[MediaRow],
                        maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      "8-band/8-bit banding guarantees recall only for maxHamming <= 7")
    val hashes = imageHashes(decodeImages(media)).toDF()
    val uniq = hashes.select("ahash").distinct()
    val bands = uniq.select(col("ahash"),
      explode(array((0 until 8).map(b => struct(lit(b).as("band"),
        shiftright(col("ahash"), b * 8).bitwiseAND(lit(0xffL)).as("key"))): _*)).as("bk"))
      .select(col("ahash"), col("bk.band").as("band"), col("bk.key").as("key"))
    val hashPairs = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.ahash") < col("y.ahash"))
      .select(col("x.ahash").as("ha"), col("y.ahash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= maxHamming)
    val sameHash = hashes.as("a").join(hashes.as("b"),
        col("a.ahash") === col("b.ahash") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        lit(0).cast("int").as("hamming"))
    val crossHash = hashPairs
      .join(hashes.toDF("da", "ha"), "ha")
      .join(hashes.toDF("db", "hb"), "hb")
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
    sameHash.unionByName(crossHash).orderBy("doc_a", "doc_b")
  }

  /** One decoded audio row: real format fields from the codec
    * (javax.sound.sampled), frame count from the stream length, and
    * integer-only signal features — peak amplitude and Σ sample²
    * (energy) — so every value is deterministic and engine-checkable.
    * `ok=false` is the quarantine lane (payload not decodable as
    * audio), mirroring [[ImageFeatures]]. */
  case class AudioFeatures(doc_id: Long, ok: Boolean, sample_rate: Int,
                           channels: Int, bits: Int, n_frames: Long,
                           duration_ms: Long, peak: Int, energy_sum: Long)

  /** REAL audio decode — javax.sound.sampled (in every JDK, no external
    * codec) parses RIFF/WAVE PCM: format fields come from the codec's
    * parsed header, samples from its stream. 16-bit signed PCM only
    * (the synth below emits exactly that; other encodings quarantine).
    * Integer arithmetic throughout — peak and Σ s² are exact, so the
    * decode is reproducible bit-for-bit on any partitioning. */
  def decodeAudioRow(r: MediaRow): AudioFeatures =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      val fmt = in.getFormat
      require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        && fmt.getSampleSizeInBits == 16, s"unsupported encoding: $fmt")
      val bytes = in.readAllBytes()
      val rate = fmt.getSampleRate.toInt
      val nFrames = bytes.length.toLong / fmt.getFrameSize
      val be = fmt.isBigEndian
      var energy = 0L
      var peak = 0
      var i = 0
      while (i + 1 < bytes.length) {
        val s: Int =
          if (be) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort.toInt
          else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toInt
        energy += s.toLong * s
        val a = math.abs(s)
        if (a > peak) peak = a
        i += 2
      }
      AudioFeatures(r.doc_id, ok = true, rate, fmt.getChannels,
        fmt.getSampleSizeInBits, nFrames, nFrames * 1000L / rate, peak, energy)
    } catch { case scala.util.control.NonFatal(_) =>
      AudioFeatures(r.doc_id, ok = false, 0, 0, 0, 0L, 0L, 0, 0L)
    }

  /** In-memory RIFF/WAVE synthesis (PCM signed 16-bit LE): a square
    * wave alternating ±amp per frame across all channels. Byte-exact
    * deterministic, and every feature of the result has a CLOSED FORM
    * (peak = amp; energy = frames·channels·amp²; duration = frames/rate)
    * — which is what lets the DuckDB oracle verify the REAL codec
    * round-trip without parsing WAV itself. */
  def synthWav(rate: Int, channels: Int, nFrames: Int, amp: Int): Array[Byte] = {
    require(amp > 0 && amp <= Short.MaxValue, s"amp out of 16-bit range: $amp")
    val dataLen = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort)
    bb.putInt(rate); bb.putInt(rate * channels * 2)
    bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    var f = 0
    while (f < nFrames) {
      val s = (if (f % 2 == 0) amp else -amp).toShort
      var c = 0
      while (c < channels) { bb.putShort(s); c += 1 }
      f += 1
    }
    bb.array()
  }

  case class AudioParams(doc_id: Long, rate: Int, channels: Int,
                         n_frames: Int, amp: Int)

  /** The ORACLED audio endpoint: per document, synthesize a WAV whose
    * parameters derive from the row (rate/channels/frames/amplitude),
    * decode it with the REAL javax.sound codec, and emit the decoded
    * features. The oracle recomputes the same features from the
    * construction arithmetic's closed forms — so the gate hash-verifies
    * the full synth→RIFF→codec→features round-trip end to end (a wrong
    * header field, endianness slip, or off-by-one in the frame count
    * breaks the match). Per-partition batch shape: payloads are built
    * and decoded inside the executor, only fixed-width features
    * shuffle — the 100 TB posture for media columns. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val params = Tables.documents(spark, dir)
      .select(col("doc_id"),
        (lit(8000) + pmod(col("doc_id"), lit(3)) * 4000).cast("int").as("rate"),
        (lit(1) + pmod(col("doc_id"), lit(2))).cast("int").as("channels"),
        (lit(400) + pmod(col("n_chars"), lit(256))).cast("int").as("n_frames"),
        (lit(1000) + pmod(col("doc_id"), lit(100)) * 10).cast("int").as("amp"))
      .as[AudioParams]
    params.mapPartitions { it =>
      it.map(p => decodeAudioRow(MediaRow(p.doc_id,
        synthWav(p.rate, p.channels, p.n_frames, p.amp))))
    }.toDF()
      .filter(col("ok"))
      .select("doc_id", "sample_rate", "channels", "bits", "n_frames",
        "duration_ms", "peak", "energy_sum")
      .orderBy("doc_id")
  }

  /** Per-partition batch decode over the binary column (mapPartitions =
    * the batch-UDF shape: amortize codec init across a partition's rows).
    * Output is deterministic because FakeDecode is. */
  def decodeFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))
      .as[MediaRow]
    media.mapPartitions { it =>
      // real pipelines initialize the codec once per partition here
      it.map(FakeDecode.decode)
    }.toDF().orderBy("doc_id")
  }

  // ===== Video: REAL multi-frame decode via the JDK's animated-GIF codec =====

  /** Decoded multi-frame features. Frame means are exact integers for
    * solid frames (every pixel equal ⇒ integer division is lossless),
    * which is what makes the REAL-codec round-trip closed-form
    * checkable. `ok=false` is the quarantine lane, as for image/audio. */
  case class VideoFeatures(doc_id: Long, ok: Boolean, width: Int, height: Int,
                           n_frames: Int, mean_sum: Long, peak_mean: Int,
                           mid_mean: Int)

  /** REAL multi-frame video-container decode. Animated GIF is the one
    * multi-image motion format the stock JDK can both write and read
    * (javax.imageio's GIF plugin); the decode below is the genuine
    * article — container parsing, LZW decompression, palette
    * resolution — not a stub. Per frame it computes the mean gray
    * level (red channel; the synth palette is achromatic); whole-file
    * features are the frame count, ΣF mean_f, max_f mean_f and the
    * middle frame's mean. Undecodable or zero-frame payloads
    * quarantine as `ok=false` rather than failing the batch. */
  def decodeVideoRow(r: MediaRow): VideoFeatures =
    try {
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory honors ImageIO.useCache (default true) and returns a
      // FileCacheImageInputStream — one temp-file create/write/delete
      // cycle + open fd PER ROW. At sf10 that was ~600k file-cache
      // round-trips per sweep and the prime suspect in the warm-run
      // regression the round-8 gate measured (56 s warm vs 33 s cold);
      // the payload is already in heap, so the cache buys nothing.
      // Still closed in ALL paths: the stream owns an internal buffer.
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(r.payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no installed codec recognizes the payload")
        val reader = readers.next()
        try {
          reader.setInput(iis, false)
          val n = reader.getNumImages(true)
          require(n > 0, "container holds no frames")
          var meanSum = 0L; var peak = 0; var mid = 0
          var w = 0; var h = 0; var i = 0
          while (i < n) {
            val img = reader.read(i)
            if (i == 0) { w = img.getWidth; h = img.getHeight }
            var px = 0L; var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { px += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
              y += 1
            }
            val mean = (px / (img.getWidth.toLong * img.getHeight)).toInt
            meanSum += mean
            if (mean > peak) peak = mean
            if (i == n / 2) mid = mean
            i += 1
          }
          VideoFeatures(r.doc_id, ok = true, w, h, n, meanSum, peak, mid)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) =>
      VideoFeatures(r.doc_id, ok = false, 0, 0, 0, 0L, 0, 0)
    }

  /** In-memory animated-GIF synthesis through the REAL encoder
    * (`prepareWriteSequence`/`writeToSequence`): `nFrames` solid frames
    * whose gray level for frame i is `(base + i·step) mod 256`. Frames
    * are `TYPE_BYTE_INDEXED` over an explicit 256-gray palette, so the
    * encoder's color table carries the exact values and the
    * encode→LZW→decode round-trip is bit-faithful — every decoded
    * feature has the closed form the DuckDB oracle recomputes. */
  def synthGif(w: Int, h: Int, nFrames: Int, base: Int, step: Int): Array[Byte] = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad geometry: ${w}x${h}x$nFrames")
    val grays = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    val bos = new java.io.ByteArrayOutputStream()
    // memory-cache for the same reason as the decode side: the factory
    // default is a disk-backed FileCacheImageOutputStream per row
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var i = 0
      while (i < nFrames) {
        val g = (base + i * step) % 256
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, g); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        i += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  case class VideoParams(doc_id: Long, width: Int, height: Int,
                         n_frames: Int, base: Int, step: Int)

  /** The ORACLED video endpoint — the motion analogue of
    * [[audioFeatures]]: per document, synthesize an animated GIF whose
    * geometry and per-frame gray ramp derive from the row, decode it
    * with the REAL javax.imageio multi-frame reader, and emit the
    * decoded features. The oracle recomputes the same features from
    * the ramp's closed forms, so the gate hash-verifies the full
    * synth→GIF container→LZW→palette→frame-stats round-trip (a wrong
    * frame count, palette slip, or off-by-one in the middle-frame
    * index breaks the match). Per-partition batch shape: payloads are
    * built and decoded inside the executor; only fixed-width features
    * ever shuffle — the 100 TB posture for media columns. */
  def videoFrameFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val params = Tables.documents(spark, dir)
      .select(col("doc_id"),
        (lit(6) + pmod(col("doc_id"), lit(6))).cast("int").as("width"),
        (lit(6) + pmod(col("doc_id"), lit(5))).cast("int").as("height"),
        (lit(3) + pmod(col("n_chars"), lit(6))).cast("int").as("n_frames"),
        pmod(col("doc_id") * 7, lit(200)).cast("int").as("base"),
        (lit(1) + pmod(col("doc_id"), lit(9))).cast("int").as("step"))
      .as[VideoParams]
    params.mapPartitions { it =>
      it.map(p => decodeVideoRow(MediaRow(p.doc_id,
        synthGif(p.width, p.height, p.n_frames, p.base, p.step))))
    }.toDF()
      .filter(col("ok"))
      .select("doc_id", "width", "height", "n_frames",
        "mean_sum", "peak_mean", "mid_mean")
      .orderBy("doc_id")
  }
}

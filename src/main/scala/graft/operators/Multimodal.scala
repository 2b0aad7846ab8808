package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video payloads travel as opaque `binary` columns with typed metadata;
  * decode / feature-extraction runs per-partition in bounded batches.
  *
  * IMAGE decode is REAL: [[decodeImageStats]] runs `javax.imageio`
  * (ships in the JDK — PNG/JPEG/BMP/GIF) per partition and reduces each
  * image to exact integer pixel statistics; [[syntheticPng]] generates
  * deterministic fixtures whose closed-form pattern the DuckDB oracle
  * recomputes, so the decode path is hash-gated end to end (PNG is
  * lossless — a decoder bug shows up as a sum mismatch).
  *
  * AUDIO decode is REAL too: [[decodeAudioStats]] runs
  * `javax.sound.sampled` (JDK — WAV/AIFF PCM) with the same
  * closed-form-fixture gate ([[syntheticWav]]).
  *
  * VIDEO decode is REAL for the one moving-picture container the JDK
  * ships a codec for — animated GIF ([[decodeVideoStats]] /
  * [[syntheticGif]], grayscale frames so the palette is lossless and
  * the same closed-form gate applies). MP4 CONTAINER demux is real
  * too: [[parseMp4]] walks the public ISO-BMFF box grammar
  * library-free (brand/duration/tracks/codec fourcc/sample+keyframe
  * counts/dimensions — the crawl-triage metadata), gated by
  * closed-form byte-grammar fixtures ([[syntheticMp4]]). CONTENT
  * EMBEDDINGS are real-decode too for every modality the JDK ships a
  * codec for — [[imageEmbedding]] (grid-gray + gradient octants),
  * [[audioEmbedding]] (window means + crossing rate),
  * [[videoEmbedding]] (centered cells + octants + motion), routed per
  * row by [[contentEmbedding]]. Only CODEC decode the JDK lacks
  * (H.264 frame decode, arbitrary-payload frame handling) stays
  * behind the clearly marked `decodeStub` / [[sampleFrames]] stubs,
  * reached solely through [[contentEmbedding]]'s labeled fallback
  * branch and the legacy [[extractFeatures]]. Everything AROUND the
  * codecs — the schema contract, partition-level batching, the
  * mapPartitions signature, output schema binding — is the real
  * distributed plumbing and is tested.
  * At 100 TB: payloads stay columnar (parquet binary), decode parallelism
  * is per-file-split, and nothing ever collects to the driver.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** STUB codec: a real implementation would decode the payload (JPEG/PCM/
    * container) and run a vision/audio encoder. Deterministic fake: feature
    * f(j) = md5-derived 60-bit hash of (payload ++ ":j"), mod 1000, scaled
    * to [0, 1) — stable across runs/partitions, and reproducible in SQL
    * (DuckDB twin: `CAST(CAST('0x' || substr(md5(payload || ':' || j), 1,
    * 15) AS BIGINT) % 1000 / 1000.0 AS REAL)`), so the correctness gate
    * can hash-compare multimodal features end-to-end. */
  private[graft] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    // hash the payload ONCE and clone the digest state per dimension —
    // md5(payload ++ ":j") for each j without re-reading the payload
    // dim times (identical digests; MD5 instances are cloneable)
    val base = java.security.MessageDigest.getInstance("MD5")
    base.update(payload)
    var j = 0
    while (j < dim) {
      val md = base.clone().asInstanceOf[java.security.MessageDigest]
      md.update(s":$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      // first 15 hex chars of the digest = top 7.5 bytes, big-endian
      var v = 0L
      var i = 0
      while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
      v = (v << 4) | ((d(7) & 0xf0L) >> 4)
      // divide in double then narrow — matches CAST(<double> AS REAL)
      out(j) = ((v % 1000) / 1000.0).toFloat
      j += 1
    }
    out
  }

  /** Feature extraction over a media table: per-partition batched decode →
    * (`media_id`, `modality`, `n_bytes`, `features: array<float>`).
    * mapPartitions keeps the decode loop off the driver and amortizes any
    * per-partition codec setup (model load, in a real impl). */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    // require a numeric id at PLAN time (a string id would otherwise
    // surface as per-row cast nulls -> opaque NPEs in the executor loop);
    // the cast then widens narrower numeric types to the long the row
    // reader expects
    val idType = media.schema("media_id").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"media_id must be numeric, got $idType")
    media.select(col("media_id").cast("long"), col("modality"),
        col("payload"))
      .mapPartitions { it =>
        // per-partition setup happens here once (codec/model init in a
        // real implementation)
        it.map { r =>
          // a NULL id would NPE inside the error-message formatting
          // below — reject it first with the promised clear message
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)} — decode needs bytes")
          Row(r.getLong(0), r.getString(1), payload.length.toLong,
            decodeStub(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Deterministic synthetic PNG: pixel (x, y) of image `id` is
    *
    *   r = (id·31 + x·7  + y·13) mod 256
    *   g = (id·17 + x·3  + y·5 ) mod 256
    *   b = (id·29 + x·11 + y·2 ) mod 256
    *
    * encoded losslessly via JDK `ImageIO.write(…, "png", …)`. The
    * closed form is shared with the q220 oracle: DuckDB regenerates the
    * pattern arithmetically and must agree with what the engine DECODES
    * back out of the bytes — a real round-trip gate on the imageio
    * path. Requires id ≥ 0 (the mod stays nonnegative). */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    require(id >= 0 && w >= 1 && h >= 1, s"bad image params: $id, $w, $h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
        val b = ((id * 29 + x * 11 + y * 2) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode (JDK `javax.imageio` — PNG/JPEG/BMP/GIF) reduced
    * to exact integer pixel statistics:
    * (width, height, per-channel Σv and Σv², and a `grid`×`grid`
    * downsample of Σ(r+g+b) per cell, cell (cx, cy) = (x·grid)/w,
    * (y·grid)/h — floor division, any w/h). Integers make the stats
    * fold-order-free and engine-exact: callers derive means/stds with
    * one division each, and the DuckDB oracle reproduces every value
    * from the fixture's closed form. Alpha is ignored (RGB projection —
    * `getRGB` is the sRGB int regardless of the decoded raster type).
    * Throws with the byte length on an undecodable payload (fail fast,
    * not a NULL row — a corrupt image in a curated set is a data bug). */
  private[graft] def decodeImageStats(payload: Array[Byte], grid: Int)
      : (Int, Int, Array[Long], Array[Long], Array[Long]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null,
      s"payload (${payload.length} bytes) is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](3)
    val sqs = new Array[Long](3)
    val cells = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val cy = y * grid / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sums(0) += r; sums(1) += g; sums(2) += b
        sqs(0) += r.toLong * r; sqs(1) += g.toLong * g; sqs(2) += b.toLong * b
        cells(cy * grid + x * grid / w) += r + g + b
        x += 1
      }
      y += 1
    }
    (w, h, sums, sqs, cells)
  }

  /** Image feature extraction over a media table (same mapPartitions
    * batching as [[extractFeatures]], but the codec is the REAL
    * [[decodeImageStats]]): one row per image —
    * (`media_id`, `width`, `height`, `r_sum g_sum b_sum`,
    * `r_sq g_sq b_sq`, `cells`: array<long> of grid² gray sums).
    * Feed it `modality = "image"` rows; any undecodable payload fails
    * the task with the offending media_id. */
  def imageFeatures(media: DataFrame, grid: Int = 4): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("r_sum", LongType, nullable = false),
      StructField("g_sum", LongType, nullable = false),
      StructField("b_sum", LongType, nullable = false),
      StructField("r_sq", LongType, nullable = false),
      StructField("g_sq", LongType, nullable = false),
      StructField("b_sq", LongType, nullable = false),
      StructField("cells", ArrayType(LongType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idType = media.schema("media_id").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"media_id must be numeric, got $idType")
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          // a NULL id would NPE inside the error-message formatting
          // below — reject it first with the promised clear message
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (w, h, sums, sqs, cells) =
            try decodeImageStats(payload, grid)
            catch {
              // wrap EVERY decode failure, not just the precondition
              // IAEs — a corrupt-body PNG throws IIOException
              // (IOException family) from inside ImageIO.read, and the
              // contract is "fails with the offending media_id"
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          Row(r.getLong(0), w, h, sums(0), sums(1), sums(2),
            sqs(0), sqs(1), sqs(2), cells.toSeq)
        }
      }(enc)
  }

  /** REAL-decode content features for the deterministic image
    * embedding: gray = r+g+b per pixel (integer channel sum, the
    * imageHashes discipline), then
    *
    *  - per grid×grid cell (floor-division membership `x·grid/w`):
    *    exact integer gray sum + pixel count;
    *  - an 8-octant gradient-orientation histogram over forward
    *    differences dx = gray(x+1,y) − gray(x,y), dy = gray(x,y+1) −
    *    gray(x,y) for every pixel with both neighbors — the octant is
    *    decided by INTEGER sign/magnitude comparisons only (no atan2,
    *    no floats), zero-gradient pixels are skipped, and `total`
    *    counts the kept ones.
    *
    * Every emitted quantity is an exact integer, so a SQL oracle
    * reproduces the whole report from a closed-form pixel formula
    * without decoding bytes (q236's fixture discipline) while the
    * ENGINE path really decodes (ImageIO). */
  private[graft] def decodeGrayFeatures(payload: Array[Byte], grid: Int,
      bins: Int): (Array[Long], Array[Long], Array[Long], Long) = {
    require(bins == 8, s"octant histogram is 8-bin by construction, got $bins")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null,
      s"payload (${payload.length} bytes) is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val gray = Array.ofDim[Int](h, w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        gray(y)(x) = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
          (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    val cellSum = new Array[Long](grid * grid)
    val cellCnt = new Array[Long](grid * grid)
    val oct = new Array[Long](8)
    var total = 0L
    y = 0
    while (y < h) {
      val cy = y * grid / h
      var x = 0
      while (x < w) {
        val c = cy * grid + x * grid / w
        cellSum(c) += gray(y)(x)
        cellCnt(c) += 1
        if (x + 1 < w && y + 1 < h) {
          val dx = gray(y)(x + 1) - gray(y)(x)
          val dy = gray(y + 1)(x) - gray(y)(x)
          if (dx != 0 || dy != 0) {
            // 8 sectors of atan2(dy, dx), boundaries on axes/diagonals,
            // each decided by exact integer comparisons
            val b =
              if (dx > 0 && dy >= 0) { if (dx > dy) 0 else 1 }
              else if (dx <= 0 && dy > 0) { if (dy > -dx) 2 else 3 }
              else if (dx < 0) { if (-dx > -dy) 4 else 5 }
              else { if (-dy > dx) 6 else 7 }
            oct(b) += 1
            total += 1
          }
        }
        x += 1
      }
      y += 1
    }
    (cellSum, cellCnt, oct, total)
  }

  /** Exact-integer report behind [[imageEmbedding]], one row per
    * feature — the oracle surface (q271): cell dims carry (gray sum,
    * pixel count), octant dims carry (gradient count, total kept
    * gradients). `dim_idx` 0..grid²−1 = cells (cy·grid + cx), then 8
    * octants. */
  def imageEmbeddingStats(media: DataFrame, grid: Int = 4): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dim_idx", IntegerType, nullable = false),
      StructField("num", LongType, nullable = false),
      StructField("den", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (cs, cc, oc, tot) =
            try decodeGrayFeatures(payload, grid, 8)
            catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          val id = r.getLong(0)
          cs.indices.map(i => Row(id, i, cs(i), cc(i))) ++
            oc.indices.map(i => Row(id, grid * grid + i, oc(i), tot))
        }
      }(enc)
  }

  /** REAL content embedding from decoded pixels — the round-11
    * replacement for [[decodeStub]] on the image modality: dims
    * 0..grid²−1 are normalized cell-gray means (cellSum/(cellCnt·765))
    * and the last 8 dims the normalized gradient-orientation histogram
    * (octantCount/total; all-zero on a flat image). Both divisions are
    * single exact double ops narrowed to float, so a SQL oracle
    * reproduces every value bit for bit from [[imageEmbeddingStats]]'
    * integers (`CAST(CAST(num AS DOUBLE)/den/… AS REAL)`) — which is
    * what lets the ANN/dedup stack (q272) run end-to-end on REAL
    * decoded content under the same hash-equality gate as everything
    * else.
    * @return (`vec_id`, `embedding` array<float> of grid²+8). */
  def imageEmbedding(media: DataFrame, grid: Int = 4): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (cs, cc, oc, tot) =
            try decodeGrayFeatures(payload, grid, 8)
            catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          val emb = new Array[Float](grid * grid + 8)
          var i = 0
          while (i < cs.length) {
            // empty cells cannot happen (floor-division membership is
            // total), but guard the division anyway
            emb(i) =
              if (cc(i) == 0L) 0f
              else (cs(i).toDouble / (cc(i) * 765.0)).toFloat
            i += 1
          }
          var b = 0
          while (b < 8) {
            emb(grid * grid + b) =
              if (tot == 0L) 0f else (oc(b).toDouble / tot).toFloat
            b += 1
          }
          Row(r.getLong(0), emb.toSeq)
        }
      }(enc)
  }

  /** [[syntheticPng]] with a SPARSE perturbation — the near-duplicate
    * fixture for the perceptual-hash family: pixels where
    * `(x·5 + y·3) mod 29 == 0` (≈3.4% of the raster) get `delta` added
    * to every channel before the mod-256 wrap. `delta = 0` is exactly
    * [[syntheticPng]]; a small delta leaves cell means almost
    * unchanged, so the perturbed image aHash/dHash-matches its base
    * within a few bits — while a different `base` is unrelated word
    * soup. Closed form shared with the q236/q237 oracles. */
  def syntheticPngNear(base: Long, delta: Int, w: Int, h: Int)
      : Array[Byte] = {
    require(base >= 0 && delta >= 0 && w >= 1 && h >= 1,
      s"bad image params: $base, $delta, $w, $h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val d = if ((x * 5 + y * 3) % 29 == 0) delta else 0
        val r = ((base * 31 + x * 7 + y * 13 + d) % 256).toInt
        val g = ((base * 17 + x * 3 + y * 5 + d) % 256).toInt
        val b = ((base * 29 + x * 11 + y * 2 + d) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Perceptual hashes of one decoded image — aHash (average hash) and
    * dHash (difference hash), the cheap pixel-level near-dup screen a
    * crawl pipeline runs before any embedding model:
    *
    *   - aHash bit (cy·grid + cx) = 1 iff cell (cx, cy)'s mean gray
    *     exceeds the image's global mean, over a grid×grid downsample;
    *   - dHash bit (cy·grid + cx) = 1 iff cell (cx, cy) is brighter
    *     than its right neighbor (cx+1, cy), over a grid×(grid+1)
    *     downsample — gradient direction survives global
    *     brightness/contrast shifts, which is why dHash is the stock
    *     screen.
    *
    * Gray = r + g + b (integer channel sum — no luma-weight floats);
    * cell membership is floor division (`x·cols / w`), so any image
    * size maps exactly and the DuckDB oracle reproduces every bit.
    * Mean comparisons run as exact integer cross-multiplications
    * (`sumA·pixB > sumB·pixA`) — no division, bit-exact up to ~100 MP
    * images before the products near Long range. Requires
    * w ≥ grid+1 and h ≥ grid (every cell non-empty — resize or filter
    * thumbnails upstream; a degenerate hash would silently near-dup
    * everything). */
  private[graft] def decodeImageHashes(payload: Array[Byte], grid: Int)
      : (Long, Long) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    require(img != null,
      s"payload (${payload.length} bytes) is not a decodable image")
    hashOfImage(img, grid)
  }

  /** The (aHash, dHash) kernel over one decoded frame — shared by the
    * still-image path above and the per-frame video path
    * ([[videoFrameHashes]]). */
  private def hashOfImage(img: java.awt.image.BufferedImage, grid: Int)
      : (Long, Long) = {
    val w = img.getWidth
    val h = img.getHeight
    require(w >= grid + 1 && h >= grid,
      s"image ${w}x$h too small for a $grid-cell perceptual hash — " +
        "resize or filter thumbnails upstream")
    val cols = grid + 1
    val sumA = new Array[Long](grid * grid)
    val cntA = new Array[Long](grid * grid)
    val sumD = new Array[Long](grid * cols)
    val cntD = new Array[Long](grid * cols)
    var tot = 0L
    var y = 0
    while (y < h) {
      val ay = y * grid / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val gray = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        val ka = ay * grid + x * grid / w
        sumA(ka) += gray; cntA(ka) += 1
        val kd = ay * cols + x * cols / w
        sumD(kd) += gray; cntD(kd) += 1
        tot += gray
        x += 1
      }
      y += 1
    }
    val totPix = w.toLong * h
    var ahash = 0L
    var dhash = 0L
    var k = 0
    while (k < grid * grid) {
      if (sumA(k) * totPix > tot * cntA(k)) ahash |= 1L << k
      val cy = k / grid
      val cx = k % grid
      val l = cy * cols + cx
      if (sumD(l) * cntD(l + 1) > sumD(l + 1) * cntD(l)) dhash |= 1L << k
      k += 1
    }
    (ahash, dhash)
  }

  /** Perceptual-hash extraction over a media table — the pixel-level
    * near-dup screen joining the real-decode family
    * ([[imageFeatures]]) to the Hamming-band dedup machinery
    * ([[Dedup.simHashJoin]] consumes either hash column directly):
    * one row per image, (`media_id`, `ahash`: long, `dhash`: long),
    * grid² ≤ 64 bits each. Same mapPartitions batching as the rest of
    * the family (per-partition codec reuse; decode never touches the
    * driver); at 100 TB the hash table is ~16 bytes/image and the
    * banded join shuffles keys, never pixels. */
  def imageHashes(media: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 1 && grid * grid <= 64,
      s"need 1 <= grid with grid*grid <= 64 bits, got $grid")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idType = media.schema("media_id").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"media_id must be numeric, got $idType")
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (a, d) =
            try decodeImageHashes(payload, grid)
            catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          Row(r.getLong(0), a, d)
        }
      }(enc)
  }

  /** Deterministic synthetic WAV (16-bit signed PCM, mono, little
    * endian): sample i of clip `id` is
    *
    *   s_i = ((id·37 + i·13) mod 4096) − 2048
    *
    * packaged through JDK `AudioSystem.write` (a real RIFF/WAVE file,
    * not hand-rolled bytes). Closed form shared with the q221 oracle —
    * PCM is lossless, so the decode-side stats must reproduce the
    * formula exactly. */
  def syntheticWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    require(id >= 0 && nSamples >= 2 && sampleRate >= 1,
      s"bad audio params: $id, $nSamples, $sampleRate")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((id * 37 + i.toLong * 13) % 4096) - 2048).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** [[syntheticWav]]'s near-duplicate CLIP fixture (q245/q246):
    * sample i of clip `base` is
    *
    *   s_i = ((base·37 + i·13 + (i²·(1 + base mod 7)) mod 199)
    *          mod 4096) − 2048, plus `delta` where i mod 31 == 0
    *
    * — the base-keyed NONLINEAR term gives each base its own energy
    * profile (a pure linear pattern differs between bases by phase
    * only, and an energy-gradient hash would call every clip a
    * near-dup), and the sparse `delta` bump barely moves window
    * energies, so the perturbed clip hashes within a few bits of its
    * base. `delta = 0` with the same base is the exact base clip.
    * Closed form shared with the q245/q246 oracles. */
  def syntheticWavNear(base: Long, delta: Int, nSamples: Int,
      sampleRate: Int): Array[Byte] = {
    require(base >= 0 && delta >= 0 && nSamples >= 2 && sampleRate >= 1,
      s"bad audio params: $base, $delta, $nSamples, $sampleRate")
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val nl = (i.toLong * i * (1 + base % 7)) % 199
      val d = if (i % 31 == 0) delta else 0
      val s = (((base * 37 + i.toLong * 13 + nl) % 4096) - 2048 + d).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Perceptual AUDIO hash — the energy-profile fingerprint that
    * completes the near-dup screen across all three modalities
    * (images/video: [[imageHashes]]/[[videoFrameHashes]]): the clip's
    * samples split into `bits`+1 windows by floor division
    * (`i·(bits+1)/n` — any length maps exactly), each window reduces
    * to its exact integer energy Σs², and bit k compares adjacent
    * window MEAN energies by cross-multiplication
    * (`e_k·c_{k+1} > e_{k+1}·c_k`) — the 1-D dHash. Gradient bits
    * survive global gain changes the way dHash survives brightness
    * shifts (both means scale together), which is why energy-profile
    * hashing is the stock audio screen. 16-bit mono PCM via the same
    * JDK decode as [[audioFeatures]]; requires n ≥ bits+1 samples
    * (every window non-empty). Exact-integer bound: e·c products stay
    * under Long range for clips to ~1.4M samples (~90 s at 16 kHz) —
    * hash longer audio per-segment, as production screens do.
    * @return (`media_id`, `ehash`: long). */
  def audioHashes(media: DataFrame, bits: Int = 64): DataFrame = {
    require(bits >= 1 && bits <= 64, s"need 1 <= bits <= 64, got $bits")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ehash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idType = media.schema("media_id").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"media_id must be numeric, got $idType")
    val nWin = bits + 1
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val h =
            try {
              val (_, _, n, samples) = decodePcmSamples(payload)
              require(n >= nWin,
                s"clip of $n samples too short for a $bits-bit energy " +
                  "hash — hash longer segments or pad upstream")
              val e = new Array[Long](nWin)
              val c = new Array[Long](nWin)
              var i = 0
              while (i < samples.length) {
                val w = (i.toLong * nWin / samples.length).toInt
                val s = samples(i)
                e(w) += s.toLong * s
                c(w) += 1
                i += 1
              }
              var hash = 0L
              var k = 0
              while (k < bits) {
                if (e(k) * c(k + 1) > e(k + 1) * c(k)) hash |= 1L << k
                k += 1
              }
              hash
            } catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          Row(r.getLong(0), h)
        }
      }(enc)
  }

  /** REAL-decode audio content features behind [[audioEmbedding]]:
    * per floor-division window (`i·W/n`) the exact signed sample sum
    * and count, plus the zero-crossing count (sign flip between
    * consecutive samples — [[decodeAudioStats]]' convention) over
    * `n − 1` adjacent pairs. All integers, so a SQL oracle reproduces
    * the report from the fixture's closed-form sample formula while
    * the engine path really decodes (javax.sound PCM). */
  private[graft] def decodeAudioWindows(payload: Array[Byte],
      windows: Int): (Array[Long], Array[Long], Long, Long) = {
    val (_, _, n, samples) = decodePcmSamples(payload)
    require(n >= windows && n >= 2,
      s"clip of $n samples too short for $windows windows")
    val sums = new Array[Long](windows)
    val cnts = new Array[Long](windows)
    var crossings = 0L
    var i = 0
    while (i < n) {
      val w = (i.toLong * windows / n).toInt
      sums(w) += samples(i)
      cnts(w) += 1
      if (i + 1 < n && (samples(i) >= 0) != (samples(i + 1) >= 0))
        crossings += 1
      i += 1
    }
    (sums, cnts, crossings, n.toLong - 1)
  }

  /** Exact-integer oracle surface behind [[audioEmbedding]] (q276's
    * discipline = q271's for images): window dims carry (signed sample
    * sum, sample count), the final dim (zero crossings, n − 1). */
  def audioEmbeddingStats(media: DataFrame,
      windows: Int = 16): DataFrame = {
    require(windows >= 1, s"windows must be >= 1, got $windows")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dim_idx", IntegerType, nullable = false),
      StructField("num", LongType, nullable = false),
      StructField("den", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (sums, cnts, cross, pairs) =
            try decodeAudioWindows(payload, windows)
            catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          val id = r.getLong(0)
          sums.indices.map(i => Row(id, i, sums(i), cnts(i))) :+
            Row(id, windows, cross, pairs)
        }
      }(enc)
  }

  /** REAL content embedding for the AUDIO modality (the image twin is
    * [[imageEmbedding]]): dims 0..W−1 are signed normalized window
    * means (windowSum / (windowCount · 32768) — full-scale 16-bit PCM
    * maps to [−1, 1)), the last dim the zero-crossing rate
    * (crossings / (n − 1)). Window MEANS, not energies, by
    * measurement on the [[syntheticWavNear]] fixture family: energy
    * profiles of the near-uniform synthetic clips don't separate
    * (near-pair cos 0.99808 < cross-pair max 0.99964) while signed
    * means do (near ≥ 0.99970, cross ≤ 0.96527) — and on real audio
    * the signed mean profile is the DC/waveform-shape fingerprint.
    * Each value is one exact double division narrowed to float, so a
    * SQL oracle rebuilds every dim bit for bit from
    * [[audioEmbeddingStats]]' integers.
    * @return (`vec_id`, `embedding` array<float> of W+1). */
  def audioEmbedding(media: DataFrame, windows: Int = 16): DataFrame = {
    require(windows >= 1, s"windows must be >= 1, got $windows")
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (sums, cnts, cross, pairs) =
            try decodeAudioWindows(payload, windows)
            catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          val emb = new Array[Float](windows + 1)
          var i = 0
          while (i < windows) {
            emb(i) =
              if (cnts(i) == 0L) 0f
              else (sums(i).toDouble / (cnts(i) * 32768.0)).toFloat
            i += 1
          }
          emb(windows) = (cross.toDouble / pairs).toFloat
          Row(r.getLong(0), emb.toSeq)
        }
      }(enc)
  }

  /** Shared 16-bit mono PCM decode: (rate, channels, n, samples). */
  private def decodePcmSamples(payload: Array[Byte])
      : (Int, Int, Int, Array[Int]) = {
    val ais = try javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    catch {
      case e: javax.sound.sampled.UnsupportedAudioFileException =>
        throw new IllegalArgumentException(
          s"payload (${payload.length} bytes) is not a decodable audio " +
            "stream", e)
    }
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 &&
        fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"only 16-bit signed PCM supported, got $fmt")
    require(fmt.getChannels == 1,
      s"only mono supported, got ${fmt.getChannels} channels")
    val bytes = ais.readAllBytes()
    require(bytes.length % 2 == 0,
      s"truncated 16-bit PCM stream: ${bytes.length} bytes")
    val big = fmt.isBigEndian
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val lo = bytes(2 * i).toInt
      val hi = bytes(2 * i + 1).toInt
      out(i) = if (big) (lo << 8) | (hi & 0xff)
        else (hi << 8) | (lo & 0xff)
      i += 1
    }
    (math.round(fmt.getSampleRate), fmt.getChannels, n, out)
  }

  /** REAL audio decode (JDK `javax.sound.sampled` — WAV/AIFF PCM)
    * reduced to exact integer sample statistics:
    * (sample_rate, channels, n_samples, Σs, Σs², zero crossings —
    * sign(s) = s ≥ 0 flips between consecutive samples, the classic
    * voiced/unvoiced energy feature). 16-bit signed PCM only (the
    * training-data case; reject others loudly rather than mis-parse).
    * All outputs are integers, so the q221 oracle recomputes them from
    * the fixture's closed form with no float drift possible. */
  private[graft] def decodeAudioStats(payload: Array[Byte])
      : (Int, Int, Long, Long, Long, Long) = {
    val ais = try javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    catch {
      case e: javax.sound.sampled.UnsupportedAudioFileException =>
        throw new IllegalArgumentException(
          s"payload (${payload.length} bytes) is not a decodable audio " +
            "stream", e)
    }
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16 &&
        fmt.getEncoding ==
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      s"only 16-bit signed PCM supported, got $fmt")
    // mono only — interleaved stereo words would silently mix channels
    // into one stream (sum/zero-crossings of alternating L/R samples
    // are meaningless); reject loudly per the contract
    require(fmt.getChannels == 1,
      s"only mono supported, got ${fmt.getChannels} channels")
    val bytes = ais.readAllBytes()
    require(bytes.length % 2 == 0,
      s"truncated 16-bit PCM stream: ${bytes.length} bytes")
    val big = fmt.isBigEndian
    val ch = fmt.getChannels
    val n = bytes.length / 2
    var sum = 0L
    var sq = 0L
    var zc = 0L
    var prevNonNeg = false
    var i = 0
    while (i < n) {
      val lo = bytes(2 * i).toInt
      val hi = bytes(2 * i + 1).toInt
      val s = if (big) (lo << 8) | (hi & 0xff)
        else (hi << 8) | (lo & 0xff)
      sum += s
      sq += s.toLong * s
      val nonNeg = s >= 0
      if (i > 0 && nonNeg != prevNonNeg) zc += 1
      prevNonNeg = nonNeg
      i += 1
    }
    (math.round(fmt.getSampleRate), ch, n.toLong, sum, sq, zc)
  }

  /** Audio feature extraction over a media table — the REAL-decode
    * twin of [[imageFeatures]] for the audio modality: one row per
    * clip, (`media_id`, `sample_rate`, `channels`, `n_samples`,
    * `s_sum`, `s_sq`, `zero_crossings`). */
  def audioFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("s_sum", LongType, nullable = false),
      StructField("s_sq", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idType = media.schema("media_id").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"media_id must be numeric, got $idType")
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          // a NULL id would NPE inside the error-message formatting
          // below — reject it first with the promised clear message
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (rate, ch, n, sum, sq, zc) =
            try decodeAudioStats(payload)
            catch {
              // wrap EVERY decode failure (readAllBytes IOExceptions on
              // truncated streams included), not just precondition IAEs
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          Row(r.getLong(0), rate, ch, n, sum, sq, zc)
        }
      }(enc)
  }

  /** Deterministic synthetic multi-frame VIDEO as an animated GIF —
    * the one moving-picture container the JDK can both write and
    * decode. Frames are GRAYSCALE (≤256 distinct colors, so the GIF
    * palette is lossless): pixel (x, y) of frame f in clip `id` is
    *
    *   v = (id·31 + f·17 + x·7 + y·13) mod 256
    *
    * Closed form shared with the q228 oracle. */
  def syntheticGif(id: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    require(id >= 0 && w >= 1 && h >= 1 && frames >= 1,
      s"bad video params: $id, $w, $h, $frames")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    // EXPLICIT 256-gray palette (indices stored verbatim — no writer
    // palette inference), and INTERLACE DISABLED: the JDK writer
    // defaults to interlaced frames, which round-trip fine at normal
    // sizes but scramble rows below the interlace pass strides
    // (measured: a 5×3 frame came back with row 1 zeroed and row 2
    // holding row 1's content)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val cmap = Array.tabulate(256)(v => (0xff << 24) | (v << 16) |
      (v << 8) | v)
    val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false,
      -1, java.awt.image.DataBuffer.TYPE_BYTE)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toInt
          img.getRaster.setSample(x, y, 0, v)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), param)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** [[syntheticGif]]'s near-duplicate CLIP fixture (q243/q244): the
    * same SPARSE perturbation rule as [[syntheticPngNear]] (pixels
    * where `(x·5 + y·3) mod 29 == 0` get `delta` before the mod-256
    * wrap, every frame), PLUS a base-keyed NONLINEAR term
    * `(x·y·(1 + base mod 5)) mod 23` — without it the linear pattern
    * differs between clips only by a constant, and dHash (a gradient
    * hash, deliberately shift-invariant) would call every clip a
    * near-dup of every other. `delta = 0` with the same base is the
    * exact base clip. */
  def syntheticGifNear(base: Long, delta: Int, w: Int, h: Int,
      frames: Int): Array[Byte] = {
    require(base >= 0 && delta >= 0 && w >= 1 && h >= 1 && frames >= 1,
      s"bad video params: $base, $delta, $w, $h, $frames")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val cmap = Array.tabulate(256)(v => (0xff << 24) | (v << 16) |
      (v << 8) | v)
    val icm = new java.awt.image.IndexColorModel(8, 256, cmap, 0, false,
      -1, java.awt.image.DataBuffer.TYPE_BYTE)
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val d = if ((x * 5 + y * 3) % 29 == 0) delta else 0
          val nl = (x * y * (1 + base % 5)) % 23
          val v = ((base * 31 + f * 17 + x * 7 + y * 13 + nl + d)
            % 256).toInt
          img.getRaster.setSample(x, y, 0, v)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), param)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Per-FRAME perceptual hashes over a video table — how video
    * near-dup actually works at corpus scale (sample frames → hash
    * each → match clips on shared frame hashes; whole-file hashing
    * breaks on any re-encode). One row per (clip, frame):
    * (`media_id`, `frame_idx`, `ahash`, `dhash`), the same integer
    * cross-multiplication kernel as [[imageHashes]] applied to each
    * decoded frame; q244 then feeds the dHash column through the
    * banded Hamming machinery keyed by (clip, frame) and aggregates
    * matches to clip pairs. */
  def videoFrameHashes(media: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 1 && grid * grid <= 64,
      s"need 1 <= grid with grid*grid <= 64 bits, got $grid")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("ahash", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idType = media.schema("media_id").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"media_id must be numeric, got $idType")
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          var reader: javax.imageio.ImageReader = null
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            require(readers.hasNext,
              s"media_id=${r.getLong(0)}: payload is not a decodable video")
            reader = readers.next()
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            (0 until n).map { f =>
              val (a, d) =
                try hashOfImage(reader.read(f), grid)
                catch {
                  case scala.util.control.NonFatal(e) => throw
                    new IllegalArgumentException(
                      s"media_id=${r.getLong(0)} frame $f: " +
                        e.getMessage, e)
                }
              Row(r.getLong(0), f, a, d)
            }
          } finally {
            if (reader != null) reader.dispose()
            iis.close()
          }
        }
      }(enc)
  }

  /** REAL-decode video content features behind [[videoEmbedding]]:
    * all frames of the clip (JDK multi-frame reader — animated GIF)
    * pooled into exact integers — per 4×4-cell gray sums/counts
    * (floor-division membership, summed across frames), the clip-total
    * gray sum/count, an 8-octant gradient-orientation histogram over
    * per-frame forward differences ([[decodeGrayFeatures]]' integer
    * octant rule), and the motion pair (Σ|v_f − v_{f−1}| over aligned
    * pixels, pair count). Gray here is the sRGB red channel (= the
    * gray level for a grayscale palette — [[decodeVideoStats]]'
    * convention). All integers, so a SQL oracle reproduces the report
    * from the fixture's closed-form raster while the engine path
    * really decodes. Frames must share frame 0's dimensions. */
  private[graft] def decodeVideoWindows(payload: Array[Byte], grid: Int)
      : (Array[Long], Array[Long], Long, Long, Array[Long], Long,
        Long, Long) = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    var reader: javax.imageio.ImageReader = null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        s"payload (${payload.length} bytes) is not a decodable video")
      reader = readers.next()
      reader.setInput(iis)
      val nf = reader.getNumImages(true)
      require(nf >= 1, "clip has no frames")
      val cellSum = new Array[Long](grid * grid)
      val cellCnt = new Array[Long](grid * grid)
      var totSum = 0L
      var totCnt = 0L
      val oct = new Array[Long](8)
      var octTot = 0L
      var motion = 0L
      var motionPairs = 0L
      var prev: Array[Int] = null
      var w = -1
      var h = -1
      var f = 0
      while (f < nf) {
        val img = reader.read(f)
        if (f == 0) { w = img.getWidth; h = img.getHeight }
        else require(img.getWidth == w && img.getHeight == h,
          s"frame $f is ${img.getWidth}x${img.getHeight}, frame 0 " +
            s"was ${w}x$h — mixed-geometry clips unsupported")
        val cur = new Array[Int](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            cur(y * w + x) = (img.getRGB(x, y) >> 16) & 0xff
            x += 1
          }
          y += 1
        }
        y = 0
        while (y < h) {
          val cy = y * grid / h
          var x = 0
          while (x < w) {
            val v = cur(y * w + x)
            val c = cy * grid + x * grid / w
            cellSum(c) += v
            cellCnt(c) += 1
            totSum += v
            totCnt += 1
            if (x + 1 < w && y + 1 < h) {
              val dx = cur(y * w + x + 1) - v
              val dy = cur((y + 1) * w + x) - v
              if (dx != 0 || dy != 0) {
                val b =
                  if (dx > 0 && dy >= 0) { if (dx > dy) 0 else 1 }
                  else if (dx <= 0 && dy > 0) { if (dy > -dx) 2 else 3 }
                  else if (dx < 0) { if (-dx > -dy) 4 else 5 }
                  else { if (-dy > dx) 6 else 7 }
                oct(b) += 1
                octTot += 1
              }
            }
            if (prev != null) {
              motion += math.abs(v - prev(y * w + x)).toLong
              motionPairs += 1
            }
            x += 1
          }
          y += 1
        }
        prev = cur
        f += 1
      }
      (cellSum, cellCnt, totSum, totCnt, oct, octTot, motion,
        motionPairs)
    } finally {
      if (reader != null) reader.dispose()
      iis.close()
    }
  }

  /** Exact-integer oracle surface behind [[videoEmbedding]] (q278 —
    * q271/q276's discipline for the video modality). `dim_idx` layout:
    * 0..grid²−1 cells (gray sum, pixel count — pooled over frames),
    * grid² the clip total (gray sum, pixel count), grid²+1..grid²+8
    * octants (gradient count, total kept gradients), grid²+9 motion
    * (Σ|frame delta|, aligned-pair count). */
  def videoEmbeddingStats(media: DataFrame, grid: Int = 4): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("dim_idx", IntegerType, nullable = false),
      StructField("num", LongType, nullable = false),
      StructField("den", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (cs, cc, ts, tp, oc, ot, md, mc) =
            try decodeVideoWindows(payload, grid)
            catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          val id = r.getLong(0)
          val g2 = grid * grid
          cs.indices.map(i => Row(id, i, cs(i), cc(i))) ++
            Seq(Row(id, g2, ts, tp)) ++
            oc.indices.map(i => Row(id, g2 + 1 + i, oc(i), ot)) :+
            Row(id, g2 + 9, md, mc)
        }
      }(enc)
  }

  /** REAL content embedding for the VIDEO modality (the triad member
    * beside [[imageEmbedding]] and [[audioEmbedding]]): dims
    * 0..grid²−1 are CENTERED pooled cell-gray means
    * ((cellSum/cellCnt − totSum/totCnt)/255 — centering strips the
    * shared-brightness component that otherwise crushes the cosine
    * contrast; measured on the q243 fixture family: raw means leave
    * near-pairs inseparable while centered-cells + octants + motion
    * recover the planted copy as EVERY clip's top-1 neighbor, min
    * top1−top2 gap 0.0033), the next 8 dims the gradient-orientation
    * histogram, the last dim the motion rate
    * (Σ|frame delta| / (pairs·255); 0 for single-frame clips). Each
    * value is a fixed chain of exact double ops narrowed to float, so
    * a SQL oracle rebuilds every dim bit for bit from
    * [[videoEmbeddingStats]]' integers.
    * @return (`vec_id`, `embedding` array<float> of grid²+9). */
  def videoEmbedding(media: DataFrame, grid: Int = 4): DataFrame = {
    require(grid >= 1, s"grid must be >= 1, got $grid")
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val (cs, cc, ts, tp, oc, ot, md, mc) =
            try decodeVideoWindows(payload, grid)
            catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          val g2 = grid * grid
          val emb = new Array[Float](g2 + 9)
          val clipMean = ts.toDouble / tp
          var i = 0
          while (i < g2) {
            emb(i) =
              if (cc(i) == 0L) 0f
              else ((cs(i).toDouble / cc(i) - clipMean) / 255.0).toFloat
            i += 1
          }
          var b = 0
          while (b < 8) {
            emb(g2 + b) =
              if (ot == 0L) 0f else (oc(b).toDouble / ot).toFloat
            b += 1
          }
          emb(g2 + 8) =
            if (mc == 0L) 0f else (md.toDouble / (mc * 255.0)).toFloat
          Row(r.getLong(0), emb.toSeq)
        }
      }(enc)
  }

  /** The MODALITY-ROUTING content extractor — [[extractFeatures]]'
    * real-decode successor: one pass over a mixed media table,
    * dispatching each row on its `modality` to the matching REAL
    * decoder — `image` → [[imageEmbedding]]'s grid-gray + octant
    * features (grid²+8 dims), `audio` → [[audioEmbedding]]'s window
    * means + crossing rate (windows+1), `video` →
    * [[videoEmbedding]]'s centered cells + octants + motion
    * (grid²+9) — and any OTHER modality to the documented
    * [[decodeStub]] (`stubDim` dims; the JDK ships no codec for it —
    * the only remaining stub surface, and it is labeled in the
    * output by its modality). Embedding widths differ by modality by
    * design; downstream consumers group by `modality` before
    * vector ops.
    * @return (`vec_id`, `modality`, `embedding` array<float>). */
  def contentEmbedding(media: DataFrame, imageGrid: Int = 4,
      audioWindows: Int = 16, videoGrid: Int = 4,
      stubDim: Int = 16): DataFrame = {
    require(imageGrid >= 1 && audioWindows >= 1 && videoGrid >= 1 &&
      stubDim >= 1, "all dims must be >= 1")
    val outSchema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select(col("media_id").cast("long"), col("modality"),
        col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val modality = r.getString(1)
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val emb =
            try modality match {
              case "image" =>
                val (cs, cc, oc, tot) =
                  decodeGrayFeatures(payload, imageGrid, 8)
                val g2 = imageGrid * imageGrid
                val e = new Array[Float](g2 + 8)
                var i = 0
                while (i < g2) {
                  e(i) = if (cc(i) == 0L) 0f
                    else (cs(i).toDouble / (cc(i) * 765.0)).toFloat
                  i += 1
                }
                var b = 0
                while (b < 8) {
                  e(g2 + b) =
                    if (tot == 0L) 0f else (oc(b).toDouble / tot).toFloat
                  b += 1
                }
                e
              case "audio" =>
                val (sums, cnts, cross, pairs) =
                  decodeAudioWindows(payload, audioWindows)
                val e = new Array[Float](audioWindows + 1)
                var i = 0
                while (i < audioWindows) {
                  e(i) = if (cnts(i) == 0L) 0f
                    else (sums(i).toDouble / (cnts(i) * 32768.0)).toFloat
                  i += 1
                }
                e(audioWindows) = (cross.toDouble / pairs).toFloat
                e
              case "video" =>
                val (cs, cc, ts, tp, oc, ot, md, mc) =
                  decodeVideoWindows(payload, videoGrid)
                val g2 = videoGrid * videoGrid
                val e = new Array[Float](g2 + 9)
                val cm = ts.toDouble / tp
                var i = 0
                while (i < g2) {
                  e(i) = if (cc(i) == 0L) 0f
                    else ((cs(i).toDouble / cc(i) - cm) / 255.0).toFloat
                  i += 1
                }
                var b = 0
                while (b < 8) {
                  e(g2 + b) =
                    if (ot == 0L) 0f else (oc(b).toDouble / ot).toFloat
                  b += 1
                }
                e(g2 + 8) = if (mc == 0L) 0f
                  else (md.toDouble / (mc * 255.0)).toFloat
                e
              case _ => decodeStub(payload, stubDim)
            } catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)} ($modality): " +
                    e.getMessage, e)
            }
          Row(r.getLong(0), modality, emb.toSeq)
        }
      }(enc)
  }

  /** REAL video decode: every frame of a multi-frame image container
    * (animated GIF via the JDK reader) reduced to exact integer
    * per-frame gray statistics — (frame_idx, width, height, Σv, Σv²)
    * where v is the sRGB red channel (= the gray level for a grayscale
    * palette). Throws on undecodable payloads. */
  private[graft] def decodeVideoStats(payload: Array[Byte])
      : Seq[(Int, Int, Int, Long, Long)] = {
    // close the input stream and dispose the reader on EVERY path:
    // createImageInputStream defaults to a file-backed cache stream
    // (open FD + /tmp file), and mapPartitions calls this once per row —
    // leaking them kills long-lived executors with EMFILE
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    var reader: javax.imageio.ImageReader = null
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext,
        s"payload (${payload.length} bytes) is not a decodable video")
      reader = readers.next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n).map { f =>
        val img = reader.read(f)
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var sq = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = (img.getRGB(x, y) >> 16) & 0xff
            sum += v
            sq += v.toLong * v
            x += 1
          }
          y += 1
        }
        (f, w, h, sum, sq)
      }
    } finally {
      if (reader != null) reader.dispose()
      iis.close()
    }
  }

  /** Per-frame feature extraction over a video table — the REAL-decode
    * member of the triad beside [[imageFeatures]] and [[audioFeatures]]:
    * one row per (clip, frame) —
    * (`media_id`, `frame_idx`, `width`, `height`, `v_sum`, `v_sq`). */
  def videoFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("v_sum", LongType, nullable = false),
      StructField("v_sq", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val idType = media.schema("media_id").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"media_id must be numeric, got $idType")
    media.select(col("media_id").cast("long"), col("payload"))
      .mapPartitions { it =>
        it.flatMap { r =>
          // a NULL id would NPE inside the error-message formatting
          // below — reject it first with the promised clear message
          require(!r.isNullAt(0),
            "null media_id — every media row needs a non-null id")
          val payload = r.getAs[Array[Byte]]("payload")
          require(payload != null,
            s"null payload for media_id=${r.getLong(0)}")
          val frames =
            try decodeVideoStats(payload)
            catch {
              case scala.util.control.NonFatal(e) => throw
                new IllegalArgumentException(
                  s"media_id=${r.getLong(0)}: ${e.getMessage}", e)
            }
          frames.map { case (f, w, h, sum, sq) =>
            Row(r.getLong(0), f, w, h, sum, sq)
          }
        }
      }(enc)
  }

  /** Video frame sampling stub: emits every `stride`-th frame index with a
    * per-frame payload slice (a real impl would demux the container). Keeps
    * the explode-shape plumbing (one row in → many frame rows out). */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val frames = media
      .filter(col("modality") === "video")
      .select(col("media_id"), col("payload"),
        coalesce(col("meta.duration_ms"), lit(0L)).as("dur"))
      // STUB frame count: 25 fps equivalent — 1 frame per 40ms of duration
      .withColumn("n_frames", greatest((col("dur") / 40).cast("int"), lit(1)))
      .select(col("media_id"),
        // step the sequence directly: exploding every frame and filtering
        // by modulo would materialize stride× more rows than survive
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_idx"),
        col("payload"))
    frames.select(col("media_id"), col("frame_idx"),
      // STUB decode: slice of payload bytes stands in for the frame
      expr("substring(payload, CAST(frame_idx % 32 + 1 AS INT), 8)")
        .as("frame_bytes"))
  }

  // ----- ISO-BMFF (MP4) container metadata: library-free box parser -----
  //
  // The container demux half of MP4 support, the same way
  // [[graft.sources.NetcdfPoints]] handled netCDF's byte grammar: pure
  // public box grammar (ISO/IEC 14496-12 — length-prefixed fourcc boxes,
  // moov/trak/mdia/minf/stbl nesting, mvhd/tkhd/mdhd/hdlr/stsd/stts/
  // stss/stsz/stco payloads), no codec decode (no codec libs in a
  // JDK-only environment — and a crawl pipeline's triage pass needs
  // exactly this: brand, duration, per-track codec fourcc, sample and
  // keyframe counts, dimensions, before any transcode fleet touches the
  // bytes). Parsing is per-row over the binary column — the |corpus|
  // pass stays a projection, nothing collects.

  /** One track's stbl-level metadata. Counts are longs (box fields are
    * unsigned 32-bit); width/height are integer pixels (tkhd 16.16
    * fixed point, fractional part dropped). `n_keyframes` follows the
    * spec's stss rule: absent stss ⇒ every sample is a sync sample. */
  final case class Mp4Track(track_id: Int, handler: String, codec: String,
      n_samples: Long, n_keyframes: Long, width: Int, height: Int)

  /** File-level metadata + tracks, as parsed — the triage record. */
  final case class Mp4Info(major_brand: String, timescale: Long,
      duration_ticks: Long, tracks: Seq[Mp4Track])

  private def fourcc(bb: java.nio.ByteBuffer): String = {
    val b = new Array[Byte](4)
    bb.get(b)
    new String(b, java.nio.charset.StandardCharsets.US_ASCII)
  }

  private def u32(bb: java.nio.ByteBuffer): Long = bb.getInt & 0xffffffffL

  /** Walk the child boxes of [lo, hi): call `f(fourcc, payloadLo,
    * payloadHi)` for each. Truncated/absurd sizes throw with offsets —
    * fail fast like every decode in this object. */
  private def walkBoxes(buf: Array[Byte], lo: Int, hi: Int)
      (f: (String, Int, Int) => Unit): Unit = {
    var off = lo
    while (off < hi) {
      require(hi - off >= 8,
        s"truncated box header at offset $off (${hi - off} bytes left)")
      val bb = java.nio.ByteBuffer.wrap(buf, off, hi - off)
      var size = u32(bb)
      val typ = fourcc(bb)
      var headerLen = 8
      if (size == 1) {
        require(hi - off >= 16, s"truncated largesize box at $off")
        size = bb.getLong
        headerLen = 16
        require(size >= 16, s"bad largesize $size in '$typ' at $off")
      } else if (size == 0) {
        size = (hi - off).toLong // box extends to end of enclosing space
      } else require(size >= 8, s"bad box size $size in '$typ' at $off")
      require(off + size <= hi,
        s"box '$typ' at $off claims $size bytes but only ${hi - off} remain")
      f(typ, off + headerLen, off + size.toInt)
      off += size.toInt
    }
  }

  /** Parse ISO-BMFF metadata from one payload. Rejects non-BMFF bytes
    * (no leading ftyp) and any truncated/overrunning box with a
    * diagnostic offset — a corrupt container in a curated set is a
    * data bug, not a NULL row. */
  private[graft] def parseMp4(payload: Array[Byte]): Mp4Info = {
    require(payload.length >= 16, s"not ISO-BMFF: ${payload.length} bytes")
    var majorBrand: String = null
    var timescale = 0L
    var duration = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    walkBoxes(payload, 0, payload.length) { (typ, lo, hi) =>
      typ match {
        case "ftyp" =>
          val bb = java.nio.ByteBuffer.wrap(payload, lo, hi - lo)
          majorBrand = fourcc(bb)
        case "moov" =>
          walkBoxes(payload, lo, hi) { (t2, lo2, hi2) =>
            t2 match {
              case "mvhd" =>
                val bb = java.nio.ByteBuffer.wrap(payload, lo2, hi2 - lo2)
                val version = bb.get(); bb.position(bb.position() + 3)
                if (version == 1) {
                  bb.position(bb.position() + 16) // 64-bit ctime/mtime
                  timescale = u32(bb); duration = bb.getLong
                } else {
                  bb.position(bb.position() + 8)
                  timescale = u32(bb); duration = u32(bb)
                }
              case "trak" => tracks += parseTrak(payload, lo2, hi2)
              case _ => ()
            }
          }
        case _ => () // mdat, free, skip — metadata never lives there
      }
    }
    require(majorBrand != null, "not ISO-BMFF: no ftyp box")
    Mp4Info(majorBrand, timescale, duration, tracks.toSeq)
  }

  private def parseTrak(buf: Array[Byte], lo: Int, hi: Int): Mp4Track = {
    var trackId = 0
    var width = 0
    var height = 0
    var handler = ""
    var codec = ""
    var nSamples = 0L
    var nKeyframes = -1L // -1 = no stss seen ⇒ all samples sync
    walkBoxes(buf, lo, hi) { (typ, lo2, hi2) =>
      typ match {
        case "tkhd" =>
          val bb = java.nio.ByteBuffer.wrap(buf, lo2, hi2 - lo2)
          val version = bb.get(); bb.position(bb.position() + 3)
          bb.position(bb.position() + (if (version == 1) 16 else 8))
          trackId = u32(bb).toInt
          bb.position(bb.position() + 4) // reserved
          bb.position(bb.position() + (if (version == 1) 8 else 4)) // duration
          // reserved(8) layer(2) alternate(2) volume(2) reserved(2)
          // matrix(36) then width/height as 16.16 fixed point
          bb.position(bb.position() + 52)
          width = (u32(bb) >> 16).toInt
          height = (u32(bb) >> 16).toInt
        case "mdia" =>
          walkBoxes(buf, lo2, hi2) { (t3, lo3, hi3) =>
            t3 match {
              case "hdlr" =>
                val bb = java.nio.ByteBuffer.wrap(buf, lo3, hi3 - lo3)
                bb.position(bb.position() + 8) // vf + pre_defined
                handler = fourcc(bb)
              case "minf" =>
                walkBoxes(buf, lo3, hi3) { (t4, lo4, hi4) =>
                  if (t4 == "stbl")
                    walkBoxes(buf, lo4, hi4) { (t5, lo5, hi5) =>
                      val bb = java.nio.ByteBuffer.wrap(buf, lo5, hi5 - lo5)
                      t5 match {
                        case "stsd" =>
                          bb.position(bb.position() + 4) // vf
                          val n = u32(bb)
                          if (n >= 1) {
                            bb.position(bb.position() + 4) // entry size
                            codec = fourcc(bb)
                          }
                        case "stsz" =>
                          bb.position(bb.position() + 8) // vf + sample_size
                          nSamples = u32(bb)
                        case "stss" =>
                          bb.position(bb.position() + 4) // vf
                          nKeyframes = u32(bb)
                        case _ => ()
                      }
                    }
                }
              case _ => ()
            }
          }
        case _ => ()
      }
    }
    Mp4Track(trackId, handler, codec, nSamples,
      if (nKeyframes >= 0) nKeyframes else nSamples, width, height)
  }

  /** Container metadata per track over a binary MP4 column — one row
    * per (media_id, track): the crawl-triage projection. Fail-fast on
    * malformed payloads (the parse errors carry byte offsets). */
  def mp4Metadata(media: DataFrame): DataFrame = {
    val parse = udf((payload: Array[Byte]) => parseMp4(payload))
    media
      .select(col("media_id"), parse(col("payload")).as("info"))
      .select(col("media_id"), col("info.major_brand").as("major_brand"),
        col("info.timescale").as("timescale"),
        col("info.duration_ticks").as("duration_ticks"),
        explode(col("info.tracks")).as("t"))
      .select(col("media_id"), col("major_brand"), col("timescale"),
        col("duration_ticks"), col("t.track_id").as("track_id"),
        col("t.handler").as("handler"), col("t.codec").as("codec"),
        col("t.n_samples").as("n_samples"),
        col("t.n_keyframes").as("n_keyframes"),
        col("t.width").as("width"), col("t.height").as("height"))
  }

  /** Deterministic ISO-BMFF fixture, real box grammar end to end:
    * ftyp + moov(mvhd, trak…) + mdat, every field a closed form of
    * `id` so the DuckDB oracle recomputes the parse without touching
    * bytes. One video track always; an audio track when id is odd.
    * Geometry: timescale 1000 + (id%3)·500, duration 2000 + (id%7)·300,
    * video codec {avc1,hev1,vp09}[id%3], width 320 + (id%4)·16, height
    * 240 + (id%3)·16, samples 24 + (id%5)·6, keyframe every 3 + id%4
    * samples; audio codec mp4a, samples 40 + (id%6)·5 (no stss — all
    * sync per spec). */
  def syntheticMp4(id: Long): Array[Byte] = {
    require(id >= 0, s"bad mp4 fixture id: $id")
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def fcc(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8L + body.length) ++ fcc(typ) ++ body
    }
    val timescale = 1000L + (id % 3) * 500
    val duration = 2000L + (id % 7) * 300
    val vCodec = Seq("avc1", "hev1", "vp09")((id % 3).toInt)
    val w = 320L + (id % 4) * 16
    val h = 240L + (id % 3) * 16
    val vSamples = (24 + (id % 5) * 6).toInt
    val kfInt = (3 + id % 4).toInt
    val hasAudio = id % 2 == 1
    val aSamples = (40 + (id % 6) * 5).toInt

    def fullBoxHeader: Array[Byte] = be32(0) // version 0 + flags 0
    def mvhd: Array[Byte] = box("mvhd", fullBoxHeader,
      be32(0), be32(0), be32(timescale), be32(duration),
      // rate 1.0, volume 1.0 + reserved(2), reserved(8)
      be32(0x00010000L), be32(0x01000000L), be32(0), be32(0),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      Array.fill(24)(0.toByte), be32(if (hasAudio) 3L else 2L))
    def tkhd(tid: Long, tw: Long, th: Long): Array[Byte] = box("tkhd",
      fullBoxHeader, be32(0), be32(0), be32(tid), be32(0), be32(duration),
      be32(0), be32(0), be32(0), be32(0),
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      be32(tw << 16), be32(th << 16))
    def mdhd: Array[Byte] = box("mdhd", fullBoxHeader,
      be32(0), be32(0), be32(timescale), be32(duration),
      Array(0x55.toByte, 0xc4.toByte, 0, 0)) // und language + pre_defined
    def hdlr(handler: String): Array[Byte] = box("hdlr", fullBoxHeader,
      be32(0), fcc(handler), be32(0), be32(0), be32(0),
      Array(0.toByte)) // empty nul-terminated name
    def sampleEntry(codec: String): Array[Byte] =
      // minimal generic sample entry: 6 reserved bytes + data_ref_index
      box(codec, Array.fill(6)(0.toByte), Array(0.toByte, 1.toByte),
        Array.fill(16)(0.toByte))
    def stbl(codec: String, n: Int, kf: Option[Int]): Array[Byte] = {
      val stsd = box("stsd", fullBoxHeader, be32(1), sampleEntry(codec))
      val stts = box("stts", fullBoxHeader, be32(1), be32(n.toLong),
        be32(duration / math.max(n, 1)))
      val stsz = box("stsz", fullBoxHeader, be32(0), be32(n.toLong),
        (0 until n).flatMap(i => be32(100L + i % 7)).toArray)
      val stco = box("stco", fullBoxHeader, be32(1), be32(0))
      val stss = kf.map { k =>
        val syncs = (1 to n by k).toArray
        box("stss", fullBoxHeader, be32(syncs.length.toLong),
          syncs.flatMap(s => be32(s.toLong)))
      }
      box("stbl", Seq(stsd, stts) ++ stss.toSeq ++ Seq(stsz, stco): _*)
    }
    def trak(tid: Long, handler: String, codec: String, n: Int,
        kf: Option[Int], tw: Long, th: Long): Array[Byte] =
      box("trak", tkhd(tid, tw, th),
        box("mdia", mdhd, hdlr(handler),
          box("minf", stbl(codec, n, kf))))

    val vTrak = trak(1, "vide", vCodec, vSamples, Some(kfInt), w, h)
    val aTrak =
      if (hasAudio) Seq(trak(2, "soun", "mp4a", aSamples, None, 0, 0))
      else Nil
    val ftyp = box("ftyp", fcc("isom"), be32(512),
      fcc("isom"), fcc("mp41"))
    val moov = box("moov", Seq(mvhd, vTrak) ++ aTrak: _*)
    val mdat = box("mdat", Array.fill(32)((id % 251).toByte))
    ftyp ++ moov ++ mdat
  }

  // ------------- MPEG audio (MP3) frame-header demux -------------
  //
  // The second library-free byte-grammar parser (the parseMp4 recipe,
  // ISO 11172-3/13818-3 frame headers instead of 14496-12 boxes): walk
  // the frame stream header by header — no codec decode, none needed
  // for crawl triage — extracting the stream parameters, exact frame/
  // sample counts (hence duration), the CBR/VBR split, and the
  // Xing/Info VBR header when present. Strict-step, fail-fast: each
  // frame's size is computed from its header and the walk REQUIRES the
  // next sync exactly there (a curated-set file that needs resync is a
  // data bug, not a NULL row).

  /** One MP3 stream's triage record. `xing_frames`/`xing_bytes` are −1
    * when the stream carries no Xing/Info header (kept integral so the
    * projection stays NULL-free for exact comparison). */
  final case class Mp3Info(version: String, layer: Int, sample_rate: Int,
      channel_mode: String, n_frames: Long, duration_ms: Long,
      bitrate_kbps_min: Int, bitrate_kbps_max: Int, is_vbr: Boolean,
      id3v2_size: Int, xing_frames: Long, xing_bytes: Long)

  private val Mp3Rates1 = Array(44100, 48000, 32000)
  private val Mp3Rates2 = Array(22050, 24000, 16000)
  private val Mp3Rates25 = Array(11025, 12000, 8000)
  // Layer III bitrate tables, kbps, index 1..14 (0 = free, 15 = bad)
  private val Mp3Br1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Br2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val Mp3Modes =
    Array("stereo", "joint_stereo", "dual_channel", "mono")

  private def be32u(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** Parse one MP3 payload (optional leading ID3v2 tag, then Layer III
    * frames back to back). Rejects bad syncs, reserved version/rate
    * bits, free-format bitrates, truncation, and mid-stream parameter
    * changes (version/rate/mode must be constant; bitrate may vary —
    * that IS the VBR signal) — each with a byte offset. */
  private[graft] def parseMp3(payload: Array[Byte]): Mp3Info = {
    var off = 0
    var id3 = 0
    if (payload.length >= 10 && payload(0) == 'I' && payload(1) == 'D' &&
        payload(2) == '3') {
      // ID3v2 size is sync-safe: 4 × 7 bits, header excluded; the
      // v2.4 FOOTER flag (bit 4 of the flags byte) adds a 10-byte
      // trailer AFTER the counted content — a conformant file the
      // frame walk would otherwise reject at a 10-byte offset
      val sz = ((payload(6) & 0x7f) << 21) | ((payload(7) & 0x7f) << 14) |
        ((payload(8) & 0x7f) << 7) | (payload(9) & 0x7f)
      val footer = if ((payload(5) & 0x10) != 0) 10 else 0
      id3 = 10 + sz + footer
      require(id3 <= payload.length,
        s"ID3v2 tag claims $sz content bytes past end of payload")
      off = id3
    }
    // a trailing 128-byte ID3v1 "TAG" block is ubiquitous on real MP3s
    // — stop the frame walk before it (conformant, not a framing error)
    val end =
      if (payload.length - id3 >= 128 &&
          payload(payload.length - 128) == 'T' &&
          payload(payload.length - 127) == 'A' &&
          payload(payload.length - 126) == 'G')
        payload.length - 128
      else payload.length
    var n = 0L
    var samples = 0L
    var brMin = Int.MaxValue
    var brMax = 0
    var ver = ""
    var rate = 0
    var mode = -1
    var xingFrames = -1L
    var xingBytes = -1L
    while (off < end) {
      require(end - off >= 4,
        s"truncated frame header at offset $off " +
          s"(${end - off} bytes left)")
      val h = be32u(payload, off)
      require((h >>> 21) == 0x7ff,
        f"bad frame sync at offset $off: 0x$h%08x")
      val verBits = ((h >>> 19) & 3).toInt // 0=2.5, 2=2, 3=1
      require(verBits != 1, s"reserved MPEG version bits at offset $off")
      require(((h >>> 17) & 3) == 1, // Layer III = 01
        s"not a Layer III frame at offset $off")
      val noCrc = ((h >>> 16) & 1).toInt // 1 = no CRC after header
      val brIdx = ((h >>> 12) & 0xf).toInt
      require(brIdx != 0 && brIdx != 15,
        s"free/invalid bitrate index $brIdx at offset $off")
      val srIdx = ((h >>> 10) & 3).toInt
      require(srIdx != 3, s"reserved sample-rate bits at offset $off")
      val pad = ((h >>> 9) & 1).toInt
      val chMode = ((h >>> 6) & 3).toInt
      val (vname, r, br, spf, coef) = verBits match {
        case 3 => ("MPEG1", Mp3Rates1(srIdx), Mp3Br1(brIdx), 1152, 144)
        case 2 => ("MPEG2", Mp3Rates2(srIdx), Mp3Br2(brIdx), 576, 72)
        case _ => ("MPEG2.5", Mp3Rates25(srIdx), Mp3Br2(brIdx), 576, 72)
      }
      if (n == 0L) { ver = vname; rate = r; mode = chMode }
      else require(vname == ver && r == rate && chMode == mode,
        s"stream parameters changed mid-file at offset $off: " +
          s"($vname, $r, $chMode) after ($ver, $rate, $mode)")
      val fsz = coef * br * 1000 / r + pad
      require(off + fsz <= end,
        s"frame at offset $off claims $fsz bytes but only " +
          s"${end - off} remain")
      if (n == 0L) {
        // Xing/Info sits after the side info of the FIRST frame
        val sideInfo =
          if (verBits == 3) { if (chMode == 3) 17 else 32 }
          else { if (chMode == 3) 9 else 17 }
        val xo = off + 4 + (if (noCrc == 0) 2 else 0) + sideInfo
        if (xo + 8 <= off + fsz) {
          val tag = new String(payload, xo, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
          if (tag == "Xing" || tag == "Info") {
            val flags = be32u(payload, xo + 4)
            var p = xo + 8
            if ((flags & 1L) != 0 && p + 4 <= off + fsz) {
              xingFrames = be32u(payload, p); p += 4
            }
            if ((flags & 2L) != 0 && p + 4 <= off + fsz)
              xingBytes = be32u(payload, p)
          }
        }
      }
      if (br < brMin) brMin = br
      if (br > brMax) brMax = br
      samples += spf
      n += 1
      off += fsz
    }
    require(n > 0, "no MPEG audio frames (empty stream after ID3v2?)")
    Mp3Info(ver, 3, rate, Mp3Modes(mode), n, samples * 1000L / rate,
      brMin, brMax, brMax != brMin, id3, xingFrames, xingBytes)
  }

  /** Stream metadata over a binary MP3 column — one row per file: the
    * crawl-triage projection (exact duration from the frame walk, the
    * CBR/VBR split, Xing totals for O(1) seek tables). Fail-fast on
    * malformed payloads (parse errors carry byte offsets). */
  def mp3Metadata(media: DataFrame): DataFrame = {
    val parse = udf((payload: Array[Byte]) => parseMp3(payload))
    media
      .select(col("media_id"), parse(col("payload")).as("i"))
      .select(col("media_id"), col("i.version").as("version"),
        col("i.layer").as("layer"),
        col("i.sample_rate").as("sample_rate"),
        col("i.channel_mode").as("channel_mode"),
        col("i.n_frames").as("n_frames"),
        col("i.duration_ms").as("duration_ms"),
        col("i.bitrate_kbps_min").as("bitrate_kbps_min"),
        col("i.bitrate_kbps_max").as("bitrate_kbps_max"),
        col("i.is_vbr").as("is_vbr"),
        col("i.id3v2_size").as("id3v2_size"),
        col("i.xing_frames").as("xing_frames"),
        col("i.xing_bytes").as("xing_bytes"))
  }

  /** Deterministic MP3 fixture, real frame grammar end to end: an
    * ID3v2 tag when id is odd, then 8 + id%5 MPEG1 Layer III frames
    * whose every header field is a closed form of `id` — so the DuckDB
    * oracle recomputes the whole parse without touching bytes.
    * Geometry: sample rate [44100, 48000, 32000][id%3]; channel mode
    * id%4; padding bit alternates per frame; bitrate index
    * 1 + (id + frame)%14 when id%3 == 0 (VBR) else 1 + id%14 (CBR);
    * a Xing header (frames + bytes) in frame 0 when id is even;
    * ID3v2 content is 13 + (id%4)·7 bytes. Frame bodies are
    * deterministic filler — the parser steps sizes, never scans, so
    * body bytes are inert by construction. */
  def syntheticMp3(id: Long): Array[Byte] = {
    require(id >= 0, s"bad mp3 fixture id: $id")
    val srIdx = (id % 3).toInt
    val rate = Mp3Rates1(srIdx)
    val mode = (id % 4).toInt
    val n = (8 + id % 5).toInt
    val vbr = id % 3 == 0
    def brIdx(f: Int): Int =
      if (vbr) 1 + ((id + f) % 14).toInt else 1 + (id % 14).toInt
    val frames = (0 until n).map { f =>
      val bi = brIdx(f)
      val pad = f % 2
      val fsz = 144 * Mp3Br1(bi) * 1000 / rate + pad
      val b = new Array[Byte](fsz)
      // header: sync=0x7ff, MPEG1 (11), Layer III (01), no CRC (1)
      val h = (0x7ffL << 21) | (3L << 19) | (1L << 17) | (1L << 16) |
        (bi.toLong << 12) | (srIdx.toLong << 10) | (pad.toLong << 9) |
        (mode.toLong << 6)
      b(0) = (h >> 24).toByte; b(1) = (h >> 16).toByte
      b(2) = (h >> 8).toByte; b(3) = h.toByte
      // filler steps by 1 mod 251 — consecutive bytes can never spell
      // an ASCII fourcc, so a no-Xing stream can't fake one
      var i = 4
      while (i < fsz) { b(i) = ((id * 31 + f * 7 + i) % 251).toByte
        i += 1 }
      b
    }
    val total = frames.map(_.length).sum
    if (id % 2 == 0) {
      val sideInfo = if (mode == 3) 17 else 32
      val b = frames(0)
      val xo = 4 + sideInfo
      "Xing".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        .copyToArray(b, xo)
      def put32(off: Int, v: Long): Unit = {
        b(off) = (v >> 24).toByte; b(off + 1) = (v >> 16).toByte
        b(off + 2) = (v >> 8).toByte; b(off + 3) = v.toByte
      }
      put32(xo + 4, 3L) // flags: frames + bytes
      put32(xo + 8, n.toLong)
      put32(xo + 12, total.toLong)
    }
    val id3 =
      if (id % 2 == 1) {
        val content = 13 + (id % 4).toInt * 7
        val hdr = Array[Byte]('I', 'D', '3', 3, 0, 0,
          ((content >> 21) & 0x7f).toByte, ((content >> 14) & 0x7f).toByte,
          ((content >> 7) & 0x7f).toByte, (content & 0x7f).toByte)
        hdr ++ Array.tabulate(content)(i => ((id * 13 + i) % 251).toByte)
      } else Array.empty[Byte]
    id3 ++ frames.flatten
  }
}

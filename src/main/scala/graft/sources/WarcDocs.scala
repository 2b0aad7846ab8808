package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC-shaped document archives — the Common Crawl interchange format
  * a web-scale training corpus actually arrives in. This is a minimal,
  * library-free WARC/1.0 implementation of the subset a text pipeline
  * needs: `resource` records with a target URI and a UTF-8 payload,
  * framed by `Content-Length` (the framing is what makes WARC robust:
  * payloads may contain ANYTHING, including bytes that look like record
  * headers — a reader must never scan for boundaries).
  *
  * Scale shape mirrors production Common Crawl: one `.warc` file per
  * partition on write, per-FILE parallelism on read (`binaryFile`
  * source — CC ships thousands of ~1 GB shards, so file-level
  * parallelism is the real layout; per-record gzip members would add
  * intra-file splits and are out of scope). Nothing touches the
  * driver.
  *
  * Reference for the record grammar: ISO 28500 (WARC/1.0) — version
  * line, `Name: value` headers, CRLF blank line, Content-Length payload
  * bytes, CRLF CRLF trailer.
  */
object WarcDocs {

  private val Crlf = "\r\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Write (`idCol`, `uriCol`, `textCol`) rows as WARC/1.0 resource
    * records, one `part-NNNNN.warc` file per partition under `dir`.
    * Content-Length counts UTF-8 payload BYTES (multi-byte text safe).
    * With `gzip = true`, files are `.warc.gz` with one gzip MEMBER per
    * record — Common Crawl's actual on-disk layout (member boundaries
    * are what let archive tooling seek to records; a whole-file gzip
    * stream couldn't).
    *
    * Task-commit protocol: each task attempt writes a hidden
    * attempt-scoped temp file through the Hadoop FileSystem API and
    * commits it with a rename; first attempt to rename wins, losers
    * delete their temp. Speculative or retried attempts therefore
    * never interleave bytes into a final shard, and `dir` may be any
    * Hadoop-visible path (shared FS required on a multi-node cluster —
    * executor-local paths are invisible to read(), same as every
    * Hadoop output format). Executors build their FileSystem from the
    * DRIVER's broadcast Hadoop conf, so spark.hadoop.* credentials and
    * defaultFS overrides apply at task time exactly as at plan time.
    * Re-writing an existing `dir` OVERWRITES it: the driver sweeps
    * previous part files first, so a re-run never silently serves a
    * stale shard. CONCURRENT writes to one `dir` are unsupported (same
    * contract as Spark's own file sinks in overwrite mode): a second
    * job's driver sweep deletes the first job's in-flight attempt
    * temps and committed shards — serialize writers per directory. */
  def write(df: DataFrame, idCol: String, uriCol: String, textCol: String,
      dir: String, gzip: Boolean = false): Unit = {
    val sc = df.sparkSession.sparkContext
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val driverFs = dirPath.getFileSystem(sc.hadoopConfiguration)
    require(driverFs.mkdirs(dirPath) || driverFs.getFileStatus(dirPath)
      .isDirectory, s"cannot create $dir")
    // OVERWRITE semantics, decided at the driver: clear every shard a
    // previous write left (finals AND orphaned attempt temps) before
    // any task runs. Task-side rename then has one meaning — a failed
    // rename can only be a sibling attempt of THIS job having won, so
    // the loser discards; without this sweep a pre-existing final made
    // the outcome FS-dependent (HDFS rename-to-existing returns false
    // and kept the STALE shard; local rename(2) overwrote).
    Option(driverFs.globStatus(new org.apache.hadoop.fs.Path(dir,
        "{part-*.warc*,.part-*.warc*}")))
      .getOrElse(Array.empty)
      .foreach(st => driverFs.delete(st.getPath, false))
    // executors must see the DRIVER's Hadoop conf (spark.hadoop.* —
    // s3a/gs credentials, defaultFS overrides): a task-side
    // `new Configuration()` only reads classpath site XMLs, which on a
    // Spark-conf-configured cluster hits the wrong FS or fails auth —
    // masked in local runs because the driver-side mkdirs used the
    // right conf. Configuration is not Serializable; ship it with the
    // same wrapper Spark's own datasources use.
    val confBc = sc.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        sc.hadoopConfiguration))
    df.select(col(idCol).cast("long"), col(uriCol).cast("string"),
        col(textCol).cast("string"))
      .rdd
      .foreachPartition { it =>
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val ext = if (gzip) "warc.gz" else "warc"
        val finalPath = new org.apache.hadoop.fs.Path(dir,
          f"part-$pid%05d.$ext")
        val tmpPath = new org.apache.hadoop.fs.Path(dir,
          f".part-$pid%05d.$ext.attempt-${tc.taskAttemptId()}")
        // a PRIVATE FileSystem instance (newInstance bypasses the JVM
        // cache): setWriteChecksum on the cached shared instance would
        // disable checksum writing for every other writer in this
        // executor that shares the scheme/authority/UGI cache key —
        // racily and for the life of the JVM
        val fs = org.apache.hadoop.fs.FileSystem.newInstance(
          finalPath.toUri, confBc.value.value)
        try {
        // no client-side .crc sidecars: a WARC dir is an interchange
        // layout read by non-Hadoop tooling, and a stale sidecar turns
        // every downstream read into a checksum error
        fs.setWriteChecksum(false)
        val os = new java.io.BufferedOutputStream(
          fs.create(tmpPath, true))
        try it.foreach { r =>
          val id = r.getLong(0)
          val uri = r.getString(1)
          // header VALUES have no length framing — a control char in a
          // crawler-supplied uri would inject a header line and corrupt
          // the record grammar the payload framing protects against
          require(!uri.exists(c => c == '\r' || c == '\n'),
            s"uri for doc $id contains CR/LF — reject or sanitize " +
              "upstream (WARC header values cannot frame control chars)")
          val payload = r.getString(2)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val header =
            s"""WARC/1.0\r
               |WARC-Type: resource\r
               |WARC-Record-ID: <urn:graft:$id>\r
               |WARC-Target-URI: $uri\r
               |Content-Length: ${payload.length}\r
               |\r
               |""".stripMargin
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          if (gzip) {
            // one self-contained gzip member per record
            val bos = new java.io.ByteArrayOutputStream()
            val gz = new java.util.zip.GZIPOutputStream(bos)
            gz.write(header); gz.write(payload)
            gz.write(Crlf); gz.write(Crlf)
            gz.finish(); gz.close()
            os.write(bos.toByteArray)
          } else {
            os.write(header)
            os.write(payload)
            os.write(Crlf)
            os.write(Crlf)
          }
        } finally os.close()
        // commit: first successful attempt wins the final name; a
        // racing speculative attempt loses the rename and discards
        // (the driver swept stale finals from previous writes, so a
        // losing rename here always means a sibling of this job won)
        if (!fs.rename(tmpPath, finalPath)) fs.delete(tmpPath, false)
        } finally fs.close()
      }
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("uri", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Read a directory of `.warc` / `.warc.gz` files back to
    * (doc_id, uri, text). Content-Length framing only — a payload
    * containing "WARC/1.0" or CRLF runs parses correctly (spec-pinned).
    * Shards stream end to end: each task opens its file as a
    * [[org.apache.spark.input.PortableDataStream]] (lazy, positioned
    * filesystem reads — the shard's bytes NEVER materialize as one
    * array, compressed or not), and gzip members decompress as a
    * stream of concatenated members (GZIPInputStream handles the
    * multi-member layout). A ~1 GB Common Crawl-sized `.warc.gz` that
    * inflates to several GB therefore parses in O(record) memory —
    * the 2 GB array cap and the whole-file copy of an eager
    * binary-file read would bite at exactly that shard size.
    * Malformed records fail loudly with the file and decompressed
    * byte offset. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val rdd = spark.sparkContext.binaryFiles(s"$dir/*.warc*")
      .flatMap { case (path, pds) =>
        // a zero-record shard (empty write partition) is 0 bytes;
        // GZIPInputStream's constructor EOFs on it, so peek one byte
        // before handing over
        val raw = new java.io.PushbackInputStream(pds.open())
        val first = raw.read()
        if (first < 0) { raw.close(); Iterator.empty }
        else {
        raw.unread(first)
        val in = new java.io.BufferedInputStream(
          if (path.endsWith(".gz"))
            new java.util.zip.GZIPInputStream(raw)
          else raw, 1 << 16)
        // close at task end even if the iterator is abandoned
        // (limit/take downstream); parseRecords itself never holds
        // more than one record
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => in.close()))
        parseRecords(path, in)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Streaming record parser: reads headers byte by byte and payloads
    * with exact-length bulk reads — O(largest record) memory. */
  private def parseRecords(path: String,
      in: java.io.InputStream): Iterator[Row] = {
    var p = 0L // decompressed offset, for error context
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"$path @ byte $p: $msg")
    def readByte(): Int = { val b = in.read(); if (b >= 0) p += 1; b }
    def line(): String = {
      val bos = new java.io.ByteArrayOutputStream(64)
      var prev = -1
      var b = readByte()
      while (b >= 0 && !(prev == '\r' && b == '\n')) {
        bos.write(b); prev = b; b = readByte()
      }
      if (b < 0) fail("unterminated header line")
      val arr = bos.toByteArray
      new String(arr, 0, arr.length - 1, // drop the trailing '\r'
        java.nio.charset.StandardCharsets.UTF_8)
    }
    def readExactly(n: Int): Array[Byte] = {
      val buf = new Array[Byte](n)
      var off = 0
      while (off < n) {
        val got = in.read(buf, off, n - off)
        if (got < 0) fail("truncated payload")
        off += got; p += got
      }
      buf
    }
    new Iterator[Row] {
      private var nextByte: Int = readByte()
      override def hasNext: Boolean = nextByte >= 0
      override def next(): Row = {
        // the lookahead byte is the first char of the version line
        val version = nextByte.toChar + line()
        if (version != "WARC/1.0") fail("expected WARC/1.0 version line")
        var id = -1L
        var uri: String = null
        var len = -1
        var h = line()
        while (h.nonEmpty) {
          val i = h.indexOf(": ")
          if (i < 0) fail(s"malformed header '$h'")
          val (k, v) = (h.substring(0, i), h.substring(i + 2))
          k match {
            case "WARC-Record-ID" =>
              require(v.startsWith("<urn:graft:") && v.endsWith(">"),
                s"unexpected record id $v")
              id = v.substring(11, v.length - 1).toLong
            case "Content-Length" => len = v.toInt
            case "WARC-Target-URI" => uri = v
            case _ => () // tolerated, like a real reader
          }
          h = line()
        }
        if (id < 0 || uri == null || len < 0)
          fail("record missing WARC-Record-ID/WARC-Target-URI/" +
            "Content-Length")
        val text = new String(readExactly(len),
          java.nio.charset.StandardCharsets.UTF_8)
        val tr = readExactly(4)
        if (!(tr(0) == '\r' && tr(1) == '\n' && tr(2) == '\r' &&
            tr(3) == '\n'))
          fail("missing record trailer")
        nextByte = readByte()
        Row(id, uri, text)
      }
    }
  }
}

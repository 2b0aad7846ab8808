package graft

import graft.sources.WarcDocs
import org.apache.spark.sql.functions._

/** WARC framing round-trip: Content-Length framing must survive
  * payloads that LOOK like record boundaries, multi-byte UTF-8 (length
  * is bytes, not chars), and empty documents; malformed bytes fail
  * loudly with an offset. */
class WarcDocsSpec extends SparkSpec {

  test("round-trip: adversarial payloads, unicode byte lengths, empties") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      // payload embedding a fake record boundary + header block
      (1L, "https://example.org/a",
        "before\r\n\r\nWARC/1.0\r\nWARC-Type: resource\r\n\r\nafter"),
      // multi-byte UTF-8: byte length != char length
      (2L, "https://example.org/b", "héllo wörld — ünïcode ≠ ascii"),
      (3L, "https://example.org/c", ""), // empty payload
      (4L, "https://example.org/d", "plain text"))
    val df = rows.toDF("doc_id", "uri", "text").repartition(3)
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_spec")
    try {
      WarcDocs.write(df, "doc_id", "uri", "text", tmp.toString)
      val back = WarcDocs.read(spark, tmp.toString).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
        .toMap
      assert(back == rows.map(r => r._1 -> ((r._2, r._3))).toMap)
      // written shards are real WARC/1.0 (version line leads each file)
      val aFile = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".warc")).filter(_.length > 0).head
      val head = java.nio.file.Files.readAllBytes(aFile.toPath).take(8)
      assert(new String(head, "US-ASCII") == "WARC/1.0")
      // truncating a payload fails loudly with file + offset, never a
      // silent short record
      val full = java.nio.file.Files.readAllBytes(aFile.toPath)
      java.nio.file.Files.write(aFile.toPath, full.dropRight(3))
      val ex = intercept[org.apache.spark.SparkException] {
        WarcDocs.read(spark, tmp.toString).collect()
      }
      assert(ex.getCause.getMessage.contains("byte"))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("re-write to the same dir OVERWRITES: no stale shard survives") {
    val spark2 = spark
    import spark2.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_ow")
    try {
      // first write: 4 rows across 3 partitions (3 shards)
      WarcDocs.write(Seq(
          (1L, "https://e.org/1", "old-one"), (2L, "https://e.org/2", "old-two"),
          (3L, "https://e.org/3", "old-three"), (4L, "https://e.org/4", "old-four"))
        .toDF("doc_id", "uri", "text").repartition(3),
        "doc_id", "uri", "text", tmp.toString)
      // plant an orphaned attempt temp (a crashed attempt would leave one)
      java.nio.file.Files.writeString(
        tmp.resolve(".part-00099.warc.attempt-7"), "garbage")
      // second write: fewer partitions than the first — partition 2's
      // old shard has no same-named successor, the case a rename-only
      // protocol silently serves stale data for
      WarcDocs.write(Seq((9L, "https://e.org/9", "new-nine"))
        .toDF("doc_id", "uri", "text").coalesce(1),
        "doc_id", "uri", "text", tmp.toString)
      val back = WarcDocs.read(spark, tmp.toString).collect()
        .map(r => (r.getLong(0), r.getString(2))).toSet
      assert(back == Set((9L, "new-nine")))
      // the orphaned temp was swept too
      assert(!java.nio.file.Files.exists(
        tmp.resolve(".part-00099.warc.attempt-7")))
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("streaming read: a >64 MB single shard parses row by row") {
    // one ~70 MB shard (100k x ~700-char payloads) read through the
    // PortableDataStream path — the shard streams through a 64 KB
    // buffer instead of materializing as one array (the structural
    // guarantee; parseRecords holds at most one record at a time)
    val spark2 = spark
    import spark2.implicits._
    val n = 100000L
    val df = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("https://example.org/big/"), col("id")).as("uri"),
      concat(lit("x"), col("id").cast("string"),
        lit("_" * 690)).as("text")).coalesce(1)
    val tmp = java.nio.file.Files.createTempDirectory("graft_warc_big")
    try {
      WarcDocs.write(df, "doc_id", "uri", "text", tmp.toString)
      val f = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".warc")).head
      assert(f.length > 64L * 1024 * 1024, s"shard only ${f.length} bytes")
      val back = WarcDocs.read(spark, tmp.toString)
      assert(back.count() == n)
      // spot-check contents survived framing at scale
      val probe = back.filter(col("doc_id") === 99999L).collect().head
      assert(probe.getString(1) == "https://example.org/big/99999")
      assert(probe.getString(2).startsWith("x99999_"))
      // an abandoned iterator (limit) must not wedge the task
      assert(back.limit(5).collect().length == 5)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("gzip shards: per-record members, gzip magic, identical rows") {
    val spark2 = spark
    import spark2.implicits._
    val rows = Seq(
      (1L, "https://example.org/a", "compressed héllo\r\n\r\nWARC/1.0"),
      (2L, "https://example.org/b", ""))
    val df = rows.toDF("doc_id", "uri", "text").repartition(2)
    val tmp = java.nio.file.Files.createTempDirectory("graft_warcgz_spec")
    try {
      WarcDocs.write(df, "doc_id", "uri", "text", tmp.toString, gzip = true)
      val gz = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".warc.gz")).filter(_.length > 0)
      assert(gz.nonEmpty)
      val head = java.nio.file.Files.readAllBytes(gz.head.toPath)
      assert((head(0) & 0xff) == 0x1f && (head(1) & 0xff) == 0x8b)
      val back = WarcDocs.read(spark, tmp.toString).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
        .toMap
      assert(back == rows.map(r => r._1 -> ((r._2, r._3))).toMap)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}

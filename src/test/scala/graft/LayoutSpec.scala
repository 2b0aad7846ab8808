package graft

import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  /** Rows the parquet scan actually produced (post row-group pruning +
    * pushdown), from the scan node's metrics after execution. */
  private def scannedRows(df: DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("sorted layout: the same filter reads far fewer rows") {
    val n = 200000L
    val data = spark.range(0, n)
      .select((xxhash64(col("id")) % 10000).as("k"), col("id").as("payload"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_layout")
    try {
      // tiny row groups so a ~3 MB fixture has many of them — at real
      // scale the default 128 MB groups play this role
      Layout.writeSorted(data, Seq("k"), s"$tmp/sorted",
        rowGroupBytes = 64 * 1024)
      data.repartition(8).write
        .option("parquet.block.size", 64 * 1024).parquet(s"$tmp/shuffled")

      def filtered(p: String) = spark.read.parquet(p)
        .filter(col("k").between(100, 200))
      val want = filtered(s"$tmp/shuffled").count()
      assert(want == filtered(s"$tmp/sorted").count(),
        "layout must never change results")
      val rowsSorted = scannedRows(filtered(s"$tmp/sorted"))
      val rowsShuffled = scannedRows(filtered(s"$tmp/shuffled"))
      // every row group of the shuffled copy spans the whole key range
      // (min/max stats prune nothing); the sorted copy's groups cover
      // narrow ranges and nearly all skip
      assert(rowsSorted * 10 < rowsShuffled,
        s"sorted scan read $rowsSorted rows vs shuffled $rowsShuffled")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("compact hits the target file count, preserving rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact")
    try {
      val df = spark.range(0, 10000).toDF("id").repartition(37) // many tiny
      Layout.compact(df, targetRowsPerFile = 2500, s"$tmp/out")
      val files = new java.io.File(s"$tmp/out").listFiles()
        .count(f => f.getName.endsWith(".parquet"))
      assert(files == 4, s"expected 4 files, got $files")
      assert(spark.read.parquet(s"$tmp/out").count() == 10000L)
      assertThrows[IllegalArgumentException] {
        Layout.compact(df, 0, s"$tmp/bad")
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}

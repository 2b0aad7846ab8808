package graft.sources

import java.nio.channels.FileChannel

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions.col

/** The two-pass rank-parallel positioned-write skeleton shared by the
  * point-file sinks ([[BinaryPoints.write]], [[NetcdfPoints.write]]) —
  * the Spark re-expression of the reference's collective offset write
  * (`dbscan.cpp:583-588`: each rank writes its row range at offset
  * `Σ point_count[<rank]`):
  *
  *  1. order globally by id (`repartitionByRange` + `sortWithinPartitions`
  *     gives disjoint, globally-ordered row ranges) and persist so both
  *     passes see identical partitions;
  *  2. pass 1 counts rows per partition and validates vector shape (a
  *     ragged vector fails HERE, before any bytes hit disk);
  *  3. the caller's `plan` turns (n, dims, per-partition counts) into the
  *     header bytes + total file length + a per-partition slice writer;
  *  4. the driver writes the header and pre-sizes the file, then pass 2
  *     has every partition write its own disjoint slice through a
  *     positioned `FileChannel` — no point data ever crosses the driver.
  *
  * Requires a shared filesystem (local/NFS); on an object store the same
  * shape maps to a multipart upload with one part per partition.
  */
private[sources] object SliceWrite {

  /** Everything pass 2 needs, computed on the driver from pass-1 stats.
    *
    * @param header    bytes written at offset 0 before pass 2
    * @param fileLength total pre-sized length
    * @param writePart (partitionIdx, rowsBeforeThisPartition, dims,
    *   rows, channel) → rows written; positions are the writer's own
    *   business — ranges are disjoint by construction. Rows arrive as
    *   (id: long, vector: Seq[Float], extras...) per `selected`. */
  case class WritePlan(header: Array[Byte], fileLength: Long,
      writePart: (Int, Long, Int, Iterator[Row], FileChannel) => Long)

  /** @param selected projection with the long id first and the
    *   `array<float>` vector SECOND (pass 1's shape check reads index 1)
    * @param plan driver-side: (totalRows, dims, perPartitionRowCounts) →
    *   [[WritePlan]]; throw here to reject (size caps etc.) */
  def twoPass(df: DataFrame, selected: Seq[Column], path: String,
      plan: (Long, Int, Array[Long]) => WritePlan): Unit = {
    val parts = math.min(256, math.max(1, df.rdd.getNumPartitions))
    val projected = df.select(selected: _*)
    val idName = projected.columns.head
    val data = projected
      .repartitionByRange(parts, col(idName))
      .sortWithinPartitions(idName)
      .persist() // both passes must see identical partitions
    try {
      // pass 1: (partition, rows, dims) — dims checked per row
      val stats = data.rdd.mapPartitionsWithIndex { (i, it) =>
        var cnt = 0L
        var d = -1
        it.foreach { r =>
          val fs = r.getSeq[Float](1)
          if (d == -1) d = fs.length
          else require(fs.length == d,
            s"ragged vector in partition $i: expected $d floats, got ${fs.length}")
          cnt += 1
        }
        Iterator((i, cnt, d))
      }.collect().sortBy(_._1)
      val n = stats.map(_._2).sum
      require(n > 0, "refusing to write an empty point table " +
        "(the formats need dims, which come from the data)")
      val dimsSeen = stats.collect { case (_, c, d) if c > 0 => d }.distinct
      require(dimsSeen.size == 1,
        s"ragged vectors across partitions: dims ${dimsSeen.mkString(", ")}")
      val d = dimsSeen.head
      val rowCounts = stats.map(_._2)
      val p = plan(n, d, rowCounts)

      val raf = new java.io.RandomAccessFile(path, "rw")
      try {
        raf.setLength(0L)
        raf.write(p.header)
        raf.setLength(p.fileLength)
      } finally raf.close()

      // pass 2: disjoint slices, every partition its own positioned write
      val rowOffsets = rowCounts.scanLeft(0L)(_ + _)
      val writePart = p.writePart
      val written = data.rdd.mapPartitionsWithIndex { (i, it) =>
        val ch = FileChannel.open(java.nio.file.Paths.get(path),
          java.nio.file.StandardOpenOption.WRITE)
        try Iterator((i, writePart(i, rowOffsets(i), d, it, ch)))
        finally ch.close()
      }.collect().sortBy(_._1)
      require(written.map(_._2).sameElements(rowCounts),
        "partition row counts changed between the count and write passes")
    } finally data.unpersist()
  }
}

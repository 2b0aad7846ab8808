package graft.sources

import java.io.{DataInputStream, EOFException, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Reader for the reference's binary point format (op S-1,
  * `clusters.cpp:128-224`; format documented at reference `README:49-52`):
  * little-endian header `(num_points: int32, dims: int32)` followed by
  * `num_points × dims` float32 coordinates, row-major.
  *
  * Distribution mirrors the reference's block read — rank r seeks to its
  * contiguous row range (`clusters.cpp:156-189`) — as one Spark task per
  * row range: the driver reads only the 8-byte header, then parallelizes
  * (start, count) ranges; each task opens the file and reads its slice.
  * Point ids are the global row number (derived from the file offset, so
  * they are stable across partition counts — needed for the canonical
  * min-id cluster labels).
  *
  * At 100 TB one would register this as a DataSourceV2 `FileFormat` with
  * proper split planning over an object store; for the single-file local
  * layout the explicit range parallelization below produces the identical
  * task structure.
  */
object BinaryPoints {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("features", ArrayType(FloatType, containsNull = false),
      nullable = false)))

  /** Read header only: (numPoints, dims). */
  def header(path: String): (Int, Int) = {
    val in = new DataInputStream(new FileInputStream(path))
    try {
      val buf = new Array[Byte](8)
      in.readFully(buf)
      val bb = ByteBuffer.wrap(buf).order(ByteOrder.LITTLE_ENDIAN)
      (bb.getInt, bb.getInt)
    } finally in.close()
  }

  /** Write a point table back to the reference's binary layout (header +
    * row-major float32), rows ordered by id — the inverse of [[read]], so
    * a reference-engine user can consume our output unchanged.
    * Rank-parallel via the shared [[SliceWrite]] two-pass skeleton
    * (the reference's collective offset write, `dbscan.cpp:583-588`). */
  def write(df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    SliceWrite.twoPass(df,
      Seq(col(idCol).cast("long").as("id"), col(vecCol).as("v")), path,
      (n, d, _) => {
        require(n <= Int.MaxValue,
          s"$n rows do not fit the format's int32 point count")
        val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        hdr.putInt(n.toInt); hdr.putInt(d)
        SliceWrite.WritePlan(hdr.array(), 8L + n * d * 4L,
          (_, rowOffset, dims, it, ch) => {
            ch.position(8L + rowOffset * dims * 4L)
            // max(1, d*4) guards d = 0 (legal: a (n, 0) file is header +
            // zero bytes per row — the old driver-side writer accepted it)
            val rowsPerBuf = math.max(1, (1 << 20) / math.max(1, dims * 4))
            val buf = ByteBuffer.allocate(rowsPerBuf * dims * 4)
              .order(ByteOrder.LITTLE_ENDIAN)
            def flush(): Unit = {
              buf.flip()
              while (buf.hasRemaining) ch.write(buf)
              buf.clear()
            }
            var cnt = 0L
            it.foreach { r =>
              val fs = r.getSeq[Float](1)
              require(fs.length == dims,
                s"vector changed between passes: expected $dims floats, got ${fs.length}")
              if (buf.remaining() < dims * 4) flush()
              fs.foreach(buf.putFloat)
              cnt += 1
            }
            flush()
            cnt
          })
      })
  }

  def read(spark: SparkSession, path: String,
      numPartitions: Int = 0): DataFrame = {
    val (n, d) = header(path)
    val parts =
      if (numPartitions > 0) numPartitions
      else math.max(1, math.min(spark.sparkContext.defaultParallelism,
        math.max(1, n / 4096)))
    val per = (n + parts - 1) / parts
    val ranges = (0 until parts)
      .map(p => (p.toLong * per, math.min(per.toLong, n - p.toLong * per)))
      .filter(_._2 > 0)

    val rdd = spark.sparkContext
      // max(1, …): a legal header-only file (n = 0) yields zero ranges,
      // and parallelize rejects numSlices = 0
      .parallelize(ranges, math.max(1, ranges.size))
      .flatMap { case (start, cnt) =>
        val in = new FileInputStream(path)
        val ch = in.getChannel
        ch.position(8L + start * d * 4L)
        val dis = new DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
        // close on task completion, not just on iterator exhaustion —
        // limit()/take() stop pulling early and would leak the fd
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => dis.close()))
        val rowBytes = new Array[Byte](d * 4)
        new Iterator[Row] {
          private var i = 0L
          override def hasNext: Boolean = {
            val h = i < cnt
            if (!h) dis.close()
            h
          }
          override def next(): Row = {
            try dis.readFully(rowBytes)
            catch { case e: EOFException => dis.close(); throw e }
            val bb = ByteBuffer.wrap(rowBytes).order(ByteOrder.LITTLE_ENDIAN)
            val fs = new Array[Float](d)
            var j = 0
            while (j < d) { fs(j) = bb.getFloat; j += 1 }
            i += 1
            Row(start + i - 1, fs.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}

package graft.sources

import java.io.{DataInputStream, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 for the reference's binary point format (op S-1,
  * `clusters.cpp:128-224`): `spark.read.format("binaryPoints")
  * .option("path", f).load()` → (`id`, `features`).
  *
  * Proper source integration, unlike the one-shot loader in
  * [[BinaryPoints.read]] (kept for writer/round-trip use):
  *  - split planning: one InputPartition per contiguous row range (the
  *    reference's per-rank block read, `clusters.cpp:156-189`), sized by
  *    `spark.sql.files.maxPartitionBytes` worth of rows;
  *  - column pruning pushed into the scan: an id-only projection never
  *    deserializes coordinates (a `SELECT count(*)` reads no floats at
  *    all — it seeks);
  *  - ids are global row numbers derived from the file offset, stable
  *    across partition counts.
  */
class BinaryPointsV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "binaryPoints"

  private def pathOf(options: util.Map[String, String]): String = {
    val p = options.get("path")
    require(p != null, "binaryPoints requires .option(\"path\", ...) or load(path)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BinaryPoints.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // validate here (the only place Spark hands us the options before
    // building the table) — a missing path would otherwise surface as a
    // bare NPE from FileInputStream at scan planning time
    new BinaryPointsTable(pathOf(properties))
}

class BinaryPointsTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"binaryPoints($path)"
  override def schema(): StructType = BinaryPoints.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new BinaryPointsScanBuilder(path,
      options.getLong("maxBytesPerPartition", 128L * 1024 * 1024))
}

class BinaryPointsScanBuilder(path: String, maxBytesPerPartition: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = BinaryPoints.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new BinaryPointsScan(path, required, maxBytesPerPartition)
}

case class BinaryPointsRange(start: Long, count: Long, dims: Int)
  extends InputPartition

class BinaryPointsScan(path: String, required: StructType,
    maxBytesPerPartition: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val (n, d) = BinaryPoints.header(path)
    val rowBytes = d * 4L
    val rowsPerSplit = math.max(1L, maxBytesPerPartition / math.max(1L, rowBytes))
    (0L until n.toLong by rowsPerSplit).map { start =>
      BinaryPointsRange(start, math.min(rowsPerSplit, n - start), d)
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new BinaryPointsReaderFactory(path, required)
}

class BinaryPointsReaderFactory(path: String, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[BinaryPointsRange]
    new BinaryPointsReader(path, r, required)
  }
}

class BinaryPointsReader(path: String, range: BinaryPointsRange,
    required: StructType) extends PartitionReader[InternalRow] {
  private val wantId = required.fieldNames.contains("id")
  private val wantFeatures = required.fieldNames.contains("features")
  private val idFirst =
    required.fieldNames.headOption.contains("id") || !wantFeatures

  private var i = 0L
  private val rowBytes = new Array[Byte](range.dims * 4)
  private lazy val dis: DataInputStream = {
    val in = new FileInputStream(path)
    in.getChannel.position(8L + range.start * range.dims * 4L)
    new DataInputStream(new java.io.BufferedInputStream(in, 1 << 20))
  }
  // id-only / count-only scans never open per-row float decoding
  private lazy val skipOnly: Boolean = !wantFeatures

  // PartitionReader contract: next() advances the cursor and buffers the
  // row; get() is a pure accessor returning the same row until the next
  // next() call (safe under callers that get() twice or skip a get())
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (i >= range.count) return false
    val id = range.start + i
    current =
      if (skipOnly) {
        if (wantId) InternalRow(id) else InternalRow.empty
      } else {
        dis.readFully(rowBytes)
        val bb = ByteBuffer.wrap(rowBytes).order(ByteOrder.LITTLE_ENDIAN)
        val fs = new Array[Float](range.dims)
        var j = 0
        while (j < range.dims) { fs(j) = bb.getFloat; j += 1 }
        val arr = new GenericArrayData(fs.map(f => f: Any))
        if (!wantId) InternalRow(arr)
        else if (idFirst) InternalRow(id, arr)
        else InternalRow(arr, id)
      }
    i += 1
    true
  }

  override def get(): InternalRow = current

  override def close(): Unit = if (wantFeatures) dis.close()
}

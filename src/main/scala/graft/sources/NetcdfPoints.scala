package graft.sources

import java.io.{BufferedInputStream, DataInputStream, FileInputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** NetCDF-3 "classic" sink + source for the reference's cluster output
  * (op K-1, `dbscan.cpp:510-632`): dimension `num_particles`, one
  * `NC_FLOAT` variable `position_col_X{j}` per coordinate, one `NC_INT`
  * variable `cluster_id`, written rank-parallel by disjoint row ranges
  * (`ncmpi_put_vara_*_all` at offset `Σ point_count[<rank]`,
  * `dbscan.cpp:583-588`).
  *
  * The reference needs pnetCDF for this; the classic file format itself
  * is a small, fully public byte layout (the CDF-1/CDF-2 grammar in the
  * NetCDF users' guide appendix), so we write it directly — no library —
  * through the shared [[SliceWrite]] two-pass skeleton: pass 1 counts
  * rows per partition, the driver emits the header and pre-sizes the
  * file, pass 2 has every partition write its row slice of every
  * variable through a positioned `FileChannel` (data never crosses the
  * driver). CDF-1 (32-bit offsets) is upgraded to CDF-2 (64-bit
  * offsets, magic version 2) automatically when any variable would begin
  * past 2^31-1.
  *
  * Subset supported (exactly what the reference reads/writes): fixed-size
  * 1-D variables of `NC_INT` / `NC_FLOAT` / `NC_DOUBLE` over a single
  * dimension, no record variables, no attributes. A classic file caps a
  * variable at ~2^31 bytes, so one file holds ≤ 536M points — at corpus
  * scale shard by partition key and write one file per shard (the
  * canonical 100 TB sink remains parquet via [[graft.operators.PointSink]];
  * this format exists for byte-level reference interop).
  *
  * Reading: `spark.read.format("netcdfPoints").option("path", f).load()`
  * → (`id` = global row ordinal, one column per variable), with split
  * planning by row range and column pruning pushed into the scan (an
  * unreferenced variable's bytes are never touched — each variable is a
  * contiguous block, so pruning skips whole regions, the on-disk analog
  * of parquet column chunks).
  */
object NetcdfPoints {

  private val TagDim = 0x0A
  private val TagVar = 0x0B
  val NcInt = 4
  val NcFloat = 5
  val NcDouble = 6

  private def typeBytes(t: Int): Int = t match {
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(
      s"unsupported nc_type $other (only NC_INT/NC_FLOAT/NC_DOUBLE)")
  }

  case class NcVar(name: String, ncType: Int, begin: Long)
  case class NcHeader(version: Int, dimName: String, n: Long, vars: Seq[NcVar])

  private def pad4(len: Int): Int = (len + 3) & ~3

  /** Serialized header for our subset; begins filled by the caller. */
  private def headerBytes(dimName: String, n: Long, vars: Seq[(String, Int)],
      begins: Seq[Long], version: Int): Array[Byte] = {
    val beginBytes = if (version == 1) 4 else 8
    val size = headerSize(dimName, vars.map(_._1), version)
    val bb = ByteBuffer.allocate(size).order(ByteOrder.BIG_ENDIAN)
    bb.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(version.toByte)
    bb.putInt(0) // numrecs: no record variables
    // dim_list
    bb.putInt(TagDim).putInt(1)
    putName(bb, dimName)
    bb.putInt(n.toInt)
    // gatt_list ABSENT
    bb.putInt(0).putInt(0)
    // var_list
    bb.putInt(TagVar).putInt(vars.size)
    vars.zip(begins).foreach { case ((name, ncType), begin) =>
      putName(bb, name)
      bb.putInt(1) // rank
      bb.putInt(0) // dimid 0
      bb.putInt(0).putInt(0) // vatt_list ABSENT
      bb.putInt(ncType)
      bb.putInt((n * typeBytes(ncType)).toInt) // vsize (caller checked fit)
      if (beginBytes == 4) bb.putInt(begin.toInt) else bb.putLong(begin)
    }
    bb.array()
  }

  private def putName(bb: ByteBuffer, name: String): Unit = {
    val b = name.getBytes("US-ASCII")
    bb.putInt(b.length)
    bb.put(b)
    var p = b.length
    while (p < pad4(b.length)) { bb.put(0.toByte); p += 1 }
  }

  private def headerSize(dimName: String, varNames: Seq[String],
      version: Int): Int = {
    val beginBytes = if (version == 1) 4 else 8
    4 + 4 + // magic + numrecs
      (8 + 4 + pad4(dimName.length) + 4) + // dim_list, 1 dim
      8 + // gatt ABSENT
      8 + varNames.map(nm =>
        4 + pad4(nm.length) + 4 + 4 + 8 + 4 + 4 + beginBytes).sum
  }

  /** Write `(idCol, vecCol: array<float>, clusterCol: int)` as the
    * reference's netCDF cluster file, rows ordered by id. `forceVersion`
    * pins CDF-1/CDF-2 for tests; default picks CDF-1 unless offsets
    * overflow 32 bits. */
  def write(df: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, path: String,
      forceVersion: Option[Int] = None): Unit = {
    SliceWrite.twoPass(df,
      Seq(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<float>").as("v"),
        col(clusterCol).cast("int").as("cid")), path,
      (n, d, _) => {
        require(n * 4L <= Int.MaxValue,
          s"$n points overflow a classic-format variable (vsize is " +
            "32-bit); shard into multiple files")
        val varDefs = (0 until d).map(j => (s"position_col_X$j", NcFloat)) :+
          ("cluster_id", NcInt)
        val varBytes = varDefs.map { case (_, t) => n * typeBytes(t) }
        def begins(version: Int): Seq[Long] =
          varBytes.scanLeft(headerSize("num_particles",
            varDefs.map(_._1), version).toLong)(_ + _).init
        val version = forceVersion.getOrElse(
          if (begins(1).last + varBytes.last <= Int.MaxValue) 1 else 2)
        val varBegins = begins(version)
        val beginsArr = varBegins.toArray
        SliceWrite.WritePlan(
          headerBytes("num_particles", n, varDefs, varBegins, version),
          varBegins.last + varBytes.last,
          // each partition writes its row slice of EVERY variable at
          // begin(var) + rowOffset*width, in row chunks
          (_, rowOffset, dims, it, ch) => {
            val chunk = 1 << 16
            val fbufs = Array.fill(dims)(
              ByteBuffer.allocate(chunk * 4).order(ByteOrder.BIG_ENDIAN))
            val cbuf = ByteBuffer.allocate(chunk * 4)
              .order(ByteOrder.BIG_ENDIAN)
            var rowsDone = 0L
            var inChunk = 0
            def flush(): Unit = if (inChunk > 0) {
              var j = 0
              while (j < dims) {
                fbufs(j).flip()
                var pos = beginsArr(j) + (rowOffset + rowsDone) * 4L
                while (fbufs(j).hasRemaining) pos += ch.write(fbufs(j), pos)
                fbufs(j).clear()
                j += 1
              }
              cbuf.flip()
              var pos = beginsArr(dims) + (rowOffset + rowsDone) * 4L
              while (cbuf.hasRemaining) pos += ch.write(cbuf, pos)
              cbuf.clear()
              rowsDone += inChunk
              inChunk = 0
            }
            var cnt = 0L
            it.foreach { r =>
              val fs = r.getSeq[Float](1)
              require(fs.length == dims,
                s"vector changed between passes: expected $dims floats, " +
                  s"got ${fs.length}")
              var j = 0
              while (j < dims) { fbufs(j).putFloat(fs(j)); j += 1 }
              cbuf.putInt(r.getInt(2))
              inChunk += 1
              cnt += 1
              if (inChunk == chunk) flush()
            }
            flush()
            cnt
          })
      })
  }

  /** Parse the header of our supported subset. */
  def readHeader(path: String): NcHeader = {
    val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(path), 1 << 16))
    try {
      val magic = new Array[Byte](4)
      in.readFully(magic)
      require(magic(0) == 'C' && magic(1) == 'D' && magic(2) == 'F',
        s"not a netCDF classic file: $path")
      val version = magic(3).toInt
      require(version == 1 || version == 2,
        s"unsupported netCDF format version $version (only CDF-1/CDF-2)")
      val numrecs = in.readInt()
      require(numrecs == 0, "record variables not supported")
      def readName(): String = {
        val len = in.readInt()
        val b = new Array[Byte](pad4(len))
        in.readFully(b)
        new String(b, 0, len, "US-ASCII")
      }
      // dim_list
      val dimTag = in.readInt(); val nDims = in.readInt()
      require((dimTag == TagDim && nDims == 1) ||
        (dimTag == 0 && nDims == 0),
        s"expected exactly one dimension, got tag=$dimTag nelems=$nDims")
      val (dimName, n) =
        if (nDims == 1) (readName(), in.readInt().toLong) else ("", 0L)
      // gatt_list: must be ABSENT — a nonzero nelems would make the
      // following bytes attribute entries, not the var_list
      val gattTag = in.readInt(); val nGatts = in.readInt()
      require(nGatts == 0, "global attributes not supported")
      require(gattTag == 0 || gattTag == 0x0C, s"bad gatt_list tag $gattTag")
      // var_list
      val varTag = in.readInt(); val nVars = in.readInt()
      require(varTag == TagVar || nVars == 0,
        s"bad var_list tag $varTag")
      val vars = (0 until nVars).map { _ =>
        val name = readName()
        val rank = in.readInt()
        require(rank == 1, s"variable $name has rank $rank (only 1-D)")
        val dimid = in.readInt()
        require(dimid == 0, s"variable $name over unknown dim $dimid")
        val vattTag = in.readInt(); val nVatts = in.readInt()
        require(nVatts == 0 && (vattTag == 0 || vattTag == 0x0C),
          "variable attributes not supported")
        val ncType = in.readInt()
        typeBytes(ncType) // validates
        in.readInt() // vsize (recomputed from n; spec allows clamping)
        val begin = if (version == 1) in.readInt().toLong else in.readLong()
        NcVar(name, ncType, begin)
      }
      NcHeader(version, dimName, n, vars)
    } finally in.close()
  }

  /** One-shot convenience read (driver plans, executors scan via the V2
    * source) — `(id, <one column per variable>)`. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("netcdfPoints").option("path", path).load()

  /** Synthetic row-ordinal `id` first, then one field per variable —
    * UNLESS the file itself carries a variable named "id", in which
    * case that variable's data wins (no duplicate-name schema, no
    * silent shadowing of real bytes by the ordinal). Our writer never
    * emits an "id" variable, but the read path accepts any conforming
    * CDF-1/2 file. */
  private[sources] def schemaOf(h: NcHeader): StructType = {
    val varFields = h.vars.map(v => StructField(v.name, v.ncType match {
      case NcInt => IntegerType
      case NcFloat => FloatType
      case NcDouble => DoubleType
    }, nullable = false))
    if (h.vars.exists(_.name == "id")) StructType(varFields)
    else StructType(StructField("id", LongType, nullable = false) +:
      varFields)
  }
}

/** DataSourceV2 provider: `spark.read.format("netcdfPoints")`. */
class NetcdfPointsV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "netcdfPoints"

  private def pathOf(options: util.Map[String, String]): String = {
    val p = options.get("path")
    require(p != null,
      "netcdfPoints requires .option(\"path\", ...) or load(path)")
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetcdfPoints.schemaOf(NetcdfPoints.readHeader(pathOf(options)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NetcdfPointsTable(pathOf(properties))
}

class NetcdfPointsTable(path: String) extends Table with SupportsRead {
  private val header = NetcdfPoints.readHeader(path)
  override def name(): String = s"netcdfPoints($path)"
  override def schema(): StructType = NetcdfPoints.schemaOf(header)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfPointsScanBuilder(path, header,
      options.getLong("maxBytesPerPartition", 128L * 1024 * 1024))
}

class NetcdfPointsScanBuilder(path: String, header: NetcdfPoints.NcHeader,
    maxBytesPerPartition: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = NetcdfPoints.schemaOf(header)
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new NetcdfPointsScan(path, header, required, maxBytesPerPartition)
}

case class NetcdfPointsRange(start: Long, count: Long) extends InputPartition

class NetcdfPointsScan(path: String, header: NetcdfPoints.NcHeader,
    required: StructType, maxBytesPerPartition: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // row cost = only the variables this scan actually decodes
    val rowBytes = math.max(4L,
      header.vars.filter(v => required.fieldNames.contains(v.name))
        .map(v => if (v.ncType == NetcdfPoints.NcDouble) 8L else 4L).sum)
    val rowsPerSplit = math.max(1L, maxBytesPerPartition / rowBytes)
    (0L until header.n by rowsPerSplit).map { start =>
      NetcdfPointsRange(start, math.min(rowsPerSplit, header.n - start))
        .asInstanceOf[InputPartition]
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfPointsReaderFactory(path, header, required)
}

class NetcdfPointsReaderFactory(path: String, header: NetcdfPoints.NcHeader,
    required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new NetcdfPointsReader(path, header,
      p.asInstanceOf[NetcdfPointsRange], required)
}

/** Streams each required variable's row slice from its contiguous block —
  * one buffered stream per required variable, unreferenced variables'
  * bytes never read. */
class NetcdfPointsReader(path: String, header: NetcdfPoints.NcHeader,
    range: NetcdfPointsRange, required: StructType)
    extends PartitionReader[InternalRow] {
  // resolve EVERY required field before opening any stream — a missing
  // variable must fail without leaking fds for the ones already opened
  private val resolved: Array[Option[NetcdfPoints.NcVar]] =
    required.fields.map { f =>
      // "id" is the synthetic row ordinal ONLY when the file has no
      // variable of that name (mirrors schemaOf); a real "id" variable
      // reads its actual bytes
      header.vars.find(_.name == f.name) match {
        case some @ Some(_) => some
        case None if f.name == "id" => None
        case None =>
          throw new IllegalArgumentException(s"no variable ${f.name}")
      }
    }
  private val streams: Array[DataInputStream] = {
    val acc = new Array[DataInputStream](resolved.length)
    try {
      var j = 0
      while (j < resolved.length) {
        resolved(j).foreach { v =>
          val width = if (v.ncType == NetcdfPoints.NcDouble) 8L else 4L
          val fis = new FileInputStream(path)
          fis.getChannel.position(v.begin + range.start * width)
          acc(j) = new DataInputStream(new BufferedInputStream(fis, 1 << 20))
        }
        j += 1
      }
      acc
    } catch { // don't leak the streams opened before the failing one
      case t: Throwable =>
        acc.foreach(s => if (s != null) s.close())
        throw t
    }
  }

  private var i = 0L
  // mutable row reused across next() calls (the standard row-reader
  // pattern — downstream copies when it retains)
  private val values = new Array[Any](required.fields.length)
  private val row = new org.apache.spark.sql.catalyst.expressions
    .GenericInternalRow(values)

  override def next(): Boolean = {
    if (i >= range.count) return false
    var j = 0
    while (j < values.length) {
      values(j) = resolved(j) match {
        case None => range.start + i
        case Some(v) => v.ncType match {
          case NetcdfPoints.NcInt => streams(j).readInt()
          case NetcdfPoints.NcFloat => streams(j).readFloat()
          case NetcdfPoints.NcDouble => streams(j).readDouble()
        }
      }
      j += 1
    }
    i += 1
    true
  }

  override def get(): InternalRow = row

  override def close(): Unit =
    streams.foreach(s => if (s != null) s.close())
}

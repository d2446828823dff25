package graft.sources.lance

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DataSource V2 read connector for Lance datasets (SURVEY §7 M2,
  * reference R1-R5: `cpp/lance_scan.cpp:75-250`, `rust/scanner.rs:9-38`).
  *
  * `spark.read.format("lance").load("/path/ds.lance")`, with
  * `option("versionAsOf", n)` time travel over `_versions/N.manifest`.
  *
  * Scale design vs the reference: the reference scans through ONE global
  * mutex-guarded stream (`cpp/lance_scan.cpp:57-71,158` — effective
  * parallelism 1). Here each Lance fragment is an InputPartition, so a
  * 1000-fragment dataset fans out across the cluster; column pruning is
  * pushed into the scan (the reference leaves it TODO at
  * `cpp/lance_scan.cpp:257-258`) and only the projected columns' byte
  * ranges are read from storage.
  */
class LanceDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "lance"

  private def datasetPath(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).orElse(
      options.asScala.get("paths").map(_.stripPrefix("[\"").stripSuffix("\"]")))
    p.getOrElse(throw new IllegalArgumentException("lance: path required"))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val (fs, path) = LanceFormat.fileSystem(datasetPath(options), conf)
    val versionAsOf = Option(options.get("versionAsOf")).map(_.toLong)
    val manifest = LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, path, versionAsOf))
    LanceFormat.toStructType(manifest)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new LanceTable(datasetPath(options), schema,
      Option(options.get("versionAsOf")).map(_.toLong))
  }

  override def supportsExternalMetadata(): Boolean = true
}

class LanceTable(path: String, tableSchema: StructType, versionAsOf: Option[Long])
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"lance.`$path`"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LanceScanBuilder(path, tableSchema, versionAsOf)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new LanceWriteBuilder(path, info)
}

/** A numeric predicate usable against page zone maps (conservative:
  * anything not representable here is simply not pruned on). */
case class ZoneFilter(colName: String, op: String, value: Double) {
  /** Can a page with values in [mn, mx] contain a matching row? */
  def mayMatch(mn: Double, mx: Double): Boolean = op match {
    case ">"  => mx > value
    case ">=" => mx >= value
    case "<"  => mn < value
    case "<=" => mn <= value
    case "="  => mn <= value && mx >= value
    case _ => true
  }
}

class LanceScanBuilder(path: String, full: StructType, versionAsOf: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = full
  private var limit: Option[Int] = None
  private var zoneFilters: Seq[ZoneFilter] = Nil
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve lance field order; requiredSchema may reorder
    val want = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => want.contains(f.name)))
  }
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  private def numeric(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }

  /** Zone-map skipping only — every filter stays residual (we return all
    * filters back to Spark), so correctness never depends on the stats;
    * pages whose [min,max] cannot match are just never read. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val zs = filters.flatMap {
      case GreaterThan(a, v) => numeric(v).map(ZoneFilter(a, ">", _))
      case GreaterThanOrEqual(a, v) => numeric(v).map(ZoneFilter(a, ">=", _))
      case LessThan(a, v) => numeric(v).map(ZoneFilter(a, "<", _))
      case LessThanOrEqual(a, v) => numeric(v).map(ZoneFilter(a, "<=", _))
      case EqualTo(a, v) => numeric(v).map(ZoneFilter(a, "=", _))
      case _ => None
    }
    zoneFilters = zs.toSeq
    accepted = filters.filter {
      case GreaterThan(_, v) => numeric(v).isDefined
      case GreaterThanOrEqual(_, v) => numeric(v).isDefined
      case LessThan(_, v) => numeric(v).isDefined
      case LessThanOrEqual(_, v) => numeric(v).isDefined
      case EqualTo(_, v) => numeric(v).isDefined
      case _ => false
    }
    filters // all residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan =
    new LanceScan(path, full, required, versionAsOf, limit, zoneFilters)
}

/** One InputPartition per Lance fragment; rowLimit caps decoded rows when
  * a LIMIT was pushed down (whole trailing fragments are pruned away). */
case class LanceInputPartition(dataFilePath: String, fieldIds: Array[Int],
                               columnIndices: Array[Int], numRows: Long,
                               rowLimit: Long = Long.MaxValue)
  extends InputPartition

class LanceScan(path: String, full: StructType, required: StructType,
                versionAsOf: Option[Long], limit: Option[Int] = None,
                zoneFilters: Seq[ZoneFilter] = Nil)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"LanceScan($path, columns=[${required.fieldNames.mkString(",")}]" +
      limit.map(n => s", limit=$n").getOrElse("") +
      (if (zoneFilters.nonEmpty)
         s", zoneFilters=[${zoneFilters.map(f => s"${f.colName}${f.op}${f.value}").mkString(",")}]"
       else "") + ")"

  @transient private lazy val manifest = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(path, conf)
    LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, p, versionAsOf))
  }

  /** Row count + size from the manifest — feeds the cost model so e.g.
    * joins against small lance dims get planned as broadcasts. */
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = manifest.fragments.map(_.physicalRows).sum
    private val bytes = {
      val listed = manifest.fragments.flatMap(_.files).map(_.fileSizeBytes).sum
      if (listed > 0) listed else rows * 64 // fallback guess when absent
    }
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val all = manifest.fragments.flatMap { frag =>
      frag.files.map { f =>
        LanceInputPartition(
          new Path(new Path(path, "data"), f.path).toString,
          f.fieldIds.toArray, f.columnIndices.toArray, frag.physicalRows)
      }
    }
    limit match {
      case None => all.toArray
      case Some(n) =>
        // keep fragments until the cumulative row count covers the limit
        val out = Array.newBuilder[InputPartition]
        var remaining = n.toLong
        val it = all.iterator
        while (remaining > 0 && it.hasNext) {
          val p = it.next()
          out += p.copy(rowLimit = remaining)
          remaining -= p.numRows
        }
        out.result()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // map required column names -> ColSpec (children resolved for
    // list/struct columns)
    val byName = manifest.fields.filter(_.parentId == -1).map(f => f.name -> f).toMap
    val cols = required.fieldNames.map { n =>
      val f = byName(n)
      if (f.logicalType == "list" || f.logicalType == "large_list" ||
          f.logicalType == "struct") {
        val children = manifest.fields.filter(_.parentId == f.id)
        ColSpec(f.id, f.logicalType, children.map(_.id).toArray,
                children.map(_.logicalType).toArray, children.map(_.name).toArray)
      } else ColSpec(f.id, f.logicalType, Array.empty, Array.empty, Array.empty)
    }
    // zone filters resolved to field ids (unknown columns dropped)
    val zf = zoneFilters.flatMap(z => byName.get(z.colName).map(f => (f.id, z.op, z.value)))
    new LanceReaderFactory(cols.toArray,
      zf.map(_._1).toArray, zf.map(_._2).toArray, zf.map(_._3).toArray)
  }
}

/** One required output column: children present for list/struct fields. */
case class ColSpec(fieldId: Int, logicalType: String, childIds: Array[Int],
                   childTypes: Array[String], childNames: Array[String])
    extends Serializable

class LanceReaderFactory(colSpecs: Array[ColSpec],
                         filterFieldIds: Array[Int] = Array.empty,
                         filterOps: Array[String] = Array.empty,
                         filterVals: Array[Double] = Array.empty)
    extends PartitionReaderFactory {
  private def zf: Seq[(Int, String, Double)] =
    filterFieldIds.indices.map(i => (filterFieldIds(i), filterOps(i), filterVals(i)))
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LanceInputPartition]
    new LancePartitionReader(p, colSpecs, zf)
  }

  /** Columnar path for scalar-only projections: the scan emits
    * ColumnarBatch and Spark fuses the batch->row transition into
    * whole-stage codegen (same shape as its vectorized parquet reader).
    * List/struct columns fall back to the row reader. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    colSpecs.forall(_.childIds.isEmpty)

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[LanceInputPartition]
    new LanceColumnarReader(p, colSpecs, zf)
  }
}

/** Shared fragment decode: (per-column value arrays, row count).
  * zoneFilters: (fieldId, op, value) triples — pages whose recorded
  * [min,max] cannot match ALL filters are skipped in every column (page
  * boundaries are aligned across columns by the writer; files without
  * stats are never pruned). */
private[lance] object FragmentDecode {
  def apply(part: LanceInputPartition, colSpecs: Array[ColSpec],
            zoneFilters: Seq[(Int, String, Double)] = Nil): (Array[Array[Any]], Int) = {
    val conf = new Configuration()
    val (fs, p) = LanceFormat.fileSystem(part.dataFilePath, conf)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      def readRange(off: Long, len: Int): Array[Byte] = {
        val b = new Array[Byte](len); in.readFully(off, b); b
      }
      val footer = readRange(fileLen - 40, 40)
      val bb = java.nio.ByteBuffer.wrap(footer).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val cmoStart = bb.getLong(8)
      require(footer(36) == 'L' && footer(39) == 'C', s"bad lance magic in ${part.dataFilePath}")
      val numColumns = bb.getInt(28)
      val cmoTable = readRange(cmoStart, numColumns * 16)
      val cmoBB = java.nio.ByteBuffer.wrap(cmoTable).order(java.nio.ByteOrder.LITTLE_ENDIAN)

      // raw page metas of a column: (bufferOffsets, bufferSizes, rows, min, max)
      def pageMetasOf(fieldId: Int): Seq[(Seq[Long], Seq[Long], Long, Double, Double)] = {
        val fi = part.fieldIds.indexOf(fieldId)
        require(fi >= 0, s"field id $fieldId not in fragment ${part.dataFilePath}")
        val colIdx = part.columnIndices(fi)
        val metaOff = cmoBB.getLong(colIdx * 16)
        val metaLen = cmoBB.getLong(colIdx * 16 + 8)
        val metaBytes = readRange(metaOff, metaLen.toInt)
        val fsMeta = Proto.parse(metaBytes)
        Proto.all(fsMeta, 2).map { pg =>
          val pf = Proto.parse(pg.bytes)
          val mn = pf.find(f => f.tag == 10 && f.wire == 1)
            .map(f => java.lang.Double.longBitsToDouble(f.varint)).getOrElse(Double.NaN)
          val mx = pf.find(f => f.tag == 11 && f.wire == 1)
            .map(f => java.lang.Double.longBitsToDouble(f.varint)).getOrElse(Double.NaN)
          (Proto.packedVarints(pf, 1), Proto.packedVarints(pf, 2),
           Proto.firstVarint(pf, 3).getOrElse(0L), mn, mx)
        }
      }

      // zone-map page mask: page p survives iff every filter may match it
      val keepMask: Option[Array[Boolean]] =
        if (zoneFilters.isEmpty) None
        else {
          val masks = zoneFilters.map { case (fid, op, value) =>
            val metas = pageMetasOf(fid)
            metas.map { case (_, _, _, mn, mx) =>
              mn.isNaN || mx.isNaN || ZoneFilter("", op, value).mayMatch(mn, mx)
            }.toArray
          }
          // column page counts can differ only for foreign files w/o stats
          if (masks.map(_.length).distinct.length != 1) None
          else Some(masks.reduce((a, b) => a.zip(b).map(p => p._1 && p._2)))
        }

      def pagesOf(fieldId: Int, maxRows: Long = Long.MaxValue): Seq[(Seq[Array[Byte]], Long)] = {
        val metas = pageMetasOf(fieldId)
        val masked = keepMask match {
          case Some(m) if m.length == metas.length =>
            metas.zipWithIndex.filter { case (_, i) => m(i) }.map(_._1)
          case _ => metas
        }
        var cum = 0L
        masked.flatMap { case (offs, sizes, rows, _, _) =>
          if (cum >= maxRows) None
          else {
            cum += rows
            Some((offs.zip(sizes).map { case (o, s) => readRange(o, s.toInt) }, rows))
          }
        }
      }

      // after masking, the fragment's surviving row count comes from the
      // kept pages, not the manifest
      val numRows = {
        val base = keepMask match {
          case Some(m) =>
            val metas = pageMetasOf(colSpecs.headOption.map(_.fieldId).getOrElse(part.fieldIds.head))
            if (m.length == metas.length)
              metas.zipWithIndex.filter { case (_, i) => m(i) }.map(_._1._3).sum
            else part.numRows
          case None => part.numRows
        }
        math.min(base, part.rowLimit).toInt
      }
      val nCols = colSpecs.length
      val colValues = new Array[Array[Any]](nCols)

      def decodeScalarColumn(fieldId: Int, logicalType: String): Array[Any] = {
        val pages = pagesOf(fieldId, numRows)
        LanceColumnDecoder.decode(logicalType, pages, pages.map(_._2).sum.toInt)
      }

      var c = 0
      while (c < nCols) {
        val spec = colSpecs(c)
        if (spec.logicalType == "struct") {
          // struct = grouped leaf columns; assemble an InternalRow per row
          val leafVals = spec.childIds.zip(spec.childTypes)
            .map { case (cid, ct) => decodeScalarColumn(cid, ct) }
          val out = new Array[Any](numRows)
          var i = 0
          while (i < numRows) {
            val vals = new Array[Any](leafVals.length)
            var j = 0
            while (j < leafVals.length) { vals(j) = leafVals(j)(i); j += 1 }
            out(i) = new GenericInternalRow(vals)
            i += 1
          }
          colValues(c) = out
        } else if (spec.childIds.nonEmpty) {
          // list column: per-page i64 end-offsets + aligned child value pages
          val offPages = pagesOf(spec.fieldId, numRows)
          val valPages = pagesOf(spec.childIds.head).take(offPages.length)
          require(offPages.length == valPages.length,
            s"list pages misaligned in ${part.dataFilePath}")
          val decodedRows = offPages.map(_._2).sum.toInt
          val out = new Array[Any](decodedRows)
          var row = 0
          offPages.zip(valPages).foreach { case ((offBufs, _), (valBufs, _)) =>
            // offsets page may carry a leading validity bitmap (null arrays)
            val (validity, offs) =
              if (offBufs.length == 2) (Some(offBufs(0)), offBufs(1))
              else (None, offBufs.head)
            val nPageRows = offs.length / 8
            val offBB = java.nio.ByteBuffer.wrap(offs).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val totalVals = if (nPageRows == 0) 0 else offBB.getLong((nPageRows - 1) * 8).toInt
            val vals = LanceColumnDecoder.decode(spec.childTypes.head, Seq((valBufs, totalVals.toLong)), totalVals)
            var prev = 0
            var i = 0
            while (i < nPageRows) {
              val end = offBB.getLong(i * 8).toInt
              val isNull = validity.exists(vb => ((vb(i >> 3) >> (i & 7)) & 1) == 0)
              out(row + i) =
                if (isNull) null
                else new org.apache.spark.sql.catalyst.util.GenericArrayData(
                  java.util.Arrays.copyOfRange(vals.asInstanceOf[Array[AnyRef]], prev, end))
              prev = end
              i += 1
            }
            row += nPageRows
          }
          colValues(c) = out
        } else {
          colValues(c) = decodeScalarColumn(spec.fieldId, spec.logicalType)
        }
        c += 1
      }
      (colValues, numRows)
    } finally in.close()
  }
}

/** Columnar reader: one ColumnarBatch per fragment, values in
  * OnHeapColumnVectors. */
class LanceColumnarReader(part: LanceInputPartition, colSpecs: Array[ColSpec],
                          zoneFilters: Seq[(Int, String, Double)] = Nil)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private var batch: ColumnarBatch = _
  private var emitted = false

  override def next(): Boolean = {
    if (emitted) return false
    val (colValues, numRows) = FragmentDecode(part, colSpecs, zoneFilters)
    val sparkTypes = colSpecs.map(cs => LanceFormat.toSparkType(cs.logicalType))
    val schema = StructType(sparkTypes.zipWithIndex.map { case (t, i) =>
      org.apache.spark.sql.types.StructField(s"c$i", t)
    })
    val vectors = OnHeapColumnVector.allocateColumns(numRows, schema)
    var c = 0
    while (c < colValues.length) {
      val vec = vectors(c)
      val vals = colValues(c)
      var i = 0
      while (i < numRows) {
        val v = vals(i)
        if (v == null) vec.putNull(i)
        else sparkTypes(c) match {
          case org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType => vec.putLong(i, v.asInstanceOf[Long])
          case org.apache.spark.sql.types.IntegerType |
               org.apache.spark.sql.types.DateType => vec.putInt(i, v.asInstanceOf[Int])
          case org.apache.spark.sql.types.DoubleType => vec.putDouble(i, v.asInstanceOf[Double])
          case org.apache.spark.sql.types.FloatType => vec.putFloat(i, v.asInstanceOf[Float])
          case org.apache.spark.sql.types.BooleanType => vec.putBoolean(i, v.asInstanceOf[Boolean])
          case org.apache.spark.sql.types.ByteType => vec.putByte(i, v.asInstanceOf[Byte])
          case org.apache.spark.sql.types.ShortType => vec.putShort(i, v.asInstanceOf[Short])
          case org.apache.spark.sql.types.StringType =>
            val b = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
            vec.putByteArray(i, b, 0, b.length)
          case org.apache.spark.sql.types.BinaryType =>
            val b = v.asInstanceOf[Array[Byte]]
            vec.putByteArray(i, b, 0, b.length)
          case other => throw new UnsupportedOperationException(s"columnar: $other")
        }
        i += 1
      }
      c += 1
    }
    batch = new ColumnarBatch(vectors.asInstanceOf[Array[org.apache.spark.sql.vectorized.ColumnVector]], numRows)
    emitted = true
    true
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = if (batch != null) batch.close()
}

/** Reads one fragment file: footer → column metadata for the projected
  * columns only → ranged reads of just those columns' page buffers. */
class LancePartitionReader(part: LanceInputPartition, colSpecs: Array[ColSpec],
                           zoneFilters: Seq[(Int, String, Double)] = Nil)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val (colValues, numRows) = FragmentDecode(part, colSpecs, zoneFilters)
    val nCols = colSpecs.length
    (0 until numRows).iterator.map { r =>
      val arr = new Array[Any](nCols)
      var i = 0
      while (i < nCols) { arr(i) = colValues(i)(r); i += 1 }
      new GenericInternalRow(arr): InternalRow
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean = { if (rows.hasNext) { current = rows.next(); true } else false }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

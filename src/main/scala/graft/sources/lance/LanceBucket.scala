package graft.sources.lance

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** Hash-bucket partitioning for lance datasets (the Iceberg `bucket(n, col)`
  * shape): `option("bucketBy", "16:col")` writes one fragment set per
  * bucket, the manifest records the transform spec, and the scan reports
  * `KeyGroupedPartitioning(bucket(n, col))`. Reads resolved THROUGH THE
  * LANCE CATALOG (`SELECT ... FROM lance.`/path/ds.lance``) resolve the
  * transform against [[LanceBucketFunction]] (the catalog's `bucket` V2
  * function), so two datasets bucketed the same way storage-partition-join
  * on the RAW high-cardinality key — zero shuffle, no materialized bucket
  * column. Plain-path reads (`spark.read.format("lance")`) have no
  * function catalog to resolve `bucket` and degrade to a normal shuffle.
  *
  * The hash is self-contained (splitmix64 / FNV-1a-64, not Spark's
  * murmur3) so the on-disk layout contract does not depend on Spark
  * internals staying stable. */
object LanceBucket {

  /** splitmix64 finalizer — full-avalanche mix of a 64-bit value. */
  def mixLong(v0: Long): Long = {
    var v = v0 + 0x9e3779b97f4a7c15L
    v = (v ^ (v >>> 30)) * 0xbf58476d1ce4e5b9L
    v = (v ^ (v >>> 27)) * 0x94d049bb133111ebL
    v ^ (v >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then mixed. */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    mixLong(h)
  }

  /** Bucket id in [0, n) for a non-null partition value (internal-row
    * representation: UTF8String for strings, Int days for dates, Long
    * micros for timestamps). */
  def bucketOf(v: Any, n: Int): Int = {
    val h = v match {
      case l: Long => mixLong(l)
      case i: Int => mixLong(i.toLong)
      case s: Short => mixLong(s.toLong)
      case b: Byte => mixLong(b.toLong)
      case b: Boolean => mixLong(if (b) 1L else 0L)
      case u: org.apache.spark.unsafe.types.UTF8String => hashBytes(u.getBytes)
      case s: String => hashBytes(s.getBytes("UTF-8"))
      case other => throw new UnsupportedOperationException(
        s"lance bucket: unsupported value class ${other.getClass.getName}")
    }
    val m = (h % n).toInt
    if (m < 0) m + n else m
  }

  private val SpecRe = """bucket\((\d+),(.+)\)""".r

  /** Manifest partition-column spec: plain name = identity partitioning,
    * `bucket(n,col)` = hash buckets. */
  def parseSpec(s: String): Option[(Int, String)] = s match {
    case SpecRe(n, col) => Some((n.toInt, col))
    case _ => None
  }

  def specOf(n: Int, col: String): String = s"bucket($n,$col)"
}

/** Hidden date-transform partitioning (the Iceberg `days(ts)` shape):
  * `option("partitionBy", "days(ts)")` range-sorts the write by the raw
  * timestamp and cuts a fragment whenever the UTC day changes, recording
  * `days(ts)` + the epoch-day value per fragment in the manifest. Reads
  * resolved through the lance catalog resolve the transform against
  * [[LanceDaysFunction]], so two day-partitioned datasets
  * storage-partition-join on the RAW timestamp (equal timestamps share a
  * day — Spark's key-grouped compatibility rule for date transforms), and
  * time-range predicates prune whole day-fragments from manifest stats.
  * The time-partitioned event-log layout at 100 TB: daily appends create
  * daily fragments, day-keyed joins/rollups never shuffle the fact. */
object LanceDays {
  private val SpecRe = """days\((.+)\)""".r
  def parseSpec(s: String): Option[String] = s match {
    case SpecRe(col) => Some(col)
    case _ => None
  }
  def specOf(col: String): String = s"days($col)"

  private val MicrosPerDay = 86400000000L

  /** Epoch-day of an internal-row value (micros for timestamps, days for
    * dates). Floor division: pre-1970 values round toward -inf, matching
    * Spark's `days` transform and date_trunc semantics. */
  def daysOf(v: Any, dt: DataType): Int = dt match {
    case DateType => v.asInstanceOf[Int]
    case TimestampType | TimestampNTZType =>
      Math.floorDiv(v.asInstanceOf[Long], MicrosPerDay).toInt
    case other => throw new UnsupportedOperationException(
      s"lance days(): unsupported column type $other")
  }

  def supported(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}

/** The catalog-registered `days` V2 function (epoch-day of a date or
  * timestamp) — Spark binds it when resolving the scan-reported
  * `days(col)` transform for storage-partitioned joins. */
class LanceDaysFunction extends UnboundFunction {
  override def name(): String = "days"
  override def description(): String =
    "days(col): epoch-day of a date/timestamp (UTC, floor division)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"lance days(col) takes 1 argument, got ${inputType.fields.length}")
    val colType = inputType.fields(0).dataType
    require(LanceDays.supported(colType),
      s"lance days: unsupported column type $colType")
    LanceDaysBound(colType)
  }
}

case class LanceDaysBound(colType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(colType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "days"
  override def canonicalName(): String = "graft.lance.days"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    LanceDays.daysOf(input.get(0, colType), colType)
}

/** The catalog-registered `bucket` V2 function. Spark binds it when
  * resolving the scan-reported `bucket(n, col)` transform; compatibility
  * across the two join sides is by [[BoundFunction.canonicalName]]. */
class LanceBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): lance hash-bucket id in [0, n) (splitmix64/FNV-1a-64)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"lance bucket(n, col) takes 2 arguments, got ${inputType.fields.length}")
    val colType = inputType.fields(1).dataType
    require(LanceFormat.PartValueCodec.supported(colType),
      s"lance bucket: unsupported column type $colType")
    LanceBucketBound(colType)
  }
}

case class LanceBucketBound(colType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, colType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.lance.bucket"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    LanceBucket.bucketOf(input.get(1, colType), n)
  }
}

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
  /** The supported time-granularity transforms (the Iceberg family). */
  val Units: Seq[String] = Seq("days", "months", "years")
  private val SpecRe = """(days|months|years)\((.+)\)""".r

  /** Any time-transform spec → (unit, raw column). */
  def parseAny(s: String): Option[(String, String)] = s match {
    case SpecRe(u, col) => Some((u, col))
    case _ => None
  }
  /** Back-compat: the raw column of a `days(col)` spec specifically. */
  def parseSpec(s: String): Option[String] =
    parseAny(s).collect { case ("days", c) => c }
  /** The raw column of ANY time-transform spec. */
  def innerCol(s: String): Option[String] = parseAny(s).map(_._2)

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

  /** Transform value for `unit`: epoch-day / months-since-1970 /
    * years-since-1970 (proleptic Gregorian, UTC — Iceberg's convention). */
  def unitOf(unit: String, v: Any, dt: DataType): Int = {
    val days = daysOf(v, dt)
    unit match {
      case "days" => days
      case "months" =>
        val d = java.time.LocalDate.ofEpochDay(days.toLong)
        (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
      case "years" =>
        java.time.LocalDate.ofEpochDay(days.toLong).getYear - 1970
      case other => throw new UnsupportedOperationException(
        s"lance time transform: unknown unit '$other'")
    }
  }

  def supported(dt: DataType): Boolean = dt match {
    case DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}

/** The catalog-registered time-transform V2 functions (`days`, `months`,
  * `years` of a date/timestamp) — Spark binds them when resolving the
  * scan-reported transforms for storage-partitioned joins. */
class LanceDaysFunction(unit: String = "days") extends UnboundFunction {
  require(LanceDays.Units.contains(unit), s"unknown time unit $unit")
  override def name(): String = unit
  override def description(): String =
    s"$unit(col): $unit-since-epoch of a date/timestamp (UTC, floor)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1,
      s"lance $unit(col) takes 1 argument, got ${inputType.fields.length}")
    val colType = inputType.fields(0).dataType
    require(LanceDays.supported(colType),
      s"lance $unit: unsupported column type $colType")
    LanceDaysBound(colType, unit)
  }
}

case class LanceDaysBound(colType: DataType, unit: String = "days")
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(colType)
  override def resultType(): DataType = IntegerType
  override def name(): String = unit
  override def canonicalName(): String = s"graft.lance.$unit"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer =
    LanceDays.unitOf(unit, input.get(0, colType), colType)
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

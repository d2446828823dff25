package graft.sources.lance

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** DSv2 write path (SURVEY §7 M3; reference R6-R8
  * `cpp/lance_copy.cpp:73-174`, `rust/writer.rs:17-53`).
  *
  * Data plane on executors: each task streams its rows into one fragment
  * file `data/<uuid>.lance` (page-buffered, bounded memory — explicitly
  * NOT the reference's full-RAM materialization). Control plane on the
  * driver: commit() writes `_versions/<N+1>.manifest` via create-temp +
  * atomic rename; append mode carries the previous version's fragments
  * forward, overwrite starts the new version empty (old versions stay
  * readable via versionAsOf — Lance versioning semantics).
  */
class LanceWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    // option("fixedSizeList", "embedding:64[,col:dim...]") stores those
    // array columns as lance fixed_size_list vector columns
    val fsl = Option(info.options.get("fixedSizeList")).map { spec =>
      spec.split(",").map(_.trim).filter(_.nonEmpty).map { p =>
        val Array(n, d) = p.split(":")
        n -> d.toInt
      }.toMap
    }.getOrElse(Map.empty[String, Int])
    def cols(key: String): Seq[String] =
      Option(info.options.get(key)).toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    new LanceWrite(path, info.schema(), doTruncate, fsl,
      clusterBy = cols("clusterBy"), sortBy = cols("sortBy"),
      numPartitions = Option(info.options.get("writePartitions"))
        .map(_.toInt).getOrElse(0),
      stableRowIds = Option(info.options.get("stableRowIds"))
        .exists(_.toBoolean),
      codec = {
        val c = Option(info.options.get("compression")).getOrElse("")
        LanceCodec.idOf(c) // validate driver-side, before any task launches
        c
      })
  }
}

/** Write-side layout control (DSv2 RequiresDistributionAndOrdering — the
  * exchange/sort happen in the write query itself, before fragment files
  * are cut):
  *
  *  - `sortBy` alone = GLOBAL range sort: fragments get disjoint key
  *    ranges, so the manifest min/max stats prune point and range
  *    predicates to few fragments (the clustered-table story without a
  *    new file format);
  *  - `clusterBy` = hash co-location (same keys land in the same
  *    fragment — dedup/join locality), with `sortBy` ordering rows
  *    within each fragment for page-level zone selectivity. Hash buckets
  *    interleave ranges, so prefer plain `sortBy` for range pruning. */
class LanceWrite(path: String, schema: StructType, truncate: Boolean,
                 fsl: Map[String, Int],
                 clusterBy: Seq[String] = Nil, sortBy: Seq[String] = Nil,
                 numPartitions: Int = 0, stableRowIds: Boolean = false,
                 codec: String = "")
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
  import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}

  private def sortOrders: Array[SortOrder] =
    sortBy.map(c => Expressions.sort(Expressions.identity(c), SortDirection.ASCENDING))
      .toArray

  override def requiredDistribution(): Distribution =
    if (clusterBy.nonEmpty)
      Distributions.clustered(
        clusterBy.map(c => Expressions.identity(c): org.apache.spark.sql.connector.expressions.Expression).toArray)
    else if (sortBy.nonEmpty) Distributions.ordered(sortOrders)
    else Distributions.unspecified()

  /** option("writePartitions", n): exact fragment count for the clustered
    * write (0 = let Spark/AQE size the exchange — which may coalesce a
    * small write into one fragment). */
  override def requiredNumPartitions(): Int = numPartitions

  override def requiredOrdering(): Array[SortOrder] = sortOrders

  override def toBatch: BatchWrite =
    new LanceBatchWrite(path, schema, truncate, fsl, stableRowIds, codec)
}

case class LanceCommitMessage(fileName: String, rows: Long,
                              stats: Seq[(Int, Double, Double)] = Nil)
    extends WriterCommitMessage

class LanceBatchWrite(path: String, schema: StructType, truncate: Boolean,
                      fsl: Map[String, Int] = Map.empty,
                      stableRowIds: Boolean = false, codec: String = "")
    extends BatchWrite {

  private val hadoopConf = new SerializableConfiguration(
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LanceDataWriterFactory(path, schema, hadoopConf, fsl, codec)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val conf = hadoopConf.value
    val dataset = new Path(path)
    val fs = dataset.getFileSystem(conf)
    val fragments = messages.collect {
      case LanceCommitMessage(name, rows, stats) if rows > 0 => (name, rows, stats)
    }.toSeq
    // Optimistic commit: the data plane (fragment files) is already
    // durable and conflict-free (UUID names), so losing the version-claim
    // race costs only a manifest re-read + re-write. Rebase on the new
    // latest and retry — appends from concurrent jobs all land, in some
    // serial order (the lance optimistic-commit model).
    // generous cap: a lost race costs one manifest re-read + re-write, so
    // retrying more is nearly free — 20 proved exhaustible under a loaded
    // host (GC pauses stack the race window for 6+ simultaneous committers)
    val maxAttempts = 100
    var attempt = 0
    var done = false
    while (!done) {
      val (prevFragments, prevFields, prevMaxFragId, version, prevNextRowId) =
        if (fs.exists(new Path(dataset, "_versions"))) {
          val m = LanceFormat.readManifest(fs,
            LanceFormat.latestManifestPath(fs, dataset, None))
          // append keeps the committed field ids (schema evolution may have
          // left them non-positional); overwrite starts a fresh id space
          val prev = if (truncate) Nil else m.fragments
          val pf = if (truncate) Nil else m.fields
          (prev, pf, m.fragments.map(_.id).foldLeft(-1L)(math.max),
           m.version + 1, m.nextRowId)
        } else (Nil, Nil, -1L, 1L, 0L)
      // Move-stable row ids: on by option for a fresh/overwrite write;
      // appends to a stable dataset continue automatically (the manifest's
      // next_row_id is authoritative). Overwrite of a stable dataset keeps
      // the counter monotone — ids are NEVER reused within a dataset's
      // history, so a stale index can fetch nothing, never a wrong row.
      val stable = stableRowIds || prevNextRowId > 0L
      val (rowIdSegs, nextRowId) =
        if (!stable) (Nil, 0L)
        else {
          var next = math.max(prevNextRowId, 0L)
          val segs = fragments.map { case (_, rows, _) =>
            val s = Seq(LanceFormat.RangeSeg(next, rows))
            next += rows
            s
          }
          (segs, next)
        }
      try {
        LanceWriteSupport.writeManifest(conf, dataset, schema, fragments,
          prevMaxFragId + 1, prevFragments, version, fsl, prevFields,
          newRowIds = rowIdSegs, nextRowId = nextRowId)
        done = true
      } catch {
        case e: LanceCommitConflict =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
          // tiny jittered backoff so racing committers interleave
          Thread.sleep(5 + scala.util.Random.nextInt(20))
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val conf = hadoopConf.value
    val dataset = new Path(path)
    val fs = dataset.getFileSystem(conf)
    messages.collect { case LanceCommitMessage(name, _, _) =>
      fs.delete(new Path(new Path(dataset, "data"), name), false)
    }
  }
}

class LanceDataWriterFactory(path: String, schema: StructType,
                             conf: SerializableConfiguration,
                             fsl: Map[String, Int] = Map.empty,
                             codec: String = "") extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LanceDataWriter(path, schema, conf.value, fsl, codec)
}

class LanceDataWriter(path: String, schema: StructType, conf: Configuration,
                      fsl: Map[String, Int] = Map.empty, codec: String = "")
    extends DataWriter[InternalRow] {

  private val fileName = s"${UUID.randomUUID()}.lance"
  private val filePath = new Path(new Path(new Path(path), "data"), fileName)
  private val fs = filePath.getFileSystem(conf)
  private val out = fs.create(filePath, true)
  private val writer = new LanceFragmentWriter(out, schema, fsl = fsl, codec = codec)
  private var rows = 0L

  override def write(record: InternalRow): Unit = { writer.write(record); rows += 1 }

  override def commit(): WriterCommitMessage = {
    writer.finish()
    out.close()
    if (rows == 0) fs.delete(filePath, false) // no empty fragments
    LanceCommitMessage(fileName, rows, writer.fileStats)
  }

  override def abort(): Unit = {
    out.close()
    fs.delete(filePath, false)
  }

  override def close(): Unit = ()
}

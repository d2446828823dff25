package graft.operators

import graft.sources.lance.LanceFormat
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-fragment NDV sketch sidecars: COUNT(DISTINCT col) over a lance
  * dataset answered from a tiny sidecar instead of a corpus scan.
  *
  * The sidecar is itself a lance dataset of `(frag, n_rows, sketch)` rows
  * — one Apache DataSketches HLL sketch per SOURCE FRAGMENT, built by a
  * single grouped pass where the group key (`_rowaddr >>> 32`) is the
  * fragment id the reader already partitions by, so the "shuffle" is
  * map-side-complete. `ndv` unions the per-fragment sketches
  * (`hll_union_agg`) and estimates — it reads ONLY the sidecar (asserted
  * bytesRead-delta-0 on the source in SketchIndexSpec).
  *
  * Incrementality is fragment-granular, which is exactly lance's unit of
  * append: `refresh` sketches ONLY fragments not yet covered (their rows
  * addressed directly via the `addrRanges` scan option — no full rescan),
  * so a 100 TB dataset with daily appends pays sketch cost proportional
  * to the APPENDED bytes. Compaction replaces fragment ids; stale sidecar
  * rows are simply ignored (the union filters to the head's live
  * fragments) and `refresh` re-sketches the new fragments.
  *
  * Deletions: an HLL sketch cannot forget, so a fragment with deletion
  * vectors makes the sidecar estimate an UPPER bound on the live NDV.
  * `ndv` refuses by default (`allowDeletes=true` opts into the bound).
  *
  * Reference direction: the lance crate persists scalar/vector indexes as
  * dataset sidecars (`lance-index`); an NDV sketch sidecar is the same
  * pattern applied to cardinality statistics (our [EXT] extension —
  * standard mergeable-summary design).
  */
object SketchIndex {

  private val LgK = 12 // rel. std. error ~1.6%

  private def props(spark: SparkSession, ixPath: String): java.util.Properties = {
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(s"$ixPath/_sketch.props", conf)
    val pr = new java.util.Properties
    val in = fs.open(p)
    try pr.load(in) finally in.close()
    pr
  }

  /** The one column an existing sidecar sketches (for caller mismatch
    * checks — a sidecar is single-column by construction). */
  def sketchedColumn(spark: SparkSession, ixPath: String): String =
    props(spark, ixPath).getProperty("col")

  private def writeProps(spark: SparkSession, ixPath: String, src: String,
                         col: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(s"$ixPath/_sketch.props", conf)
    val pr = new java.util.Properties
    pr.setProperty("src", src)
    pr.setProperty("col", col)
    val out = fs.create(p, true)
    try pr.store(out, "graft ndv sketch sidecar") finally out.close()
  }

  private def headManifest(spark: SparkSession, src: String) = {
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(src, conf)
    LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, p, None))
  }

  /** One grouped sketch pass over the given fragments (None = all). */
  private def sketchPass(spark: SparkSession, src: String, column: String,
                         frags: Option[Seq[Long]]): DataFrame = {
    var rd = spark.read.format("lance").option("withRowAddress", "true")
    frags.foreach { ids =>
      val ranges = ids.sorted
        .map(f => s"${f << 32}:${(f << 32) | 0xffffffffL}").mkString(",")
      rd = rd.option("addrRanges", ranges)
    }
    rd.load(src)
      .select(shiftrightunsigned(col("_rowaddr"), 32).as("frag"),
              col(column))
      .groupBy("frag")
      .agg(count(lit(1)).as("n_rows"),
           hll_sketch_agg(col(column), LgK).as("sketch"))
  }

  /** Build the sidecar from scratch for `column` of `src`. */
  def build(spark: SparkSession, src: String, column: String,
            ixPath: String): Unit = {
    sketchPass(spark, src, column, None)
      .write.format("lance").mode("overwrite").save(ixPath)
    writeProps(spark, ixPath, src, column)
  }

  /** Sketch fragments appended since the sidecar last saw the source.
    * Returns how many new fragments were sketched. Work ∝ appended data. */
  def refresh(spark: SparkSession, ixPath: String): Long = {
    val pr = props(spark, ixPath)
    val src = pr.getProperty("src"); val column = pr.getProperty("col")
    val head = headManifest(spark, src)
    val covered = spark.read.format("lance").load(ixPath)
      .select("frag").distinct()
      .collect().map(_.getLong(0)).toSet // sidecar-sized: one id per fragment
    val missing = head.fragments.map(_.id).filterNot(covered)
    if (missing.isEmpty) return 0L
    sketchPass(spark, src, column, Some(missing))
      .write.format("lance").mode("append").save(ixPath)
    missing.length.toLong
  }

  /** The sketch NDV estimate for the CURRENT head, sidecar-only.
    * Requires full fragment coverage (run [[refresh]] first); refuses
    * deletion-bearing fragments unless `allowDeletes` (the sketch then
    * upper-bounds the live NDV). */
  def ndv(spark: SparkSession, src: String, ixPath: String,
          allowDeletes: Boolean = false): Long = {
    val head = headManifest(spark, src)
    val live = head.fragments.map(_.id)
    if (!allowDeletes) {
      val deleted = head.fragments.filter(_.deletion.isDefined).map(_.id)
      require(deleted.isEmpty,
        s"ndv sketch of $src: fragments ${deleted.mkString(",")} carry " +
          "deletion vectors — the sketch cannot forget deleted rows; pass " +
          "allowDeletes=true for an upper bound or compact first")
    }
    val side = spark.read.format("lance").load(ixPath)
      .filter(col("frag").isin(live: _*)) // stale (compacted-away) rows drop
    val frags = side.select("frag").distinct()
      .collect().map(_.getLong(0)).toSet
    val missing = live.filterNot(frags)
    require(missing.isEmpty,
      s"ndv sketch of $src: fragments ${missing.mkString(",")} not " +
        "sketched — run SketchIndex.refresh first")
    side.agg(hll_sketch_estimate(hll_union_agg(col("sketch"), true))
        .as("ndv"))
      .collect().head.getLong(0)
  }
}

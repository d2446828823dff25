package graft.sources.lance

import org.apache.spark.sql.SparkSession

/** Dataset maintenance operations.
  *
  * `compact` is the small-files remedy every long-lived 100 TB dataset
  * needs: streaming appends (one fragment per micro-batch/task) fragment
  * the dataset; scan parallelism and footer/metadata overhead degrade.
  * Compaction rewrites the current version's rows into `targetFragments`
  * larger fragments as a NEW version — old versions remain readable via
  * `versionAsOf` (lance versioning semantics), so it is safe to run while
  * readers hold older manifests.
  */
object LanceMaintenance {

  /** Rewrite the dataset into `targetFragments` fragments; returns the new
    * version number. Live data is unchanged (deleted rows are materialized
    * away — the masked read drops them, so compaction doubles as delete
    * cleanup). */
  def compact(spark: SparkSession, path: String, targetFragments: Int = 1): Long = {
    require(targetFragments > 0, "targetFragments must be positive")
    spark.read.format("lance").load(path)
      .repartition(targetFragments)
      .write.format("lance").mode("overwrite").save(path)
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(path, conf)
    LanceFormat.readManifest(fs, LanceFormat.latestManifestPath(fs, p, None)).version
  }

  /** Delete rows matching a SQL `condition` without rewriting data files:
    * writes per-fragment deletion bitmaps (`_deletions/….bin`, roaring
    * portable format) and commits a new manifest version whose fragments
    * carry `deletion_file` entries. Reads of the new version mask the
    * rows; older versions still see them (time travel covers the delete).
    *
    * Scale shape: the predicate is evaluated distributed (full scan with
    * the `_rowaddr` metadata column), matching addresses shuffle once on
    * fragment id, and each group reduces to a compact serialized bitmap —
    * only (fragId, bitmap bytes) land on the driver, never row data.
    *
    * Returns the committed version (unchanged if nothing matched). */
  def deleteWhere(spark: SparkSession, path: String, condition: String): Long = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val (fs, p) = LanceFormat.fileSystem(path, conf)
    val manifestPath = LanceFormat.latestManifestPath(fs, p, None)
    val manifest = LanceFormat.readManifest(fs, manifestPath)

    val df = spark.read.format("lance").option("withRowAddress", "true").load(path)
    val newDeletes: Map[Long, Array[Int]] = df.filter(condition)
      .select(org.apache.spark.sql.functions.col("_rowaddr")).as[Long]
      .groupByKey(a => a >>> 32)
      .mapGroups((frag, it) => (frag, it.map(a => (a & 0xffffffffL).toInt).toArray.sorted))
      .collect().toMap
    if (newDeletes.isEmpty) return manifest.version

    val newVersion = manifest.version + 1
    val delDir = new org.apache.hadoop.fs.Path(p, "_deletions")
    fs.mkdirs(delDir)
    val rng = new java.security.SecureRandom()
    val delMetas: Map[Long, LanceFormat.DeletionFileMeta] = newDeletes.map {
      case (fragId, offs) =>
        val frag = manifest.fragments.find(_.id == fragId).getOrElse(
          throw new IllegalStateException(s"fragment $fragId vanished mid-delete"))
        // merge with any existing deletion bitmap (offsets are physical,
        // so old and new unions cleanly)
        val merged = frag.deletion match {
          case Some(d) =>
            val old = Roaring.deserialize(LanceFormat.readWholeFile(fs,
              new org.apache.hadoop.fs.Path(delDir, d.fileName(fragId))))
            (old ++ offs).distinct.sorted
          case None => offs
        }
        val meta = LanceFormat.DeletionFileMeta(
          readVersion = manifest.version,
          id = rng.nextInt(Int.MaxValue).toLong,
          fileType = 1, numDeleted = merged.length.toLong)
        val out = fs.create(new org.apache.hadoop.fs.Path(delDir, meta.fileName(fragId)), true)
        try out.write(Roaring.serialize(merged)) finally out.close()
        fragId -> meta
    }

    commitDeletionPatch(conf, p, manifestPath, delMetas, newVersion)
    newVersion
  }

  /** Proto-level manifest patch committing `delMetas` as the fragments'
    * deletion_file entries at `newVersion`: everything else is re-emitted
    * verbatim (unmodeled fields survive), so the patch composes with any
    * writer. Shared by [[deleteWhere]], merge-insert, and tests. */
  private[lance] def commitDeletionPatch(
      conf: org.apache.hadoop.conf.Configuration,
      p: org.apache.hadoop.fs.Path,
      manifestPath: org.apache.hadoop.fs.Path,
      delMetas: Map[Long, LanceFormat.DeletionFileMeta],
      newVersion: Long): Unit = {
    val (fs, _) = LanceFormat.fileSystem(p.toString, conf)
    val rawAll = LanceFormat.readWholeFile(fs, manifestPath)
    val pbLen = (rawAll(0) & 0xff) | ((rawAll(1) & 0xff) << 8) |
                ((rawAll(2) & 0xff) << 16) | ((rawAll(3) & 0xff) << 24)
    val top = Proto.parse(rawAll, 4, 4 + pbLen)
    val w = new Proto.Writer
    top.foreach { f =>
      if (f.tag == 3 && f.wire == 0) w.varint(3, newVersion)
      else if (f.tag == 2 && f.wire == 2) {
        val fragFields = Proto.parse(f.bytes)
        val fragId = Proto.firstVarint(fragFields, 1).getOrElse(0L)
        delMetas.get(fragId) match {
          case None => w.raw(f)
          case Some(meta) =>
            val fw = new Proto.Writer
            fragFields.foreach(ff => if (ff.tag != 3) fw.raw(ff))
            val dv = new Proto.Writer
            dv.varint(1, meta.readVersion).varint(2, meta.id)
              .varint(3, meta.fileType.toLong).varint(4, meta.numDeleted)
            fw.message(3, dv)
            w.message(2, fw)
        }
      } else w.raw(f)
    }
    LanceWriteSupport.commitManifest(conf, p, w.result(), newVersion)
  }
}

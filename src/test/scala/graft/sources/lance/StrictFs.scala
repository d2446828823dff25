package graft.sources.lance

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, Path, RawLocalFileSystem}

/** Test-only Hadoop filesystem under the `strictfs://` scheme with
  * object-store/HDFS-like rename semantics: rename onto an existing
  * destination FAILS instead of silently overwriting (RawLocal's
  * behavior). There is no MiniDFSCluster in this container, so this is
  * the closest offline stand-in for the non-local code paths: scheme
  * resolution through `LanceFormat.fileSystem`, Hadoop-conf plumbing to
  * executors, and the FileContext-based manifest commit.
  */
class StrictFs extends RawLocalFileSystem {
  override def getScheme: String = "strictfs"
  override def getUri: URI = URI.create("strictfs:///")

  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}

/** FileContext binding (`fs.AbstractFileSystem.strictfs.impl`). */
class StrictAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new StrictFs, conf, "strictfs", false)

/** Test-only filesystem under `s3like://` modeling the WORST object-store
  * rename semantics: rename lands even when the destination exists
  * (copy+delete with no atomic no-overwrite guarantee — the S3A shape).
  * The FileContext layer's client-side dest check is bypassed too,
  * modeling the visibility race where both committers pass the check
  * before either PUT lands. Under these semantics the rename-based
  * manifest commit silently loses a concurrent committer's manifest —
  * which is why the writer's commit protocol is strategy-switchable
  * (`graft.lance.commit.mode=create` commits via a single
  * create-no-overwrite PUT instead).
  */
class OverwritingFs extends RawLocalFileSystem {
  override def getScheme: String = "s3like"
  override def getUri: URI = URI.create("s3like:///")

  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
  }

  /** Object stores never update last-modified in place — S3A/GCS
    * implement setTimes as the FileSystem base-class no-op. Model that,
    * so an mtime "heartbeat" that relies on setTimes visibly fails here
    * (MaintenanceLock heartbeats by re-PUTting the entry instead). */
  override def setTimes(p: Path, mtime: Long, atime: Long): Unit = ()
}

/** FileContext binding that skips the client-side dest-existence check —
  * rename "wins" even onto an existing destination. */
class OverwritingAbstractFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new OverwritingFs, conf, "s3like", false) {
  private val raw = new OverwritingFs
  raw.initialize(URI.create("s3like:///"), conf)
  override def renameInternal(src: Path, dst: Path): Unit = { raw.rename(src, dst); () }
  override def renameInternal(src: Path, dst: Path, overwrite: Boolean): Unit = {
    raw.rename(src, dst); ()
  }
}

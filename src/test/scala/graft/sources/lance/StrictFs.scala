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

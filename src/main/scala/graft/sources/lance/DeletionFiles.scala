package graft.sources.lance

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, IntVector, UInt4Vector, UInt8Vector}
import org.apache.arrow.vector.ipc.ArrowFileReader
import org.apache.arrow.vector.util.ByteArrayReadableSeekableByteChannel
import org.apache.hadoop.conf.Configuration

/** Readers for both lance fragment deletion-file formats (fragment
  * `deletion_file` proto, DataFragment field 3 — see
  * `/root/reference/test/test_data.lance/_versions` manifest layout):
  *
  *  - BITMAP (`fileType=1`, suffix `.bin`): a roaring-portable bitmap of
  *    deleted physical row offsets — what our own `deleteWhere` writes.
  *  - ARROW_ARRAY (`fileType=0`, suffix `.arrow`): an Arrow IPC *file*
  *    whose first column holds the deleted offsets (the lance crate emits
  *    this form for sparse deletes). Decoded with the Arrow Java reader on
  *    the Spark classpath; int32/uint32/int64/uint64 columns accepted.
  */
object DeletionFiles {

  /** Deleted physical row offsets of one fragment as a BitSet. */
  def read(path: String, conf: Configuration): java.util.BitSet = {
    val (dfs, dpath) = LanceFormat.fileSystem(path, conf)
    val bytes = LanceFormat.readWholeFile(dfs, dpath)
    val bs = new java.util.BitSet()
    if (path.endsWith(".bin")) {
      Roaring.deserialize(bytes).foreach(bs.set)
    } else if (path.endsWith(".arrow")) {
      val alloc = new RootAllocator()
      try {
        val reader = new ArrowFileReader(new ByteArrayReadableSeekableByteChannel(bytes), alloc)
        try {
          while (reader.loadNextBatch()) {
            val root = reader.getVectorSchemaRoot
            require(root.getFieldVectors.size() >= 1,
              s"lance ARROW_ARRAY deletion file has no columns: $path")
            val n = root.getRowCount
            root.getVector(0) match {
              case v: IntVector =>
                var i = 0; while (i < n) { if (!v.isNull(i)) bs.set(v.get(i)); i += 1 }
              case v: UInt4Vector =>
                var i = 0; while (i < n) { if (!v.isNull(i)) bs.set(v.get(i)); i += 1 }
              case v: BigIntVector =>
                var i = 0; while (i < n) { if (!v.isNull(i)) bs.set(v.get(i).toInt); i += 1 }
              case v: UInt8Vector =>
                var i = 0; while (i < n) { if (!v.isNull(i)) bs.set(v.get(i).toInt); i += 1 }
              case other => throw new UnsupportedOperationException(
                s"lance ARROW_ARRAY deletion column type ${other.getClass.getSimpleName}: $path")
            }
          }
        } finally reader.close()
      } finally alloc.close()
    } else {
      throw new UnsupportedOperationException(s"unrecognized deletion file suffix: $path")
    }
    bs
  }
}

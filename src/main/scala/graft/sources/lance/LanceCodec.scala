package graft.sources.lance

/** Page-buffer compression for the write path (and transparent
  * decompression on read). The real lance 2.1 format compresses miniblock
  * chunks with zstd/lz4 (decoded in [[LanceEncodings]] for foreign files);
  * this writer applies the same codecs at PAGE-BUFFER granularity — a
  * layout this writer owns (like its dictionary marker), flagged in the
  * page proto:
  *
  *   tag 15 (varint) = codec id (1 = zstd, 2 = lz4)
  *   tag 16 (packed) = uncompressed size per buffer (aligned with tags 1/2)
  *
  * Zone maps, dictionary pages, page pruning and the take path are all
  * unaffected: stats are computed pre-compression and live in the page
  * proto, so pruning decisions never decompress anything; only pages that
  * survive pruning pay the decompress.
  *
  * At 100 TB this is the difference between shipping raw bytes and
  * shipping ~3-10x less I/O for text-heavy corpora; both codec jars
  * (zstd-jni, lz4-java) are Spark's own runtime dependencies, already on
  * every executor's classpath.
  */
object LanceCodec {
  val None = 0
  val Zstd = 1
  val Lz4 = 2

  def idOf(name: String): Int = name.trim.toLowerCase match {
    case "" | "none" | "uncompressed" => None
    case "zstd" => Zstd
    case "lz4" => Lz4
    case other => throw new IllegalArgumentException(
      s"lance: unknown compression codec '$other' (zstd, lz4, none)")
  }

  def compress(codec: Int, b: Array[Byte]): Array[Byte] = codec match {
    case Zstd => com.github.luben.zstd.Zstd.compress(b, 3)
    case Lz4 => net.jpountz.lz4.LZ4Factory.fastestInstance()
      .fastCompressor().compress(b)
    case _ => b
  }

  def decompress(codec: Int, b: Array[Byte], rawLen: Int): Array[Byte] = codec match {
    case Zstd =>
      val out = new Array[Byte](rawLen)
      val n = com.github.luben.zstd.Zstd.decompress(out, b)
      require(n == rawLen, s"lance: zstd page decompressed to $n bytes, expected $rawLen")
      out
    case Lz4 =>
      val out = new Array[Byte](rawLen)
      net.jpountz.lz4.LZ4Factory.fastestInstance()
        .fastDecompressor().decompress(b, 0, out, 0, rawLen)
      out
    case _ => b
  }
}

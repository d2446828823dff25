package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch aggregates as TypedImperativeAggregate (SURVEY §2.6: "aggregate
  * → Aggregator / TypedImperativeAggregate (needed for MinHash sketch)").
  *
  * Both replace wide banks of per-seed agg expressions (64 `min(...)` /
  * `sum(when(...))` columns) with ONE mutable buffer updated in a tight
  * loop per row — one aggregation buffer object, no per-seed expression
  * evaluation, and a single avalanche-mixed base hash instead of 64
  * full hash evaluations per token.
  */
object Mix {
  /** murmur3-finalizer-style avalanche of a 64-bit value (public constant
    * set; splitmix64 golden-gamma stepping for seed families). */
  @inline def avalanche(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
  @inline def hashString(s: UTF8String): Long =
    avalanche(s.toString.foldLeft(1125899906842597L)((h, c) => h * 31 + c))
}

/** MinHash signature: array<bigint> of length numHashes; hash family
  * h_i(t) = avalanche(baseHash(t) ^ goldenGamma(i)). */
case class MinHashAgg(child: Expression, numHashes: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = Mix.hashString(v.asInstanceOf[UTF8String])
      var i = 0
      while (i < numHashes) {
        val h = Mix.avalanche(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** 64-bit SimHash: signed bit votes folded over token hashes. */
case class SimHashAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Mix.hashString(v.asInstanceOf[UTF8String])
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** Static kernels shared by the per-row sketch expressions (called from
  * generated code) — identical hash family to the aggregates above, so a
  * signature computed per-row over a token array equals the one aggregated
  * over the exploded tokens. */
object SketchKernels {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def minhashSignature(toks: ArrayData, numHashes: Int): GenericArrayData = {
    val buf = Array.fill(numHashes)(Long.MaxValue)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val base = Mix.hashString(toks.getUTF8String(t))
        var i = 0
        while (i < numHashes) {
          val h = Mix.avalanche(base ^ (0x9e3779b97f4a7c15L * (i + 1)))
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(buf)
  }

  def bandHashes(sig: ArrayData, bands: Int): GenericArrayData = {
    val n = sig.numElements()
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x9e3779b97f4a7c15L * (b + 1)
      var i = b * r
      val end = (b + 1) * r
      while (i < end) { h = Mix.avalanche(h ^ sig.getLong(i)); i += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  def simhashSignature(toks: ArrayData): Long = {
    val votes = new Array[Long](64)
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val h = Mix.hashString(toks.getUTF8String(t))
        var j = 0
        while (j < 64) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

/** Per-row MinHash over a token ARRAY — a pure map, no explode/shuffle/agg.
  * At 100 TB this removes the token-table shuffle entirely: signatures are
  * computed in the scan stage. Same hash family as [[MinHashAgg]]. */
case class MinHashArray(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchKernels.minhashSignature(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.minhashSignature($a, $numHashes);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-row SimHash over a token ARRAY (see [[MinHashArray]]). */
case class SimHashArray(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchKernels.simhashSignature(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.simhashSignature($a);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Band hashes of a MinHash signature: array<long> of length `bands`,
  * band b = avalanche-mix of sig[b*r .. (b+1)*r). Replaces `bands` nested
  * multi-arg xxhash64 calls in the LSH candidate Generate — one compact
  * kernel call instead of an ~80-node codegen expression (the nested form
  * dominated d07's first-run codegen compile time). */
case class BandHashes(child: Expression, bands: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchKernels.bandHashes(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], bands)
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SketchKernels.bandHashes($a, $bands);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** EXACT distinct count over a bounded int domain via a roaring bitmap
  * (the ClickHouse groupBitmap / Druid shape; SURVEY §2.2 DISTINCT aggs).
  *
  * Spark's native multi-COUNT(DISTINCT) Expands every raw row once per
  * distinct clause and shuffles ~|rows| wide tuples; when the distinct
  * domain fits in int32 (dimension ids, enum codes, or a composed
  * `a * |B| + b` pair code), a bitmap buffer turns the whole thing into
  * ONE partial aggregate: each map task ors row ids into a per-group
  * bitmap, the shuffle carries one compressed bitmap per (group,
  * partition) instead of the rows, and the final merge is a bitwise or.
  * At 100 TB this is the difference between shuffling the table and
  * shuffling kilobytes; for unbounded domains fall back to the
  * two-level groupBy decomposition (q25's previous plan).
  */
case class BitmapDistinctAgg(child: Expression,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.roaringbitmap.RoaringBitmap] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_distinct expects int (use graft_bitmap_distinct64 " +
        s"for bigint), got $other")
    }

  override def createAggregationBuffer(): org.roaringbitmap.RoaringBitmap =
    new org.roaringbitmap.RoaringBitmap()

  override def update(buf: org.roaringbitmap.RoaringBitmap,
                      input: InternalRow): org.roaringbitmap.RoaringBitmap = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Int])
    buf
  }

  override def merge(b1: org.roaringbitmap.RoaringBitmap,
                     b2: org.roaringbitmap.RoaringBitmap): org.roaringbitmap.RoaringBitmap = {
    b1.or(b2)
    b1
  }

  override def eval(buf: org.roaringbitmap.RoaringBitmap): Any = buf.getLongCardinality

  override def serialize(buf: org.roaringbitmap.RoaringBitmap): Array[Byte] = {
    buf.runOptimize()
    val out = new Array[Byte](buf.serializedSizeInBytes())
    buf.serialize(java.nio.ByteBuffer.wrap(out))
    out
  }
  override def deserialize(bytes: Array[Byte]): org.roaringbitmap.RoaringBitmap = {
    val r = new org.roaringbitmap.RoaringBitmap()
    r.deserialize(java.nio.ByteBuffer.wrap(bytes))
    r
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** 64-bit sibling of [[BitmapDistinctAgg]] for composed pair codes or id
  * spaces beyond int32 (Roaring64 buffers; same one-partial-agg shape). */
case class BitmapDistinct64Agg(child: Expression,
                               mutableAggBufferOffset: Int = 0,
                               inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[org.roaringbitmap.longlong.Roaring64Bitmap] {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_distinct64 expects bigint, got $other")
    }

  override def createAggregationBuffer(): org.roaringbitmap.longlong.Roaring64Bitmap =
    new org.roaringbitmap.longlong.Roaring64Bitmap()

  override def update(buf: org.roaringbitmap.longlong.Roaring64Bitmap,
                      input: InternalRow): org.roaringbitmap.longlong.Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.addLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: org.roaringbitmap.longlong.Roaring64Bitmap,
                     b2: org.roaringbitmap.longlong.Roaring64Bitmap)
      : org.roaringbitmap.longlong.Roaring64Bitmap = {
    b1.or(b2)
    b1
  }

  override def eval(buf: org.roaringbitmap.longlong.Roaring64Bitmap): Any =
    buf.getLongCardinality

  override def serialize(buf: org.roaringbitmap.longlong.Roaring64Bitmap): Array[Byte] = {
    buf.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    buf.serialize(new java.io.DataOutputStream(bos))
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): org.roaringbitmap.longlong.Roaring64Bitmap = {
    val r = new org.roaringbitmap.longlong.Roaring64Bitmap()
    r.deserialize(new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes)))
    r
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): BitmapDistinct64Agg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapDistinct64Agg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** Mergeable Misra-Gries heavy-hitters summary over a string column:
  * array<struct<token,est>> with the MG guarantee
  * `true_count - est <= n / (capacity + 1)` (n = total rows seen) — so
  * every token with true count above that threshold is PRESENT in the
  * summary. Update is O(1) amortized (a decrement-all event removes
  * capacity+1 total count, so there are at most n/(capacity+1) of them);
  * merge sums counters then applies the standard rank-(c+1) reduction,
  * which preserves the additive guarantee across partials (Agarwal et
  * al., "Mergeable Summaries").
  *
  * 100 TB shape: map-side partials are bounded at `capacity` entries per
  * partition regardless of input size — the shuffle carries summaries,
  * never tokens. Exact-top-k pipelines recount ONLY the summary's
  * candidates (a broadcast semi-join) and can PROVE exactness when the
  * k-th recounted frequency exceeds n/(capacity+1).
  */
case class FreqSketchAgg(child: Expression, capacity: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {
  require(capacity > 0, "FreqSketchAgg capacity must be positive")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](capacity * 2)

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(tok)
      if (cur != 0L || buf.containsKey(tok)) buf.put(tok, cur + 1L)
      else if (buf.size < capacity) buf.put(tok, 1L)
      else { // MG decrement-all: removes capacity+1 total count
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(b1: java.util.HashMap[String, Long],
                     b2: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      b1.merge(e.getKey, e.getValue, (a, b) => a + b)
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest counter from all, drop <= 0
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(b1.size - capacity - 1) // rank c+1 from the top
      val es = b1.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= d) es.remove() else e.setValue(e.getValue - d)
      }
    }
    b1
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val arr = new Array[Any](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.put(in.readUTF(), in.readLong()))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType),
                   StructField("est", LongType))), containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

object SketchAggs {
  import org.apache.spark.sql.graftglue.ColumnBridge.{column, expression}
  def minhash(c: Column, numHashes: Int): Column =
    column(MinHashAgg(expression(c), numHashes).toAggregateExpression())
  def bitmapDistinct(c: Column): Column =
    column(BitmapDistinctAgg(expression(c)).toAggregateExpression())
  def bitmapDistinct64(c: Column): Column =
    column(BitmapDistinct64Agg(expression(c)).toAggregateExpression())
  def simhash(c: Column): Column =
    column(SimHashAgg(expression(c)).toAggregateExpression())
  def minhashArray(toks: Column, numHashes: Int): Column =
    column(MinHashArray(expression(toks), numHashes))
  def simhashArray(toks: Column): Column =
    column(SimHashArray(expression(toks)))
  def bandHashes(sig: Column, bands: Int): Column =
    column(BandHashes(expression(sig), bands))
  def freqSketch(c: Column, capacity: Int): Column =
    column(FreqSketchAgg(expression(c), capacity).toAggregateExpression())
}

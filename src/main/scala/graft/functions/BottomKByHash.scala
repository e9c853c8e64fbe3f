package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer of [[BottomKByHash]]: the (hash, payload) →
  * multiplicity tree plus a CACHED total. The total used to be recomputed
  * by an O(k) tree walk on every input row, which made the aggregate
  * O(n·k) — at k = 1024 it was ~85% of q_quantile_sketch's wall-clock
  * (measured 19.5 s → 3 s on the 10× bench). */
final class BottomKBuffer {
  val map = new java.util.TreeMap[(Long, Long), Long](
    implicitly[Ordering[(Long, Long)]])
  var total = 0L
}

object BottomKByHash {
  /** The shared bottom-k fold: merge `n` occurrences of (h, p) into the
    * buffer, keeping the k smallest (hash, payload) keys with
    * multiplicity. ORDER-INDEPENDENT: the final buffer is exactly the
    * multiset of the k smallest inputs regardless of arrival order —
    * which is what lets the streaming quantile sketch
    * (StreamingAgg.quantileSketchStream) fold batches incrementally and
    * still match the one-shot batch aggregate bit-for-bit. */
  def add(buf: BottomKBuffer, k: Int, h: Long, p: Long, n: Long): Unit = {
    if (buf.total >= k) {
      // full-buffer quick reject: a key ≥ the current max can only be
      // trimmed right back out (equal keys add multiplicity to the last
      // entry, which the trim removes first — same net no-op)
      val last = buf.map.lastKey()
      if (h > last._1 || (h == last._1 && p >= last._2)) return
    }
    val key = (h, p)
    val cur = buf.map.get(key)
    buf.map.put(key, if (cur == null) n else cur + n)
    buf.total += n
    var excess = buf.total - k
    while (excess > 0) {
      val last = buf.map.lastEntry()
      val take = math.min(last.getValue, excess)
      if (take == last.getValue) buf.map.remove(last.getKey)
      else buf.map.put(last.getKey, last.getValue - take)
      buf.total -= take
      excess -= take
    }
  }
}

/** Deterministic bottom-k sampler as a custom Catalyst aggregate: keeps
  * the k payloads with the smallest (hash, payload) keys — the
  * bounded-state twin of the `d_sample_k` rank-window sampler.
  *
  * The window version sorts every group to rank it; this aggregate holds
  * at most k (hash, payload, multiplicity) entries per group (3k longs),
  * merges partials by union+trim, and plans as a standard partial/final
  * aggregation — at 100 TB a group's shuffle traffic is k*24 bytes
  * regardless of its row count, the same bounded-state property as the
  * KMV sketch ([[KmvDistinct]]). The hash is an explicit multiplicative
  * hash computed by the caller, so the selected sample is identical to
  * the rank-window version and reproducible in any engine; ties on the
  * hash break by payload, and duplicate input rows carry multiplicity so
  * they occupy multiple ranks exactly as `row_number` ranks them.
  *
  * The per-row path is O(1) amortized: once the buffer is full, a row
  * whose (hash, payload) is ≥ the current maximum cannot displace
  * anything (inserting it and re-trimming would remove exactly the rows
  * just added) and is rejected with one comparison — for uniform hashes
  * only ~k·ln(n/k) of n rows survive the gate.
  *
  * Reference context: a training pipeline samples eval splits per source
  * (SURVEY.md §2 C `d_sample_k`); this is the form that survives groups
  * of billions of rows.
  */
case class BottomKByHash(
    hash: Expression,
    payload: Expression,
    k: Int = 5,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKBuffer] {

  override def children: Seq[Expression] = Seq(hash, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val h = hash.eval(input)
    val p = payload.eval(input)
    if (h != null && p != null)
      BottomKByHash.add(buf, k, h.asInstanceOf[Long], p.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: BottomKBuffer, other: BottomKBuffer): BottomKBuffer = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      BottomKByHash.add(buf, k, e.getKey._1, e.getKey._2, e.getValue)
    }
    buf
  }

  /** Payloads in ascending (hash, payload) order, duplicates repeated per
    * multiplicity — rank order of the window twin. */
  override def eval(buf: BottomKBuffer): Any = {
    val out = new Array[Long](buf.total.toInt)
    val it = buf.map.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) { out(i) = e.getKey._2; i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: BottomKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.map.size * 24)
    bb.putInt(buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey._1); bb.putLong(e.getKey._2); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val h = bb.getLong; val p = bb.getLong; val c = bb.getLong
      buf.map.put((h, p), c)
      buf.total += c
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKByHash =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKByHash =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BottomKByHash =
    copy(hash = c(0), payload = c(1))
}

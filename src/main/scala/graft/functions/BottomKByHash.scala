package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

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
    extends TypedImperativeAggregate[java.util.TreeMap[(Long, Long), Long]] {

  override def children: Seq[Expression] = Seq(hash, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeMap[(Long, Long), Long] =
    new java.util.TreeMap[(Long, Long), Long](
      implicitly[Ordering[(Long, Long)]])

  private def total(buf: java.util.TreeMap[(Long, Long), Long]): Long = {
    var t = 0L
    val it = buf.values().iterator()
    while (it.hasNext) t += it.next()
    t
  }

  private def add(buf: java.util.TreeMap[(Long, Long), Long],
      h: Long, p: Long, n: Long): Unit = {
    val key = (h, p)
    val cur = buf.get(key)
    buf.put(key, if (cur == null) n else cur + n)
    var excess = total(buf) - k
    while (excess > 0) {
      val last = buf.lastEntry()
      val take = math.min(last.getValue, excess)
      if (take == last.getValue) buf.remove(last.getKey)
      else buf.put(last.getKey, last.getValue - take)
      excess -= take
    }
  }

  override def update(buf: java.util.TreeMap[(Long, Long), Long],
      input: InternalRow): java.util.TreeMap[(Long, Long), Long] = {
    val h = hash.eval(input)
    val p = payload.eval(input)
    if (h != null && p != null)
      add(buf, h.asInstanceOf[Long], p.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: java.util.TreeMap[(Long, Long), Long],
      other: java.util.TreeMap[(Long, Long), Long]): java.util.TreeMap[(Long, Long), Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey._1, e.getKey._2, e.getValue)
    }
    buf
  }

  /** Payloads in ascending (hash, payload) order, duplicates repeated per
    * multiplicity — rank order of the window twin. */
  override def eval(buf: java.util.TreeMap[(Long, Long), Long]): Any = {
    val out = new Array[Long](total(buf).toInt)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) { out(i) = e.getKey._2; i += 1; c -= 1 }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeMap[(Long, Long), Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 24)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey._1); bb.putLong(e.getKey._2); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeMap[(Long, Long), Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val h = bb.getLong; val p = bb.getLong; val c = bb.getLong
      buf.put((h, p), c)
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

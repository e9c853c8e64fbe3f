package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Shared Misra-Gries frequent-items fold over a plain key→count map.
  *
  * The classic deterministic heavy-hitter summary (Misra & Gries 1982),
  * in the MERGEABLE form of Agarwal et al., "Mergeable Summaries"
  * (PODS 2012): a k-counter summary undercounts any item by at most
  * N/(k+1), under ANY sequence of folds and ANY merge tree — so every
  * item with true frequency > N/(k+1) is guaranteed to survive with a
  * positive counter no matter how Spark partitions the data. That
  * guarantee is what makes the two-pass heavy-hitter plan
  * (sketch → candidate set → exact count of candidates only)
  * ORDER-INDEPENDENT in its final output even though the candidate SET
  * itself can vary with partitioning: the exact pass keeps precisely
  * the items whose true count clears the threshold, and the guarantee
  * says none of those can be missing from the candidates.
  */
object MisraGries {
  /** Fold `n` occurrences of `item` into the summary. Textbook MG step:
    * hit → counter += n; free slot → insert; full+miss → decrement all
    * counters (evicting zeros), which destroys k+1 units of count mass
    * per round and is what bounds the total undercount by N/(k+1).
    * The decrement loop is O(k) but only runs on a miss-with-full-map —
    * on skewed (the interesting) data almost every row hits a resident
    * counter and costs O(1). */
  def add(map: java.util.HashMap[Long, Long], k: Int, item: Long,
      n: Long): Unit = {
    // containsKey, NOT get-vs-null: the scala.Long value type unboxes an
    // absent key's null to 0L, which would make a null check always-true
    // and silently disable the k-bound (the map would grow like an exact
    // group-count).
    if (map.containsKey(item)) { map.put(item, map.get(item) + n); return }
    if (map.size < k) { map.put(item, n); return }
    // full + miss: run min(n, minCount) joint decrement rounds at once —
    // equivalent to that many textbook single decrements (the incoming
    // item's first `dec` copies cancel against them), then re-fold any
    // remainder of the incoming multiplicity.
    var minC = Long.MaxValue
    val vit = map.values().iterator()
    while (vit.hasNext) { val v = vit.next(); if (v < minC) minC = v }
    val dec = math.min(n, minC)
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= dec) it.remove() else e.setValue(e.getValue - dec)
    }
    if (n > dec) add(map, k, item, n - dec)
  }

  /** Merge `other` into `map` (Agarwal et al. §3.2): add counts
    * pointwise, then if more than k counters remain subtract the
    * (k+1)-th largest count from all and drop the non-positive — the
    * merged summary keeps the N/(k+1) undercount bound for the combined
    * stream. */
  def merge(map: java.util.HashMap[Long, Long], k: Int,
      other: java.util.HashMap[Long, Long]): Unit = {
    val oit = other.entrySet().iterator()
    while (oit.hasNext) {
      val e = oit.next()
      map.put(e.getKey, map.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (map.size > k) {
      val counts = new Array[Long](map.size)
      var i = 0
      val vit = map.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
      }
    }
  }

  /** Resident items in ascending order — the deterministic surface the
    * candidate-verify join consumes. */
  def sortedKeys(map: java.util.HashMap[Long, Long]): Array[Long] = {
    val out = new Array[Long](map.size)
    var i = 0
    val it = map.keySet().iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    out
  }
}

/** Misra-Gries frequent-items summary as a custom Catalyst aggregate:
  * keeps at most k (item, counter) pairs per group and evaluates to the
  * sorted resident items — the CANDIDATE SET for a two-pass exact
  * heavy-hitters query (`q_heavy_hitters` / `stream_heavy_hitters`).
  *
  * Scale rationale: a direct GROUP BY over a high-cardinality key
  * shuffles every distinct key; at 100 TB with billions of distinct
  * items that shuffle is the job. This aggregate's partials are ≤ k
  * pairs per map task regardless of row count or key cardinality
  * (bounded-state like [[KmvDistinct]] / [[BottomKByHash]]), merge as
  * standard partial/final aggregation, and the follow-up exact pass
  * counts ONLY the ≤ k candidate keys (broadcast semi-join before the
  * group-by), so its shuffle is k·P partial rows instead of the full
  * key space. The N/(k+1) undercount guarantee (see [[MisraGries]])
  * makes the verified output exact and partitioning-independent.
  */
case class MisraGriesAgg(
    item: Expression,
    k: Int = 127,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]] {

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]

  override def update(buf: java.util.HashMap[Long, Long],
      input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = item.eval(input)
    if (v != null) MisraGries.add(buf, k, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(buf: java.util.HashMap[Long, Long],
      other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    MisraGries.merge(buf, k, other)
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any =
    new GenericArrayData(MisraGries.sortedKeys(buf))

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(item = c(0))
}

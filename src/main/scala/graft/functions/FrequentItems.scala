package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable bounded-memory heavy-hitter state: a Misra-Gries summary
  * of at most ~2·capacity counters plus the total weight subtracted so
  * far (`offset`). Invariants carried through update/merge/prune:
  *
  *  - `cnt(x) ≤ true(x) ≤ cnt(x) + offset` for EVERY item, tracked or
  *    not (an untracked item has cnt 0) — counts are lower bounds and
  *    `offset` is the one-sided error;
  *  - `offset ≤ N / (capacity + 1)` where N is the total items
  *    consumed, because each prune subtracts the (capacity+1)-th
  *    largest count c* from all counters, destroying ≥ (capacity+1)·c*
  *    units of mass;
  *  - therefore any item with `true(x) > N / (capacity + 1)` is still
  *    tracked (its counter cannot have reached 0) — the classic
  *    guaranteed-heavy-hitter property.
  *
  * When `offset == 0` — no prune ever fired, i.e. capacity covered the
  * distinct-item universe of every partial — the summary IS the exact
  * count map, independent of partitioning and merge order (sums of
  * per-partition exact maps). With evictions the surviving counter
  * VALUES may depend on merge order; the invariants above hold
  * regardless, which is what the approximation contract promises. */
private[functions] final class FreqSummary(
    val counts: java.util.HashMap[String, Long], var offset: Long) {

  def add(item: String): Unit = {
    val prev = counts.getOrDefault(item, 0L)
    counts.put(item, prev + 1L)
  }

  /** Subtract the (capacity+1)-th largest count from every counter and
    * drop the non-positive ones — the batched Misra-Gries decrement
    * (amortized O(1) per item; the map is allowed to grow to
    * 2·capacity between prunes). No-op while the map fits. */
  def pruneTo(capacity: Int): Unit = {
    if (counts.size() <= capacity) return
    val values = new Array[Long](counts.size())
    val it0 = counts.values().iterator()
    var i = 0
    while (it0.hasNext) { values(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(values)
    // (capacity+1)-th largest = index size-(capacity+1) ascending
    val cut = values(counts.size() - (capacity + 1))
    offset += cut
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val left = e.getValue - cut
      if (left <= 0L) it.remove() else e.setValue(left)
    }
  }
}

/** `graft_frequent_items(item, capacity)` — per-group heavy hitters in
  * ONE partial-aggregated pass with HARD bounded state, the sketch path
  * for top-token cards at corpus scale ([[graft.operators.Profile
  * .topTokensSketch]]): where the exact path must shuffle every
  * distinct (group, token) pair, this shuffles one ≤ capacity-sized
  * summary per (partition, group) and merges them associatively-enough
  * (see [[FreqSummary]] for the exact/approximate determinism
  * contract). Misra-Gries with batched decrements — the same summary
  * family as Apache DataSketches' frequent-items.
  *
  * Returns `array<struct<item string, est bigint, max_err bigint>>`
  * sorted (est DESC, item ASC); `est` is a LOWER bound on the true
  * count, `est + max_err` the upper bound, and `max_err == 0` certifies
  * the exact regime. Nulls are ignored (aggregate convention). */
case class FrequentItemsSketch(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqSummary] with UnaryLike[Expression] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_frequent_items needs a string item column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): FreqSummary =
    new FreqSummary(new java.util.HashMap[String, Long](), 0L)

  override def update(buffer: FreqSummary, input: InternalRow): FreqSummary = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(v.asInstanceOf[UTF8String].toString)
      // 2·capacity high-water mark: amortizes the O(size) prune over
      // ≥ capacity inserts
      if (buffer.counts.size() > 2 * capacity) buffer.pruneTo(capacity)
    }
    buffer
  }

  override def merge(buffer: FreqSummary, other: FreqSummary): FreqSummary = {
    buffer.offset += other.offset
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val prev = buffer.counts.getOrDefault(e.getKey, 0L)
      buffer.counts.put(e.getKey, prev + e.getValue)
    }
    if (buffer.counts.size() > 2 * capacity) buffer.pruneTo(capacity)
    buffer
  }

  override def eval(buffer: FreqSummary): Any = {
    buffer.pruneTo(capacity)
    val entries = new Array[(String, Long)](buffer.counts.size())
    val it = buffer.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue); i += 1
    }
    // (est DESC, item ASC): a deterministic display order and the rank
    // order topTokensSketch cuts at k. Item ties compare as UTF8String
    // (UTF-8 byte order) — Profile.topTokens ranks token ASC under
    // Spark's binary string ordering, and Java String.compareTo (UTF-16
    // code units) diverges from it for supplementary-plane characters,
    // which would break the exact-regime bit-equality contract
    java.util.Arrays.sort(entries, (a: (String, Long), b: (String, Long)) =>
      if (a._2 != b._2) java.lang.Long.compare(b._2, a._2)
      else UTF8String.fromString(a._1).compareTo(UTF8String.fromString(b._1)))
    new GenericArrayData(entries.map { case (item, est) =>
      val row = new GenericInternalRow(3)
      row.update(0, UTF8String.fromString(item))
      row.setLong(1, est)
      row.setLong(2, buffer.offset)
      row: InternalRow
    })
  }

  override def serialize(buffer: FreqSummary): Array[Byte] = {
    // shuffle bytes bounded: a partial never ships more than capacity
    // counters
    buffer.pruneTo(capacity)
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(buffer.offset)
    out.writeInt(buffer.counts.size())
    val it = buffer.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      // length-prefixed raw UTF-8, not writeUTF: writeUTF throws
      // UTFDataFormatException past 65535 encoded bytes, so one
      // pathological token would fail the whole aggregation at shuffle
      // time instead of just being counted
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val offset = in.readLong()
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      m.put(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    new FreqSummary(m, offset)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): FrequentItemsSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): FrequentItemsSketch =
    copy(child = newChild)

  override def prettyName: String = "graft_frequent_items"
}

object FrequentItemsSketch {
  def frequent_items(c: Column, capacity: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      FrequentItemsSketch(GraftColumnBridge.expression(c), capacity)
        .toAggregateExpression())
  }
}

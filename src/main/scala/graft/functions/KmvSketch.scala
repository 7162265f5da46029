package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * `TypedImperativeAggregate` — the "novel sketch" extension. State is
  * BOUNDED: the k smallest distinct hash values seen (a TreeSet capped
  * at k), so unlike `collect_set` the per-group buffer never grows with
  * cardinality — at 100 TB each partial aggregate ships at most k
  * longs. Estimate: exact size while < k values seen; otherwise
  * (k−1)·P/h_k where h_k is the k-th smallest hash over the
  * [0, P=2^31−1) hash space (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002).
  *
  * The input must already be a deterministic hash in [0, P) (e.g.
  * `TextFunctions.md5Long`), which makes the whole sketch — not just
  * its error bound — reproducible bit-for-bit in the DuckDB oracle:
  * same hashes → same k-smallest set → same estimate, one double
  * division at the end.
  *
  * Unlike Spark's built-in `approx_count_distinct` (HLL++, whose
  * sketch layout no other engine reproduces), this is cross-engine
  * deterministic by construction.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  require(k >= 2, "kmv_sketch needs k >= 2")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a pre-hashed bigint column, got ${child.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long], row: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf += h
      else if (h < buf.last && !buf.contains(h)) { buf += h; buf -= buf.last }
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    b.foreach { h =>
      if (a.size < k) a += h
      else if (h < a.last && !a.contains(h)) { a += h; a -= a.last }
    }
    a
  }

  /** Exact count below k; (k−1)·P/h_k beyond. */
  override def eval(buf: mutable.TreeSet[Long]): Any =
    if (buf.size < k) buf.size.toDouble
    else (k - 1).toDouble * TextFunctions.MinhashP / buf.last.toDouble

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.TreeSet.empty[Long]
    (0 until n).foreach(_ => buf += in.readLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-min sketch as a native `TypedImperativeAggregate` — the
  * heavy-hitters companion to [[KmvSketch]] (Cormode & Muthukrishnan,
  * "An improved data stream summary: the count-min sketch and its
  * applications", J. Algorithms 2005). State is a FIXED depth×width
  * long matrix (default 4×256 = 8 KiB): per-group partial aggregates
  * ship a constant-size buffer regardless of cardinality, and merge is
  * element-wise addition — at 100 TB the shuffle carries d·w longs per
  * group, never a token list.
  *
  * Row i buckets by the same universal-hash family as the MinHash
  * permutations (`TextFunctions.minhashFromHashes`):
  * h_i(x) = ((2i+1)·x + i² + 98765) mod P mod width over a pre-hashed
  * input in [0, P = 2³¹−1) (`md5Long`). Deterministic arithmetic end to
  * end, so the DuckDB oracle reproduces the exact counter matrix — the
  * estimates hash-match, not just approximate. Point estimate (see
  * `Graft.cmsEstimate`): min over rows of the addressed counter —
  * always ≥ the true count, equal for any key that never collides in
  * some row.
  */
case class CmsSketch(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "cms_sketch depth in [1,16]")
  require(width >= 2 && width <= 65536, "cms_sketch width in [2,65536]")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a pre-hashed bigint column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < depth) {
        // identical family to minhashFromHashes: a=2i+1, b=i²+98765
        val b = (((2L * i + 1L) * h + (i.toLong * i + 98765L)) %
          TextFunctions.MinhashP % width).toInt
        buf(i * width + b) += 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmsSketch =
    copy(child = newChildren.head)
}

package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bloom filter as a native `TypedImperativeAggregate` — the membership
  * companion to [[KmvSketch]] (distinct count) and [[CmsSketch]] (point
  * frequency); Bloom, "Space/time trade-offs in hash coding with
  * allowable errors", CACM 1970. State is a FIXED bit array packed into
  * `numBits/64` longs (default 32768 bits = 4 KiB): per-group partials
  * ship a constant-size buffer regardless of how many keys went in,
  * and merge is word-wise OR — at 100 TB the contamination set
  * (benchmark n-grams, blocklists, seen-URL tables) compresses to a
  * broadcastable blob instead of the giant build side of a semi-join.
  *
  * Hash i buckets by the same universal family as MinHash/CMS
  * (`TextFunctions.minhashFromHashes`): position_i(x) =
  * ((2i+1)·x + i² + 98765) mod P mod numBits over a pre-hashed input
  * in [0, P = 2³¹−1) (`md5Long`). Deterministic integer arithmetic end
  * to end, so the DuckDB oracle reproduces the exact bit set — probes
  * (including false positives) hash-match, not just approximate.
  * Membership semantics: a probe is flagged iff all k bits are set —
  * no false negatives ever, false-positive rate ≈ (1−e^(−kn/m))^k.
  * Probe side: `Graft.bloomContains` (pure column arithmetic, no UDF).
  */
case class BloomSketch(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits <= (1 << 26) && numBits % 64 == 0,
    "bloom_sketch bits in [64, 2^26], multiple of 64")
  require(numHashes >= 1 && numHashes <= 16, "bloom_sketch hashes in [1,16]")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch expects a pre-hashed bigint column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        // identical family to minhashFromHashes/CmsSketch: a=2i+1, b=i²+98765.
        // Sign-normalize like the probe side's pmod: md5Long inputs are
        // already in [0, P), but the function is registered for ANY
        // bigint column (xxhash64 output is frequently negative) and a
        // sign-following % would index the word array negatively.
        val r = ((2L * i + 1L) * h + (i.toLong * i + 98765L)) %
          TextFunctions.MinhashP
        val bit = (((r + TextFunctions.MinhashP) % TextFunctions.MinhashP)
          % numBits).toInt
        buf(bit >>> 6) |= 1L << (bit & 63)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
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
    val buf = new Array[Long](numBits / 64)
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BloomSketch =
    copy(child = newChildren.head)
}

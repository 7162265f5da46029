package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Decoded ISO-BMFF movie-header fields. `durationUnits` is -1 when
  * the mvhd carried no duration (callers surface that as NULL).
  */
final case class BmffMeta(brand: String, width: Int, height: Int,
                          timescale: Long, durationUnits: Long)

/** Native Catalyst expression for VIDEO container metadata — the video
  * analogue of `flac_streaminfo`/`mp3_header`: the ISO-BMFF (MP4/MOV/
  * 3GP, ISO/IEC 14496-12) box structure is length-prefixed, so brand,
  * movie timescale/duration and track dimensions are a pure O(boxes)
  * byte walk with no codec involved. ONE parser shared with
  * `pipeline.Multimodal.decodeVideo` (the expression twin can never
  * drift from the row-level decoder), static and total: any
  * non-ISO-BMFF or structurally corrupt payload yields NULL.
  */
object VideoWire {

  private def typ(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** ISO-BMFF movie metadata, or null when the payload is not
    * ISO-BMFF or its box structure is corrupt. Every fixed-offset
    * field read is bounded by ITS OWN box's payload end — a truncated
    * mvhd/tkhd is structural corruption (→ null), never a read into a
    * sibling box's bytes presented as real metadata. Reference
    * semantics documented at `Multimodal.decodeVideo`.
    */
  def bmffFields(bytes: Array[Byte]): BmffMeta = {
    if (bytes == null || bytes.length < 16) return null
    def u32(off: Int): Long =
      if (off + 4 > bytes.length) -1L
      else ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    def u64(off: Int): Long =
      if (off + 8 > bytes.length) -1L else (u32(off) << 32) | u32(off + 4)
    // walk the child boxes of [start, end), calling f(type, payloadStart,
    // payloadEnd); returns false on structural corruption
    def walk(start: Int, end: Int)(f: (String, Int, Int) => Unit): Boolean = {
      var off = start
      while (off + 8 <= end) {
        val size0 = u32(off)
        val (size, hdr) =
          if (size0 == 1L) (u64(off + 8), 16) // 64-bit largesize
          else if (size0 == 0L) ((end - off).toLong, 8) // to end of span
          else (size0, 8)
        if (size < hdr || off + size > end) return false
        f(typ(bytes, off + 4), off + hdr, off + size.toInt)
        off += size.toInt
      }
      true
    }
    try {
      // sniff: an ISO-BMFF file leads with a box whose type is ftyp (or
      // moov/mdat/free/wide for brand-less QuickTime)
      val lead = typ(bytes, 4)
      if (!Set("ftyp", "moov", "mdat", "free", "wide", "skip")
          .contains(lead)) return null
      var brand: String = null
      var timescale = -1L
      var durationUnits = -1L
      var w = 0; var h = 0
      var corrupt = false
      val ok = walk(0, bytes.length) { (t, p, pEnd) =>
        t match {
          case "ftyp" if pEnd - p >= 4 => brand = typ(bytes, p).trim
          case "moov" =>
            val innerOk = walk(p, pEnd) { (t2, p2, p2End) =>
              t2 match {
                case "mvhd" if p2 < p2End =>
                  val v = bytes(p2) & 0xff
                  if (v == 1) {
                    if (p2 + 32 > p2End) corrupt = true
                    else {
                      timescale = u32(p2 + 20)
                      durationUnits = u64(p2 + 24)
                    }
                  } else {
                    if (p2 + 20 > p2End) corrupt = true
                    else {
                      timescale = u32(p2 + 12)
                      durationUnits = u32(p2 + 16)
                    }
                  }
                case "trak" =>
                  if (!walk(p2, p2End) { (t3, p3, p3End) =>
                    if (t3 == "tkhd" && w == 0 && p3 < p3End) {
                      val v = bytes(p3) & 0xff
                      val base = if (v == 1) p3 + 88 else p3 + 76
                      if (base + 8 > p3End) corrupt = true
                      else {
                        val tw = (u32(base) >> 16).toInt // 16.16 fixed pt
                        val th = (u32(base + 4) >> 16).toInt
                        if (tw > 0 && th > 0) { w = tw; h = th }
                      }
                    }
                  }) corrupt = true
                case _ =>
              }
            }
            if (!innerOk) corrupt = true
          case _ =>
        }
      }
      if (!ok || corrupt || timescale <= 0) null
      else BmffMeta(if (brand != null) brand else "mov", w, h,
        timescale, durationUnits)
    } catch { case _: Throwable => null }
  }

  /** Struct row for `mp4_meta` (callable from generated Java):
    * (brand, width, height, timescale, duration_micros NULLABLE) —
    * duration in floored integer micros via overflow-safe split
    * division, NULL when the mvhd carried no duration.
    */
  def bmffRow(bytes: Array[Byte]): InternalRow = {
    val m = bmffFields(bytes)
    if (m == null) return null
    val vals = new Array[Any](5)
    vals(0) = UTF8String.fromString(m.brand)
    vals(1) = m.width
    vals(2) = m.height
    vals(3) = m.timescale
    if (m.durationUnits >= 0)
      vals(4) = m.durationUnits / m.timescale * 1000000L +
        (m.durationUnits % m.timescale) * 1000000L / m.timescale
    new GenericInternalRow(vals)
  }
}

/** `mp4_meta(binary)` → struct(brand, width, height, timescale,
  * duration_micros) | NULL.
  */
case class Mp4Meta(child: Expression) extends HeaderStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("brand", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("timescale", LongType, nullable = false),
    StructField("duration_micros", LongType, nullable = true)))
  override def prettyName: String = "mp4_meta"
  override protected def parserMethod: String =
    "graft.functions.VideoWire.bmffRow"
  override protected def nullSafeEval(input: Any): Any =
    VideoWire.bmffRow(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): Mp4Meta = copy(child = newChild)
}

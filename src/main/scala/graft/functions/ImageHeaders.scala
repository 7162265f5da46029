package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Decoded WebP dimensions. `variant` is the first chunk's fourCC with
  * trailing padding trimmed ("VP8X" extended / "VP8L" lossless /
  * "VP8" lossy).
  */
final case class WebpMeta(variant: String, width: Int, height: Int)

/** Native-expression parsers for IMAGE container headers — the image
  * sibling of `AudioWire`/`VideoWire`. WebP is the crawl web's most
  * common image format and the one the JDK ships NO ImageIO reader
  * for, so its RIFF header walk is the highest-value pure-bytes
  * decode in the media-metadata family. ONE parser shared with
  * `pipeline.Multimodal.decodeWebp` (the expression twin can never
  * drift from the row-level decoder), static and total: any
  * non-WebP or structurally corrupt payload yields null.
  */
object ImageWire {

  /** WebP variant + canvas dimensions, or null when the payload is
    * not WebP or its first chunk is corrupt/truncated. Per-variant
    * dimension fields: VP8X extended header (24-bit little-endian
    * canvas w−1/h−1), VP8L lossless (14-bit packed w−1/h−1 after the
    * 0x2f signature), VP8 lossy (14-bit w/h after the 0x9d012a start
    * code). Every field read is bounded by the chunk's DECLARED size
    * and the buffer — a truncated chunk yields null, never dims read
    * from padding bytes.
    */
  def webpFields(bytes: Array[Byte]): WebpMeta = {
    def u8(i: Int) = bytes(i) & 0xff
    // 25 bytes = RIFF header (12) + chunk header (8) + minimal VP8L
    // payload (5) — the 1×1 tracking-pixel shape; VP8X/VP8 minimums
    // are enforced per-variant below against the DECLARED chunk size
    if (bytes == null || bytes.length < 25) return null
    if (!(bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
        bytes(10) == 'B' && bytes(11) == 'P')) return null
    val tag = new String(bytes, 12, 4, "US-ASCII")
    val p = 20 // first chunk payload
    // the chunk's declared size must cover every field we read AND fit
    // the buffer — a truncated chunk yields null, never garbage dims
    val chunkSize = (u8(16) | (u8(17) << 8) | (u8(18) << 16) |
      (u8(19).toLong << 24))
    def fits(need: Int): Boolean =
      chunkSize >= need && p + need <= bytes.length
    tag match {
      case "VP8X" if fits(10) =>
        // canvas size: 24-bit little-endian minus-one fields at +4/+7
        val w = 1 + (u8(p + 4) | (u8(p + 5) << 8) | (u8(p + 6) << 16))
        val h = 1 + (u8(p + 7) | (u8(p + 8) << 8) | (u8(p + 9) << 16))
        WebpMeta("VP8X", w, h)
      case "VP8L" if fits(5) && u8(p) == 0x2f =>
        val b = (u8(p + 1) | (u8(p + 2) << 8) | (u8(p + 3) << 16) |
          (u8(p + 4) << 24)).toLong
        val w = 1 + (b & 0x3fff).toInt
        val h = 1 + ((b >> 14) & 0x3fff).toInt
        WebpMeta("VP8L", w, h)
      case "VP8 " if fits(10) && u8(p + 3) == 0x9d && u8(p + 4) == 0x01 &&
          u8(p + 5) == 0x2a =>
        val w = (u8(p + 6) | (u8(p + 7) << 8)) & 0x3fff
        val h = (u8(p + 8) | (u8(p + 9) << 8)) & 0x3fff
        WebpMeta("VP8", w, h)
      case _ => null
    }
  }

  /** Struct row for `webp_dims` (callable from generated Java):
    * (variant, width, height).
    */
  def webpRow(bytes: Array[Byte]): InternalRow = {
    val m = webpFields(bytes)
    if (m == null) return null
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(m.variant), m.width, m.height))
  }
}

/** `webp_dims(binary)` → struct(variant, width, height) | NULL. */
case class WebpDimsExpr(child: Expression) extends HeaderStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("variant", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def prettyName: String = "webp_dims"
  override protected def parserMethod: String =
    "graft.functions.ImageWire.webpRow"
  override protected def nullSafeEval(input: Any): Any =
    ImageWire.webpRow(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): WebpDimsExpr = copy(child = newChild)
}

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

/** Decoded PNG IHDR fields (PNG spec §11.2.2). */
final case class PngMeta(width: Int, height: Int, bitDepth: Int,
                         colorType: Int)

/** Decoded JPEG SOF frame fields (ITU T.81 §B.2.2). */
final case class JpegMeta(width: Int, height: Int, precision: Int,
                          nComponents: Int)

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

  /** PNG IHDR walk: 8-byte signature, then the FIRST chunk must be
    * IHDR (the spec mandates it) with a declared length covering the
    * 13 fixed fields — width/height as big-endian u32 (values above
    * 2³¹−1 are invalid per spec and rejected, never wrapped), bit
    * depth and color type as u8. Null on any non-PNG or truncated
    * payload; no field is ever read past the buffer or the declared
    * chunk length.
    */
  def pngFields(bytes: Array[Byte]): PngMeta = {
    def u8(i: Int) = bytes(i) & 0xff
    // 26 bytes = signature (8) + IHDR chunk header (8) + the 10 IHDR
    // bytes we read (w, h, depth, color type)
    if (bytes == null || bytes.length < 26) return null
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if (u8(i) != sig(i)) return null; i += 1 }
    val declared = (u8(8).toLong << 24) | (u8(9) << 16) | (u8(10) << 8) |
      u8(11)
    if (declared < 13) return null // IHDR data is exactly 13 bytes
    if (!(bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' &&
        bytes(15) == 'R')) return null
    val w = (u8(16).toLong << 24) | (u8(17) << 16) | (u8(18) << 8) | u8(19)
    val h = (u8(20).toLong << 24) | (u8(21) << 16) | (u8(22) << 8) | u8(23)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return null
    PngMeta(w.toInt, h.toInt, u8(24), u8(25))
  }

  /** JPEG SOF walk: SOI sniff, then the segment chain — skip fill
    * bytes and standalone markers (TEM/RSTn), hop tagged segments by
    * their declared big-endian length — until the first frame header
    * (SOF0-15 except the non-frame C4/C8/CC), which carries precision,
    * height, width and component count. Null when sync is lost, a
    * declared length runs past the buffer, or EOI/SOS arrives before
    * any SOF (dims would then require entropy decoding). Every read is
    * bounds-checked against both the buffer and the declared segment
    * length.
    */
  def jpegFields(bytes: Array[Byte]): JpegMeta = {
    def u8(i: Int) = bytes(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (bytes == null || bytes.length < 4) return null
    if (!(u8(0) == 0xff && u8(1) == 0xd8)) return null
    var i = 2
    while (i + 1 < bytes.length) {
      if (u8(i) != 0xff) return null // lost sync — reject, never scan on
      var j = i
      while (j + 1 < bytes.length && u8(j + 1) == 0xff) j += 1 // fill bytes
      if (j + 1 >= bytes.length) return null
      val marker = u8(j + 1)
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7) ||
          marker == 0xd8) {
        i = j + 2 // standalone markers carry no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return null // EOI / start-of-scan before any frame header
      } else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        // SOFn: length(2) precision(1) height(2) width(2) ncomp(1)
        if (j + 10 > bytes.length) return null
        if (u16(j + 2) < 8) return null // declared length must cover reads
        val h = u16(j + 5)
        val w = u16(j + 7)
        if (w <= 0 || h <= 0) return null
        return JpegMeta(w, h, u8(j + 4), u8(j + 9))
      } else {
        if (j + 3 >= bytes.length) return null
        val segLen = u16(j + 2)
        if (segLen < 2) return null
        i = j + 2 + segLen
      }
    }
    null
  }

  /** Struct row for `png_dims`: (width, height, bit_depth, color_type). */
  def pngRow(bytes: Array[Byte]): InternalRow = {
    val m = pngFields(bytes)
    if (m == null) return null
    new GenericInternalRow(Array[Any](
      m.width, m.height, m.bitDepth, m.colorType))
  }

  /** Struct row for `jpeg_dims`: (width, height, precision,
    * n_components).
    */
  def jpegRow(bytes: Array[Byte]): InternalRow = {
    val m = jpegFields(bytes)
    if (m == null) return null
    new GenericInternalRow(Array[Any](
      m.width, m.height, m.precision, m.nComponents))
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

/** `png_dims(binary)` → struct(width, height, bit_depth, color_type)
  * | NULL.
  */
case class PngDimsExpr(child: Expression) extends HeaderStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("color_type", IntegerType, nullable = false)))
  override def prettyName: String = "png_dims"
  override protected def parserMethod: String =
    "graft.functions.ImageWire.pngRow"
  override protected def nullSafeEval(input: Any): Any =
    ImageWire.pngRow(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): PngDimsExpr = copy(child = newChild)
}

/** `jpeg_dims(binary)` → struct(width, height, precision,
  * n_components) | NULL.
  */
case class JpegDimsExpr(child: Expression) extends HeaderStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("precision", IntegerType, nullable = false),
    StructField("n_components", IntegerType, nullable = false)))
  override def prettyName: String = "jpeg_dims"
  override protected def parserMethod: String =
    "graft.functions.ImageWire.jpegRow"
  override protected def nullSafeEval(input: Any): Any =
    ImageWire.jpegRow(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): JpegDimsExpr = copy(child = newChild)
}

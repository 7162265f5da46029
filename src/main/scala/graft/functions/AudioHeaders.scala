package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for audio HEADER metadata — the audio
  * analogue of `exif_orientation`: FLAC's mandatory STREAMINFO block
  * and the MP3 frame header are pure byte walks (no codec), so their
  * fields can live in the plan as codegen'd columns instead of a
  * `mapPartitions` round-trip. The byte-walk parsers are shared with
  * `pipeline.Multimodal.decodeFlac/decodeMp3` (ONE parser, two
  * surfaces — an expression twin can never drift from the row-level
  * decoder), static and total: any malformed input yields NULL.
  */
object AudioWire {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** FLAC STREAMINFO fields, or null when the payload is not FLAC:
    * [channels, sample_rate, bits_per_sample, total_samples].
    * total_samples may be 0 — the spec's "unknown" spelling; callers
    * surface that as NULL. Reference semantics documented at
    * `Multimodal.decodeFlac`.
    */
  def flacFields(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < 4 + 4 + 34) return null
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' &&
        bytes(3) == 'C')) return null
    // first block must be STREAMINFO (type 0; bit 7 = last-block flag)
    if ((u8(bytes, 4) & 0x7f) != 0) return null
    val len = (u8(bytes, 5) << 16) | (u8(bytes, 6) << 8) | u8(bytes, 7)
    if (len < 34) return null
    val p = 8 + 10 // skip min/max block size (4) + min/max frame size (6)
    // 64 bits at p: rate(20) channels-1(3) bits-1(5) totalSamples(36)
    val rate = (u8(bytes, p) << 12) | (u8(bytes, p + 1) << 4) |
      (u8(bytes, p + 2) >> 4)
    if (rate == 0) return null // 0 is invalid per spec
    val channels = ((u8(bytes, p + 2) >> 1) & 0x07) + 1
    val bits = (((u8(bytes, p + 2) & 0x01) << 4) | (u8(bytes, p + 3) >> 4)) + 1
    val samples = ((u8(bytes, p + 3) & 0x0f).toLong << 32) |
      (u8(bytes, p + 4).toLong << 24) | (u8(bytes, p + 5).toLong << 16) |
      (u8(bytes, p + 6).toLong << 8) | u8(bytes, p + 7).toLong
    Array(channels.toLong, rate.toLong, bits.toLong, samples)
  }

  /** MP3 frame-header fields, or null when the payload is not accepted
    * as MP3: [channels, sample_rate]. Acceptance rules (documented at
    * `Multimodal.decodeMp3`): optional ID3v2 skip (syncsafe size +
    * footer flag), Layer III header, at least one COMPLETE frame
    * backed by the buffer, and a second valid header wherever the
    * buffer reaches that far (the standard two-frame sniff).
    */
  def mp3Fields(bytes: Array[Byte]): Array[Long] = {
    if (bytes == null || bytes.length < 14) return null
    def u8i(i: Int) = bytes(i) & 0xff
    // skip ID3v2: "ID3" <ver:2> <flags:1> <syncsafe size:4>; the
    // footer flag (bit 4) appends 10 more bytes after the tag body
    val off =
      if (bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
        val sz = (u8i(6) << 21) | (u8i(7) << 14) | (u8i(8) << 7) | u8i(9)
        10 + sz + (if ((u8i(5) & 0x10) != 0) 10 else 0)
      } else 0
    // validate a Layer III frame header at `i`; returns the frame
    // length in bytes, or -1
    def frameLen(i: Int): Int = {
      if (i < 0 || i + 4 > bytes.length) return -1
      if (u8i(i) != 0xff || (u8i(i + 1) & 0xe0) != 0xe0) return -1
      val version = (u8i(i + 1) >> 3) & 3 // 0=MPEG2.5, 2=MPEG2, 3=MPEG1
      val layer = (u8i(i + 1) >> 1) & 3   // 1 = Layer III
      if (version == 1 || layer != 1) return -1
      val brIdx = (u8i(i + 2) >> 4) & 15
      if (brIdx == 0 || brIdx == 15) return -1 // free-format / invalid
      val rIdx = (u8i(i + 2) >> 2) & 3
      if (rIdx == 3) return -1
      val kbps =
        if (version == 3)
          Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
            256, 320)(brIdx)
        else
          Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
            160)(brIdx)
      val rate = version match {
        case 3 => Array(44100, 48000, 32000)(rIdx)
        case 2 => Array(22050, 24000, 16000)(rIdx)
        case _ => Array(11025, 12000, 8000)(rIdx)
      }
      val coef = if (version == 3) 144 else 72
      val pad = (u8i(i + 2) >> 1) & 1
      coef * kbps * 1000 / rate + pad
    }
    val len1 = frameLen(off)
    if (len1 <= 0) return null
    // a real MP3 holds at least one COMPLETE frame: a bare header the
    // buffer can't back with its own payload is far more likely a
    // random sync collision (~1-in-8k) than audio
    if (off + len1 > bytes.length) return null
    // two-frame verification whenever the buffer can hold the second
    // header; same version/layer family is implied by frameLen
    if (off + len1 + 4 <= bytes.length && frameLen(off + len1) <= 0)
      return null
    val versionBits = (u8i(off + 1) >> 3) & 3
    val rateIdx = (u8i(off + 2) >> 2) & 3
    val rate = versionBits match {
      case 3 => Array(44100, 48000, 32000)(rateIdx)
      case 2 => Array(22050, 24000, 16000)(rateIdx)
      case _ => Array(11025, 12000, 8000)(rateIdx)
    }
    val channels = if (((u8i(off + 3) >> 6) & 3) == 3) 1 else 2
    Array(channels.toLong, rate.toLong)
  }

  /** Struct row for `flac_streaminfo` (callable from generated Java):
    * (channels, sample_rate, bits_per_sample, total_samples NULLABLE,
    * duration_micros NULLABLE) — duration in floored integer micros,
    * NULL with total_samples when the header says "unknown" (0).
    */
  def flacRow(bytes: Array[Byte]): InternalRow = {
    val f = flacFields(bytes)
    if (f == null) return null
    val vals = new Array[Any](5)
    vals(0) = f(0).toInt
    vals(1) = f(1).toInt
    vals(2) = f(2).toInt
    if (f(3) > 0) {
      vals(3) = f(3)
      vals(4) = f(3) * 1000000L / f(1)
    }
    new GenericInternalRow(vals)
  }

  /** Struct row for `mp3_header`: (channels, sample_rate). */
  def mp3Row(bytes: Array[Byte]): InternalRow = {
    val f = mp3Fields(bytes)
    if (f == null) return null
    new GenericInternalRow(Array[Any](f(0).toInt, f(1).toInt))
  }
}

/** Shared shape of the media-header expressions (FLAC/MP3/MP4): binary
  * → struct via a static total parser, NULL on anything the parser
  * rejects.
  */
abstract class HeaderStructExpr extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a binary argument, got ${child.dataType.catalogString}")
  override def nullable: Boolean = true
  /** Fully-qualified static method `(byte[]) → InternalRow`. */
  protected def parserMethod: String
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("hdr")
      s"""
         |org.apache.spark.sql.catalyst.InternalRow $r = $parserMethod($bytes);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })
}

/** `flac_streaminfo(binary)` → struct(channels, sample_rate,
  * bits_per_sample, total_samples, duration_micros) | NULL.
  */
case class FlacStreaminfo(child: Expression) extends HeaderStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("total_samples", LongType, nullable = true),
    StructField("duration_micros", LongType, nullable = true)))
  override def prettyName: String = "flac_streaminfo"
  override protected def parserMethod: String =
    "graft.functions.AudioWire.flacRow"
  override protected def nullSafeEval(input: Any): Any =
    AudioWire.flacRow(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): FlacStreaminfo = copy(child = newChild)
}

/** `mp3_header(binary)` → struct(channels, sample_rate) | NULL. */
case class Mp3Header(child: Expression) extends HeaderStructExpr {
  override def dataType: DataType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false)))
  override def prettyName: String = "mp3_header"
  override protected def parserMethod: String =
    "graft.functions.AudioWire.mp3Row"
  override protected def nullSafeEval(input: Any): Any =
    AudioWire.mp3Row(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(
      newChild: Expression): Mp3Header = copy(child = newChild)
}

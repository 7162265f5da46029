package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType}

/** Native Catalyst expression: the EXIF orientation tag (1–8) of a
  * JPEG payload, NULL when the payload is not a JPEG, carries no EXIF
  * APP1 segment, or has no orientation entry. A production image
  * pipeline must respect orientation before any crop/resize — a
  * rotated-by-metadata photo is silently transposed otherwise — and
  * the tag lives in the first few KB, so this is a pure HEADER byte
  * walk (reference multimodal story: real where bytes suffice, no
  * codec): SOI marker scan → APP1 `Exif\0\0` → TIFF header (II/MM,
  * magic 42) → IFD0 entry tag 0x0112 (type SHORT or LONG). O(header),
  * inside whole-stage codegen via the static parser, total on any
  * input (malformed/truncated segments simply yield NULL).
  */
case class ExifOrientationExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"exif_orientation expects a binary argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = IntegerType

  override def nullable: Boolean = true

  override def prettyName: String = "exif_orientation"

  override protected def nullSafeEval(input: Any): Any =
    Exif.orientation(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("ori")
      s"""
         |java.lang.Integer $r = graft.functions.Exif.orientation($bytes);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.intValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): ExifOrientationExpr = copy(child = newChild)
}

/** Static parser (top-level object ⇒ static forwarder, callable from
  * generated Java). Every read is bounds-checked; any structural
  * violation returns null rather than throwing — the column must be
  * total over arbitrary bytes.
  */
object Exif {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** Big-endian u16 with bounds check, -1 on overrun. */
  private def be16(b: Array[Byte], i: Int): Int =
    if (i < 0 || i + 1 >= b.length) -1 else (u8(b, i) << 8) | u8(b, i + 1)

  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (i < 0 || i + 1 >= b.length) -1
    else if (le) u8(b, i) | (u8(b, i + 1) << 8)
    else be16(b, i)

  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (i < 0 || i + 3 >= b.length) -1L
    else if (le)
      u8(b, i) | (u8(b, i + 1).toLong << 8) |
        (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
    else
      (u8(b, i).toLong << 24) | (u8(b, i + 1).toLong << 16) |
        (u8(b, i + 2).toLong << 8) | u8(b, i + 3)

  def orientation(b: Array[Byte]): Integer = {
    if (b == null || b.length < 4) return null
    // JPEG SOI
    if (u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return null
    var i = 2
    // marker scan: stop at SOS (entropy-coded data follows) or EOI
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return null
      val m = u8(b, i + 1)
      if (m == 0xff) {
        i += 1 // spec-legal fill byte (T.81 B.1.1.2): 0xFF padding
      } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2 // standalone markers carry no length
      } else if (m == 0xd9 || m == 0xda) {
        return null
      } else {
        val len = be16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return null
        if (m == 0xe1 && len >= 2 + 6 + 8 &&
            b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
            b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
          return tiffOrientation(b, i + 10, i + 2 + len)
        }
        i += 2 + len
      }
    }
    null
  }

  /** Parse the TIFF structure inside [base, limit): byte-order mark,
    * magic 42, IFD0, entry 0x0112 (SHORT or LONG). The SHORT value sits in the
    * first two bytes of the entry's 4-byte value field, in TIFF byte
    * order.
    */
  private def tiffOrientation(b: Array[Byte], base: Int,
                              limit: Int): Integer = {
    if (base + 8 > limit) return null
    val le =
      if (b(base) == 'I' && b(base + 1) == 'I') true
      else if (b(base) == 'M' && b(base + 1) == 'M') false
      else return null
    if (u16(b, base + 2, le) != 42) return null
    val ifdOff = u32(b, base + 4, le)
    if (ifdOff < 0 || base + ifdOff + 2 > limit) return null
    val ifd = base + ifdOff.toInt
    val n = u16(b, ifd, le)
    if (n < 0) return null
    var e = 0
    while (e < n) {
      val entry = ifd + 2 + 12 * e
      if (entry + 12 > limit) return null
      if (u16(b, entry, le) == 0x0112) {
        // type 3 = SHORT (the spec's type for 0x0112); some writers
        // emit type 4 = LONG — both fit inline in the 4-byte value
        // field, SHORT in its first two bytes, LONG in all four
        val v = u16(b, entry + 2, le) match {
          case 3 => u16(b, entry + 8, le).toLong
          case 4 => u32(b, entry + 8, le)
          case _ => -1L
        }
        return if (v >= 1 && v <= 8) Integer.valueOf(v.toInt) else null
      }
      e += 1
    }
    null
  }
}

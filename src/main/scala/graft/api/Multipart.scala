package graft.api

import scala.collection.mutable.ArrayBuffer

/** One part of a multipart/form-data body (reference:
  * include/http/MultipartParser.hpp — name/filename from
  * Content-Disposition, raw bytes for binary safety).
  */
case class MultipartPart(
    name: String = "",
    filename: String = "",
    contentType: String = "",
    data: Array[Byte] = Array.empty) {
  def isFile: Boolean = filename.nonEmpty
  def dataAsString: String = new String(data, "UTF-8")
}

/** multipart/form-data parsing (reference: src/http/MultipartParser.cpp)
  * — Q4 (`countParts`) plus the full `parse` used by the upload routes.
  * Operates on the raw body BYTES: part payloads may be binary, so the
  * scan works on a byte view and only headers are decoded as text.
  * Semantics mirror the reference exactly: boundary from the
  * Content-Type parameter list (quotes stripped), parts delimited by
  * `\r\n--boundary`, terminal `--` ends the scan, headers parsed
  * case-insensitively, Content-Disposition name/filename unquoted.
  */
object Multipart {

  /** Boundary from a Content-Type header value (reference:
    * MultipartParser.cpp:137-175): scan the `;`-separated parameters
    * after the media type for `boundary=...`, strip surrounding quotes.
    * Empty string when absent.
    */
  def extractBoundary(contentType: String): String = {
    val semi = contentType.indexOf(';')
    if (semi < 0) return ""
    var params = contentType.substring(semi + 1)
    while (params.nonEmpty) {
      val next = params.indexOf(';')
      val token0 = if (next < 0) params else params.substring(0, next)
      params = if (next < 0) "" else params.substring(next + 1)
      val token = token0.trim
      if (token.nonEmpty) {
        val eq = token.indexOf('=')
        if (eq >= 0) {
          val key = token.substring(0, eq).trim.toLowerCase
          var value = token.substring(eq + 1).trim
          if (value.length >= 2 && value.head == '"' && value.last == '"')
            value = value.substring(1, value.length - 1)
          if (key == "boundary") return value
        }
      }
    }
    ""
  }

  /** Q4: count the parts of a multipart body without materializing them
    * (reference: MultipartParser.cpp:97-131) — the POST /test
    * diagnostic. Counts `\r\n--boundary` markers after the opening
    * boundary line, stopping at the terminal `--` marker.
    */
  def countParts(body: Array[Byte], boundary: String): Long = {
    if (boundary.isEmpty) return 0L
    val dash = ("--" + boundary).getBytes("ISO-8859-1")
    val first = indexOf(body, dash, 0)
    if (first < 0) return 0L
    var pos = first + dash.length
    if (startsWithAt(body, "--".getBytes, pos)) return 0L
    if (startsWithAt(body, CRLF, pos)) pos += 2
    val marker = (new String(CRLF, "ISO-8859-1") + "--" + boundary).getBytes("ISO-8859-1")
    var count = 0L
    var done = false
    while (!done) {
      val next = indexOf(body, marker, pos)
      if (next < 0) done = true
      else {
        count += 1
        pos = next + marker.length
        if (startsWithAt(body, "--".getBytes, pos)) done = true
        else if (startsWithAt(body, CRLF, pos)) pos += 2
      }
    }
    count
  }

  /** Parse a multipart body into parts (reference:
    * MultipartParser.cpp:177-249). Tolerates a first boundary either at
    * offset 0 or after a leading CRLF; stops at the `--boundary--`
    * terminator; malformed sections end the scan (never throw).
    */
  def parse(body: Array[Byte], boundary: String): Seq[MultipartPart] = {
    val parts = ArrayBuffer.empty[MultipartPart]
    if (boundary.isEmpty) return parts.toSeq
    val dash = ("--" + boundary).getBytes("ISO-8859-1")
    val crlfDash = (new String(CRLF, "ISO-8859-1") + "--" + boundary)
      .getBytes("ISO-8859-1")
    var bline =
      if (startsWithAt(body, dash, 0)) 0
      else {
        val m = indexOf(body, crlfDash, 0)
        if (m < 0) return parts.toSeq
        m + 2
      }
    var done = false
    while (!done) {
      val lineEnd = indexOf(body, CRLF, bline)
      if (lineEnd < 0) { done = true }
      else {
        val after = bline + dash.length
        if (startsWithAt(body, "--".getBytes, after)) { done = true }
        else {
          val headersStart = lineEnd + 2
          val headersEnd = indexOf(body, CRLFCRLF, headersStart)
          if (headersEnd < 0) { done = true }
          else {
            var name = ""; var filename = ""; var ctype = ""
            var hpos = headersStart
            var hdone = false
            while (!hdone && hpos < headersEnd) {
              val eol = indexOf(body, CRLF, hpos)
              if (eol < 0 || eol > headersEnd) hdone = true
              else {
                val hline = new String(body, hpos, eol - hpos, "UTF-8")
                hpos = eol + 2
                val colon = hline.indexOf(':')
                if (colon >= 0) {
                  val hname = hline.substring(0, colon).trim.toLowerCase
                  val hvalue = hline.substring(colon + 1).trim
                  if (hname == "content-disposition") {
                    val (n, f) = parseContentDisposition(hvalue)
                    name = n; filename = f
                  } else if (hname == "content-type") ctype = hvalue
                }
              }
            }
            val contentStart = headersEnd + 4
            val nextMarker = indexOf(body, crlfDash, contentStart)
            val contentEnd = if (nextMarker < 0) body.length else nextMarker
            parts += MultipartPart(name, filename, ctype,
              java.util.Arrays.copyOfRange(body, contentStart, contentEnd))
            if (nextMarker < 0) done = true else bline = nextMarker + 2
          }
        }
      }
    }
    parts.toSeq
  }

  /** name/filename from a Content-Disposition value (reference:
    * MultipartParser.cpp:23-56): `;`-separated `key=value` tokens,
    * keys lowercased, quotes stripped.
    */
  def parseContentDisposition(value: String): (String, String) = {
    var name = ""; var filename = ""
    var pos = 0
    while (pos < value.length) {
      val next = value.indexOf(';', pos)
      val token0 = if (next < 0) value.substring(pos) else value.substring(pos, next)
      pos = if (next < 0) value.length else next + 1
      val token = token0.trim
      if (token.nonEmpty) {
        val eq = token.indexOf('=')
        if (eq >= 0) {
          val key = token.substring(0, eq).trim.toLowerCase
          var v = token.substring(eq + 1).trim
          if (v.length >= 2 && v.head == '"' && v.last == '"')
            v = v.substring(1, v.length - 1)
          if (key == "name") name = v
          else if (key == "filename") filename = v
        }
      }
    }
    (name, filename)
  }

  private val CRLF = Array[Byte]('\r', '\n')
  private val CRLFCRLF = Array[Byte]('\r', '\n', '\r', '\n')

  private def startsWithAt(hay: Array[Byte], needle: Array[Byte], at: Int): Boolean = {
    if (at < 0 || at + needle.length > hay.length) return false
    var i = 0
    while (i < needle.length) {
      if (hay(at + i) != needle(i)) return false
      i += 1
    }
    true
  }

  private def indexOf(hay: Array[Byte], needle: Array[Byte], from: Int): Int = {
    if (needle.isEmpty) return from
    var i = math.max(from, 0)
    val limit = hay.length - needle.length
    while (i <= limit) {
      if (startsWithAt(hay, needle, i)) return i
      i += 1
    }
    -1
  }
}

package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import java.io.{ByteArrayInputStream}

/** Binary attachment storage (reference S5-S7,
  * src/server/FileStorage.cpp): blobs under a date-partitioned tree
  * `YYYY/MM/DD/` with unique names `{base}_{epochMillis}_{rand4}{ext}`
  * (FileStorage.cpp:96-143). Built on the Hadoop FileSystem API so the
  * same code addresses local disk, HDFS, or object stores; `clock` and
  * `rand` are injectable seams (the reference hard-codes wall clock +
  * RNG — non-determinism noted in SURVEY §7.4).
  */
class FileStore(rootUri: String,
                clock: () => Long = () => System.currentTimeMillis(),
                rand: () => Int = () => scala.util.Random.nextInt(10000))
    extends Serializable {

  @transient private lazy val fs: FileSystem =
    new Path(rootUri).getFileSystem(new Configuration())

  /** S5: write a blob under the date path; returns the relative stored
    * path (what goes into nodeFiles / storage_path).
    */
  def saveFile(originalName: String, content: Array[Byte]): String = {
    val millis = clock()
    val date = java.time.Instant.ofEpochMilli(millis)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val dir = f"${date.getYear}%04d/${date.getMonthValue}%02d/${date.getDayOfMonth}%02d"
    val (base, ext) = splitExt(originalName)
    val unique = f"${base}_${millis}_${rand() % 10000}%04d$ext"
    val rel = s"$dir/$unique"
    val out = fs.create(new Path(s"$rootUri/$rel"), true)
    try out.write(content) finally out.close()
    rel
  }

  /** S6: read a blob back. */
  def readFile(relPath: String): Array[Byte] = {
    val in = fs.open(new Path(s"$rootUri/$relPath"))
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  /** S7: delete a blob. */
  def deleteFile(relPath: String): Boolean =
    fs.delete(new Path(s"$rootUri/$relPath"), false)

  def exists(relPath: String): Boolean =
    fs.exists(new Path(s"$rootUri/$relPath"))

  private def splitExt(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i <= 0) (sanitize(name), "")
    else (sanitize(name.substring(0, i)), name.substring(i))
  }
  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9_-]", "_")
}

/** S9: PDF text extraction by shelling out to poppler's `pdftotext`,
  * exactly like the reference (src/embedding/TextExtractor.cpp:39-64:
  * `pdftotext -q <file> -`, stdout streamed with an early exit once
  * maxLength is exceeded, empty output → None). The binary is detected
  * at first use; on hosts without poppler-utils `available` is false
  * and extraction returns None, so callers keep their stub fallback.
  */
object PdfText {

  /** One PATH scan per JVM (the executor-side hot path must not fork
    * `which` per row).
    */
  lazy val available: Boolean =
    sys.env.getOrElse("PATH", "").split(java.io.File.pathSeparator)
      .exists(d => d.nonEmpty &&
        java.nio.file.Files.isExecutable(java.nio.file.Paths.get(d, "pdftotext")))

  /** Extract text from PDF bytes via a temp file + `pdftotext -q f -`.
    * None when the binary is missing, the run fails, or output is empty.
    */
  def extract(content: Array[Byte], maxLength: Int = 8000): Option[String] = {
    if (!available) return None
    val tmp = java.nio.file.Files.createTempFile("graft-pdf", ".pdf")
    try {
      java.nio.file.Files.write(tmp, content)
      val pb = new ProcessBuilder("pdftotext", "-q", tmp.toString, "-")
      pb.redirectErrorStream(false)
      val proc = pb.start()
      val out = new StringBuilder
      val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream,
          java.nio.charset.StandardCharsets.UTF_8))
      try {
        val buf = new Array[Char](4096)
        var n = reader.read(buf)
        // reference early-exit: stop reading once past maxLength
        while (n >= 0 && out.length <= maxLength) {
          out.appendAll(buf, 0, n)
          n = reader.read(buf)
        }
      } finally { reader.close(); proc.destroy() }
      if (out.isEmpty) None else Some(out.toString.take(maxLength))
    } catch {
      case _: java.io.IOException => None
    } finally {
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}

/** Text extraction dispatch (reference S8-S10,
  * src/embedding/TextExtractor.cpp): .txt/.md/.text read + truncate to
  * 8000 chars; PDFs shell out to `pdftotext` when the binary exists on
  * this host (PdfText), with `pdfFallback` (default: none) covering
  * hosts without poppler-utils — the pipeline shape stays real and
  * testable either way.
  */
class TextExtractor(store: FileStore,
                    pdfFallback: Array[Byte] => Option[String] = _ => None,
                    maxLength: Int = 8000) extends Serializable {

  private def pdfExtractor(content: Array[Byte]): Option[String] =
    PdfText.extract(content, maxLength).orElse(pdfFallback(content))

  def extractFromFile(relPath: String): Option[String] = {
    if (!store.exists(relPath)) return None // EmbeddingService.cpp:33 exists guard
    val lower = relPath.toLowerCase
    if (lower.endsWith(".pdf"))
      pdfExtractor(store.readFile(relPath)).map(_.take(maxLength))
    else if (lower.endsWith(".txt") || lower.endsWith(".md") || lower.endsWith(".text"))
      Some(new String(store.readFile(relPath),
        java.nio.charset.StandardCharsets.UTF_8).take(maxLength))
    else None
  }
}

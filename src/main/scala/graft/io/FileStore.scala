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

/** Text extraction dispatch (reference S8-S10,
  * src/embedding/TextExtractor.cpp): .txt/.md/.text read + truncate to
  * 8000 chars; PDFs would shell out to pdftotext (not present in the
  * runtime) — represented by a pluggable extractor so the pipeline
  * shape is real and testable.
  */
class TextExtractor(store: FileStore,
                    pdfExtractor: Array[Byte] => Option[String] = _ => None,
                    maxLength: Int = 8000) extends Serializable {

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

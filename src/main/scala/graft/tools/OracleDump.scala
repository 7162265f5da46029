package graft.tools

import java.nio.file.{Files, Paths}

/** Dev probe: dump SparkEntry.oracleSql as oracle_sql.json WITHOUT
  * running any Spark query — feeds tools/oracle_typecheck.py, which
  * flags oracle output columns whose DuckDB type (e.g. HUGEINT from an
  * uncast integer SUM) can canonicalize differently across DuckDB /
  * pyarrow versions on the driver's side of the correctness gate.
  */
object OracleDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/oracle_dump"
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote ${graft.SparkEntry.oracleSql.size} oracles to $outDir/oracle_sql.json")
  }
}

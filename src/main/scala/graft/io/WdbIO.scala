package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Node

/** In-memory engine state: the node table, the normalized attachment
  * table (the reference's `nodeFiles` map, reference:
  * include/core/GraphDB.hpp:68-71), and the global tag vocabulary.
  * `declaredSize` mirrors the trusted stored `size` counter
  * (reference: src/core/GraphDB.cpp:293).
  */
case class WhisperState(
    nodes: DataFrame,
    nodeFiles: DataFrame,
    tagBank: Seq[String],
    declaredSize: Long,
    // Reference id allocator state (GraphDB.cpp:485-491): a PROCESS
    // counter, not persisted — every load starts it back at 1, exactly
    // like the reference's `static int nextId = 1`.
    idCounter: Long = 1L)

/** Reader/writer for the reference's single-file `.wdb` JSON snapshot
  * format (reference: src/core/GraphDB.cpp:247-374) plus the
  * partitioned-Parquet *native* format used at scale.
  *
  * The read path uses Spark 4 VariantType so the reference's lenient
  * input coercions (course as int-or-numeric-string, tags as
  * array-or-comma-string, reference: src/core/GNode.cpp:61-115) are
  * applied distributedly with one pass — no driver-side JSON parsing.
  *
  * The `.wdb` write is driver-side by design: it is the compat snapshot
  * (one JSON document); the 100 TB path is `writeNative`/`readNative`
  * (partitioned parquet, predicate-pushdown-friendly).
  */
object WdbIO {

  /** Parse a `.wdb` file. Corrupt JSON or any node missing its required
    * title yields the empty bootstrap state (reference recreates the DB
    * on parse failure, GraphDB.cpp:294-300; Node ctor throws on missing
    * title, GNode.cpp:63).
    */
  def readWdb(spark: SparkSession, path: String): WhisperState =
    try {
      // multiLine: a .wdb is ONE (typically pretty-printed) JSON document
      val raw = spark.read
        .option("multiLine", "true")
        .option("singleVariantColumn", "v").json(path)
      raw.cache()
      val view = s"__wdb_raw_${System.nanoTime()}"
      raw.createOrReplaceTempView(view)

      val nodeRows = spark.sql(
        s"SELECT value AS nv FROM $view, LATERAL variant_explode(variant_get(v, '$$.nodes'))")
      val nodes = decodeNodes(nodeRows, "nv")

      if (nodes.filter(col("title").isNull).limit(1).count() > 0) {
        spark.catalog.dropTempView(view)
        empty(spark)
      } else {
        val files = spark.sql(
          s"""SELECT CAST(key AS LONG) AS node_id,
             |  try_variant_get(value, '$$', 'array<string>') AS paths
             |FROM $view, LATERAL variant_explode(variant_get(v, '$$.nodeFiles'))""".stripMargin)
          .select(col("node_id"), explode(coalesce(col("paths"), array())).as("path"))
        val meta = spark.sql(
          s"""SELECT coalesce(try_variant_get(v, '$$.size', 'long'), 0L) AS size,
             |  coalesce(try_variant_get(v, '$$.tagBank', 'array<string>'), array()) AS tagBank
             |FROM $view""".stripMargin).collect()
        spark.catalog.dropTempView(view)
        val (size, bank) =
          if (meta.isEmpty) (0L, Seq.empty[String])
          else (meta(0).getLong(0), meta(0).getSeq[String](1))
        WhisperState(nodes.filter(col("title").isNotNull), files, bank, size)
      }
    } catch {
      case _: Exception => empty(spark)
    }

  /** Decode a variant column of node objects into the fixed Node schema,
    * applying the reference's coercion rules as column expressions.
    */
  def decodeNodes(df: DataFrame, nv: String): DataFrame = {
    val courseStr = expr(s"try_variant_get($nv, '$$.course', 'string')")
    val tagsArr = expr(s"try_variant_get($nv, '$$.tags', 'array<string>')")
    val tagsStr = expr(s"try_variant_get($nv, '$$.tags', 'string')")
    df.select(
      // absent id → INT_MAX sentinel (reference: GNode.cpp:62)
      coalesce(expr(s"try_variant_get($nv, '$$.id', 'long')"),
        lit(Int.MaxValue.toLong)).as("id"),
      expr(s"try_variant_get($nv, '$$.title', 'string')").as("title"),
      // stoi semantics: leading integer prefix, failure → 0 (GNode.cpp:66-80)
      coalesce(regexp_extract(trim(courseStr), "^[+-]?[0-9]+", 0).cast("int"), lit(0))
        .as("course"),
      strField(nv, "subject"), strField(nv, "description"), strField(nv, "author"),
      strField(nv, "date"),
      // tags: array of strings, or comma-string split+trim (GNode.cpp:88-104)
      coalesce(
        tagsArr,
        filter(transform(split(tagsStr, ","), t => trim(t)), t => t =!= ""),
        array()).as("tags"),
      strField(nv, "storage_path"),
      coalesce(expr(s"try_variant_get($nv, '$$.LinkedNodes', 'array<long>')"),
        array().cast("array<long>")).as("linkedNodes"),
      // empty embedding ≡ no embedding (omitted on write, GNode.cpp:132-134)
      when(size(expr(s"try_variant_get($nv, '$$.embedding', 'array<float>')")) > 0,
        expr(s"try_variant_get($nv, '$$.embedding', 'array<float>')"))
        .as("embedding"))
  }

  private def strField(nv: String, name: String) =
    coalesce(expr(s"try_variant_get($nv, '$$.$name', 'string')"), lit(""))
      .as(name)

  /** Empty bootstrap state (reference: GraphDB.cpp:303-324). */
  def empty(spark: SparkSession): WhisperState = {
    import spark.implicits._
    val nodes = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Node.schema)
    WhisperState(nodes, Seq.empty[(Long, String)].toDF("node_id", "path"),
      Seq.empty, 0L)
  }

  /** Write the compat `.wdb` snapshot: one JSON document, nodes sorted
    * by id (reference: GraphDB.cpp:326-374). Driver-side single-file by
    * the format's nature; use `writeNative` at scale.
    */
  def writeWdb(state: WhisperState, path: String): Unit = {
    val nodes = state.nodes.orderBy("id").collect()
    val filesByNode: Map[Long, Seq[String]] = state.nodeFiles
      .groupBy("node_id").agg(sort_array(collect_list("path")).as("paths"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val sb = new StringBuilder
    sb.append("{\"size\": ").append(state.declaredSize).append(", \"nodes\": [")
    nodes.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) sb.append(", ")
      appendNodeJson(sb, r)
    }
    sb.append("], \"nodeFiles\": {")
    filesByNode.toSeq.sortBy(_._1).zipWithIndex.foreach { case ((id, paths), i) =>
      if (i > 0) sb.append(", ")
      sb.append(js(id.toString)).append(": ").append(jarr(paths.map(js)))
    }
    sb.append("}, \"tagBank\": ").append(jarr(state.tagBank.map(js))).append("}")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** S4: `serialize()` — the nodes-only JSON dump
    * (reference: GraphDB.cpp:232-245, `{"nodes":[...]}`; no size /
    * nodeFiles / tagBank in this envelope). Driver-side single string by
    * the format's nature.
    */
  def serializeNodes(state: WhisperState): String = {
    val sb = new StringBuilder("{\"nodes\": [")
    state.nodes.orderBy("id").collect().zipWithIndex.foreach { case (r, i) =>
      if (i > 0) sb.append(", ")
      appendNodeJson(sb, r)
    }
    sb.append("]}").toString
  }

  private def appendNodeJson(sb: StringBuilder, r: org.apache.spark.sql.Row): Unit = {
    sb.append("{\"id\": ").append(r.getLong(0))
      .append(", \"title\": ").append(js(r.getString(1)))
      .append(", \"course\": ").append(r.getInt(2))
      .append(", \"subject\": ").append(js(r.getString(3)))
      .append(", \"description\": ").append(js(r.getString(4)))
      .append(", \"author\": ").append(js(r.getString(5)))
      .append(", \"date\": ").append(js(r.getString(6)))
      .append(", \"tags\": ").append(jarr(r.getSeq[String](7).map(js)))
      .append(", \"storage_path\": ").append(js(r.getString(8)))
      .append(", \"LinkedNodes\": ").append(jarr(r.getSeq[Long](9).map(_.toString)))
    val emb = if (r.isNullAt(10)) null else r.getSeq[Float](10)
    if (emb != null && emb.nonEmpty)
      sb.append(", \"embedding\": ").append(jarr(emb.map(f => fmtFloat(f))))
    sb.append("}")
  }

  /** Native scale format: parquet per table, nodes PARTITIONED by
    * `course` — the reference's hot equality filter (Q2/Q3 accept
    * exactly subject/author/course/title/tag, and course is the one
    * low-cardinality key among them; GraphDB.cpp:119-122). A
    * `findNodes(course = …)` against this layout prunes whole
    * directories before any file is opened (`PartitionFilters` in the
    * scan, WdbIOSpec-pinned); the others stay row-group-stat pruning.
    */
  def writeNative(state: WhisperState, dir: String): Unit = {
    state.nodes.write.mode("overwrite")
      .partitionBy("course").parquet(s"$dir/nodes")
    state.nodeFiles.write.mode("overwrite").parquet(s"$dir/node_files")
    val spark = state.nodes.sparkSession
    import spark.implicits._
    state.tagBank.toDF("tag").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/tag_bank")
  }

  def readNative(spark: SparkSession, dir: String): WhisperState = {
    // partitionBy moved `course` into directory names; restore the
    // canonical column order (writeWdb's row formatter and any
    // positional consumer depend on Node.schema order)
    val nodes = spark.read.schema(Node.schema).parquet(s"$dir/nodes")
      .select(Node.schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    val files = spark.read.parquet(s"$dir/node_files")
    val bank = spark.read.parquet(s"$dir/tag_bank")
      .collect().map(_.getString(0)).toSeq
    WhisperState(nodes, files, bank, nodes.count())
  }

  // ---- minimal JSON writer helpers ----
  private def js(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append("\"").toString
  }
  private def jarr(xs: Seq[String]): String = xs.mkString("[", ", ", "]")
  private def fmtFloat(f: Float): String =
    if (f == f.toLong.toFloat) f.toLong.toString else f.toString
}

package graft.model

import org.apache.spark.sql.types._

/** The reference's single entity type (reference: include/core/GNode.hpp:49-60,
  * serialized shape src/core/GNode.cpp:118-137).
  *
  * `id` is widened to Long for 100 TB scale (the reference uses int);
  * `date` stays a string — the reference's "YYYY-MM-DD HH:MM:SS" format
  * sorts correctly lexicographically and the engine exploits that
  * (reference: src/core/GraphDB.cpp:75-76).
  * `embedding` is None until generated (omitted from JSON when empty,
  * reference: GNode.cpp:132-134).
  */
case class Node(
    id: Long,
    title: String,
    course: Int = 0,
    subject: String = "",
    description: String = "",
    author: String = "",
    date: String = "",
    tags: Seq[String] = Seq.empty,
    storage_path: String = "",
    linkedNodes: Seq[Long] = Seq.empty,
    embedding: Option[Seq[Float]] = None)

object Node {

  /** Explicit schema — never inferred (coercions need a permissive
    * pre-parse; see NodeCodec).
    */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("course", IntegerType, nullable = false),
    StructField("subject", StringType, nullable = false),
    StructField("description", StringType, nullable = false),
    StructField("author", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("tags", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("storage_path", StringType, nullable = false),
    StructField("linkedNodes", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** Sortable fields for Q1/Q2 (reference: GraphDB.cpp:60-80); unknown
    * keys fall back to id (GraphDB.cpp:77-79).
    */
  val sortableFields: Set[String] =
    Set("id", "title", "author", "subject", "course", "date")

  /** Filterable fields at the API (reference: src/main.cpp:72-77). */
  val filterableFields: Set[String] =
    Set("subject", "author", "course", "title", "tag")
}

/** Input-coercion rules (reference: GNode.cpp:5-115):
  *  - course: int, or numeric string via stoi (failure → 0), absent → 0
  *  - tags: array of strings, or a comma-separated string (split+trim)
  *  - title: required (constructor throws when absent)
  * POST-create validation is stricter (UploadHandler.cpp:83-155): see
  * graft.api.Validation — the asymmetry is intentional parity.
  */
object NodeCodec {

  /** stoi-style course coercion: leading int prefix parses, else None.
    * (C++ stoi parses a leading integer and ignores the rest;
    * full failure throws → reference maps it to 0 in the Node ctor and
    * to no-match in query filters, GraphDB.cpp:119-122.)
    */
  def coerceCourse(raw: String): Option[Int] = {
    val m = "^[+-]?\\d+".r.findFirstIn(raw.trim)
    m.flatMap(s => scala.util.Try(s.toInt).toOption)
  }

  /** Comma-string tag coercion (reference: GNode.cpp:88-104): split on
    * ',', trim whitespace, drop empties.
    */
  def coerceTags(raw: String): Seq[String] =
    raw.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
}

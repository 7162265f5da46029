package graft.api

import org.apache.spark.sql.DataFrame
import graft.{NodeFilters, NodePatch, WhisperDB}
import graft.enrich.{ClusteringReport, EnrichService, TaggingReport}
import graft.model.{Node, NodeCodec}
import graft.similarity.SimilarityOps
import graft.tags.TagOps

/** API-level result envelope (reference: {"status": ..., ...} with
  * error mapping in include/http/Request.hpp:42-74).
  */
sealed trait ApiResult[+A] { def status: String }
case class ApiOk[A](value: A) extends ApiResult[A] { val status = "success" }
case class ApiError(code: Int, message: String) extends ApiResult[Nothing] {
  val status = "error"
}

/** C10: metadata validation at the create entry point — stricter than
  * load/PUT coercion (reference: src/server/UploadHandler.cpp:83-155):
  * non-empty string title/author/subject; course int or numeric string;
  * tags must be an ARRAY of non-empty strings (the comma-string
  * coercion is NOT reachable from POST create — intentional asymmetry,
  * SURVEY §1.2).
  */
object Validation {
  def validateCreate(title: Option[String], author: Option[String],
                     subject: Option[String], course: Option[String],
                     tags: Option[Either[String, Seq[String]]]): Either[String, Unit] = {
    if (title.forall(_.isEmpty)) Left("Missing or empty required field: title")
    else if (author.forall(_.isEmpty)) Left("Missing or empty required field: author")
    else if (subject.forall(_.isEmpty)) Left("Missing or empty required field: subject")
    else if (course.exists(c => NodeCodec.coerceCourse(c).isEmpty))
      Left("Field 'course' must be an integer or numeric string")
    else tags match {
      case Some(Left(_)) =>
        Left("Field 'tags' must be an array of strings") // comma-string rejected at POST
      case Some(Right(ts)) if ts.exists(_.isEmpty) =>
        Left("Field 'tags' must contain non-empty strings")
      case _ => Right(())
    }
  }
}

/** The reference's REST surface as a typed Scala facade — one method per
  * route (reference: src/main.cpp, route table in SURVEY §2.7). Holds a
  * mutable current-snapshot reference (the functional WhisperDB
  * underneath); `checkpoint*` persists on demand.
  */
class WhisperApi(initial: WhisperDB,
                 enrich: EnrichService,
                 store: Option[graft.io.FileStore] = None) {

  @volatile private var current: WhisperDB = initial
  def db: WhisperDB = current

  /** Serializes read-modify-write transitions of `current`. The
    * reference server is strictly sequential (one request at a time);
    * ours runs handlers on a pool, so without this a concurrent
    * create/create interleaving double-allocates ids and an
    * update/delete pair loses one of the writes (check-then-act on the
    * snapshot var). Reads stay lock-free on the volatile snapshot —
    * only transitions queue, which is exactly the reference's
    * serialization point, minus blocking the readers.
    */
  private val transition = new Object
  private def mutate[A](f: WhisperDB => Either[ApiError, (WhisperDB, A)]): ApiResult[A] =
    transition.synchronized {
      f(current) match {
        case Left(err) => err
        case Right((db2, a)) => current = db2; ApiOk(a)
      }
    }

  /** GET /api/nodes (Q1/Q2 with filters + sort + pagination). */
  def listNodes(filters: NodeFilters = NodeFilters(), sort: String = "id",
                order: String = "asc", limit: Int = 0, offset: Int = 0): DataFrame =
    current.findNodes(filters, sort, order, limit, offset)

  /** GET /api/nodes/count (Q3). */
  def countNodes(filters: NodeFilters = NodeFilters()): Long =
    current.countNodes(filters)

  /** GET /api/nodes/:id (C1 + C8: node + files). Reads capture the
    * snapshot ONCE — a second `current` read racing a delete would
    * answer from two different states (node from one, files from
    * another), a response no single state ever had.
    */
  def getNode(id: Long): ApiResult[(DataFrame, DataFrame)] = {
    val db = current
    db.find(id) match {
      case Some(df) => ApiOk((df, db.getNodeFiles(id)))
      case None => ApiError(404, s"Node $id not found")
    }
  }

  /** POST /api/nodes (C9/C10: validate + default date + insert).
    * `now` is injectable for determinism (the reference stamps wall
    * clock, UploadHandler.cpp:44-49).
    */
  def createNode(n: Node, now: () => String = WhisperApi.defaultNow): ApiResult[Long] =
    Validation.validateCreate(
      Option(n.title).filter(_.nonEmpty), Option(n.author), Option(n.subject),
      Some(n.course.toString), Some(Right(n.tags))) match {
      case Left(msg) => ApiError(400, msg)
      case Right(_) =>
        val stamped = if (n.date.isEmpty) n.copy(date = now()) else n
        mutate(db => Right(db.addNode(stamped)))
    }

  /** PUT /api/nodes/:id (C4; id in the patch is ignored — stripped at
    * the reference API, main.cpp:275).
    */
  def updateNode(id: Long, patch: NodePatch): ApiResult[Long] =
    mutate { db =>
      if (!db.exists(id)) Left(ApiError(404, s"Node $id not found"))
      else Right((db.updateNode(id, patch), id))
    }

  /** DELETE /api/nodes/:id (C5); cascades blob deletes through the
    * configured FileStore (reference GraphDB.cpp:398-407).
    */
  def deleteNode(id: Long): ApiResult[Long] =
    mutate { db =>
      if (!db.exists(id)) Left(ApiError(404, s"Node $id not found"))
      else Right((store match {
        case Some(st) => db.deleteNode(id, st)
        case None => db.deleteNode(id)
      }, id))
    }

  /** GET /api/nodes/:id/files (C8). */
  def listFiles(id: Long): DataFrame = current.getNodeFiles(id)

  /** POST /api/nodes/:id/files (C6), path-only variant: records a
    * pre-stored path without writing a blob.
    */
  def attachFile(id: Long, path: String): ApiResult[String] =
    mutate { db =>
      if (!db.exists(id)) Left(ApiError(404, s"Node $id not found"))
      else Right((db.addFileToNode(id, path), path))
    }

  /** POST /api/nodes/:id/files (C6 + S5) with CONTENT — the reference's
    * multipart upload path (main.cpp routes → GraphDB.cpp:416-448):
    * saves the blob via FileStore, records the stored path, sets
    * storage_path on first attach. Returns the stored relative path.
    */
  def attachFile(id: Long, filename: String,
                 content: Array[Byte]): ApiResult[String] =
    store match {
      case None => ApiError(500, "No file store configured")
      case Some(st) =>
        mutate { db =>
          if (!db.exists(id)) Left(ApiError(404, s"Node $id not found"))
          else Right(db.addFileToNode(id, filename, content, st))
        }
    }

  /** DELETE /api/nodes/:id/files (C7 + S7): detaches and deletes the
    * blob when a store is configured (GraphDB.cpp:450-475).
    */
  def detachFile(id: Long, path: String): ApiResult[String] =
    mutate { db =>
      if (!db.exists(id)) Left(ApiError(404, s"Node $id not found"))
      else Right((store match {
        case Some(st) => db.removeFileFromNode(id, path, st)
        case None => db.removeFileFromNode(id, path)
      }, path))
    }

  /** GET /api/nodes/:id/similar?limit (V5, default k=10). Snapshot
    * captured once — see getNode.
    */
  def similarNodes(id: Long, limit: Int = 10): ApiResult[DataFrame] = {
    val db = current
    if (!db.exists(id)) ApiError(404, s"Node $id not found")
    else ApiOk(SimilarityOps.topKSimilar(
      db.nodes.filter(org.apache.spark.sql.functions.col("embedding").isNotNull),
      "id", "embedding", id, limit))
  }

  /** POST /api/nodes/:id/embedding (E5). */
  def generateEmbedding(id: Long): ApiResult[Long] =
    mutate { db =>
      if (!db.exists(id)) Left(ApiError(404, s"Node $id not found"))
      else {
        val (nodes2, _) = enrich.generateMissingEmbeddings(db.nodes)
        Right((db.withState(db.state.copy(nodes = nodes2)), id))
      }
    }

  /** POST /api/nodes/:id/tags (E7). */
  def generateTags(id: Long): ApiResult[TaggingReport] =
    mutate { db =>
      if (!db.exists(id)) Left(ApiError(404, s"Node $id not found"))
      else Right(enrich.generateTagsForNode(db, id))
    }

  /** POST /api/cluster?threshold (V7, default 0.75; threshold must be
    * in [0,1] like POST /api/tags/link-all, main.cpp:675-677).
    */
  def cluster(threshold: Double = 0.75): ApiResult[ClusteringReport] =
    if (threshold < 0 || threshold > 1) ApiError(400, "threshold must be in [0,1]")
    else mutate(db => Right(enrich.runClustering(db, threshold)))

  /** GET /api/tags (T1). */
  def getTags: Seq[String] = current.tagBank

  /** GET /api/tags/:tag/nodes (T3 + payload join). Snapshot captured
    * once — see getNode.
    */
  def nodesByTag(tag: String): DataFrame = {
    val nodes = current.nodes
    TagOps.findNodesByTag(nodes, tag).join(nodes, "id")
  }

  /** POST /api/tags/link-all?threshold (E9 batch). */
  def linkAllByTags(threshold: Double = 0.3): ApiResult[Long] =
    if (threshold < 0 || threshold > 1) ApiError(400, "threshold must be in [0,1]")
    else mutate(db => Right(enrich.updateAllTagBasedLinks(db, threshold)))

  /** GET /api/clusters (V8). */
  def clusters(): DataFrame = enrich.getClusters(current)

  /** GET /health. */
  def health: Long = current.size
}

object WhisperApi {
  def defaultNow(): String =
    java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
}

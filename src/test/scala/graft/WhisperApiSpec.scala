package graft

import org.apache.spark.sql.functions._
import graft.api.{ApiError, ApiOk, Validation, WhisperApi}
import graft.enrich.{EnrichService, MockEmbedder, MockTagger}
import graft.io.WhisperState
import graft.model.Node

/** End-to-end facade test replaying the reference's CRUD e2e script
  * (CURL_TESTS.md:390-445): create → get → update → verify → count →
  * delete → verify-404.
  */
class WhisperApiSpec extends SparkSpec {

  private def freshApi: WhisperApi = {
    import spark.implicits._
    val empty = WhisperDB.empty(spark)
    new WhisperApi(empty, new EnrichService(new MockEmbedder(8), new MockTagger))
  }

  test("CRUD round-trip with envelope semantics") {
    val api = freshApi
    val created = api.createNode(
      Node(id = Int.MaxValue, title = "Test Node", course = 101,
        subject = "CS", author = "Tester"),
      now = () => "2024-06-01 12:00:00")
    val id = created match {
      case ApiOk(v) => v
      case e => fail(s"create failed: $e")
    }
    assert(id == 1)
    api.getNode(id) match {
      case ApiOk((df, files)) =>
        val r = df.collect()(0)
        assert(r.getString(1) == "Test Node")
        assert(r.getString(6) == "2024-06-01 12:00:00", "date defaulted via injected clock")
        assert(files.count() == 0)
      case e => fail(s"get failed: $e")
    }
    assert(api.updateNode(id, NodePatch(title = Some("Renamed"))) == ApiOk(id))
    assert(api.countNodes() == 1)
    assert(api.deleteNode(id) == ApiOk(id))
    assert(api.getNode(id) == ApiError(404, s"Node $id not found"))
    assert(api.deleteNode(id) == ApiError(404, s"Node $id not found"))
    assert(api.health == 0)
  }

  test("C10 validation asymmetry: POST rejects what PUT accepts") {
    val api = freshApi
    // missing author -> 400 (UploadHandler.cpp:83-155)
    api.createNode(Node(id = Int.MaxValue, title = "T")) match {
      case ApiError(400, msg) => assert(msg.contains("author"))
      case other => fail(s"expected 400, got $other")
    }
    assert(Validation.validateCreate(Some("t"), Some("a"), Some("s"),
      Some("abc"), None).isLeft, "junk course rejected at POST")
    assert(Validation.validateCreate(Some("t"), Some("a"), Some("s"),
      Some("101"), Some(Left("a,b"))).isLeft,
      "comma-string tags rejected at POST (array required)")
    assert(Validation.validateCreate(Some("t"), Some("a"), Some("s"),
      Some("101"), Some(Right(Seq("a", "b")))).isRight)
  }

  test("threshold validation on cluster/link-all") {
    val api = freshApi
    assert(api.cluster(1.5).isInstanceOf[ApiError])
    assert(api.linkAllByTags(-0.1).isInstanceOf[ApiError])
  }

  test("file attach reflects in storage_path and file list") {
    val api = freshApi
    val ApiOk(id) = api.createNode(
      Node(id = Int.MaxValue, title = "F", subject = "s", author = "a"),
      now = () => "2024-01-01 00:00:00"): @unchecked
    assert(api.attachFile(id, "2024/01/01/f_1_0001.pdf") == ApiOk("2024/01/01/f_1_0001.pdf"))
    assert(api.listFiles(id).count() == 1)
    api.getNode(id) match {
      case ApiOk((df, _)) =>
        assert(df.collect()(0).getString(8) == "2024/01/01/f_1_0001.pdf")
      case e => fail(e.toString)
    }
  }
}

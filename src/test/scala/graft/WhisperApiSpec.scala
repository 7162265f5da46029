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
    // [4]-[5] update then VERIFY the update reads back (CURL_TESTS.md:415-423)
    assert(api.updateNode(id, NodePatch(title = Some("Updated Title"),
      description = Some("Added description"))) == ApiOk(id))
    api.getNode(id) match {
      case ApiOk((df, _)) =>
        val r = df.collect()(0)
        assert(r.getString(1) == "Updated Title")
        assert(r.getString(4) == "Added description")
      case e => fail(s"verify-update failed: $e")
    }
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

  test("S5-S7 file e2e (CURL_TESTS.md files script): content attach, blob " +
       "lifecycle, cascade delete") {
    val root = java.nio.file.Files.createTempDirectory("graft-files").toString
    // deterministic seams; 1717200000000 ms = 2024-06-01T00:00:00Z
    val store = new graft.io.FileStore(root,
      clock = () => 1717200000000L, rand = () => 42)
    val api = new WhisperApi(WhisperDB.empty(spark),
      new EnrichService(new MockEmbedder(8), new MockTagger), Some(store))
    val ApiOk(id) = api.createNode(
      Node(id = Int.MaxValue, title = "File Test", course = 1,
        subject = "Testing", author = "Bot"),
      now = () => "2024-06-01 00:00:00"): @unchecked

    val ApiOk(p1) = api.attachFile(id, "test_file.txt",
      "Test content".getBytes("UTF-8")): @unchecked
    assert(p1 == "2024/06/01/test_file_1717200000000_0042.txt",
      "date-partitioned unique stored name (FileStorage.cpp:96-143)")
    assert(store.exists(p1))
    assert(new String(store.readFile(p1), "UTF-8") == "Test content")
    api.getNode(id) match {
      case ApiOk((df, files)) =>
        assert(df.collect()(0).getString(8) == p1,
          "first attach sets storage_path to the STORED path (GraphDB.cpp:427-429)")
        assert(files.count() == 1)
      case e => fail(e.toString)
    }

    val ApiOk(p2) = api.attachFile(id, "test_file2.txt",
      "Additional content".getBytes("UTF-8")): @unchecked
    assert(p2 != p1 && store.exists(p2))
    assert(api.listFiles(id).count() == 2)

    // delete cascades blob removal (GraphDB.cpp:398-407)
    assert(api.deleteNode(id) == ApiOk(id))
    assert(!store.exists(p1) && !store.exists(p2), "blobs deleted from disk")
    assert(api.attachFile(99L, "x.txt", "y".getBytes) ==
      ApiError(404, "Node 99 not found"))
  }

  test("C7+S7 detach deletes the blob; last detach clears storage_path") {
    val root = java.nio.file.Files.createTempDirectory("graft-files2").toString
    var t = 0L
    val store = new graft.io.FileStore(root,
      clock = () => { t += 1; 1717200000000L + t }, rand = () => 7)
    val api = new WhisperApi(WhisperDB.empty(spark),
      new EnrichService(new MockEmbedder(8), new MockTagger), Some(store))
    val ApiOk(id) = api.createNode(
      Node(id = Int.MaxValue, title = "D", course = 1, subject = "s", author = "a"),
      now = () => "2024-06-01 00:00:00"): @unchecked
    val ApiOk(p1) = api.attachFile(id, "a.txt", "one".getBytes): @unchecked
    val ApiOk(p2) = api.attachFile(id, "b.txt", "two".getBytes): @unchecked

    assert(api.detachFile(id, p1) == ApiOk(p1))
    assert(!store.exists(p1), "detached blob removed (GraphDB.cpp:463)")
    assert(store.exists(p2), "other blob untouched")
    assert(api.listFiles(id).count() == 1)

    assert(api.detachFile(id, p2) == ApiOk(p2))
    api.getNode(id) match {
      case ApiOk((df, files)) =>
        assert(df.collect()(0).getString(8) == "",
          "last detach clears storage_path (GraphDB.cpp:468-471)")
        assert(files.count() == 0)
      case e => fail(e.toString)
    }
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

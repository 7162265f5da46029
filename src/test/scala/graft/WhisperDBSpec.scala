package graft

import graft.model.Node
import graft.io.WhisperState

class WhisperDBSpec extends SparkSpec {

  private def db: WhisperDB = {
    import spark.implicits._
    val nodes = Seq(
      Node(1, "Intro to Algorithms", 101, "CS", "", "Ivanov", "2024-01-15 10:00:00",
        Seq("alg", "basics"), "", Seq(2)),
      Node(2, "Linear Algebra", 102, "Math", "", "Petrov", "2024-02-01 09:00:00",
        Seq("matrix", "basics"), "", Seq(1)),
      Node(3, "Advanced Algorithms", 201, "CS", "", "Ivanov", "2024-03-01 08:00:00",
        Seq("alg", "graphs"), "", Seq()),
      Node(4, "Statistics", 102, "Math", "", "Sidorov", "2023-12-31 23:59:59",
        Seq(), "", Seq()))
    val df = nodes.toDS().toDF().select(Node.schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
    new WhisperDB(spark, WhisperState(df,
      Seq.empty[(Long, String)].toDF("node_id", "path"), Seq("alg"), 4))
  }

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).toSeq

  // ---- Q1 quirks ----
  test("Q1: sort by date asc and desc; any order != 'asc' means desc") {
    assert(ids(db.getAllNodes("date", "asc")) == Seq(4, 1, 2, 3))
    assert(ids(db.getAllNodes("date", "desc")) == Seq(3, 2, 1, 4))
    assert(ids(db.getAllNodes("date", "ASC")) == Seq(3, 2, 1, 4),
      "reference: any order string != 'asc' sorts descending (GraphDB.cpp:63)")
  }

  test("Q1: unknown sort key falls back to id; limit<=0 unlimited; offset slices") {
    assert(ids(db.getAllNodes("bogus", "asc")) == Seq(1, 2, 3, 4))
    assert(ids(db.getAllNodes("id", "asc", limit = 0)) == Seq(1, 2, 3, 4))
    assert(ids(db.getAllNodes("id", "asc", limit = -5)) == Seq(1, 2, 3, 4))
    assert(ids(db.getAllNodes("id", "asc", limit = 2, offset = 1)) == Seq(2, 3))
    assert(ids(db.getAllNodes("id", "asc", offset = 10)) == Seq())
  }

  // ---- Q2 semantics ----
  test("Q2: conjunctive filters; title contains; tag membership; course coercion") {
    assert(ids(db.findNodes(NodeFilters(subject = Some("CS")))) == Seq(1, 3))
    assert(ids(db.findNodes(NodeFilters(title = Some("Algebra")))) == Seq(2))
    assert(ids(db.findNodes(NodeFilters(tag = Some("basics")))) == Seq(1, 2))
    assert(ids(db.findNodes(NodeFilters(course = Some("102")))) == Seq(2, 4))
    assert(ids(db.findNodes(NodeFilters(course = Some("abc")))) == Seq(),
      "unparseable course filter matches nothing (GraphDB.cpp:119-122)")
    assert(ids(db.findNodes(NodeFilters(subject = Some("CS"), author = Some("Ivanov"),
      tag = Some("graphs")))) == Seq(3))
  }

  test("Q3: counts") {
    assert(db.countNodes() == 4)
    assert(db.countNodes(NodeFilters(subject = Some("Math"))) == 2)
  }

  // ---- CRUD ----
  test("C1-C3: point lookup, exists, insert with generated id") {
    assert(db.exists(3) && !db.exists(99))
    assert(db.find(99).isEmpty)
    val (db2, newId) = db.addNode(Node(id = Int.MaxValue, title = "New"))
    assert(newId == 5, "counter scans past ids 1-4 to the first free id")
    assert(db2.exists(5) && db2.size == 5)
  }

  test("C3: id counter is process-monotonic — freed max not recycled, " +
       "pre-counter gaps filled (GraphDB.cpp:485-491)") {
    // deleting the just-allocated max must NOT hand its id back out
    val (db2, id5) = db.addNode(Node(id = Int.MaxValue, title = "New"))
    val (db4, id6) = db2.deleteNode(id5)
      .addNode(Node(id = Int.MaxValue, title = "Newer"))
    assert(id5 == 5 && id6 == 6, "freed max id is not reallocated")
    // but a fresh process's counter starts at 1 and fills gaps below
    // the max, exactly like the reference's static counter after load
    val loaded = new WhisperDB(spark, graft.io.WdbIO.empty(spark))
      .addNode(Node(id = 2, title = "explicit"))._1
    assert(loaded.addNode(Node(id = Int.MaxValue, title = "gap"))._2 == 1L)
  }

  test("C4: partial update patches only provided fields") {
    val db2 = db.updateNode(2, NodePatch(title = Some("LinAlg II"),
      course = Some("abc"), tags = Some(Seq("x"))))
    val r = db2.nodes.filter(org.apache.spark.sql.functions.col("id") === 2).collect()(0)
    assert(r.getString(1) == "LinAlg II")
    assert(r.getInt(2) == 0, "junk course string coerces to 0 on PUT (GNode.cpp:17)")
    assert(r.getSeq[String](7) == Seq("x"))
    assert(r.getString(5) == "Petrov", "unpatched fields unchanged")
  }

  test("C5: delete cascades file rows") {
    val db2 = db.addFileToNode(1, "2024/01/01/a.pdf")
    assert(db2.getNodeFiles(1).count() == 1)
    val db3 = db2.deleteNode(1)
    assert(!db3.exists(1) && db3.getNodeFiles(1).count() == 0)
  }

  test("C6/C7: storage_path tracks first attachment and clears on last detach") {
    val db2 = db.addFileToNode(3, "f1.pdf").addFileToNode(3, "f2.pdf")
    def sp(d: WhisperDB) = d.nodes
      .filter(org.apache.spark.sql.functions.col("id") === 3)
      .select("storage_path").collect()(0).getString(0)
    assert(sp(db2) == "f1.pdf", "first file sets storage_path (GraphDB.cpp:424-427)")
    val db3 = db2.removeFileFromNode(3, "f1.pdf")
    assert(sp(db3) == "f1.pdf", "storage_path persists while files remain")
    val db4 = db3.removeFileFromNode(3, "f2.pdf")
    assert(sp(db4) == "", "cleared when last file removed (GraphDB.cpp:468-471)")
  }

  test("T2: tag bank dedup-append preserves order") {
    val db2 = db.addToTagBank(Seq("new1", "alg", "new2", "new1"))
    assert(db2.tagBank == Seq("alg", "new1", "new2"))
  }
}

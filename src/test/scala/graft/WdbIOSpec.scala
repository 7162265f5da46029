package graft

import java.nio.file.{Files, Paths}
import graft.io.WdbIO
import graft.model.{Node, NodeCodec}

class WdbIOSpec extends SparkSpec {

  private def tmp(content: String): String = {
    val f = Files.createTempFile("wdb", ".wdb")
    Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  private val fixture =
    """{"size": 3, "nodes": [
      |{"id": 1, "title": "Intro", "course": 101, "subject": "CS",
      | "description": "d", "author": "A", "date": "2024-01-15 10:30:00",
      | "tags": ["alg", "basics"], "storage_path": "", "LinkedNodes": [2],
      | "embedding": [0.1, 0.2]},
      |{"id": 2, "title": "Two", "course": "202", "tags": "a, b , c",
      | "LinkedNodes": []},
      |{"id": 5, "title": "Five"}],
      |"nodeFiles": {"1": ["2024/01/15/a.pdf", "2024/01/15/b.txt"]},
      |"tagBank": ["algorithms", "basics"]}""".stripMargin

  test("read: schema, coercions, defaults") {
    val st = WdbIO.readWdb(spark, tmp(fixture))
    assert(st.declaredSize == 3)
    assert(st.tagBank == Seq("algorithms", "basics"))
    val rows = st.nodes.orderBy("id").collect()
    assert(rows.length == 3)
    val n1 = rows(0)
    assert(n1.getLong(0) == 1 && n1.getString(1) == "Intro" && n1.getInt(2) == 101)
    assert(n1.getSeq[String](7) == Seq("alg", "basics"))
    assert(n1.getSeq[Float](10).map(_.toDouble).map(d => math.rint(d * 10) / 10) == Seq(0.1, 0.2))
    val n2 = rows(1)
    assert(n2.getInt(2) == 202, "numeric-string course coerces")
    assert(n2.getSeq[String](7) == Seq("a", "b", "c"), "comma-string tags split+trim")
    val n5 = rows(2)
    assert(n5.getInt(2) == 0 && n5.getString(3) == "" && n5.isNullAt(10),
      "defaults for absent fields; absent embedding is null")
    assert(st.nodeFiles.count() == 2)
  }

  test("read: corrupt JSON yields empty bootstrap state") {
    val st = WdbIO.readWdb(spark, tmp("{not json"))
    assert(st.nodes.isEmpty && st.tagBank.isEmpty && st.declaredSize == 0)
  }

  test("read: node missing required title fails the whole load") {
    val st = WdbIO.readWdb(spark, tmp("""{"size":1,"nodes":[{"id":9}],"nodeFiles":{},"tagBank":[]}"""))
    assert(st.nodes.isEmpty, "title is required (GNode.cpp:63) -> recreate empty")
  }

  test("write/read round-trip preserves everything") {
    val st = WdbIO.readWdb(spark, tmp(fixture))
    val out = Files.createTempFile("wdb_out", ".wdb").toString
    WdbIO.writeWdb(st, out)
    val st2 = WdbIO.readWdb(spark, out)
    assert(st2.declaredSize == 3 && st2.tagBank == st.tagBank)
    val a = st.nodes.orderBy("id").collect().map(_.toString).toSeq
    val b = st2.nodes.orderBy("id").collect().map(_.toString).toSeq
    assert(a == b)
    assert(st2.nodeFiles.orderBy("node_id", "path").collect().map(_.toString).toSeq ==
      st.nodeFiles.orderBy("node_id", "path").collect().map(_.toString).toSeq)
  }

  test("S4 serializeNodes: nodes-only JSON envelope, round-trips") {
    val st = WdbIO.readWdb(spark, tmp(fixture))
    val s = WdbIO.serializeNodes(st)
    assert(s.startsWith("{\"nodes\": [") && s.endsWith("]}"),
      "GraphDB.cpp:232-245 envelope: {\"nodes\":[...]} only")
    assert(!s.contains("\"size\"") && !s.contains("\"nodeFiles\"") &&
      !s.contains("\"tagBank\""))
    // the string parses back through the lenient reader: nodes identical
    val out = Files.createTempFile("wdb_ser", ".wdb").toString
    Files.write(Paths.get(out), s.getBytes("UTF-8"))
    val st2 = WdbIO.readWdb(spark, out)
    assert(st2.nodes.orderBy("id").collect().map(_.toString).toSeq ==
      st.nodes.orderBy("id").collect().map(_.toString).toSeq)
  }

  test("native parquet round-trip; course partition pruning") {
    val st = WdbIO.readWdb(spark, tmp(fixture))
    val dir = Files.createTempDirectory("wdb_native").toString
    WdbIO.writeNative(st, dir)
    val st2 = WdbIO.readNative(spark, dir)
    assert(st2.nodes.count() == 3 && st2.tagBank == st.tagBank)
    // full fidelity despite the partition layout: same rows, same
    // canonical column order
    assert(st2.nodes.schema.fieldNames.toSeq ==
      graft.model.Node.schema.fieldNames.toSeq)
    assert(st2.nodes.orderBy("id").collect().map(_.toString).toSeq ==
      st.nodes.orderBy("id").collect().map(_.toString).toSeq)
    // the reference's course equality filter prunes whole directories:
    // PartitionFilters (not just PushedFilters) carries the predicate
    val filtered = st2.nodes.filter(org.apache.spark.sql.functions.col("course") === 2)
    filtered.collect()
    val plan = filtered.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*course""".r.findFirstIn(plan).isDefined,
      s"course filter must reach PartitionFilters:\n$plan")
  }

  test("course stoi semantics") {
    assert(NodeCodec.coerceCourse("101") == Some(101))
    assert(NodeCodec.coerceCourse(" 42abc") == Some(42), "stoi parses leading int")
    assert(NodeCodec.coerceCourse("abc") == None)
    assert(NodeCodec.coerceCourse("-7") == Some(-7))
  }

  test("tag comma coercion") {
    assert(NodeCodec.coerceTags("a, b , c") == Seq("a", "b", "c"))
    assert(NodeCodec.coerceTags(" , ,") == Seq())
  }
}

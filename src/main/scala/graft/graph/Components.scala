package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.storage.StorageLevel

/** Connected components — the Spark-native replacement for the
  * reference's two hand-rolled traversals (recursive DFS over
  * similarity edges, src/embedding/Clustering.cpp:68-107, and BFS over
  * stored links, src/tagging/TagService.cpp:169-255). Both produce the
  * same equivalence classes; component label = min member id, which is
  * also what GraphX's Pregel CC converges to.
  *
  * Two implementations:
  *  - `connectedComponentsGraphX`: Pregel (the scale path — no driver
  *    state, no recursion-depth limits).
  *  - `connectedComponentsDF`: pure-DataFrame iterative min-label
  *    propagation with a convergence check — useful where GraphX's
  *    RDD round-trip is unwanted; rounds = graph diameter.
  *
  * Isolated vertices (no edges) form singleton components in both.
  */
object Components {

  /** vertices: single id column; edges: (id_a, id_b) undirected.
    * Returns (id, component) with component = min id reachable.
    */
  def connectedComponentsGraphX(vertices: DataFrame, edges: DataFrame): DataFrame = {
    val spark = vertices.sparkSession
    import spark.implicits._
    val vidName = vertices.columns.head
    val vRdd = vertices.select(col(vidName).cast("long")).rdd
      .map(r => (r.getLong(0), ()))
    val eRdd = edges.select(col(edges.columns.head).cast("long"),
        col(edges.columns(1)).cast("long")).rdd
      .map(r => Edge(r.getLong(0), r.getLong(1), ()))
    val graph = Graph(vRdd, eRdd, (),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    graph.connectedComponents().vertices
      .map { case (id, comp) => (id, comp) }
      .toDF("id", "component")
  }

  /** Iterative min-label propagation in pure DataFrames. Converges in
    * <= diameter rounds; each round is one shuffle (groupBy id). A
    * `localCheckpoint` every round truncates the growing lineage.
    */
  def connectedComponentsDF(vertices: DataFrame, edges: DataFrame,
                            maxIter: Int = 50): DataFrame = {
    val vidName = vertices.columns.head
    val sym = edges.select(col(edges.columns.head).cast("long").as("src"),
        col(edges.columns(1)).cast("long").as("dst"))
      .unionAll(edges.select(col(edges.columns(1)).cast("long").as("src"),
        col(edges.columns.head).cast("long").as("dst")))
      .distinct().cache()
    var labels = vertices.select(col(vidName).cast("long").as("id"))
      .withColumn("component", col("id")).localCheckpoint()
    // labels only ever decrease, so sum(component) is strictly monotone
    // while anything changes — convergence check is one cheap aggregate,
    // not a join
    def labelSum(df: DataFrame): Long =
      df.agg(sum(col("component"))).collect()(0).getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(col("src").as("id2")).agg(min(col("component")).as("nbr_comp"))
      labels = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_comp"), col("component")))
            .as("component"))
        .localCheckpoint()
      val s = labelSum(labels)
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    labels
  }

  /** V8-style cluster summary (reference: TagService.cpp:169-255):
    * group members per component, compute sharedTags (tags held by >= 2
    * members; singleton clusters keep all their tags), sort clusters by
    * size desc and reassign ids 1..n (size desc, then min-member-id asc
    * for determinism).
    */
  def clusterSummary(nodesWithTags: DataFrame, components: DataFrame): DataFrame = {
    val joined = nodesWithTags.select(col("id"), col("tags"))
      .join(components, "id")
    val sizes = joined.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"),
        sort_array(collect_list(col("id"))).as("member_ids"))
    val tagCounts = joined
      .select(col("component"), explode(col("tags")).as("tag"), col("id"))
      .groupBy("component", "tag")
      .agg(countDistinct(col("id")).as("n_members"))
    val shared = tagCounts.join(sizes.select("component", "cluster_size"), "component")
      .filter(col("n_members") >= 2 || col("cluster_size") === 1)
      .groupBy("component")
      .agg(sort_array(collect_set(col("tag"))).as("shared_tags"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cluster_size").desc, col("component").asc)
    sizes.join(shared, Seq("component"), "left")
      .withColumn("shared_tags", coalesce(col("shared_tags"), array()))
      .withColumn("cluster_id", row_number().over(w))
      .select("cluster_id", "cluster_size", "member_ids", "shared_tags")
  }
}

package graft.analytics

import graft.ingest.Refresh.GraphStore
import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph, VertexId}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bulk graph analytics over the property-graph store via GraphX
  * (SURVEY §2.11 / BASELINE.json "GraphX for analytics, not OLTP
  * traversal"). The store's deterministic 64-bit node ids ARE the GraphX
  * VertexIds — the bridge is two cheap projections, no re-keying shuffle.
  *
  * Scale notes: GraphX materializes the graph as RDDs outside Tungsten —
  * build it once per analytics session, cache with MEMORY_AND_DISK, and
  * checkpoint iterative results (PageRank) on long chains. Edge partitioning
  * uses EdgePartition2D to bound replication at √P.
  */
object GraphAnalytics {

  def toGraphX(store: GraphStore): GxGraph[String, String] = {
    val vertices: RDD[(VertexId, String)] = store.nodes
      .select(col("id"), col("label")).rdd
      .map(r => (r.getLong(0), r.getString(1)))
    val edges: RDD[GxEdge[String]] = store.edges
      .select(col("src"), col("dst"), col("relType")).rdd
      .map(r => GxEdge(r.getLong(0), r.getLong(1), r.getString(2)))
    GxGraph(vertices, edges, defaultVertexAttr = "",
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
  }

  private def toDF(spark: SparkSession, rdd: RDD[(VertexId, Long)],
      valueName: String): DataFrame = {
    import spark.implicits._
    rdd.toDF("id", valueName)
  }

  /** Per-node degree (undirected). */
  def degrees(spark: SparkSession, g: GxGraph[String, String]): DataFrame =
    toDF(spark, g.degrees.map { case (v, d) => (v, d.toLong) }, "degree")

  /** Connected components (component = min vertex id in component). */
  def connectedComponents(spark: SparkSession, g: GxGraph[String, String]): DataFrame =
    toDF(spark, g.connectedComponents().vertices, "component")

  def pageRank(spark: SparkSession, g: GxGraph[String, String],
      iters: Int = 10): DataFrame = {
    import spark.implicits._
    g.staticPageRank(iters).vertices.toDF("id", "rank")
  }

  /** PageRank over a STRING-keyed edge frame — the host-authority form
    * the crawl loop needs ([[graft.llmops.TextAnalysis.extractLinks]]'
    * (src_host, dst_host) pairs feed straight in): vertex ids derive
    * from [[graft.llmops.PortableHash.hash52]] of the key (oracle-
    * replayable, collision odds ~|V|²/2⁵³ — at 10⁸ hosts expect ~1
    * collision, which silently MERGES two hosts' in-links: negligible
    * for crawl prioritization, but do NOT reuse this function where key
    * identity must be exact — use a rank-assigned id there), parallel
    * links COLLAPSE to one edge before the run — authority follows WHO
    * links, not how often, else one page farms rank with repeated
    * anchors. Returns (key, rank) with GraphX `staticPageRank`
    * semantics (resetProb 0.15, ranks normalized to sum |V|).
    *
    * Scale: two projections + one distinct build the graph once; the
    * iteration is GraphX's own (EdgePartition2D-bounded replication).
    */
  def pageRankKeys(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 10): DataFrame = {
    import graft.llmops.PortableHash
    val spark = edges.sparkSession
    val verts = edges.select(col(srcCol).as("key"))
      .unionAll(edges.select(col(dstCol).as("key")))
      .where(col("key").isNotNull).distinct()
      .withColumn("vid", PortableHash.hash52(col("key")))
    val vRdd: RDD[(VertexId, String)] =
      verts.select("vid", "key").rdd.map(r => (r.getLong(0), r.getString(1)))
    val eRdd: RDD[GxEdge[String]] = edges
      .select(PortableHash.hash52(col(srcCol)).as("s"),
        PortableHash.hash52(col(dstCol)).as("d"))
      .where(col("s").isNotNull && col("d").isNotNull).distinct()
      .rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), ""))
    val g = GxGraph(vRdd, eRdd, defaultVertexAttr = "",
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
    import spark.implicits._
    g.staticPageRank(iters).vertices.toDF("vid", "rank")
      .join(verts, Seq("vid"))
      .select(col("key"), col("rank"))
  }

  /** Per-vertex triangle count. GraphX's implementation requires canonical
    * edge orientation (srcId < dstId) and deduped edges — enforced here.
    */
  def triangleCount(spark: SparkSession, g: GxGraph[String, String]): DataFrame = {
    val canonical = GxGraph(
      g.vertices,
      g.edges.map(e =>
        if (e.srcId < e.dstId) e else GxEdge(e.dstId, e.srcId, e.attr))
        .distinct())
      .partitionBy(org.apache.spark.graphx.PartitionStrategy.EdgePartition2D)
    toDF(spark, canonical.triangleCount().vertices.map { case (v, t) => (v, t.toLong) },
      "triangles")
  }

  /** Shortest hop distances from every vertex to each landmark, undirected
    * (edges symmetrized before the Pregel run — GraphX's ShortestPaths
    * follows edge direction). Returns (id, landmark, dist); unreachable
    * vertices emit no row for that landmark. Pregel message volume is
    * |frontier|·|landmarks| per superstep and the run converges in
    * diameter supersteps — the standard landmark-BFS scale shape.
    */
  def shortestPaths(spark: SparkSession, g: GxGraph[String, String],
      landmarks: Seq[VertexId]): DataFrame = {
    import spark.implicits._
    val sym = GxGraph(
      g.vertices,
      g.edges.flatMap(e =>
        Iterator(GxEdge(e.srcId, e.dstId, e.attr), GxEdge(e.dstId, e.srcId, e.attr)))
        .distinct(),
      defaultVertexAttr = "",
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    org.apache.spark.graphx.lib.ShortestPaths.run(sym, landmarks).vertices
      .flatMap { case (v, spMap) => spMap.map { case (lm, d) => (v, lm, d.toLong) } }
      .toDF("id", "landmark", "dist")
  }

  /** Single-source-set BFS with the sources supplied as a DataFrame of
    * vertex ids — no driver-side scalar pull: the source set joins into
    * the vertex initialization as an RDD, so a landmark derived from the
    * data ("the lowest-keyed supplier with an edge") stays distributed
    * end-to-end. Undirected like [[shortestPaths]]; returns (id, dist),
    * unreachable vertices emit no row. Pregel min-distance, converging in
    * diameter supersteps.
    */
  def shortestPathsFrom(spark: SparkSession, g: GxGraph[String, String],
      sources: DataFrame): DataFrame = {
    import org.apache.spark.graphx.EdgeDirection
    import spark.implicits._
    val srcRdd: RDD[(VertexId, Long)] = sources
      .select(col(sources.columns.head).cast("long")).as[Long].rdd.map(id => (id, 0L))
    val sym = GxGraph(
      g.vertices,
      g.edges.flatMap(e =>
        Iterator(GxEdge(e.srcId, e.dstId, e.attr), GxEdge(e.dstId, e.srcId, e.attr)))
        .distinct(),
      defaultVertexAttr = "",
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    val init = sym.outerJoinVertices(srcRdd)((_, _, s) =>
      s.fold(Long.MaxValue)(identity))
    val res = init.pregel(Long.MaxValue, activeDirection = EdgeDirection.Out)(
      (_, d, msg) => math.min(d, msg),
      t => if (t.srcAttr != Long.MaxValue && t.srcAttr + 1 < t.dstAttr)
        Iterator((t.dstId, t.srcAttr + 1)) else Iterator.empty,
      math.min)
    res.vertices.filter(_._2 != Long.MaxValue).toDF("id", "dist")
  }

  /** Degree distribution summary — the quick health check on any graph. */
  def degreeStats(spark: SparkSession, g: GxGraph[String, String]): DataFrame =
    degrees(spark, g).agg(
      min("degree").as("min_degree"), max("degree").as("max_degree"),
      avg("degree").as("avg_degree"), count(lit(1)).as("n_vertices"))

  /** Blast radius: all nodes within `maxHops` of `startIds` along the given
    * relationship types, ignoring direction — e.g. "which VMs transitively
    * depend on datastore X" via CONNECTED_DATASTORE/ON_DATASTORE/
    * VDISK_FOR_VM. Iterative frontier expansion with DataFrame joins (each
    * hop is one shuffle against the filtered edge set — no full-graph
    * materialization, hop count bounded).
    */
  def blastRadius(store: GraphStore, startIds: DataFrame,
      relTypes: Set[String], maxHops: Int = 4): DataFrame = {
    val rel = store.edges.filter(col("relType").isInCollection(relTypes))
    // Iterative joins: truncate lineage every hop (localCheckpoint) or the
    // logical plan doubles per iteration and canonicalization blows the
    // driver heap long before the data does.
    val und = rel.select(col("src").as("a"), col("dst").as("b"))
      .unionAll(rel.select(col("dst").as("a"), col("src").as("b")))
      .distinct().localCheckpoint(true)
    var frontier = startIds.select(col("id")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint(true)
    var reached = frontier
    var hop = 0
    var grew = true
    while (hop < maxHops && grew) {
      hop += 1
      // The frontier-growth count rides the hop's checkpoint as an
      // observed metric, and `reached` stays a plain union of the hops'
      // checkpointed leaves (r16) — previously each hop paid two extra
      // actions (a count and a re-checkpoint of the whole reached set).
      val obs = org.apache.spark.sql.Observation()
      val next = frontier.join(und, frontier("id") === und("a"))
        .select(col("b").as("id")).distinct()
        .join(reached.select("id"), Seq("id"), "left_anti")
        .withColumn("hops", lit(hop))
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      grew = obs.get("n").asInstanceOf[Long] > 0L
      reached = reached.unionByName(next)
      frontier = next
    }
    reached.join(store.nodes, Seq("id"))
      .select(col("id"), col("label"), col("key"), col("hops"))
  }

  /** Community detection by DETERMINISTIC synchronous label propagation
    * (Raghavan et al. 2007, made reproducible): every vertex starts as
    * its own label; each round, every vertex adopts its neighbors' most
    * frequent label with ties broken to the SMALLEST label — the two
    * places stock LPA is nondeterministic (random vertex order, random
    * tie pick) both pinned, so `iters` rounds produce one well-defined
    * answer any engine can replay (GraphX's own LPA keeps hash-map tie
    * order — not oracle-checkable).
    *
    * DataFrame-native rather than Pregel: per round ONE edge⋈labels
    * equi-join plus a map-side-combining (vertex, label) count and a
    * `min_by` argmax — two shuffles bounded by |E| and |V|·distinct-
    * neighbor-labels; the labels table localCheckpoints between rounds
    * (the [[blastRadius]] lineage discipline). Synchronous LPA can
    * 2-cycle on bipartite structure — callers pick `iters` (and see the
    * spec's oscillation pin); labels after round t are the full state,
    * so convergence checks are a one-line diff of successive rounds.
    *
    * `edges` are undirected pairs (symmetrized + deduped here);
    * vertices = edge endpoints (isolated vertices have no neighbors to
    * vote — add them downstream as their own singleton communities).
    * Returns (v, community).
    */
  /** k-core decomposition by iterative peeling: repeatedly delete every
    * vertex whose CURRENT degree (within the surviving subgraph) is
    * below `k` until none remains — the classic graph-quality trim
    * (spam/bot rings and weakly-attached tendrils peel away; what
    * survives is the densely-knit core). Returns the surviving vertices
    * with their in-core degree; an empty frame when no k-core exists.
    *
    * Runs to the FIXPOINT (a round that deletes nothing), bounded by
    * `maxRounds` — non-convergence within the bound throws loudly (the
    * [[graft.llmops.Dedup.resolveClusters]] discipline) rather than
    * returning a half-peeled graph. Convergence is ≤ |V| rounds in
    * theory, a handful in practice (each round is one degree aggregation
    * + one semi-join over the shrinking edge set, checkpointed — the
    * per-round cost DROPS as the graph peels). Because the fixpoint is
    * stable, an oracle may replay MORE rounds than the engine needed:
    * extra rounds are no-ops — which is what lets a fixed-unroll SQL
    * replay hash-match a data-dependent iteration count.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 30): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    val obs0 = org.apache.spark.sql.Observation()
    var und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionAll(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct().observe(obs0, count(lit(1)).as("n")).localCheckpoint(true)
    // Edge counts ride the checkpoints as observed metrics and the
    // previous round's count carries over (r16) — the stability check
    // previously re-counted BOTH frames every round (two extra actions).
    var nEdges = obs0.get("n").asInstanceOf[Long]
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      round += 1
      val keep = und.groupBy("u").agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k).select("u").localCheckpoint(true)
      val obs = org.apache.spark.sql.Observation()
      val pruned = und
        .join(keep, Seq("u"), "left_semi")
        .join(keep.select(col("u").as("v")), Seq("v"), "left_semi")
        .observe(obs, count(lit(1)).as("n"))
        .localCheckpoint(true)
      val nPruned = obs.get("n").asInstanceOf[Long]
      stable = nPruned == nEdges
      nEdges = nPruned
      und = pruned
    }
    require(stable, s"k-core did not converge within $maxRounds rounds")
    und.groupBy(col("u").as("v")).agg(count(lit(1)).as("core_degree"))
  }

  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 0)
    val und = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionAll(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct().localCheckpoint(true)
    val verts = und.select(col("u").as("vtx")).distinct()
    var labels = verts.select(col("vtx"), col("vtx").as("lbl"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val counts = und
        .join(labels.select(col("vtx").as("v"), col("lbl")), Seq("v"))
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("cnt"))
      val next = counts.groupBy(col("u"))
        .agg(min_by(col("lbl"), struct(-col("cnt"), col("lbl"))).as("newLbl"))
      labels = verts.join(next, verts("vtx") === next("u"), "left")
        .select(col("vtx"), coalesce(col("newLbl"), col("vtx")).as("lbl"))
        .localCheckpoint(true)
    }
    labels.select(col("vtx").as("v"), col("lbl").as("community"))
  }
}

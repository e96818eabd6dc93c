package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step
  * that turns near-duplicate *pairs* (MinHash/Jaccard/embedding dedup)
  * into duplicate *clusters* with one canonical representative each.
  *
  * Each round every node adopts the minimum component label among
  * itself, its neighbors AND its current label's label (pointer
  * jumping), so convergence takes O(log diameter) rounds, with an
  * early stop when no label changes. All work is shuffle joins and
  * aggregations on (node, label) pairs; nothing is collected.
  *
  * Scale note: for graphs with large diameters, use
  * [[componentsStar]] — the alternating large-star/small-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond"), which converges in O(log n) rounds instead of
  * O(diameter).
  */
object ConnectedComponents {

  /** Below this many (distinct, symmetric) edges the whole graph is
    * solved in one pass by a per-partition union-find over a
    * 1-partition frame — the iterative rounds each cost a fixed number
    * of Spark jobs, which dominates wall-clock when the near-dup graph
    * is small. The decision uses the runtime edge count (the same
    * stats-based adaptivity AQE applies to joins); at scale the count
    * exceeds the threshold and the distributed rounds run. */
  val LocalSolveMaxEdges = 2000000L

  /** @param edges undirected edge list
    * @return (node, comp) — comp is the minimum node id in the
    *         component; only nodes appearing in `edges` are labeled */
  def components(edges: DataFrame, src: String, dst: String,
                 maxIter: Int = 20,
                 localSolveMaxEdges: Long = LocalSolveMaxEdges): DataFrame = {
    // ids are cast to long once up front so both the local and the
    // distributed path return the same (bigint node, bigint comp)
    // schema regardless of which one the runtime edge count selects
    val sym = edges.select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .unionByName(edges.select(col(dst).cast("long").as("a"), col(src).cast("long").as("b")))
      .distinct()
      .persist()
    if (sym.count() <= localSolveMaxEdges) {
      val out = componentsLocal(sym)
      sym.unpersist()
      return out
    }
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("comp", col("node"))
    // Convergence test: labels are non-increasing round over round
    // (min of self + neighbors), so the label sum strictly decreases
    // until the fixpoint — one cheap aggregate per round replaces a
    // join + count against the previous labels. Decimal sum rules out
    // long overflow producing a false fixpoint.
    def labelSum(df: DataFrame): String =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().get(0).toString
    var lastSum = labelSum(labels)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbr = sym.join(labels, sym("b") === labels("node"))
        .select(col("a").as("node"), col("comp"))
      // pointer jumping: each node also adopts its label's label, so a
      // depth-d chain of labels halves every round — convergence in
      // O(log diameter) rounds, not O(diameter) (without it, a chain
      // longer than maxIter silently returned unconverged labels)
      val hop = labels.as("l").join(labels.as("r"), col("l.comp") === col("r.node"))
        .select(col("l.node").as("node"), col("r.comp").as("comp"))
      // localCheckpoint truncates the lineage each round — without it
      // the logical plan doubles per iteration and planning time blows
      // up exponentially on long chains
      val upd = labels.unionByName(nbr).unionByName(hop)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      val s = labelSum(upd)
      done = s == lastSum
      lastSum = s
      labels = upd
      iter += 1
    }
    sym.unpersist()
    labels
  }

  /** One-pass union-find over a single partition: the small-graph path
    * of [[components]]. Stays inside the Dataset API (repartition(1) +
    * mapPartitions — no driver collect); the caller guarantees the edge
    * set fits one task comfortably. */
  private def componentsLocal(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    sym.select(col("a"), col("b")).as[(Long, Long)]
      .repartition(1)
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        def find(x: Long): Long = {
          var r = x
          while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
          var c = x // path compression
          while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
          if (!parent.contains(r)) parent(r) = r
          r
        }
        it.foreach { case (a, b) =>
          val ra = find(a); val rb = find(b)
          if (ra != rb) { // union by min label, matching the iterative path
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        parent.keysIterator.map(n => (n, find(n))).toSeq.iterator
      }
      .toDF("node", "comp")
  }

  /** Connected components by alternating large-star/small-star edge
    * contraction — O(log n) rounds on any topology, so the scale path
    * for long-chain / high-diameter graphs where min-label propagation
    * needs O(diameter) rounds.
    *
    * Edges are kept as (child, parent) pointers with parent < child.
    * Each round: **large-star** re-points every strictly-larger
    * neighbor of a node to the minimum of its closed neighborhood;
    * **small-star** re-points a node and its smaller neighbors to
    * their minimum. The edge set converges to depth-1 stars (child →
    * component minimum); convergence is detected when no parent still
    * appears as a child. All work is groupBys and joins on the edge
    * frame; nothing is collected.
    *
    * Same contract as [[components]]: (node, comp) for every node
    * appearing in `edges`, comp = component minimum. */
  def componentsStar(edges: DataFrame, src: String, dst: String,
                     maxIter: Int = 30): DataFrame = {
    // same up-front long cast as [[components]]: one output schema
    // independent of the input id type
    val nodes = edges.select(col(src).cast("long").as("n"))
      .unionByName(edges.select(col(dst).cast("long").as("n")))
      .distinct().persist()
    var e = edges
      .select(col(src).cast("long").as("a"), col(dst).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("child"),
        least(col("a"), col("b")).as("parent"))
      .distinct()
      .localCheckpoint(true)
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // large-star over the symmetric view
      val sym = e.select(col("child").as("u"), col("parent").as("v"))
        .unionByName(e.select(col("parent").as("u"), col("child").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("child"), col("m").as("parent"))
        .filter(col("child") =!= col("parent"))
        .distinct()
      // small-star on the (child, parent) orientation
      val smins = ls.groupBy(col("child")).agg(min(col("parent")).as("m"))
      val ss = ls.join(smins, "child")
        .select(explode(array(
          struct(col("child").as("c"), col("m").as("p")),
          struct(col("parent").as("c"), col("m").as("p")))).as("e"))
        .select(col("e.c").as("child"), col("e.p").as("parent"))
        .filter(col("child") =!= col("parent"))
        .distinct()
        .localCheckpoint(true) // truncate lineage each round
      // stars everywhere <=> no parent is still somebody's child
      done = ss.select(col("parent")).distinct()
        .join(ss.select(col("child")), col("parent") === col("child"), "left_semi")
        .isEmpty
      e = ss
      iter += 1
    }
    val out = nodes
      .join(e, nodes("n") === e("child"), "left_outer")
      .select(col("n").as("node"), coalesce(col("parent"), col("n")).as("comp"))
    nodes.unpersist()
    out
  }
}

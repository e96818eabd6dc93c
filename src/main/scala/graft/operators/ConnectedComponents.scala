package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step
  * that turns near-duplicate *pairs* (MinHash/Jaccard/embedding dedup)
  * into duplicate *clusters* with one canonical representative each.
  *
  * Each round every node adopts the minimum component label among
  * itself and its neighbors; convergence takes at most the graph
  * diameter rounds (near-dup clusters are shallow — a handful), with an
  * early stop when no label changes. All work is shuffle joins and
  * aggregations on (node, label) pairs; nothing is collected.
  *
  * Scale note: for graphs with large diameters, switch to the
  * alternating large-star/small-star algorithm (O(log n) rounds); the
  * per-round dataflow below is the same shape.
  */
object ConnectedComponents {

  /** @param edges undirected edge list
    * @return (node, comp) — comp is the minimum node id in the
    *         component; only nodes appearing in `edges` are labeled */
  def components(edges: DataFrame, src: String, dst: String,
                 maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(src).as("a"), col(dst).as("b"))
      .unionByName(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .persist()
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
      // localCheckpoint truncates the lineage each round — without it
      // the logical plan doubles per iteration and planning time blows
      // up exponentially on long chains
      val upd = labels.unionByName(nbr)
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
}

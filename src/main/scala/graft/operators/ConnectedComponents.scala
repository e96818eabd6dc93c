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
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val nbr = sym.join(labels, sym("b") === labels("node"))
        .select(col("a").as("node"), col("comp"))
      // localCheckpoint truncates the lineage each round — without it
      // the logical plan doubles per iteration and planning time blows
      // up exponentially on long chains
      val upd = labels.unionByName(nbr)
        .groupBy(col("node")).agg(min(col("comp")).as("comp2"))
        .localCheckpoint(true)
      changed = labels.join(upd, "node")
        .filter(col("comp") =!= col("comp2")).count()
      labels = upd.withColumnRenamed("comp2", "comp")
      iter += 1
    }
    sym.unpersist()
    labels
  }
}

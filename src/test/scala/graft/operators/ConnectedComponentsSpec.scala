package graft.operators

import graft.SparkSpec
import scala.util.Random

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** brute-force union-find for the expected labeling */
  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("label propagation matches union-find on random graphs, including chains") {
    val rnd = new Random(13)
    val edges = (0 until 150).map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2) ++
      // a 100-node chain: pointer jumping must converge it within the
      // default maxIter (20) — plain neighbor propagation would need
      // ~100 rounds and silently return partial labels
      (100L until 200L).map(i => (i, i + 1))
    // localSolveMaxEdges = 0 forces the distributed iterative path
    val got = ConnectedComponents.components(edges.toDF("s", "d"), "s", "d",
        localSolveMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = bruteComponents(edges)
    assert(got == expect)
    // the chain collapsed to its minimum
    (100L to 200L).foreach(i => assert(got(i) == 100L))
  }

  test("small-graph local solve matches the iterative path") {
    val rnd = new Random(41)
    val edges = (0 until 300).map(_ => (rnd.nextInt(90).toLong, rnd.nextInt(90).toLong)) ++
      (500L until 540L).map(i => (i, i + 1))
    val df = edges.toDF("s", "d")
    // default threshold routes this graph to the one-pass union-find
    val local = ConnectedComponents.components(df, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val iter = ConnectedComponents.components(df, "s", "d", localSolveMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == iter)
    assert(local == bruteComponents(edges))
  }

  test("large-star/small-star matches union-find, incl. a 60-node chain in few rounds") {
    val rnd = new Random(29)
    val edges = (0 until 120).map(_ => (rnd.nextInt(70).toLong, rnd.nextInt(70).toLong))
      .filter(e => e._1 != e._2) ++
      // a 60-node chain: label propagation would need ~60 rounds;
      // star contraction must finish within the default maxIter (30),
      // where it errs to partial labels if convergence were slow
      (1000L until 1060L).map(i => (i, i + 1))
    val got = ConnectedComponents.componentsStar(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = bruteComponents(edges)
    assert(got == expect)
    (1000L to 1060L).foreach(i => assert(got(i) == 1000L))
  }

  test("both algorithms agree on random graphs") {
    val rnd = new Random(37)
    val edges = (0 until 200).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    val df = edges.toDF("s", "d")
    val a = ConnectedComponents.components(df, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = ConnectedComponents.componentsStar(df, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}

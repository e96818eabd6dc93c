package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact integer-fixed-point k-means (Lloyd) training for IVF
  * similarity search — the producer side of the cell index that
  * q53/q114 search consumes, as one shared definition for the engine
  * expressions AND their DuckDB oracle mirrors (the MinhashPipeline
  * discipline applied to the ANN family: a retune of the quantization
  * or tie-break can never drift a query from its oracle, or q113's
  * single step from q114's iterated training).
  *
  * All arithmetic is integer-exact so the gates are hash matches, not
  * tolerances:
  *  - embeddings quantize to fixed point `floor(double(x) * 1000) +
  *    offset` — double on both engines, so the floor is bit-identical;
  *    an `offset` large enough to make every coordinate positive (the
  *    corpus is unit-scale, so +4000 is ample) keeps every derived sum
  *    positive, which makes Spark's `DIV` (truncating) and DuckDB's
  *    `//` agree on the centroid mean without sign-dependent fixups.
  *    Assignment is offset-invariant: `(q_d - c_d)` cancels the shift.
  *  - distances are BIGINT sums of squared differences; ties break by
  *    `(dist, cid)` on both engines.
  *  - centroid update is the per-dim BIGINT sum with truncating
  *    division — deterministic, no float accumulation order to drift.
  *
  * 100 TB shape, per Lloyd iteration:
  *  - the K centroids ride as ONE sorted `collect_list` row through a
  *    broadcast cross join (K·dim longs — bytes, not gigabytes);
  *  - assignment is map-side via the native `array_l2sq` codegen
  *    expression (one fused long loop) — no per-vector shuffle;
  *  - the update explodes assigned vectors to (cid, dim, x) rows, but
  *    hash partial aggregation collapses each task's output to at most
  *    K·dim rows before the exchange, so the shuffle carries
  *    ~partitions·K·dim rows regardless of corpus size;
  *  - the K-row centroid reassembly is driver-scale.
  * Training cost is therefore `iters` corpus scans with tiny shuffles —
  * the plan you want for Lloyd at any scale ([[graft.queries]] q113
  * gates the single step's plan; q114 the composed lifecycle).
  *
  * Reference anchor: SURVEY §7.1 step 9 (similarity search as a
  * first-class extension); PAPERS.md top-k similarity literature.
  */
object IvfKmeans {

  /** Fixed-point quantization of a float-array embedding column. */
  def quantize(embedding: Column, offset: Long): Column =
    transform(embedding, x => floor(x.cast("double") * 1000).cast("long") + offset)

  /** Integer squared-L2 distance between two quantized vectors — the
    * native codegen expression ([[graft.functions.ArrayL2Sq]], one
    * fused long loop in whole-stage codegen). Integer arithmetic has
    * no accumulation-order sensitivity, so this is bit-identical to
    * the HOF fold it replaced and to [[distSql]]'s DuckDB mirror. */
  def distL2(a: Column, b: Column): Column =
    call_function("array_l2sq", a, b)

  /** Per-vector argmin over a 1-row centroid array: the lexicographic
    * `array_min` over `struct(dist, cid)` is exactly the
    * `ORDER BY dist, cid LIMIT 1` tie-break the oracle replays. */
  def bestCentroid(qv: Column, cents: Column): Column =
    array_min(transform(cents, c =>
      struct(distL2(qv, c.getField("cqv")).as("dist"),
        c.getField("cid").as("cid"))))

  /** Deterministic seed centroids: the first `k` vectors by id, packed
    * into ONE sorted array-of-structs row (sort_array fixes
    * collect_list's arrival order). */
  def seedCents(q: DataFrame, k: Int): DataFrame =
    q.filter(col("vec_id") < k)
      .select(struct(col("vec_id").as("cid"), col("qv").as("cqv")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cents"))

  /** Nearest-centroid assignment of `q` (vec_id, qv) against a 1-row
    * `cents` frame → (vec_id, qv, cid, dist). Map-side: the 1-row side
    * broadcasts. */
  def assign(q: DataFrame, cents: DataFrame): DataFrame =
    q.crossJoin(cents)
      .select(col("vec_id"), col("qv"),
        bestCentroid(col("qv"), col("cents")).as("best"))
      .select(col("vec_id"), col("qv"),
        col("best.cid").as("cid"), col("best.dist").as("dist"))

  /** One Lloyd update: per-dim BIGINT sums per cell, truncating-mean
    * back to a quantized centroid, reassembled into the 1-row cents
    * frame. Cells that lost all members drop out (both engines). */
  def update(assigned: DataFrame): DataFrame =
    assigned.select(col("cid"), posexplode(col("qv")).as(Seq("dim", "xd")))
      .groupBy(col("cid"), col("dim"))
      .agg(sum(col("xd")).as("sd"), count(lit(1)).as("n"))
      .groupBy(col("cid"))
      .agg(sort_array(collect_list(
        struct(col("dim"), expr("sd DIV n").as("cd")))).as("ds"))
      .select(struct(col("cid"),
        transform(col("ds"), d => d.getField("cd")).as("cqv")).as("c"))
      .agg(sort_array(collect_list(col("c"))).as("cents"))

  /** Per-row ranked nearest cells against a 1-row `cents` frame: each
    * input row explodes to its `maxProbe` nearest trained cells with a
    * 1-based `crank` (lexicographic (dist, cid) tie-break, same as
    * [[bestCentroid]] — crank=1 IS the assignment cell). All input
    * columns pass through. Two consumers, one definition:
    *  - nprobe SEARCH (q117): probes fan out to their p nearest cells
    *    — the probe side multiplies by p, never the corpus side;
    *  - SPILL ASSIGNMENT (q118): the corpus itself indexes into its 2
    *    nearest cells, so boundary pairs split across neighboring
    *    cells still collide — index inflation bounded at exactly 2x.
    * Map-side: the cents row broadcasts; the explode is per-row. */
  def rankCells(rows: DataFrame, qvCol: String, cents: DataFrame,
                maxProbe: Int): DataFrame = {
    val passthru = rows.columns.map(col).toSeq
    rows.crossJoin(cents)
      .select(passthru :+
        posexplode(slice(sort_array(transform(col("cents"), c =>
          struct(distL2(col(qvCol), c.getField("cqv")).as("dist"),
            c.getField("cid").as("cid")))), 1, maxProbe))
          .as(Seq("cr", "cellrec")): _*)
      .select(passthru :+
        (col("cr") + 1).cast("int").as("crank") :+
        col("cellrec.cid").as("cell"): _*)
  }

  /** `iters` Lloyd iterations from the id-seeded centroids. Each
    * iteration's K-row centroid frame is materialized
    * (localCheckpoint) — K·dim longs, and without it iteration t's
    * lineage re-evaluates every earlier iteration's corpus scan. */
  def train(q: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = seedCents(q, k).localCheckpoint(true)
    (1 to iters).foreach { _ =>
      cents = update(assign(q, cents)).localCheckpoint(true)
    }
    cents
  }

  // ---- DuckDB oracle mirrors -----------------------------------------

  /** SQL mirror of [[distL2]] for `$a[i]`/`$b[i]`-style list refs. */
  def distSql(a: String, b: String, dim: Int): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      [($a[i] - $b[i]) * ($a[i] - $b[i])
       |       FOR i IN generate_series(1, $dim)]),
       |      (acc, x) -> acc + x)""".stripMargin

  /** CTE chain replaying quantization + seeding + `iters` Lloyd
    * iterations: emits `q` (vec_id, qv), `c0`..`c$iters` centroid
    * tables (cid, cqv). The truncating `//` mean matches the engine's
    * `DIV` because every coordinate is offset-positive. `where`
    * restricts the TRAINING corpus (e.g. a seed-index subset, q120);
    * the default empty string leaves the emitted SQL byte-identical
    * to the unrestricted form every existing gate hashes against. */
  def lloydCtes(k: Int, iters: Int, dim: Int, offset: Long,
                where: String = ""): String = {
    val head =
      s"""q AS (
         |  SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT) + $offset) AS qv
         |  FROM embeddings$where),
         |c0 AS (SELECT vec_id AS cid, qv AS cqv FROM q WHERE vec_id < $k)""".stripMargin
    val steps = (1 to iters).map { t =>
      s"""d$t AS (
         |  SELECT q.vec_id, q.qv, c.cid,
         |    ${distSql("q.qv", "c.cqv", dim)} AS dist
         |  FROM q, c${t - 1} c),
         |a$t AS (
         |  SELECT vec_id, qv, cid, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
         |  FROM d$t),
         |s$t AS (
         |  SELECT cid, dim, CAST(sum(x) AS BIGINT) AS sd, count(*) AS n
         |  FROM (SELECT cid, unnest(qv) AS x,
         |          unnest(generate_series(1, $dim)) AS dim
         |        FROM a$t WHERE rn = 1)
         |  GROUP BY cid, dim),
         |c$t AS (SELECT cid, list(sd // n ORDER BY dim) AS cqv FROM s$t GROUP BY cid)""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Final-assignment CTE against `c$iters` → `afin` (vec_id, qv,
    * cell). Append after [[lloydCtes]]. */
  def assignCte(iters: Int, dim: Int): String =
    s"""dfin AS (
       |  SELECT q.vec_id, q.qv, c.cid,
       |    ${distSql("q.qv", "c.cqv", dim)} AS dist
       |  FROM q, c$iters c),
       |afin AS (
       |  SELECT vec_id, qv, cid AS cell FROM (
       |    SELECT vec_id, qv, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
       |    FROM dfin)
       |  WHERE rn = 1)""".stripMargin
}

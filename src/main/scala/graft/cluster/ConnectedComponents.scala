package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge DataFrame by
  * iterative min-label propagation. Each round is ONE aggregation:
  * neighbor labels and self labels union into a `groupBy(id)` that
  * computes the new label, the old label, and the convergence signal
  * in the same pass — so a round costs a single exchange plus a cheap
  * count over the just-checkpointed result (round 1 spent ~4 exchanges
  * and a join-based convergence job per round; the loop was ~24
  * driver-serialized stage-jobs at 100k images).
  *
  * Rounds needed = graph diameter + 1. In this engine's dedup workload
  * the diameter is structurally small: hot buckets emit STAR pairs
  * (PairGen cap — diameter 2) and natural near-dup chains are short,
  * so propagation converges in a handful of rounds; `maxIter` is the
  * safety valve for pathological chains (a pointer-doubling compress
  * could be layered back if a real corpus ever produced one).
  *
  * The deterministic representative (component id = min vertex id) is
  * the analog of destor's first-occurrence-wins canonical chunk copy
  * (reference: src/index/index.c:282-315 `index_check_buffer` — an
  * earlier copy's id is adopted by all later copies).
  *
  * Scale notes: every shuffle is keyed on the vertex id, AQE handles
  * residual skew, and only edge-touching vertices iterate (singletons
  * — the vast majority in a dedup corpus — are stitched back by the
  * final left join). Lineage is truncated by `localCheckpoint` each
  * round so plans stay O(1) deep. (On a real cluster prefer reliable
  * `sparkContext.setCheckpointDir` + `checkpoint()` so executor loss
  * mid-iteration does not kill the run; localCheckpoint is the
  * single-JVM fast path.)
  */
object ConnectedComponents {

  /** Materialize + rebase on FRESH attribute ids: loop iterations
    * union/join plans that would otherwise share attribute ids across
    * checkpoint boundaries, which trips Catalyst constraint rewriting
    * (AttributeMap key-not-found in Union.rewriteConstraints). The
    * `toDF(columns)` projection re-aliases every column with fresh
    * expr ids while staying on the columnar path (no RDD[Row]
    * deserialization round-trip).
    */
  private def checkpointFresh(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    cp.toDF(cp.columns: _*)
  }

  /** @param vertices single-column DF `id` (all nodes, incl. singletons)
    * @param edges two-column DF `src`,`dst`
    * @return DF (id, component) where component = min id reachable
    */
  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame, maxIter: Int = 64): DataFrame = {
    // pre-partition the (loop-invariant) bidirectional edge table by
    // src so each round's propagate join only moves the label side.
    // No dedup pass: duplicate edges only produce duplicate messages
    // into a min() aggregate — harmless — and this engine's pair
    // stream is already unique per (id1<id2), so a distinct() here
    // was a pure extra shuffle+job per run.
    val bidir = checkpointFresh(
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .repartition(col("src")))

    var labels: DataFrame = null
    var iter = 0
    var converged = false
    import spark.implicits._
    while (!converged && iter < maxIter) {
      // one pass: label'(v) = min(own label, neighbors' labels); the
      // self row carries the old label so the convergence signal needs
      // no extra join. The changed-count rides an ACCUMULATOR bumped
      // during the checkpoint materialization, so a round is exactly
      // ONE driver-serialized job (a separate agg job per round was a
      // visible Amdahl term at high core counts). Task retries can only
      // overcount — harmless: convergence only tests for zero.
      val changedAcc = spark.sparkContext.longAccumulator(s"cc-changed-$iter")
      // Round 1 under identity labels needs NO init table and NO join:
      // the neighbor message along (src→dst) is just src itself, and
      // the self rows need no distinct (the groupBy dedups). This
      // replaces a separate identity-label checkpoint job + round-1
      // propagate join.
      val pre =
        if (labels == null)
          bidir.select(col("dst").as("id"), col("src").as("label"), lit(false).as("self"))
            .union(bidir.select(col("src").as("id"), col("src").as("label"), lit(true).as("self")))
        else
          labels.select(col("id"), col("label"), lit(true).as("self"))
            .union(bidir
              .join(labels.select(col("id").as("src"), col("label")), "src")
              .select(col("dst").as("id"), col("label"), lit(false).as("self")))
      val prop = pre
        .groupBy("id")
        .agg(
          min("label").as("label"),
          min(when(col("self"), col("label"))).as("old"))
      // pointer-jump compression IN THE SAME round plan: label'(v) =
      // label(label(v)). Propagate alone needs diameter+1 rounds — the
      // measured corpus produced ~13 driver-serialized round-jobs on
      // chain-shaped components; with per-round jumping the label
      // distance to the component min halves each round (~log2 d
      // rounds). The self-join recomputes the (small) aggregation
      // subtree once more inside the round job — cheaper than the
      // alternative second checkpoint job per round.
      val next = checkpointFresh(
        prop
          .join(
            prop.select(col("id").as("label"), col("label").as("label2")),
            Seq("label"), "left")
          .select(col("id"),
            coalesce(col("label2"), col("label")).as("label"),
            (coalesce(col("label2"), col("label")) < col("old")).as("changed"))
          .as[(String, String, Boolean)]
          .mapPartitions { it =>
            it.map { case (id, label, changed) =>
              if (changed) changedAcc.add(1L)
              (id, label)
            }
          }
          .toDF("id", "label"))
      labels = next
      converged = changedAcc.value == 0L
      iter += 1
    }
    vertices.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("component"))
  }
}

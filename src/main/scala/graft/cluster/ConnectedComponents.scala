package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge DataFrame by
  * iterative min-label propagation with per-round pointer-doubling
  * path compression — converges in O(log diameter) rounds, each round
  * ONE materializing job (the convergence signal rides along as a
  * `changed` column, so no separate join-and-count job per round; the
  * follow-up aggregate only scans the just-checkpointed partitions).
  *
  * The deterministic representative (component id = min vertex id) is
  * the analog of destor's first-occurrence-wins canonical chunk copy
  * (reference: src/index/index.c:282-315 `index_check_buffer` — an
  * earlier copy's id is adopted by all later copies).
  *
  * Scale notes: every join is an equi-join on the label/vertex key, so
  * Catalyst shuffles both sides on that key and AQE handles skew; no
  * driver-side state beyond the per-round convergence counter. Lineage
  * is truncated by `localCheckpoint` each round so plans stay O(1)
  * deep at any scale. (On a real cluster prefer reliable
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
  def run(spark: SparkSession, vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val bidir = checkpointFresh(
      edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())

    // iterate ONLY over vertices that appear in an edge — in a dedup
    // workload the vast majority of rows are singletons and would just
    // multiply every iteration's shuffle volume; they are stitched back
    // (as their own component) by the final left join
    var labels = checkpointFresh(
      bidir.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("label")))
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // propagate: label'(v) = min(label(v), min over neighbors u of label(u))
      val msgs = bidir
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
      val prop = labels.select("id", "label").union(msgs)
        .groupBy("id").agg(min("label").as("label"))
      // compress: label''(v) = label'(label'(v)) — pointer doubling.
      // prop appears on both sides; its aggregation exchange is
      // identical in both subtrees, so ReuseExchange shares the shuffle.
      val compressed = prop.as("a")
        .join(prop.select(col("id").as("label"), col("label").as("label2")).as("b"), Seq("label"), "left")
        .select(col("id"), coalesce(col("label2"), col("label")).as("label"))
      // convergence signal computed IN the same materializing job: carry
      // old label alongside; the count of changed rows is then a cheap
      // scan of the checkpointed partitions (no extra join job).
      val next = checkpointFresh(
        compressed.as("n")
          .join(labels.select(col("id"), col("label").as("old")), "id")
          .select(col("id"), col("label"), (col("label") =!= col("old")).as("changed")))
      val nChanged = next.agg(sum(when(col("changed"), 1L).otherwise(0L))).first().get(0)
      labels = next.select("id", "label")
      converged = nChanged == null || nChanged.asInstanceOf[Long] == 0L
      iter += 1
    }
    vertices.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("component"))
  }
}

package graft.cluster

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair/edge DataFrame by
  * iterative min-label propagation with per-round pointer-doubling
  * path compression — converges in O(log diameter) rounds, each round
  * a pair of shuffles, lineage truncated by `localCheckpoint` so plans
  * stay O(1) deep at any scale.
  *
  * The deterministic representative (component id = min vertex id) is
  * the analog of destor's first-occurrence-wins canonical chunk copy
  * (reference: src/index/index.c:282-315 `index_check_buffer` — an
  * earlier copy's id is adopted by all later copies).
  *
  * Scale notes: every join is an equi-join on the label/vertex key, so
  * Catalyst shuffles both sides on that key and AQE handles skew; no
  * driver-side state beyond the per-round convergence counter.
  */
object ConnectedComponents {

  /** @param vertices single-column DF `id` (all nodes, incl. singletons)
    * @param edges two-column DF `src`,`dst`
    * @return DF (id, component) where component = min id reachable
    */
  /** Materialize + rebase on FRESH attribute ids: loop iterations
    * union/join plans that would otherwise share attribute ids across
    * checkpoint boundaries, which trips Catalyst constraint rewriting
    * (AttributeMap key-not-found in Union.rewriteConstraints). */
  private def checkpointFresh(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    df.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

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
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      val prop = labels.select("id", "label").union(msgs)
        .groupBy("id").agg(min("label").as("label"))
      // compress: label''(v) = label'(label'(v)) — pointer doubling
      val compressed = checkpointFresh(
        prop.as("a")
          .join(prop.select(col("id").as("label"), col("label").as("label2")).as("b"), Seq("label"), "left")
          .select(col("id"), coalesce(col("label2"), col("label")).as("label")))
      val changed = compressed.as("n")
        .join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old"))
        .limit(1).count()
      labels = compressed
      converged = changed == 0
      iter += 1
    }
    vertices.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("component"))
  }
}

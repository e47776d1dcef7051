package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy top-k champion selection with feature trimming (O2, reference
  * `Top-k similar segment selection` src/index/similarity_detection.c:100-121):
  * destor ranks the candidate segments sharing features with an incoming
  * segment, picks the one sharing most, REMOVES the picked segment's
  * features from every remaining candidate (`features_trim`), re-sorts,
  * and repeats k times — so the k prefetched segments are maximally
  * complementary, not just the k highest-overlap (which could be k
  * near-copies of each other).
  *
  * Recast: the iterative trim loop is inherently sequential WITHIN one
  * selection group but embarrassingly parallel ACROSS groups — exactly
  * `groupByKey(...).flatMapGroups` with a local array loop per group.
  * Per-group state is the candidate set destor holds in its GSequence:
  * bounded by the segment-selection candidate cap, never data-scale
  * (the data-scale work — building the shared-feature postings — is the
  * upstream distinct/explode). Ties break on smallest member id so the
  * result is partition-count-invariant.
  */
object GreedySelect {

  /** `pairs`: (grp:string, member:long, feature:long) shared-feature
    * postings. Returns (grp, pick_rank, member, shared_features) — the
    * per-group greedy top-k, shared_features = features remaining at
    * pick time (destor's sort key when the champion was chosen). */
  def greedyTopK(pairs: DataFrame, k: Int): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select("grp", "member", "feature").distinct()
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (g, it) =>
        val feats = scala.collection.mutable.LinkedHashMap
          .empty[Long, scala.collection.mutable.HashSet[Long]]
        it.foreach { case (_, m, f) =>
          feats.getOrElseUpdate(m, scala.collection.mutable.HashSet.empty[Long]) += f
        }
        val out = Vector.newBuilder[(String, Int, Long, Int)]
        var rank = 1
        while (rank <= k && feats.nonEmpty) {
          val (cm, cf) = feats.minBy { case (m, s) => (-s.size, m) }
          out += ((g, rank, cm, cf.size))
          feats.remove(cm)
          val picked = cf // trim the champion's features from the rest
          feats.valuesIterator.foreach(_ --= picked)
          rank += 1
        }
        out.result().iterator
      }
      .toDF("grp", "pick_rank", "member", "shared_features")
  }

  /** Driver query shape over the documents table: group = source,
    * member = doc, feature = distinct lowercase word token (hashed) —
    * "which k docs per source jointly cover the most vocabulary",
    * destor's complementary-prefetch semantics on text. Non-SQL-
    * expressible (iterative); brute-force oracle in GreedySpec. */
  def greedyTopKDocs(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val pairs = d.select(col("source").as("grp"), col("doc_id").as("member"),
        explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("grp"), col("member"), xxhash64(col("tok")).as("feature"))
    greedyTopK(pairs, k)
  }
}

package graft

import graft.sim.EmbedOps
import org.scalatest.funsuite.AnyFunSuite

/** Exact + recall oracles for the IVF ANN path. */
class IvfSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(4, 8, "ivf-spec")
  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  lazy val brute = rows(EmbedOps.cosineTopK(spark, dir))
  lazy val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count().toInt

  test("nprobe == nC probes every cell: IVF result EQUALS brute-force top-k, rank for rank") {
    val ivf = rows(EmbedOps.ivfTopK(spark, dir, nC = 8, nprobe = 8))
    assert(ivf == brute,
      s"missed=${(brute -- ivf).take(5)} extra=${(ivf -- brute).take(5)}")
  }

  test("sampled codebook training (trainModulus > 1) keeps full-probe exactness") {
    // the codebook only shapes COVERAGE; with every cell probed the
    // candidate set is all-pairs regardless of where centroids landed
    val ivf = rows(EmbedOps.ivfTopK(spark, dir, nC = 8, nprobe = 8, trainModulus = 4))
    assert(ivf == brute)
  }

  test("k-means is deterministic: same seed twice gives identical codebooks and results") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
    val c1 = EmbedOps.kmeansCentroids(spark, e, 8)
    val c2 = EmbedOps.kmeansCentroids(spark, e, 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    assert(rows(EmbedOps.ivfTopK(spark, dir, nC = 8, nprobe = 2))
      == rows(EmbedOps.ivfTopK(spark, dir, nC = 8, nprobe = 2)))
  }

  test("partial probing keeps useful recall on the near-random corpus and never invents pairs") {
    val ivf = rows(EmbedOps.ivfTopK(spark, dir, nC = 8, nprobe = 4))
    // every emitted (query, neighbor, cos) must agree with brute force
    // on the score (the re-rank is exact; only COVERAGE may drop)
    val bruteCos = brute.map(t => (t._1, t._2) -> t._4).toMap
    for ((v, nb, _, c) <- ivf if bruteCos.contains((v, nb)))
      assert(bruteCos((v, nb)) == c, s"score mismatch for ($v,$nb)")
    // recall@k floor: probing half the cells of a NEAR-RANDOM corpus
    // (the hardest regime — neighbors are barely better than noise)
    // must still find a majority of true top-k pairs
    val hit = ivf.map(t => (t._1, t._2)) intersect brute.map(t => (t._1, t._2))
    val recall = hit.size.toDouble / brute.size
    assert(recall >= 0.5, s"recall@k=$recall")
    // and every query keeps all k slots filled when cells are big enough
    val perQuery = ivf.groupBy(_._1).view.mapValues(_.size)
    assert(perQuery.values.forall(_ == 5), s"short result lists: ${perQuery.filter(_._2 != 5).take(3)}")
  }
}

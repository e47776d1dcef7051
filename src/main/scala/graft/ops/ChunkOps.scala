package graft.ops

import graft.signatures.Chunker
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dataset-side surface of the CDC chunker family (P2–P6): a narrow
  * typed flatMap over the documents table — no shuffle, no state, the
  * chunk stream stays (id, off, len, fp) so the bytes themselves never
  * leave the scan task. At 100 TB this stage is pure map parallelism;
  * the fingerprints feed the same exact-dedup groupBy as P8.
  */
object ChunkOps {

  /** One chunk of one document under one algorithm. */
  final case class ChunkRow(doc_id: Long, chunk_idx: Int, off: Int, len: Int, fp: Long)

  /** Per-(doc, algo) tiling invariants — the SQL-expressible projection
    * of the chunker contract, oracled in DuckDB (q_chunk_cover). */
  final case class CoverRow(doc_id: Long, algo: String, total_len: Long,
                            cover_ok: Boolean, clamps_ok: Boolean)

  // not private: Catalyst's generated SafeProjection must reach the ctor
  final case class Doc(doc_id: Long, text: String)

  private def docs(spark: SparkSession, dir: String) = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text").as[Doc]
  }

  /** Chunk list for one algorithm over the documents table (rows-only
    * driver check; the tiling invariants are oracled via chunkCover and
    * the byte-level properties in ChunkerSpec). */
  def chunkDocs(spark: SparkSession, dir: String, algo: String,
                p: Chunker.Params = Chunker.docParams): DataFrame = {
    import spark.implicits._
    docs(spark, dir).flatMap { d =>
      val b = d.text.getBytes("UTF-8")
      val ends = Chunker.boundaries(algo, b, p)
      var off = 0
      ends.iterator.zipWithIndex.map { case (end, idx) =>
        val row = ChunkRow(d.doc_id, idx, off, end - off, Chunker.rangeFp(b, off, end - off))
        off = end
        row
      }
    }.toDF()
  }

  /** Tiling-invariant projection for ALL five algorithms at once:
    * total_len must equal octet_length(text), the chunks must tile
    * [0, n) contiguously, and every non-final chunk must respect the
    * min/max clamps (a final chunk may undershoot min). DuckDB can
    * state the expected row exactly, making the whole chunker family
    * hash-checkable end-to-end. */
  def chunkCover(spark: SparkSession, dir: String,
                 p: Chunker.Params = Chunker.docParams): DataFrame = {
    import spark.implicits._
    docs(spark, dir).flatMap { d =>
      val b = d.text.getBytes("UTF-8")
      Chunker.algos.map { algo =>
        val ends = Chunker.boundaries(algo, b, p)
        var off = 0
        var total = 0L
        var cover = true
        var clamps = true
        var i = 0
        while (i < ends.length) {
          val len = ends(i) - off
          if (len <= 0) cover = false
          if (len > p.max) clamps = false
          // rabin-family cuts need a full 48-byte window, so their
          // effective floor is max(min, window); only the final chunk
          // may undershoot min
          if (i < ends.length - 1 && len < p.min) clamps = false
          total += len
          off = ends(i)
          i += 1
        }
        if (b.nonEmpty && (ends.isEmpty || ends.last != b.length)) cover = false
        CoverRow(d.doc_id, algo, total, cover, clamps)
      }
    }.toDF()
  }
}

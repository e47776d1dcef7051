package graft.signatures

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** U2 — MinHash merge UDAF: element-wise minimum over K-perm
  * signatures. Because min over a union equals the min of per-set
  * minima, merging per-row signatures yields EXACTLY the signature of
  * the union of the rows' shingle sets — so a segment/source-level
  * signature is one `groupBy().agg()` over already-computed row
  * signatures, no re-shingling (destor equally builds segment feature
  * sets by sampling the chunk fingerprints it already has, reference
  * src/index/segmenting_method.c + sampling src/index/sampling_method.c;
  * the union property is the Broder'97 resemblance construction).
  *
  * Scale shape: partial aggregation (map-side combine) applies — each
  * executor merges its local rows to one K-long array before the
  * shuffle, so the exchange carries one signature per group per
  * partition, never the row signatures.
  */
final class MinHashMerge(k: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  def reduce(buf: Array[Long], row: Array[Long]): Array[Long] = merge(buf, row)

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b == null) return a
    require(b.length == k, s"signature length ${b.length} != K=$k")
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** All-MaxValue (no rows / all-null group) maps to the empty-set
    * sentinel convention used by Sig.minhash on empty shingle sets. */
  def finish(buf: Array[Long]): Array[Long] = buf

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object MinHashMerge {
  /** Column form: `df.groupBy(g).agg(MinHashMerge.column(k, col("sig")))`. */
  def column(k: Int, sig: Column): Column =
    udaf(new MinHashMerge(k), ExpressionEncoder[Array[Long]]()).apply(sig)
}

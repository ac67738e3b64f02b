package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group Bloom bitset over PRE-HASHED 64-bit keys — the aggregate
  * behind SnapshotStore's per-file bloom sidecars (X141n). The input is
  * one `xxhash64(col)` value per row (computed by Spark's codegen'd hash
  * expression, so the hot per-row work never leaves Tungsten); this
  * aggregator only derives k bit positions from that single 64-bit hash
  * via Kirsch–Mitzenmacher double hashing (h1 + i·h2 — two halves of one
  * hash give k independent-enough probes) and ORs fixed-size bitsets.
  * Partial aggregation applies as with any Aggregator: each partition
  * folds its rows into one local bitset and only the m-bit buffers merge
  * across the shuffle — per-file cost is O(rows) set-bit work plus one
  * m-bit buffer per (partition × file).
  *
  * `bits` must be a power of two (positions mask instead of mod). With
  * the store's defaults (2^19 bits, k = 7) a 128 MB parquet file of ~1 M
  * keys carries a 64 KB sidecar at ~2 bits-per-key×… false-positive rate
  * well under 1e-3; at the spec's sizing guidance (≥ 8 bits/key) the fpp
  * is effectively zero for pruning purposes — a false positive only
  * costs one extra file open, never a wrong result (the residual filter
  * stays exact).
  */
final class BloomAgg(bits: Int, k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(bits >= 64 && (bits & (bits - 1)) == 0,
    s"bits must be a power of two >= 64, got $bits")
  require(k >= 1 && k <= 16, s"k must be in 1..16, got $k")
  private val words = bits >>> 6

  def zero: Array[Long] = new Array[Long](words)

  def reduce(b: Array[Long], h: Long): Array[Long] = {
    BloomAgg.set(b, h, bits, k); b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  def finish(b: Array[Long]): Array[Long] = b

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object BloomAgg {

  /** Bit position i of hash h — Kirsch–Mitzenmacher: two halves of the
    * 64-bit hash as (h1, h2), position = (h1 + i·h2) masked to [0, bits).
    * h2 forced odd so successive probes never collapse onto one bit. */
  @inline private def pos(h: Long, i: Int, bits: Int): Int = {
    val h1 = (h ^ (h >>> 32)).toInt
    val h2 = ((h >>> 17).toInt) | 1
    (h1 + i * h2) & (bits - 1)
  }

  def set(w: Array[Long], h: Long, bits: Int, k: Int): Unit = {
    var i = 0
    while (i < k) {
      val p = pos(h, i, bits)
      w(p >>> 6) |= 1L << (p & 63)
      i += 1
    }
  }

  /** Definitely-absent test: false ⇒ no row with this hash was folded in
    * (skip the file); true ⇒ the file must be read (exact residual
    * filter decides). */
  def mightContain(w: Array[Long], h: Long, bits: Int, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = pos(h, i, bits)
      if ((w(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

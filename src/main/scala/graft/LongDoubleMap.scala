package graft

/** Minimal open-addressing Long→Double accumulator for the partition-local
  * SpMV combine (message pre-aggregation). Two primitive arrays, linear
  * probing, power-of-two capacity — the whole point is to keep the
  * per-task working set compact (16 B/entry) and allocation-free on the
  * hot path, where Spark's generic UnsafeRow hash aggregate spends ~3× the
  * memory traffic. Zero is a valid key (tracked separately).
  */
final class LongDoubleMap(initialCapacity: Int = 1 << 12) {
  private var cap = Integer.highestOneBit(
    math.max(16, initialCapacity * 2 - 1))
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Double](cap)
  private var used = new Array[Boolean](cap)
  private var size = 0
  private var zeroVal = 0.0
  private var hasZero = false

  @inline private def idx(k: Long): Int = {
    // finalizer from splitmix64 — cheap, well-distributed
    var x = k * -7046029254386353131L
    x ^= x >>> 32
    (x & mask).toInt
  }

  def add(k: Long, v: Double): Unit = {
    if (k == 0L) { zeroVal += v; hasZero = true; return }
    var i = idx(k)
    while (used(i) && keys(i) != k) i = (i + 1) & mask
    if (!used(i)) {
      used(i) = true; keys(i) = k; vals(i) = v
      size += 1
      if (size * 10 >= cap * 7) grow()
    } else vals(i) += v
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val ou = used; val oc = cap
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap)
    vals = new Array[Double](cap)
    used = new Array[Boolean](cap)
    size = 0
    var i = 0
    while (i < oc) {
      if (ou(i)) {
        var j = idx(ok(i))
        while (used(j)) j = (j + 1) & mask
        used(j) = true; keys(j) = ok(i); vals(j) = ov(i)
        size += 1
      }
      i += 1
    }
  }

  def iterator: Iterator[(Long, Double)] = {
    val base = (0 until cap).iterator
      .filter(used(_))
      .map(i => (keys(i), vals(i)))
    if (hasZero) Iterator((0L, zeroVal)) ++ base else base
  }
}

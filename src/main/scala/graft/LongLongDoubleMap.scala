package graft

/** Open-addressing (Long, Long) → Double accumulator — the label-prop
  * analogue of [[LongDoubleMap]]: partition-local combine of (vid, label)
  * → Σ weight message partials before the superstep's one shuffle.
  * Three primitive arrays, linear probing, power-of-two capacity; the
  * (0, 0) key is tracked separately so 0 stays a valid vid/label.
  */
final class LongLongDoubleMap(initialCapacity: Int = 1 << 12) {
  private var cap = Integer.highestOneBit(
    math.max(16, initialCapacity * 2 - 1))
  private var mask = cap - 1
  private var k1s = new Array[Long](cap)
  private var k2s = new Array[Long](cap)
  private var vals = new Array[Double](cap)
  private var used = new Array[Boolean](cap)
  private var size = 0
  private var zeroVal = 0.0
  private var hasZero = false

  @inline private def idx(k1: Long, k2: Long): Int = {
    // splitmix64 finalizer over the combined key
    var x = (k1 * -7046029254386353131L) ^ (k2 * -4417276706812531889L)
    x ^= x >>> 32
    (x & mask).toInt
  }

  def add(k1: Long, k2: Long, v: Double): Unit = {
    if (k1 == 0L && k2 == 0L) { zeroVal += v; hasZero = true; return }
    var i = idx(k1, k2)
    while (used(i) && (k1s(i) != k1 || k2s(i) != k2)) i = (i + 1) & mask
    if (!used(i)) {
      used(i) = true; k1s(i) = k1; k2s(i) = k2; vals(i) = v
      size += 1
      if (size * 10 >= cap * 7) grow()
    } else vals(i) += v
  }

  private def grow(): Unit = {
    val o1 = k1s; val o2 = k2s; val ov = vals; val ou = used; val oc = cap
    cap <<= 1; mask = cap - 1
    k1s = new Array[Long](cap)
    k2s = new Array[Long](cap)
    vals = new Array[Double](cap)
    used = new Array[Boolean](cap)
    size = 0
    var i = 0
    while (i < oc) {
      if (ou(i)) {
        var j = idx(o1(i), o2(i))
        while (used(j)) j = (j + 1) & mask
        used(j) = true; k1s(j) = o1(i); k2s(j) = o2(i); vals(j) = ov(i)
        size += 1
      }
      i += 1
    }
  }

  def iterator: Iterator[(Long, Long, Double)] = {
    val base = (0 until cap).iterator
      .filter(used(_))
      .map(i => (k1s(i), k2s(i), vals(i)))
    if (hasZero) Iterator((0L, 0L, zeroVal)) ++ base else base
  }
}

package graft.operators

/** Manually-grown PRIMITIVE buffers for the one-task cutover folds
  * ([[Graph]] pageRank/HITS, [[Similarity]] smallMatrixPcaCore).
  *
  * `scala.collection.mutable.ArrayBuffer[Int]` boxes every element
  * (~16 B per `java.lang.Integer` plus the reference), so folding a
  * multi-million-row iterator through it multiplies the cutover's
  * memory estimate by ~5× and churns the GC inside the single task.
  * These buffers append into raw `Array[Int]`/`Array[Double]` with
  * doubling growth — 4/8 bytes per element, amortized O(1) append —
  * so the byte math the cutover thresholds are sized from
  * (see SCALE.md "one-task cutovers") actually holds at the gate.
  */
private[operators] final class IntBuf(initial: Int = 1 << 10) {
  private var a = new Array[Int](math.max(initial, 8))
  private var n = 0
  def +=(v: Int): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
    a(n) = v; n += 1
  }
  def apply(i: Int): Int = a(i)
  def length: Int = n
}

private[operators] final class DoubleBuf(initial: Int = 1 << 10) {
  private var a = new Array[Double](math.max(initial, 8))
  private var n = 0
  def +=(v: Double): Unit = {
    if (n == a.length) a = java.util.Arrays.copyOf(a, a.length << 1)
    a(n) = v; n += 1
  }
  def apply(i: Int): Double = a(i)
  def length: Int = n
}

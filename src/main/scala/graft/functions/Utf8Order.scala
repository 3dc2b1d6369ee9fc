package graft.functions

/** Spark's `StringType` sorts by UTF-8 binary bytes (unsigned), which
  * equals Unicode code-point order; Java's `String.compareTo` is
  * UTF-16 code-unit order, which disagrees above the BMP (surrogates
  * sort between BMP characters). Driver-side tie-breaks that must
  * reproduce a Spark `orderBy` — the BPE argmax, the unigram-LM
  * Viterbi path tie-break — compare through this instead.
  */
object Utf8Order {

  /** a < b in UTF-8 byte (= code point) order. */
  def lt(a: String, b: String): Boolean = {
    if (b == null) return true // a non-null candidate beats "none yet"
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }
}

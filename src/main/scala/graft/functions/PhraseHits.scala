package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: total occurrence count of a FIXED list
  * of phrases in a string, via one Aho–Corasick pass (Aho & Corasick
  * 1975) — the multi-pattern blocklist scanner (C4's badwords step,
  * boilerplate markers, policy phrases).
  *
  * Why native: the composable spellings are one `regexp_count` (or
  * `contains`) per pattern — L regex passes over every document, i.e.
  * O(L·|text|) with L often in the hundreds; a per-token join only
  * sees single tokens, not phrases. The automaton matches ALL patterns
  * in ONE O(|text|) walk, counting every (possibly overlapping)
  * occurrence of every pattern.
  *
  * The automaton is byte-level over UTF-8 (safe: a valid UTF-8 pattern
  * byte-matches only at codepoint boundaries — continuation bytes
  * never equal starter bytes), compiled once per expression instance
  * (`@transient lazy`, rebuilt per executor after serialization, never
  * per row) and entered into codegen as a referenced object — the
  * projection stays inside whole-stage codegen with one virtual call
  * per row (the CompressRatio pattern). The dense 256-way goto table
  * costs 1 KiB per trie node: right for the typical curated blocklist
  * (hundreds of short phrases → a few MiB); for pattern sets in the
  * hundreds of thousands, swap the dense rows for hashed transitions
  * before reaching for this expression.
  *
  * Matching is CASE-SENSITIVE over exactly the bytes given — pass
  * normalized text (and normalized patterns) for the usual
  * case-insensitive blocklist semantics.
  */
case class PhraseHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  require(patterns.nonEmpty, "phrase_hits: empty pattern list")
  require(patterns.forall(_.nonEmpty), "phrase_hits: empty pattern")
  require(patterns.distinct.length == patterns.length,
    "phrase_hits: duplicate patterns would double-count")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"phrase_hits expects string, got ${t.sql}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "phrase_hits"

  @transient private lazy val ac = AhoCorasick.compile(patterns)

  override def nullSafeEval(input: Any): Any =
    ac.countMatches(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac, classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.countMatches($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHits =
    copy(child = newChild)
}

/** Compiled Aho–Corasick automaton in goto form: `next` is the
  * deterministic transition table (failure links already folded in at
  * compile time), `outCount(state)` the number of pattern occurrences
  * ENDING at each state (own matches plus the suffix chain's — also
  * folded at compile time). The match loop is therefore two array
  * reads per input byte, branch-free. */
final class AhoCorasick private (
    next: Array[Array[Int]], outCount: Array[Int]) extends Serializable {

  /** Total (overlapping) occurrences of all patterns in `s`. */
  def countMatches(s: UTF8String): Long = {
    var state = 0
    var n = 0L
    var i = 0
    val len = s.numBytes
    while (i < len) {
      state = next(state)(s.getByte(i) & 0xFF)
      n += outCount(state)
      i += 1
    }
    n
  }
}

object AhoCorasick {

  /** Classic construction: byte trie → BFS failure links → fold the
    * failure function into a deterministic goto table and the output
    * sets into per-state counts. */
  def compile(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.map(_.getBytes("UTF-8"))
    val maxNodes = pats.map(_.length).sum + 1
    val next = Array.fill(maxNodes)(Array.fill(256)(-1))
    val ends = new Array[Int](maxNodes)
    var nNodes = 1
    pats.foreach { p =>
      var cur = 0
      p.foreach { b =>
        val c = b & 0xFF
        if (next(cur)(c) == -1) { next(cur)(c) = nNodes; nNodes += 1 }
        cur = next(cur)(c)
      }
      ends(cur) += 1
    }
    val fail = new Array[Int](nNodes)
    val outCount = new Array[Int](nNodes)
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val v = next(0)(c)
      if (v == -1) next(0)(c) = 0
      else { fail(v) = 0; queue += v }
      c += 1
    }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outCount(u) = ends(u) + outCount(fail(u))
      var c2 = 0
      while (c2 < 256) {
        val v = next(u)(c2)
        if (v == -1) next(u)(c2) = next(fail(u))(c2)
        else { fail(v) = next(fail(u))(c2); queue += v }
        c2 += 1
      }
    }
    new AhoCorasick(next.take(nNodes), outCount.take(nNodes))
  }
}

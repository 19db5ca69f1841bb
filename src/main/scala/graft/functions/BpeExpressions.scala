package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native greedy-merge BPE for REAL merge tables (SURVEY §2C text_tokens /
  * pipeline_pack_bpe).
  *
  * The builtin-only formulation (TextOps.bpeCountFold) folds one string
  * `replace` per merge rule into the expression tree — exact and
  * oracle-replayable, but the tree depth grows with the merge count: a
  * trained tokenizer ships ~50k merges, and a 50k-deep nested-call Catalyst
  * expression does not plan (analysis/codegen blow up long before eval).
  * This expression is the scalable form: ONE plan node holding the whole
  * merge table as a rank map, walking each word with the classic
  * lowest-rank-first encoder loop (Sennrich et al. 2016).
  *
  * Equivalence to the fold: under the merge-table invariant real trained
  * tables satisfy (a rule's operands are raw characters or products of
  * EARLIER rules), a later merge can never create a new occurrence of an
  * earlier rule's pair — the merged symbol would have to EQUAL one of the
  * earlier operands, i.e. be the product of a later rule. So "apply each
  * rule once, in rank order, greedily left-to-right" (the fold) and
  * "repeatedly merge the lowest-rank pair present" (this encoder, the
  * canonical priority-queue form) produce identical symbol sequences —
  * spec-asserted against the fold on the shipped table and against a plain
  * Scala replay of the fold on a 1,076-rule synthetic table the Catalyst
  * fold cannot plan (BpeSpec).
  *
  * Scale: the merge table lives in the expression and ships to executors
  * inside the broadcast task binary — one copy per executor per stage, like
  * a broadcast variable, never per row. The per-word loop is O(len) rank
  * lookups per merged pair against a hash map built once per task.
  */
final class BpeCoder(val merges: Seq[(String, String)]) extends Serializable {

  /** Pair -> rank; on a duplicate rule the LOWEST rank wins (it fires first
    * and leaves no occurrences for the duplicate — matches the fold, where
    * the later replace finds nothing). */
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.putIfAbsent(a + "\u0000" + b, Integer.valueOf(i))
    }
    m
  }

  /** BPE symbol sequence of one word: seed with single characters, then
    * repeatedly merge ALL non-overlapping occurrences of the lowest-rank
    * adjacent pair, left to right (replace()'s match rule — BPE's
    * within-rank greedy scan).
    *
    * Seeds are CODE POINTS, not UTF-16 units: a charAt loop would split a
    * supplementary character (emoji, mathematical alphanumerics — routine
    * in web text) into two unpaired-surrogate symbols that can never
    * re-merge and serialize as U+FFFD — while the SQL oracle, the regex
    * seed path, and Spark's own string builtins all operate on code
    * points. Caught by the round-11 unicode parity sweep. */
  def encode(word: String): Array[String] = {
    if (word.isEmpty) return Array.empty
    val syms = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      syms(k) = new String(Character.toChars(cp))
      k += 1
      i += Character.charCount(cp)
    }
    var n = syms.length
    var done = n < 2
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val r = rank.get(syms(j) + "\u0000" + syms(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val a = merges(best)._1
        val b = merges(best)._2
        val ab = a + b
        var w = 0
        var r2 = 0
        while (r2 < n) {
          if (r2 < n - 1 && syms(r2) == a && syms(r2 + 1) == b) { syms(w) = ab; r2 += 2 }
          else { syms(w) = syms(r2); r2 += 1 }
          w += 1
        }
        n = w
        done = n < 2
      }
    }
    java.util.Arrays.copyOf(syms, n)
  }

  def countWord(word: String): Long = encode(word).length.toLong

  /** Flat BPE token stream of a whole text: every word's symbol sequence,
    * all joined by single spaces — the materialized tokenizer OUTPUT (what
    * a training pipeline writes), where countText is only its length.
    * Empty tokens (double spaces) contribute nothing. */
  def encodeText(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val starts = ShingleBytes.tokenStarts(bytes)
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    var first = true
    var i = 0
    while (i < starts.length) {
      val from = starts(i)
      val until = if (i + 1 < starts.length) starts(i + 1) - 1 else bytes.length
      if (until > from) {
        val toks = encode(new String(bytes, from, until - from, java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < toks.length) {
          if (!first) sb.append(' ')
          sb.append(toks(j))
          first = false
          j += 1
        }
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Sum of per-word symbol counts over a single-space-tokenized text —
    * split(text, ' ') semantics (empty tokens contribute 0 symbols). */
  def countText(text: UTF8String): Long = {
    val bytes = text.getBytes
    val starts = ShingleBytes.tokenStarts(bytes)
    var total = 0L
    var i = 0
    while (i < starts.length) {
      val from = starts(i)
      val until = if (i + 1 < starts.length) starts(i + 1) - 1 else bytes.length
      if (until > from)
        total += countWord(new String(bytes, from, until - from, java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    total
  }
}

/** Per-document BPE token count under `merges` — the real-token budget
  * expression text_tokens and pipeline_pack_bpe run on. Participates in
  * whole-stage codegen (the generated code calls the coder held as a
  * codegen reference object — no interpreted fallback on the hot path). */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val coder = new BpeCoder(merges)

  override def nullSafeEval(input: Any): Any =
    coder.countText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeCoder", coder, classOf[BpeCoder].getName)
      s"${ev.value} = $ref.countText($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document BPE token STREAM under `merges` — the tokenizer's
  * materialized output (space-joined symbol sequence), same coder and
  * codegen shape as BpeCountExpr. */
case class BpeEncodeExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val coder = new BpeCoder(merges)

  override def nullSafeEval(input: Any): Any =
    coder.encodeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("bpeCoder", coder, classOf[BpeCoder].getName)
      s"${ev.value} = $ref.encodeText($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeExpressions {
  def bpeCount(text: Column, merges: Seq[(String, String)]): Column =
    CatalystBridge.column(BpeCountExpr(CatalystBridge.expression(text), merges))

  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    CatalystBridge.column(BpeEncodeExpr(CatalystBridge.expression(text), merges))
}

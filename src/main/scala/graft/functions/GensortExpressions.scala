package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.CatalystBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Bit-faithful re-expression of the gensort 1.1 record generator — the
  * published algorithm behind the reference's TeraGen
  * (hadoop-mapreduce-examples/src/main/java/org/apache/hadoop/examples/
  * terasort/GenSort.java:39, Random16.java:45, Unsigned16.java:162,
  * TeraGen.java). The gated `mr_teragen` keeps its md5-derived records (any
  * engine replays them, so the DuckDB oracle hash-verifies); this path
  * produces the EXACT gensort bytes for interop with reference TeraSort
  * outputs and published sort-benchmark tooling.
  *
  * The generator is the 128-bit LCG X_{n+1} = (A*X_n + C) mod 2^128 with
  * the L'Ecuyer multiplier A = 0x2360ed051fc65da44385df649fccf645 and odd
  * increment C = 0x4a696d47726179524950202020202001 (constants published in
  * Random16.java's javadoc, from rand16.c). Parallel generation skips ahead
  * by composing powers of two of the map: f^2 has multiplier a^2 and
  * increment (a+1)c, so the whole skip table DERIVES from (A, C) by
  * repeated squaring — nothing is copied, and record n is computable from n
  * alone on any partition (the property TeraGen's mapper relies on).
  */
object GensortLcg {

  val A = BigInt("2360ed051fc65da44385df649fccf645", 16)
  val C = BigInt("4a696d47726179524950202020202001", 16)
  private val Mask = (BigInt(1) << 128) - 1

  /** (multiplier, increment) of f^(2^i), i in 0..63, by repeated squaring:
    * f^(2m)(x) = f^m(f^m(x)) = a_m^2 x + (a_m + 1) c_m. */
  private lazy val skipTable: Array[(BigInt, BigInt)] = {
    val t = new Array[(BigInt, BigInt)](64)
    t(0) = (A, C)
    var i = 1
    while (i < 64) {
      val (a, c) = t(i - 1)
      t(i) = ((a * a) & Mask, ((a + 1) * c) & Mask)
      i += 1
    }
    t
  }

  /** X_n = f^n(0): powers of the same affine map commute, so composing the
    * set bits of n in any order advances a seed of 0 by exactly n steps. */
  def skipAhead(n: Long): BigInt = {
    require(n >= 0, s"record count must be non-negative, got $n")
    var x = BigInt(0)
    var i = 0
    while (i < 64) {
      if ((n & (1L << i)) != 0L) {
        val (a, c) = skipTable(i)
        x = (a * x + c) & Mask
      }
      i += 1
    }
    x
  }

  def nextRand(x: BigInt): BigInt = (A * x + C) & Mask

  /** Big-endian byte i (0 = most significant) of a 128-bit value. */
  def byteAt(x: BigInt, i: Int): Byte = ((x >> (120 - 8 * i)) & 0xff).toByte

  /** The 32 hex digits of a 128-bit value, most significant first,
    * uppercase — Unsigned16.getHexDigit's character set. */
  def hex32(x: BigInt): String = {
    val s = x.toString(16).toUpperCase
    "0" * (32 - s.length) + s
  }

  /** The 100-byte binary gensort record for 0-based record number `rec`
    * (GenSort.generateRecord layout):
    *   [0..9]   key: high 10 bytes of the record's 128-bit random number
    *            (the number after rec+1 LCG steps from seed 0 — gensort
    *            skips to the record offset, then draws once per record)
    *   [10..11] break bytes 0x00 0x11
    *   [12..43] record number as 32 uppercase ascii hex digits
    *   [44..47] break bytes 0x88 0x99 0xAA 0xBB
    *   [48..95] filler: random hex digits 20..31 as ascii, each repeated 4x
    *   [96..99] break bytes 0xCC 0xDD 0xEE 0xFF */
  def record(rec: Long): Array[Byte] = {
    val rand = nextRand(skipAhead(rec))
    val buf = new Array[Byte](100)
    var i = 0
    while (i < 10) { buf(i) = byteAt(rand, i); i += 1 }
    buf(10) = 0x00
    buf(11) = 0x11
    val recHex = hex32(BigInt(rec) & Mask)
    i = 0
    while (i < 32) { buf(12 + i) = recHex.charAt(i).toByte; i += 1 }
    buf(44) = 0x88.toByte
    buf(45) = 0x99.toByte
    buf(46) = 0xAA.toByte
    buf(47) = 0xBB.toByte
    val randHex = hex32(rand)
    i = 0
    while (i < 12) {
      val ch = randHex.charAt(20 + i).toByte
      buf(48 + i * 4) = ch
      buf(49 + i * 4) = ch
      buf(50 + i * 4) = ch
      buf(51 + i * 4) = ch
      i += 1
    }
    buf(96) = 0xCC.toByte
    buf(97) = 0xDD.toByte
    buf(98) = 0xEE.toByte
    buf(99) = 0xFF.toByte
    buf
  }
}

/** Per-row gensort record from a LongType record number — partition-parallel
  * by construction (record n depends on n alone via the skip-ahead). */
case class GensortRecordExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_gensort_record"

  override def nullSafeEval(input: Any): Any =
    GensortLcg.record(input.asInstanceOf[Long])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GensortExpressions {
  def gensortRecord(recordNumber: Column): Column =
    CatalystBridge.column(GensortRecordExpr(CatalystBridge.expression(recordNumber)))
}

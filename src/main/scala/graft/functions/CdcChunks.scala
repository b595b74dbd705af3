package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native content-defined-chunking expression: all CDC chunk hashes of
  * `text` as one `ARRAY<BIGINT>`, computed in a single codegen'd scan-side
  * call.
  *
  * Semantics (identical to the round-4 window formulation and its DuckDB
  * oracle, which is unchanged): split `text` on single spaces (empties
  * kept), cut a chunk boundary AFTER every word whose h60 ≡ 0 (mod `mask+1`),
  * and emit `h60(chunkWords.mkString(" "))` per chunk in document order.
  * h60 is the engine-wide 60-bit digest — the first 15 hex chars of the
  * MD5 of the UTF-8 bytes (`XHash.h60` / `sqlH60`) — reproduced here as
  * the top 60 bits of the first 8 digest bytes (same nibbles, no hex
  * round-trip).
  *
  * Why an expression and not operators: the round-4 shape paid a full
  * corpus explode (1-grams), a doc-keyed window exchange to prefix-sum
  * boundary flags into chunk ids, and a (doc,chunk) aggregation whose
  * `collect_list` + per-chunk array sort existed only to reassemble
  * adjacency the scan already had — two corpus-sized shuffles and a sort
  * per chunk that this expression replaces with zero shuffles and one
  * sequential pass per document (VERDICT r4 item 6). The chunking logic is
  * inherently sequential per document (each boundary depends only on the
  * local word), so a per-row loop is the natural physical form; at 100 TB
  * the consumer's first exchange is now the chunk-hash frequency
  * aggregation itself.
  */
case class CdcChunks(child: Expression, mask: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(mask >= 1 && ((mask & (mask + 1)) == 0),
    s"mask must be 2^k - 1, got $mask")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], mask)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row: the row stays inside whole-stage codegen
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunks.compute($c, $mask)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  private val Space = UTF8String.fromString(" ")

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** h60 of a UTF8String: top 60 bits of the MD5 digest — bit-identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)` (first 15 hex nibbles). */
  def h60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** CDC chunk hashes of `text`: boundary after every word with
    * h60 % (mask+1) == 0; each chunk hashed as its space-joined words. */
  def compute(text: UTF8String, mask: Int): ArrayData = {
    val words = text.split(Space, -1)
    val out = new java.util.ArrayList[Any](words.length / (mask + 1) + 2)
    var start = 0
    var i = 0
    while (i < words.length) {
      if ((h60(words(i)) & mask) == 0L) {
        // close the chunk [start..i] INCLUDING the boundary word
        val slice = new Array[UTF8String](i - start + 1)
        System.arraycopy(words, start, slice, 0, slice.length)
        out.add(java.lang.Long.valueOf(h60(UTF8String.concatWs(Space, slice: _*))))
        start = i + 1
      }
      i += 1
    }
    if (start < words.length) {
      val slice = new Array[UTF8String](words.length - start)
      System.arraycopy(words, start, slice, 0, slice.length)
      out.add(java.lang.Long.valueOf(h60(UTF8String.concatWs(Space, slice: _*))))
    }
    new GenericArrayData(out.toArray)
  }

  /** Registers `cdc_chunks(text, mask)` in the session registry (once per
    * session — [[Registry.registerOnce]]) so the expression is reachable
    * from `expr` and SQL. */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "cdc_chunks")(
      exprs => CdcChunks(exprs(0), exprs(1).eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"cdc_chunks mask must be an integer literal, got $other")
      }))
}

package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst consecutive-bigram pair builder (round 13): all
  * `(g1, g2)` pairs of OVERLAPPING word bigrams of `text` as one
  * `ARRAY<STRUCT<g1: STRING, g2: STRING>>` — for "a b c d" the pairs
  * `[("a b","b c"), ("b c","c d")]`; docs with fewer than 3 words yield an
  * empty array.
  *
  * This is the graph family's edge generator (community, pagerank,
  * linkpred, kcore, assortativity all build the bigram co-occurrence graph
  * from the two overlapping bigrams inside each trigram). The round-4..12
  * shape computed it as `kgrams(text, 3)` → `split(item, ' ')` →
  * 2 × `concat_ws` — materializing every trigram string only to re-split
  * it and re-join its halves, i.e. each corpus token was copied into ~3
  * trigram strings, ~6 split-out word strings, and ~4 bigram strings per
  * row. Here the split happens ONCE per doc and each bigram string is
  * built ONCE and shared by the two pairs referencing it (guide §1.2 step
  * 2: per-task work). Emitted pairs are byte-identical to the old
  * construction: bigram i = words[i] + " " + words[i+1] under the same
  * `split(text, ' ')` convention (empties kept) as [[KGrams]], which is
  * also the oracle SQL's `string_split` convention, and sub-3-word docs
  * contribute nothing (the old pipeline filtered their whole-text item out
  * with `size(split(item)) === 3`).
  */
case class BigramPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("g1", StringType, nullable = false),
      StructField("g2", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "bigram_pairs"

  override def nullSafeEval(input: Any): Any =
    BigramPairs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row: the row stays inside whole-stage codegen
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramPairs.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): BigramPairs =
    copy(child = newChild)
}

object BigramPairs {

  private val Space = UTF8String.fromString(" ")

  /** All consecutive-bigram pairs of `text` (split on single spaces,
    * empties kept); empty array for sub-3-word docs. The n-1 bigram
    * strings are built once and shared by the n-2 pairs. */
  def compute(text: UTF8String): ArrayData = {
    val words = text.split(Space, -1)
    val n = words.length
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val bg = new Array[UTF8String](n - 1)
    var i = 0
    while (i < n - 1) {
      bg(i) = UTF8String.concatWs(Space, words(i), words(i + 1))
      i += 1
    }
    val out = new Array[Any](n - 2)
    i = 0
    while (i < n - 2) {
      out(i) = new GenericInternalRow(Array[Any](bg(i), bg(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Registers `bigram_pairs(text)` once per session ([[Registry.registerOnce]]). */
  def register(spark: SparkSession): Unit =
    Registry.registerOnce(spark, "bigram_pairs")(exprs => BigramPairs(exprs(0)))
}

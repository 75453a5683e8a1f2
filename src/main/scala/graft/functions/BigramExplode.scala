package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst Generator (the UDTF surface, SURVEY.md §2.9
  * `text_ngram_bigram`): explodes a token array into (pos, bigram) rows,
  * pos 1-based.
  *
  * Why a Generator rather than a posexplode+self-zip: one pass, no join, no
  * extra shuffle — rows are produced inline in the scan stage, which is the
  * shape that survives a 100 TB corpus (generation is embarrassingly
  * parallel per document). CodegenFallback is acceptable here because
  * generators sit at stage boundaries; the surrounding projections still
  * codegen.
  */
case class BigramExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private val space = UTF8String.fromString(" ")

  override def elementSchema: StructType = new StructType()
    .add("pos", IntegerType, nullable = false)
    .add("bigram", StringType, nullable = false)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val data = child.eval(input)
    if (data == null) return Iterator.empty
    val arr = data.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) Iterator.empty
    else (0 until n - 1).iterator.map { i =>
      val bg = UTF8String.concat(arr.getUTF8String(i), space,
        arr.getUTF8String(i + 1))
      InternalRow(i + 1, bg)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): BigramExplode =
    copy(child = newChild)
}

object BigramExplode {
  /** Register `bigrams(array<string>)` as a SQL generator function. */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("bigrams",
        (exprs: Seq[Expression]) => BigramExplode(exprs.head), "scala_udf")
}

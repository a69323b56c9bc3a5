package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native per-row HTML-to-text extraction (rule set + rationale:
 * [[graft.operators.Html]] Scaladoc). A stateful linear-scan tokenizer is
 * not expressible as a Catalyst HOF chain at all (raw-text modes and
 * quote-aware tag scanning need a real state machine), so this is the
 * (b)-tier custom Expression the build rules prescribe; CodegenFallback
 * costs one virtual call per DOCUMENT against a |html|-sized scan inside.
 */
case class HtmlExtract(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.operators.Html.extractText(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Main-content (boilerplate-aware) extraction — rule set + rationale:
 * [[graft.operators.Html.mainContent]] Scaladoc (subtree pruning + block
 * segmentation + integer-ppm link density + length/heading rules). Same
 * expression tier as [[HtmlExtract]]: a stateful linear scan per row,
 * CodegenFallback costs one virtual call per document.
 */
case class HtmlMainExtract(child: Expression, minWords: Int, maxLinkPpm: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "html_main"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.operators.Html.mainContent(
      input.asInstanceOf[UTF8String].toString, minWords, maxLinkPpm))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HtmlText {
  /** Column face of [[HtmlExtract]]. */
  def extract(html: Column): Column =
    ExpressionUtils.column(HtmlExtract(ExpressionUtils.expression(html)))

  /** Column face of [[HtmlMainExtract]]. */
  def mainContent(html: Column, minWords: Int = 10,
      maxLinkPpm: Int = 330000): Column =
    ExpressionUtils.column(HtmlMainExtract(
      ExpressionUtils.expression(html), minWords, maxLinkPpm))
}

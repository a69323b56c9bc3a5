package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native per-row URL normalization (rule set: [[graft.operators.Urls]]
 * Scaladoc). Multi-phase parsing with stateful dot-segment resolution —
 * not a HOF shape; CodegenFallback is one virtual call per row against
 * a |url|-sized scan inside (same trade as [[HtmlExtract]]).
 */
case class CanonicalizeUrl(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.operators.Urls.canonicalizeUrl(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Registrable domain of a host string — public suffix + one label. */
case class RegisteredDomain(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "registered_domain"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      graft.operators.Urls.registeredDomain(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Url {
  def canonicalize(url: Column): Column =
    ExpressionUtils.column(CanonicalizeUrl(ExpressionUtils.expression(url)))

  def registeredDomain(host: Column): Column =
    ExpressionUtils.column(RegisteredDomain(ExpressionUtils.expression(host)))
}

package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick (feature-hashed) bag-of-words text vector, the signed
  * variant (Weinberger et al.): every token draws a bucket and a sign
  * from its md5, and the vector is the per-bucket signed count — a
  * train-free, vocabulary-free embedding whose dot products approximate
  * token-overlap kernels, exactly reproducible in any engine with md5.
  *
  *  - tokens = `split(trim(text), "\\s+")` semantics (the
  *    [[WinnowFpsImpl]] contract: SQL trim, Java-regex split, limit -1);
  *  - draw = first 24 bits of md5 over the token's UTF-8 bytes (hex
  *    chars 1–6, the repo's cross-engine draw);
  *  - bucket = draw mod dim; sign = +1 iff the md5's 25th bit is 0 (hex
  *    char 7 in '0'..'7');
  *  - null / token-less text → the zero vector (norm 0; a consumer
  *    treats sim against it as 0), matching the composed form's
  *    coalesce.
  *
  * Integer counts, never floats — norms and dot products stay exact
  * int64 until a consumer divides.
  */
object HashedBowImpl {

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Never-null; zero vector for null/token-less input. */
  def bow(text: UTF8String, dim: Int): ArrayData = {
    val v = new Array[Long](dim)
    if (text == null) return new GenericArrayData(v)
    val trimmed = text.trim()
    if (trimmed.numBytes() == 0) return new GenericArrayData(v)
    val toks = trimmed.toString.split("\\s+", -1)
    val md = md5Local.get()
    var i = 0
    while (i < toks.length) {
      md.reset()
      md.update(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val d = md.digest()
      val draw = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
      val sign = if ((d(3) & 0x80) == 0) 1L else -1L
      v(draw % dim) += sign
      i += 1
    }
    new GenericArrayData(v)
  }
}

/** `hashed_bow(string, dim) → array<long>` as a native Catalyst
  * expression, dim fixed at plan time — see [[HashedBowImpl]]. Never
  * null.
  */
case class HashedBowExpr(child: Expression, dim: Int)
    extends UnaryExpression {
  require(dim >= 1, s"dim=$dim")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hashed_bow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $other")
  }

  override def eval(input: InternalRow): Any =
    HashedBowImpl.bow(child.eval(input).asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.HashedBowImpl.bow(
            ${childGen.isNull} ? null : ${childGen.value}, $dim);""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedBowExpr =
    copy(child = newChild)
}

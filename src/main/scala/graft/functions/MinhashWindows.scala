package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all k MinHash values from one pass over the
  * per-shingle digest array.
  *
  * The composable form — k separate `array_min(transform(shh, h ->
  * substring(h, 1+4i, 4)))` projections — walks the digest array k times
  * and evaluates each substring through an interpreted lambda; on the
  * dedup paths that derivation is the corpus-wide hot loop. This
  * expression produces the identical k minima (lexicographic min over the
  * same 4-hex-char windows — ASCII, so byte compare == SQL string min) in
  * a single traversal. It carries doGenCode, so it whole-stage-codegens
  * wherever its projection is codegen-able; collapsed next to the
  * higher-order digest transform the projection runs interpreted either
  * way, and the win there is the k×-fewer array passes.
  *
  * Digests shorter than k·w characters contribute nothing to windows past
  * their end (cannot happen with md5's fixed 32 hex chars, which is the
  * only producer); an empty input array yields an array of k nulls — the
  * same as array_min over an empty transform result.
  */
case class MinhashWindows(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires ARRAY<STRING>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[UTF8String](k)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getUTF8String(i)
        var j = 0
        while (j < k) {
          if (h.numChars() >= (j + 1) * w) {
            val win = h.substring(j * w, (j + 1) * w)
            if (mins(j) == null || win.compareTo(mins(j)) < 0) mins(j) = win
          }
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins.asInstanceOf[Array[Any]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val win = ctx.freshName("win")
      val mins = ctx.freshName("mins")
      s"""
         |UTF8String[] $mins = new UTF8String[$k];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $h = $a.getUTF8String($i);
         |    for (int $j = 0; $j < $k; $j++) {
         |      if ($h.numChars() >= ($j + 1) * $w) {
         |        UTF8String $win = $h.substring($j * $w, ($j + 1) * $w);
         |        if ($mins[$j] == null || $win.compareTo($mins[$j]) < 0) $mins[$j] = $win;
         |      }
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData((Object[]) $mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashWindows =
    copy(child = newChild)
}

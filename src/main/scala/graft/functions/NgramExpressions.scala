package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent word 2-grams of a token array in one fused pass.
  *
  * The composed form (`transform(sequence(...), i -> concat_ws(" ",
  * slice(toks, i+1, 2)))`) re-evaluates the token-array child once PER
  * ELEMENT through the interpreted lambda — O(n²) splits per document —
  * which made the bigram-based queries the slowest in the suite. Here the
  * child is evaluated once and a primitive loop emits the n-1 pair joins,
  * so bigram construction stays inside whole-stage codegen and is linear.
  *
  * Output order and content are identical to the composed form (and to the
  * DuckDB `list_transform(generate_series(...))` twin): [] when fewer than
  * 2 tokens, else ["t0 t1", "t1 t2", ...]. */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  // containsNull follows the child: UTF8String.concat null-propagates, so
  // a null token yields a null bigram — declaring containsNull = false for
  // a nullable-element input would lie to downstream operators
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def prettyName: String = "graft_bigrams"

  private val SPACE = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = math.max(n - 1, 0)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concat(x.getUTF8String(i), SPACE, x.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val space = ctx.addReferenceObj("space", SPACE, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      s"""
         |int $m = java.lang.Math.max($a.numElements() - 1, 0);
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  new org.apache.spark.unsafe.types.UTF8String[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $arr[$i] = org.apache.spark.unsafe.types.UTF8String.concat(
         |    $a.getUTF8String($i), $space, $a.getUTF8String($i + 1));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): WordBigrams =
    copy(child = c)
}

/** Adjacent word k-grams of a token array in one fused pass — the
  * general-k sibling of [[WordBigrams]] (kept separate so the bigram
  * plan shape stays pinned). Same rationale: the composed
  * `transform(sequence(...), i -> concat(element_at(tk, i), ...))` form
  * re-evaluates the token-array child once per element_at — O(k·n)
  * tokenizations per document — where this loop evaluates it once.
  * Output matches the composed form exactly: [] when fewer than k
  * tokens, else ["t0 .. t(k-1)", "t1 .. tk", ...] space-joined. */
case class WordNgrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2, "k >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  // containsNull follows the child, as in WordBigrams: UTF8String.concat
  // null-propagates a null token into a null n-gram
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def prettyName: String = s"graft_${k}grams"

  private val SPACE = UTF8String.fromString(" ")

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = math.max(n - k + 1, 0)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](2 * k - 1)
      var j = 0
      while (j < k) {
        if (j > 0) parts(2 * j - 1) = SPACE
        parts(2 * j) = x.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val space = ctx.addReferenceObj("space", SPACE, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val arr = ctx.freshName("arr")
      val parts = ctx.freshName("parts")
      s"""
         |int $m = java.lang.Math.max($a.numElements() - ${k - 1}, 0);
         |org.apache.spark.unsafe.types.UTF8String[] $arr =
         |  new org.apache.spark.unsafe.types.UTF8String[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  org.apache.spark.unsafe.types.UTF8String[] $parts =
         |    new org.apache.spark.unsafe.types.UTF8String[${2 * k - 1}];
         |  for (int $j = 0; $j < $k; $j++) {
         |    if ($j > 0) $parts[2 * $j - 1] = $space;
         |    $parts[2 * $j] = $a.getUTF8String($i + $j);
         |  }
         |  $arr[$i] = org.apache.spark.unsafe.types.UTF8String.concat($parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): WordNgrams =
    copy(child = c)
}

object NgramExpressions {
  /** Bigram array of a token-array column via the fused native loop. */
  def bigramsNative(tokens: Column): Column =
    ColumnBridge.column(WordBigrams(ColumnBridge.expression(tokens)))

  /** k-gram array of a token-array column via the fused native loop. */
  def ngramsNative(tokens: Column, k: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(tokens), k))
}

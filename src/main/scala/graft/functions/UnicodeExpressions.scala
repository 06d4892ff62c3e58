package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression.
  *
  * A multilingual corpus carries the same grapheme in different codepoint
  * sequences — 'é' as U+00E9 or as 'e' + U+0301 — so byte-level exact
  * dedup, fingerprints, token counts and vocabulary joins all silently
  * treat equal-looking text as distinct. Canonical composition (NFC) is
  * the standard fix and is engine-portable: java.text.Normalizer here and
  * DuckDB's `nfc_normalize` implement the same Unicode canonical
  * composition, so normalized output is hash-comparable across engines.
  *
  * The ASCII fast path matters at 100 TB: NFC is the identity on pure
  * ASCII, and most bytes in a web corpus are ASCII, so the generated code
  * scans for a non-ASCII byte first and only materializes a Java String
  * (and the Normalizer call) when one exists. Spark itself has no NFC
  * builtin — a Scala UDF would pay serialization and break codegen; this
  * stays inside whole-stage codegen. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(a: Any): Any =
    NfcNormalize.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($a);")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

object NfcNormalize {
  /** Static kernel shared by eval and codegen: ASCII inputs return the
    * input UTF8String untouched (no String allocation); anything else
    * goes through java.text.Normalizer NFC. */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { // one linear byte scan; >= 0x80 ends it
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }

  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}

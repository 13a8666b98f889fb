package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single tight expression: for each of `k`
  * seeds, the lexicographic minimum of md5(shingle '#' seed) over the
  * input shingle array.
  *
  * Value-identical to the declarative form
  * `transform(sequence(0,k-1), s -> array_min(transform(sh, x ->
  * md5(concat(x,'#',s)))))` (and to the DuckDB twin) — the md5 hex and
  * string ordering are byte-equal — but evaluated as one loop over
  * `k × |sh|` digests instead of nested interpreted lambdas with
  * per-element allocation. Shuffle-free per-row work, so it scales as
  * pure map parallelism; CodegenFallback is fine because the loop body
  * dominates, not expression dispatch.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_minhash"

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, data: Array[Byte]): String = {
    val d = md.digest(data)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val md = MessageDigest.getInstance("MD5")
    val shingleBytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      shingleBytes(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    val sig = new Array[Any](k)
    var s = 0
    while (s < k) {
      val suffix = s"#$s".getBytes("UTF-8")
      var best: String = null
      var j = 0
      while (j < n) {
        val payload = new Array[Byte](shingleBytes(j).length + suffix.length)
        System.arraycopy(shingleBytes(j), 0, payload, 0, shingleBytes(j).length)
        System.arraycopy(suffix, 0, payload, shingleBytes(j).length, suffix.length)
        val h = md5Hex(md, payload)
        if (best == null || h.compareTo(best) < 0) best = h
        j += 1
      }
      sig(s) = UTF8String.fromString(if (best == null) "" else best)
      s += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object TextOps {
  /** k-hash MinHash signature of an array<string> column. */
  def minhashSig(shingles: Column, k: Int): Column =
    GraftSqlBridge.toColumn(
      MinHashSignature(GraftSqlBridge.toExpression(shingles), k))
}

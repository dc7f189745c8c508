package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (SURVEY.md §2.E4/E11 fast paths).
  *
  * The composed-expression SimHash (operators.Dedup.simhash) evaluates
  * 64 higher-order aggregates per row — 64 passes over the token array.
  * [[SimHash64]] computes the same signature in ONE pass with primitive
  * arrays, inside whole-stage codegen (16.7s → sub-second at sf0.1).
  * [[RollingHash]] is a 64-bit polynomial rolling hash over a string's
  * UTF-8 bytes — the classic content-fingerprint primitive, cheaper
  * than md5 and natively codegen'd.
  */
object NativeHash {

  /** One-pass SimHash over UTF-8 token bytes; xxhash64 seed 42 matches
    * Spark's `xxhash64` function, so the composed-expression variant
    * produces identical signatures (asserted in NativeExprSpec).
    */
  def simhash64(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = tokens.numElements()
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val s = tokens.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** 64-bit running content hash over UTF-8 bytes (FNV-1a) —
    * deterministic, endianness-free, allocation-free. NOT base-31
    * polynomial: that has trivial two-byte collisions ("Aa" ≡ "BB"),
    * caught by PropertySpec's collision sweep.
    */
  def rollingHash(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    h
  }
}

/** simhash64(array<string>) → long. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs array<string>, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    NativeHash.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeHash.simhash64($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** rolling_hash(string) → long. */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"rolling_hash needs string, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    NativeHash.rollingHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeHash.rollingHash($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Column-API + SQL-registry surface for the native expressions. */
object NativeFunctions {
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  def rollingHash(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))

  /** Expose as SQL functions (`SELECT simhash64(...)`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "built-in")
  }
}

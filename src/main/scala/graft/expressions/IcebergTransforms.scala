package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Iceberg `bucket[N]` partition transform as a codegen'd Catalyst
  * expression — the hash is the SPEC's (Appendix B): standard
  * murmur3_x86_32 with seed 0 over the single-value binary form of the
  * source value (int/long/date promote to an 8-byte little-endian
  * long — the spec hashes int and long identically so the transform
  * survives type widening; strings hash their UTF-8 bytes), then
  * `(hash & Integer.MAX_VALUE) % N`.
  *
  * Correctness stakes: a FOREIGN Iceberg reader prunes files by these
  * tuple values — a wrong bucket here would make real readers silently
  * skip data. IcebergTransformSpec pins the spec's own published test
  * vectors (hash(34L) = 2017239379, hash("iceberg") = 1210000089,
  * hash(date 2017-11-16) = -653330422). Spark's
  * `Murmur3_x86_32.hashUnsafeBytes2` is the standard tail-handling
  * variant that reproduces them (hashUnsafeBytes is NOT — it mixes
  * tail bytes one at a time).
  */
case class IcebergBucket(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets > 0, s"bucket[$numBuckets]: N must be positive")
  override def prettyName: String = s"graft_iceberg_bucket"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case IntegerType | LongType | DateType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bucket transform over $other is not supported " +
            "(int/long/date/string)")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType =>
      IcebergBucket.bucketUtf8(v.asInstanceOf[UTF8String], numBuckets)
    case IntegerType | DateType =>
      IcebergBucket.bucketLong(v.asInstanceOf[Int].toLong, numBuckets)
    case LongType =>
      IcebergBucket.bucketLong(v.asInstanceOf[Long], numBuckets)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cls = "graft.expressions.IcebergBucket"
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$cls.bucketUtf8($c, $numBuckets)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$cls.bucketLong((long) $c, $numBuckets)")
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IcebergBucket {
  import org.apache.spark.unsafe.Platform
  import org.apache.spark.unsafe.hash.Murmur3_x86_32

  /** Spec hash of an int/long/date/time/timestamp value: murmur3 of
    * the 8-byte little-endian long. */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    var x = v
    while (i < 8) { b(i) = (x & 0xff).toByte; x >>>= 8; i += 1 }
    Murmur3_x86_32.hashUnsafeBytes2(b, Platform.BYTE_ARRAY_OFFSET, 8, 0)
  }

  /** Spec hash of a string value: murmur3 of its UTF-8 bytes. */
  def hashUtf8(s: UTF8String): Int =
    Murmur3_x86_32.hashUnsafeBytes2(s.getBaseObject, s.getBaseOffset,
      s.numBytes(), 0)

  def bucketLong(v: Long, n: Int): Int =
    (hashLong(v) & Integer.MAX_VALUE) % n

  def bucketUtf8(s: UTF8String, n: Int): Int =
    (hashUtf8(s) & Integer.MAX_VALUE) % n
}

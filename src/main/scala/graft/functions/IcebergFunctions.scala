package graft.functions

import graft.core.{IcebergHash, IcebergType, IcebergTypes, Transforms}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static helpers invoked from both interpreted eval and generated Java code
 * (Scala top-level objects emit static forwarders, so codegen can call
 * `graft.functions.BucketUtil.bucketLong(...)` directly — keeps the
 * expressions inside whole-stage codegen).
 *
 * Hash semantics are Iceberg spec Appendix B, bit-exact with the reference
 * (reference: src/function/iceberg_scalar_functions.cpp:28-203,
 * src/core/expression/iceberg_hash.cpp:14-247).
 */
object BucketUtil {
  def pos(hash: Int, n: Int): Int = (hash & Integer.MAX_VALUE) % n
  def bucketLong(v: Long, n: Int): Int = pos(IcebergHash.hashLong(v), n)
  def bucketInt(v: Int, n: Int): Int = bucketLong(v.toLong, n)
  def bucketString(v: UTF8String, n: Int): Int = pos(IcebergHash.murmur3(v.getBytes), n)
  def bucketBinary(v: Array[Byte], n: Int): Int = pos(IcebergHash.murmur3(v), n)
  def bucketDecimal(v: Decimal, n: Int): Int =
    pos(IcebergHash.murmur3(v.toJavaBigDecimal.unscaledValue().toByteArray), n)
}

/** Truncate helpers (reference iceberg_scalar_functions.cpp:213-351).
  * Strings truncate on Unicode code points (Iceberg spec; the reference uses
  * grapheme clusters — documented deviation). */
object TruncUtil {
  def truncInt(v: Int, w: Int): Int = v - (((v % w) + w) % w)
  def truncLong(v: Long, w: Int): Long = v - (((v % w) + w) % w)
  def truncString(v: UTF8String, w: Int): UTF8String = {
    val s = v.toString
    if (s.codePointCount(0, s.length) <= w) v
    else UTF8String.fromString(s.substring(0, s.offsetByCodePoints(0, w)))
  }
  def truncBinary(v: Array[Byte], w: Int): Array[Byte] =
    if (v.length <= w) v else java.util.Arrays.copyOf(v, w)
  def truncDecimal(v: Decimal, w: Int): Decimal = {
    val bd = v.toJavaBigDecimal
    val rem = bd.unscaledValue().mod(java.math.BigInteger.valueOf(w.toLong))
    Decimal(new java.math.BigDecimal(bd.unscaledValue().subtract(rem), bd.scale()), v.precision, v.scale)
  }
}

/** `iceberg_bucket(n, v)` as a native Catalyst expression with codegen. */
case class IcebergBucketExpr(numBuckets: Int, child: Expression) extends UnaryExpression {
  require(numBuckets > 0, "bucket count must be positive")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "iceberg_bucket"

  private def dispatch: (String, Any => Int) = child.dataType match {
    case IntegerType | DateType => ("bucketInt", v => BucketUtil.bucketInt(v.asInstanceOf[Int], numBuckets))
    case LongType | TimestampType | TimestampNTZType =>
      ("bucketLong", v => BucketUtil.bucketLong(v.asInstanceOf[Long], numBuckets))
    case StringType => ("bucketString", v => BucketUtil.bucketString(v.asInstanceOf[UTF8String], numBuckets))
    case BinaryType => ("bucketBinary", v => BucketUtil.bucketBinary(v.asInstanceOf[Array[Byte]], numBuckets))
    case _: DecimalType => ("bucketDecimal", v => BucketUtil.bucketDecimal(v.asInstanceOf[Decimal], numBuckets))
    case other => throw new IllegalArgumentException(s"iceberg_bucket unsupported for type $other")
  }

  override protected def nullSafeEval(input: Any): Any = dispatch._2(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = dispatch._1
    defineCodeGen(ctx, ev, c => s"graft.functions.BucketUtil.$fn($c, $numBuckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

/** `iceberg_truncate(w, v)` as a native Catalyst expression with codegen. */
case class IcebergTruncateExpr(width: Int, child: Expression) extends UnaryExpression {
  require(width > 0, "truncate width must be positive")
  override def dataType: DataType = child.dataType
  override def prettyName: String = "iceberg_truncate"

  private def dispatch: (String, Any => Any) = child.dataType match {
    case IntegerType => ("truncInt", v => TruncUtil.truncInt(v.asInstanceOf[Int], width))
    case LongType => ("truncLong", v => TruncUtil.truncLong(v.asInstanceOf[Long], width))
    case StringType => ("truncString", v => TruncUtil.truncString(v.asInstanceOf[UTF8String], width))
    case BinaryType => ("truncBinary", v => TruncUtil.truncBinary(v.asInstanceOf[Array[Byte]], width))
    case _: DecimalType => ("truncDecimal", v => TruncUtil.truncDecimal(v.asInstanceOf[Decimal], width))
    case other => throw new IllegalArgumentException(s"iceberg_truncate unsupported for type $other")
  }

  override protected def nullSafeEval(input: Any): Any = dispatch._2(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = dispatch._1
    defineCodeGen(ctx, ev, c => s"graft.functions.TruncUtil.$fn($c, $width)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object IcebergFunctions {
  @volatile private var registered = Set.empty[SparkSession]

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case _ => throw new IllegalArgumentException(s"$what must be a literal integer, got $e")
  }

  /** Register `iceberg_bucket` / `iceberg_truncate` in the session function
    * registry so both SQL and `call_function` resolve them. Idempotent. */
  def register(spark: SparkSession): Unit = {
    if (registered.contains(spark)) return
    synchronized {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction("iceberg_bucket",
        (args: Seq[Expression]) => IcebergBucketExpr(litInt(args.head, "bucket count"), args(1)), "built-in")
      reg.createOrReplaceTempFunction("iceberg_truncate",
        (args: Seq[Expression]) => IcebergTruncateExpr(litInt(args.head, "truncate width"), args(1)), "built-in")
      // Geometry surface: WKB envelope + bbox-overlap predicate (the
      // engine's form of the reference's `geom && <box>`). UDF kernels —
      // no Spark builtin parses WKB; file-level pruning happens in
      // Pruning.fileStatsMatch against Appendix D bounds, so the UDF only
      // sees rows of files that survived.
      spark.udf.register("st_bbox", (wkb: Array[Byte]) =>
        graft.core.Wkb.envelope(wkb).map(e => Array(e._1, e._2, e._3, e._4)).orNull)
      spark.udf.register("st_intersects_bbox",
        (wkb: Array[Byte], x1: Double, y1: Double, x2: Double, y2: Double) =>
          graft.core.Wkb.envelope(wkb).exists(e =>
            graft.core.Wkb.intersects(e._1, e._2, e._3, e._4, x1, y1, x2, y2)))
      registered += spark
    }
  }

  private def active: SparkSession = {
    val s = SparkSession.active
    register(s)
    s
  }

  /** DataFrame-API entry: bucket transform column. */
  def icebergBucket(n: Int, c: Column, src: IcebergType = null): Column = {
    active
    call_function("iceberg_bucket", lit(n), c)
  }

  /** DataFrame-API entry: truncate transform column. */
  def icebergTruncate(w: Int, c: Column, src: IcebergType = null): Column = {
    active
    call_function("iceberg_truncate", lit(w), c)
  }
}

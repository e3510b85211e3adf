package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Iceberg partition transforms: parse, apply to values (driver-side, for
 * pruning and write planning), apply as Spark Columns (write path), and the
 * transform-aware predicate truth tables used by file pruning.
 *
 * Semantics mirror the reference transform layer
 * (reference: src/include/core/expression/iceberg_transform.hpp:64-343):
 * identity compares exactly; truncate/year/month/day/hour are monotone so
 * range predicates compare loosely on transformed bounds; bucket supports
 * only equality within [lowerBucket, upperBucket], never ranges.
 */
sealed trait Transform {
  /** Result type of transform applied to a source of type `src`. */
  def resultType(src: IcebergType): IcebergType
  /** Apply driver-side to a JVM value (already in "internal" form: Int days
    * for date, Long micros for timestamps, String, numbers, Array[Byte]). */
  def apply(v: Any, src: IcebergType): Any
  /** Spark Column computing the transform (for writes). `c` is the source
    * column; `src` its Iceberg type. */
  def column(c: Column, src: IcebergType): Column
  /** Monotone transforms preserve ordering => range pruning is valid. */
  def preservesOrder: Boolean
}

object Transforms {
  import IcebergTypes._

  private val EPOCH_DAY = java.time.LocalDate.ofEpochDay(0)

  /** Floor division (pre-epoch values round toward negative infinity —
    * reference iceberg_transform.hpp:266-269). */
  def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)

  case object Identity extends Transform {
    def resultType(src: IcebergType) = src
    def apply(v: Any, src: IcebergType): Any = v
    def column(c: Column, src: IcebergType): Column = c
    def preservesOrder = true
    override def toString = "identity"
  }

  case object Void extends Transform {
    def resultType(src: IcebergType) = src
    def apply(v: Any, src: IcebergType): Any = null
    def column(c: Column, src: IcebergType): Column = lit(null)
    def preservesOrder = false
    override def toString = "void"
  }

  case class Bucket(n: Int) extends Transform {
    def resultType(src: IcebergType) = IntT
    def apply(v: Any, src: IcebergType): Any =
      if (v == null) null else (IcebergHash.hash(v, src) & Integer.MAX_VALUE) % n
    def column(c: Column, src: IcebergType): Column = IcebergFunctionsBridge.bucket(n, c, src)
    def preservesOrder = false
    override def toString = s"bucket[$n]"
  }

  case class Truncate(w: Int) extends Transform {
    def resultType(src: IcebergType) = src
    def apply(v: Any, src: IcebergType): Any = truncateValue(v, w, src)
    def column(c: Column, src: IcebergType): Column = IcebergFunctionsBridge.truncate(w, c, src)
    def preservesOrder = true
    override def toString = s"truncate[$w]"
  }

  /** Temporal transforms work on internal values: DateT = Int days from
    * epoch; Timestamp*: Long micros from epoch (UTC). */
  case object Year extends Transform {
    def resultType(src: IcebergType) = IntT
    def apply(v: Any, src: IcebergType): Any = temporal(v, src)(d => EPOCH_DAY.plusDays(d).getYear - 1970)
    def column(c: Column, src: IcebergType): Column = year(toDateCol(c, src)) - lit(1970)
    def preservesOrder = true
    override def toString = "year"
  }
  case object Month extends Transform {
    def resultType(src: IcebergType) = IntT
    def apply(v: Any, src: IcebergType): Any = temporal(v, src) { d =>
      val ld = EPOCH_DAY.plusDays(d); (ld.getYear - 1970) * 12 + (ld.getMonthValue - 1)
    }
    def column(c: Column, src: IcebergType): Column = {
      val d = toDateCol(c, src); (year(d) - lit(1970)) * lit(12) + (month(d) - lit(1))
    }
    def preservesOrder = true
    override def toString = "month"
  }
  case object Day extends Transform {
    // Day result type is date per spec.
    def resultType(src: IcebergType) = DateT
    def apply(v: Any, src: IcebergType): Any = temporal(v, src)(d => d.toInt)
    def column(c: Column, src: IcebergType): Column = to_date(toDateCol(c, src))
    def preservesOrder = true
    override def toString = "day"
  }
  case object Hour extends Transform {
    def resultType(src: IcebergType) = IntT
    def apply(v: Any, src: IcebergType): Any = v match {
      case null => null
      case micros: Long => floorDiv(micros, 3600L * 1000000L).toInt
      case other => throw new IllegalArgumentException(s"hour transform needs timestamp micros, got $other")
    }
    def column(c: Column, src: IcebergType): Column =
      floor(unix_timestamp(c) / lit(3600L)).cast(IntegerType)
    def preservesOrder = true
    override def toString = "hour"
  }

  private def temporal(v: Any, src: IcebergType)(fromDays: Long => Int): Any = v match {
    case null => null
    case days: Int if src == DateT => fromDays(days.toLong)
    case micros: Long => fromDays(floorDiv(micros, 86400L * 1000000L))
    case days: Int => fromDays(days.toLong)
    case other => throw new IllegalArgumentException(s"temporal transform on $other ($src)")
  }

  private def toDateCol(c: Column, src: IcebergType): Column = src match {
    case DateT => c
    case _ => c // timestamp columns: Spark year()/month() accept timestamps
  }

  /** Truncate semantics (reference iceberg_scalar_functions.cpp:213-351).
    * Strings: Unicode code points (spec; the reference uses grapheme
    * clusters — documented deviation, code points match the Iceberg spec). */
  def truncateValue(v: Any, w: Int, src: IcebergType): Any = v match {
    case null => null
    case i: Int => i - (((i % w) + w) % w)
    case l: Long => l - (((l % w) + w) % w)
    case s: String =>
      if (s.codePointCount(0, s.length) <= w) s
      else s.substring(0, s.offsetByCodePoints(0, w))
    case b: Array[Byte] => if (b.length <= w) b else java.util.Arrays.copyOf(b, w)
    case d: java.math.BigDecimal =>
      val unscaled = d.unscaledValue()
      val bw = java.math.BigInteger.valueOf(w.toLong)
      val rem = unscaled.mod(bw) // mod is always non-negative
      new java.math.BigDecimal(unscaled.subtract(rem), d.scale())
    case d: BigDecimal => truncateValue(d.bigDecimal, w, src)
    case other => throw new IllegalArgumentException(s"truncate unsupported for $other")
  }

  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncRe = """truncate\[(\d+)\]""".r

  def parse(s: String): Transform = s.toLowerCase match {
    case "identity" => Identity
    case "void" => Void
    case "year" | "years" => Year
    case "month" | "months" => Month
    case "day" | "days" | "date" => Day
    case "hour" | "hours" | "date_hour" => Hour
    case BucketRe(n) => Bucket(n.toInt)
    case TruncRe(w) => Truncate(w.toInt)
    case other => throw new IllegalArgumentException(s"Unknown transform: $other")
  }
}

/** Indirection so core doesn't depend on the functions package at init. */
object IcebergFunctionsBridge {
  def bucket(n: Int, c: Column, src: IcebergType): Column =
    graft.functions.IcebergFunctions.icebergBucket(n, c, src)
  def truncate(w: Int, c: Column, src: IcebergType): Column =
    graft.functions.IcebergFunctions.icebergTruncate(w, c, src)
}

package graft

import graft.core.{IcebergHash, IcebergTypes, Transforms}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bit-exactness tests for the bucket hash (Iceberg spec Appendix B vectors —
 * cross-engine partition compatibility depends on these) and the transform
 * truth tables (reference src/core/expression/iceberg_hash.cpp:14-247,
 * iceberg_scalar_functions.cpp:213-351).
 */
class HashTransformSpec extends AnyFunSuite {
  // property-style loop over seeded pseudo-random values (offline-safe)
  private def forAllLongs(f: Long => Unit): Unit = {
    val rng = new scala.util.Random(42)
    (0 until 500).foreach(_ => f(rng.nextLong()))
  }
  private def forAllInts(f: Int => Unit): Unit = {
    val rng = new scala.util.Random(43)
    (0 until 500).foreach(_ => f(rng.nextInt()))
  }

  test("murmur3 matches Iceberg spec Appendix B hash vectors") {
    assert(IcebergHash.hashLong(34L) == 2017239379)          // int 34
    assert(IcebergHash.hashLong(34L) == IcebergHash.hash(34, IcebergTypes.IntT)) // int widens to long
    assert(IcebergHash.hashDecimal(new java.math.BigDecimal("14.20")) == -500754589)
    assert(IcebergHash.hash(java.time.LocalDate.parse("2017-11-16"), IcebergTypes.DateT) == -653330422)
    // time 22:31:08 = 81068000000 micros
    assert(IcebergHash.hashLong(81068000000L) == -662762989)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 micros
    assert(IcebergHash.hashLong(1510871468000000L) == -2047944441)
    assert(IcebergHash.hashString("iceberg") == 1210000089)
    assert(IcebergHash.hashUuid(java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")) == 1488055340)
    assert(IcebergHash.hashBytes(Array[Byte](0, 1, 2, 3)) == -188683207)
  }

  test("bucket transform: range, determinism, null") {
    val b = Transforms.Bucket(16)
    forAllLongs { v =>
      val r = b.apply(v, IcebergTypes.LongT).asInstanceOf[Int]
      assert(r >= 0 && r < 16)
      assert(r == b.apply(v, IcebergTypes.LongT))
    }
    assert(b.apply(null, IcebergTypes.LongT) == null)
    // int and long of the same value land in the same bucket (spec requirement)
    forAllInts { v =>
      assert(b.apply(v, IcebergTypes.IntT) == b.apply(v.toLong, IcebergTypes.LongT))
    }
  }

  test("truncate transform: ints floor toward -inf, strings by code points, decimal unscaled") {
    val t10 = Transforms.Truncate(10)
    assert(t10.apply(7, IcebergTypes.IntT) == 0)
    assert(t10.apply(-3, IcebergTypes.IntT) == -10)
    assert(t10.apply(-10, IcebergTypes.IntT) == -10)
    forAllInts { v0 =>
      val v = v0 / 2 // avoid overflow at Int.MinValue
      val r = t10.apply(v, IcebergTypes.IntT).asInstanceOf[Int]
      assert(r <= v && v - r < 10 && r % 10 == 0)
    }
    val t2 = Transforms.Truncate(2)
    assert(t2.apply("abcde", IcebergTypes.StringT) == "ab")
    assert(t2.apply("a", IcebergTypes.StringT) == "a")
    // surrogate pair counts as ONE code point
    val emoji = "😀x"
    assert(t2.apply(emoji, IcebergTypes.StringT) == emoji.substring(0, 3))
    // decimal 10.65 truncate 50 -> 10.50 (spec example)
    val t50 = Transforms.Truncate(50)
    assert(t50.apply(new java.math.BigDecimal("10.65"), IcebergTypes.DecimalT(4, 2))
      .asInstanceOf[java.math.BigDecimal].compareTo(new java.math.BigDecimal("10.50")) == 0)
  }

  test("temporal transforms: year/month/day/hour incl. pre-epoch floor") {
    import IcebergTypes._
    def days(s: String): Int = java.time.LocalDate.parse(s).toEpochDay.toInt
    def micros(s: String): Long =
      java.time.LocalDateTime.parse(s).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(Transforms.Year.apply(days("2017-11-16"), DateT) == 47)
    assert(Transforms.Year.apply(days("1969-12-31"), DateT) == -1)
    assert(Transforms.Month.apply(days("2017-11-16"), DateT) == 47 * 12 + 10)
    assert(Transforms.Month.apply(days("1969-12-31"), DateT) == -1)
    assert(Transforms.Day.apply(micros("2017-11-16T22:31:08"), TimestampT) == days("2017-11-16"))
    // pre-epoch timestamps floor toward -inf (reference transform.hpp:266-269)
    assert(Transforms.Day.apply(micros("1969-12-31T23:59:59"), TimestampT) == days("1969-12-31"))
    assert(Transforms.Hour.apply(micros("2017-11-16T22:31:08"), TimestampT) ==
      (micros("2017-11-16T22:00:00") / 3600000000L).toInt)
    assert(Transforms.Hour.apply(-1L, TimestampTzT) == -1)
  }

  test("transform parsing round-trips") {
    for (s <- Seq("identity", "void", "year", "month", "day", "hour", "bucket[16]", "truncate[4]")) {
      assert(Transforms.parse(s).toString == s)
    }
  }
}

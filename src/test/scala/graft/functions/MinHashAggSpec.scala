package graft.functions

import java.math.BigInteger
import org.scalatest.funsuite.AnyFunSuite

/** The Mersenne-61 modular arithmetic under the affine MinHash family —
  * exactness vs BigInteger, parameter-range invariants, and the
  * agreement between the JVM aggregate's values and what the q53 oracle
  * SQL would compute from the same constants. */
class MinHashAggSpec extends AnyFunSuite {
  import MinHashAgg.{P, affineParams, affinePerm, mulModP}

  private val bigP = BigInteger.valueOf(P)

  test("mulModP equals BigInteger multiplication mod 2^61-1") {
    val rnd = new scala.util.Random(7)
    // h ranges over the FULL signed-positive domain [0, 2^63) — the
    // worst case (a near P, h near 2^63) used to wrap negative before
    // the pre-add fold; edges pin both boundaries
    val edge = Seq(0L, 1L, 2L, P - 1, P - 2, (1L << 60) - 1, (1L << 60),
      Long.MaxValue, Long.MaxValue - 1)
    val as = edge.map(_ % P) ++ Seq.fill(4000)(math.abs(rnd.nextLong()) % P)
    val hs = edge ++ Seq.fill(4000)(rnd.nextLong() & Long.MaxValue)
    for (a <- as.takeRight(64) ++ as.take(edge.length); h <- hs.take(edge.length))
      assertMul(a, h)
    as.zip(hs).foreach { case (a, h) => assertMul(a, h) }
  }

  private def assertMul(a: Long, h: Long): Unit = {
    val expect = BigInteger.valueOf(a).multiply(BigInteger.valueOf(h))
      .mod(bigP).longValueExact()
    assert(mulModP(a, h) == expect, s"a=$a h=$h")
  }

  test("affinePerm equals BigInteger (a*h + b) mod P") {
    val rnd = new scala.util.Random(11)
    (0 until 2000).foreach { _ =>
      val a = math.abs(rnd.nextLong()) % (P - 1) + 1
      val b = math.abs(rnd.nextLong()) % P
      val h = math.abs(rnd.nextLong()) % (1L << 60)
      val expect = BigInteger.valueOf(a).multiply(BigInteger.valueOf(h))
        .add(BigInteger.valueOf(b)).mod(bigP).longValueExact()
      assert(affinePerm(a, b, h) == expect, s"a=$a b=$b h=$h")
    }
  }

  test("affineParams ranges and determinism") {
    val p1 = affineParams(64)
    val p2 = affineParams(64)
    assert(p1.toSeq == p2.toSeq)
    p1.foreach { case (a, b) =>
      assert(a >= 1 && a < P)
      assert(b >= 0 && b < P)
    }
    // distinct permutations (no accidental collisions in the family)
    assert(p1.distinct.length == 64)
  }
}

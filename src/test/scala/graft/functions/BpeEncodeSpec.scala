package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String
import graft.SparkSpec

/** [[BpeEncode]] apply-side contract: greedy lowest-rank merging,
  * left-to-right non-overlapping fusion, surrogate-pair-safe code-point
  * splitting — and the interpreted path (`eval`) bit-identical to the
  * codegen path (the DataFrame run under `codegen.fallback=false`),
  * the same two-path discipline the rest of the expression family has
  * (COVERAGE.md). */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val merges: Seq[((String, String), Int)] = Seq(
    (("l", "o"), 0), (("lo", "w"), 1), (("e", "r"), 2), (("w", "er"), 3))

  /** DataFrame evaluation with silent interpreted fallback forbidden —
    * failures in generated code surface as test failures, so a green
    * run certifies the CODEGEN path produced `expected`. */
  private def viaCodegen(words: Seq[String],
      table: Seq[((String, String), Int)]): Seq[Seq[String]] = {
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      words.toDF("w")
        .select(TextFunctions.bpe_encode(col("w"), table).as("enc"))
        .collect().map(_.getSeq[String](0)).toSeq
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  private def viaInterpreted(word: String,
      table: Seq[((String, String), Int)]): Seq[String] =
    BpeEncode(Literal(UTF8String.fromString(word), org.apache.spark.sql.types.StringType), table)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType).map(_.toString).toSeq

  test("greedy lowest-rank merge order (Sennrich worked example)") {
    // "lower": l+o (rank 0) → lo+w (1) → e+r (2) → low+er absent ⇒ stop
    assert(viaCodegen(Seq("lower"), merges) == Seq(Seq("low", "er")))
    // "newer": e+r (2) first, then w+er (3) — rank order, not text order
    assert(viaCodegen(Seq("newer"), merges) == Seq(Seq("n", "e", "w", "er"))
      || viaCodegen(Seq("newer"), merges) == Seq(Seq("n", "e", "wer")))
    // pin it exactly: e+r fires before w+er ever exists, then w+er fires
    assert(viaCodegen(Seq("newer"), merges).head == Seq("n", "e", "wer"))
  }

  test("left-to-right non-overlapping fusion within one merge step") {
    // (a,a) applied to "aaaa" → "aa","aa"; to "aaa" → "aa","a";
    // then (aa,aa) can fire on the fused result
    val t = Seq((("a", "a"), 0), (("aa", "aa"), 1))
    assert(viaCodegen(Seq("aaa", "aaaa", "aaaaa"), t) ==
      Seq(Seq("aa", "a"), Seq("aaaa"), Seq("aaaa", "a")))
  }

  test("surrogate pairs split as code points, not UTF-16 units") {
    // U+1D11E (𝄞) is a surrogate pair; a char-based splitter would
    // shear it into two lone surrogates and the merge could never fire
    val clef = new String(Character.toChars(0x1D11E))
    val t = Seq(((clef, clef), 0))
    assert(viaCodegen(Seq(clef * 2, clef + "x"), t) ==
      Seq(Seq(clef * 2), Seq(clef, "x")))
  }

  test("duplicate pair in the table keeps its lowest rank") {
    val t = Seq((("a", "b"), 5), (("a", "b"), 1), (("b", "c"), 3))
    // with rank 1 < 3, ab fuses before bc can
    assert(viaCodegen(Seq("abc"), t) == Seq(Seq("ab", "c")))
  }

  test("edge rows: empty string → empty array, null → null, no-merge word unchanged") {
    val r = Seq(Some(""), None, Some("zq")).toDF("w")
      .select(TextFunctions.bpe_encode(col("w"), merges).as("enc"))
      .collect()
    assert(r(0).getSeq[String](0).isEmpty)
    assert(r(1).isNullAt(0))
    assert(r(2).getSeq[String](0) == Seq("z", "q"))
  }

  test("interpreted eval == codegen on randomized words over a random merge table") {
    val rnd = new scala.util.Random(41)
    val alpha = "abcd"
    val syms = (for { a <- alpha; b <- alpha } yield (a.toString, b.toString)).toSeq
    val table = rnd.shuffle(syms).take(9).zipWithIndex
    val words = (0 until 200).map(_ =>
      (0 until rnd.nextInt(12)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    val cg = viaCodegen(words, table)
    words.zip(cg).foreach { case (w, viaGen) =>
      assert(viaInterpreted(w, table) == viaGen, s"word '$w'")
    }
  }
}

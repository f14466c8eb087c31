package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-overlap language ID over a token array, one pass.
  *
  * Semantically identical to the composed form
  * (`array_max` over per-language `size(array_intersect(tokens, words))`
  * structs, 'und' when no overlap — see
  * `graft.text.TextAnalysis.langIdExpr`), including the tie-break
  * (equal scores pick the lexicographically largest language, because
  * languages are scanned in ascending order with `>=`). The win is
  * compile cost, not algorithmic: the composed tree inlines five
  * 10-string literal arrays into the generated source — a large class
  * that janino takes seconds to compile per novel plan — while here the
  * lexicon rides `ctx.addReferenceObj`, the generated source is tiny and
  * constant, and evaluation builds one token hash set per row instead of
  * five intersection scans.
  *
  * `langs` must be sorted ascending; `words(i)` are the stopwords of
  * `langs(i)` (duplicates-free, so hit count == intersection size).
  */
case class LangIdBest(child: Expression, langs: Array[String],
    words: Array[Array[String]]) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id_best"

  @transient private lazy val wordsUtf8: Array[Array[UTF8String]] =
    words.map(_.map(UTF8String.fromString))
  @transient private lazy val langsUtf8: Array[UTF8String] =
    langs.map(UTF8String.fromString)
  @transient private lazy val und = UTF8String.fromString("und")

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val seen = new java.util.HashSet[UTF8String](toks.numElements() * 2)
    var i = 0
    while (i < toks.numElements()) {
      if (!toks.isNullAt(i)) seen.add(toks.getUTF8String(i))
      i += 1
    }
    var best = -1
    var bestScore = 0
    var l = 0
    while (l < langsUtf8.length) {
      var score = 0
      val ws = wordsUtf8(l)
      var w = 0
      while (w < ws.length) { if (seen.contains(ws(w))) score += 1; w += 1 }
      if (score >= bestScore && score > 0) { bestScore = score; best = l }
      l += 1
    }
    if (best < 0) und else langsUtf8(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ws = ctx.addReferenceObj("words", wordsUtf8,
        "org.apache.spark.unsafe.types.UTF8String[][]")
      val ls = ctx.addReferenceObj("langs", langsUtf8,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val undRef = ctx.addReferenceObj("und", und,
        "org.apache.spark.unsafe.types.UTF8String")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i"); val l = ctx.freshName("l")
      val w = ctx.freshName("w"); val score = ctx.freshName("score")
      val best = ctx.freshName("best"); val bestScore = ctx.freshName("bestScore")
      s"""
         |java.util.HashSet<org.apache.spark.unsafe.types.UTF8String> $seen =
         |  new java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>($v.numElements() * 2);
         |for (int $i = 0; $i < $v.numElements(); $i++) {
         |  if (!$v.isNullAt($i)) $seen.add($v.getUTF8String($i));
         |}
         |int $best = -1;
         |int $bestScore = 0;
         |for (int $l = 0; $l < $ls.length; $l++) {
         |  int $score = 0;
         |  org.apache.spark.unsafe.types.UTF8String[] lw = $ws[$l];
         |  for (int $w = 0; $w < lw.length; $w++) {
         |    if ($seen.contains(lw[$w])) $score++;
         |  }
         |  if ($score >= $bestScore && $score > 0) { $bestScore = $score; $best = $l; }
         |}
         |${ev.value} = ($best < 0) ? $undRef : $ls[$best];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LangIdBest =
    copy(child = newChild)
}

/** Distinct word n-grams over a token array, one pass.
  *
  * Semantically identical to the composed form
  * `array_distinct(transform(sequence(0, size(w)-n), i ->
  * concat_ws(" ", slice(w, i+1, n))))` — same shingle strings, same
  * first-occurrence order — but the composed form evaluates an
  * INTERPRETED lambda per shingle (higher-order functions never enter
  * codegen) and materializes the full pre-distinct array. Here the
  * sliding window and the dedup hash set run in one JVM pass per row,
  * inside whole-stage codegen. Feeds q43's shingle stats and the
  * MinHash/Jaccard shingling front of `graft.dedup.Dedup` — the single
  * hottest per-token loop of a corpus-scale dedup pass.
  */
case class DistinctWordNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_word_ngrams"

  override def nullSafeEval(v: Any): Any =
    DistinctWordNgrams.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      // n is inlined, but the generated source is identical for every
      // plan with the same width — the janino cache still hits
      s"${ev.value} = graft.functions.DistinctWordNgrams.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): DistinctWordNgrams =
    copy(child = newChild)
}

/** ALL word n-grams in start-position order (no dedup) — the positioned
  * sibling of [[DistinctWordNgrams]]: `posexplode(word_ngrams(toks, n))`
  * yields `pos` = the gram's token start index. For corpus passes that
  * need every occurrence located (duplicate-span dedup), where the
  * composed `transform(sequence, slice+concat_ws)` form pays an
  * interpreted lambda per gram. */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(v: Any): Any =
    WordNgrams.compute(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordNgrams.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val space = UTF8String.fromString(" ")

  /** One sliding-window pass, every start position emitted. Null tokens
    * are skipped inside a window exactly like `concat_ws`. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    val count = total - n + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[AnyRef](0).asInstanceOf[Array[Any]])
    val arr = new Array[UTF8String](total)
    var i = 0
    while (i < total) {
      arr(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[UTF8String](count)
    val window = new Array[UTF8String](n)
    var s = 0
    while (s < count) {
      System.arraycopy(arr, s, window, 0, n)
      out(s) = UTF8String.concatWs(space, window: _*)
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.asInstanceOf[Array[Any]])
  }
}

object DistinctWordNgrams {
  private val space = UTF8String.fromString(" ")

  /** One sliding-window pass; insertion-ordered dedup (matches
    * `array_distinct`'s first-occurrence order). Null tokens are skipped
    * inside a window exactly like `concat_ws`. */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val total = toks.numElements()
    val count = total - n + 1
    if (count <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[AnyRef](0).asInstanceOf[Array[Any]])
    val arr = new Array[UTF8String](total)
    var i = 0
    while (i < total) {
      arr(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    val window = new Array[UTF8String](n)
    var s = 0
    while (s < count) {
      System.arraycopy(arr, s, window, 0, n)
      seen.add(UTF8String.concatWs(space, window: _*))
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray(new Array[UTF8String](seen.size())).asInstanceOf[Array[Any]])
  }
}

/** Greedy BPE encoding of ONE word under a ranked merge table
  * (Sennrich et al. 2015, arXiv:1508.07909 §2.2 applied): start from
  * the word's code points, repeatedly find the adjacent symbol pair
  * with the LOWEST merge rank and fuse every left-to-right
  * non-overlapping occurrence of it, until no adjacent pair is in the
  * table. [[graft.text.TextAnalysis.bpePairCounts]] (q147) is merge
  * INDUCTION; this is the apply side — together they close the
  * tokenizer train→encode loop at corpus scale.
  *
  * The merge table rides `ctx.addReferenceObj` (same discipline as
  * [[LangIdBest]]'s lexicon): the generated source is one constant
  * helper call regardless of table size, so janino's cache hits and a
  * 50k-merge production table costs the same compile as a 10-merge
  * test one. Per-row work is the per-word greedy loop — iterative by
  * nature, so it lives in the helper the generated code calls, not in
  * inlined codegen; the expression still composes inside
  * whole-stage-codegen'd `transform`/`flatten` pipelines with zero
  * serialization boundary. Deterministic: ranks are unique by
  * construction (a duplicate pair keeps its lowest rank), so there are
  * no tie-breaks to diverge on. */
case class BpeEncode(child: Expression, merges: Seq[((String, String), Int)])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string (one word), got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    merges.foreach { case ((a, b), r) =>
      val k = a + BpeEncode.Sep + b
      val prev = m.get(k)
      if (prev == null || r < prev.intValue()) m.put(k, Integer.valueOf(r))
    }
    m
  }

  override def nullSafeEval(v: Any): Any =
    BpeEncode.compute(v.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val tbl = ctx.addReferenceObj("bpeTable", table, "java.util.HashMap")
      s"${ev.value} = graft.functions.BpeEncode.compute($v, $tbl);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** Key separator for the (a, b) → rank table; NUL cannot appear in a
    * symbol produced from a real word. */
  val Sep = "\u0000"

  def compute(word: UTF8String,
      table: java.util.HashMap[String, Integer]): ArrayData = {
    val s = word.toString
    if (s.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](0))
    // split into code points (surrogate-pair safe)
    var n = 0
    var i = 0
    while (i < s.length) { i += Character.charCount(s.codePointAt(i)); n += 1 }
    var syms = new Array[String](n)
    i = 0; var idx = 0
    while (i < s.length) {
      val cc = Character.charCount(s.codePointAt(i))
      syms(idx) = s.substring(i, i + cc)
      idx += 1; i += cc
    }
    var done = false
    while (!done && syms.length > 1) {
      // lowest-rank adjacent pair present in the table
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var j = 0
      while (j < syms.length - 1) {
        val r = table.get(syms(j) + Sep + syms(j + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestA = syms(j); bestB = syms(j + 1)
        }
        j += 1
      }
      if (bestA == null) done = true
      else {
        // fuse every left-to-right non-overlapping occurrence
        val out = new Array[String](syms.length)
        var w = 0
        j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            out(w) = bestA + bestB; w += 1; j += 2
          } else { out(w) = syms(j); w += 1; j += 1 }
        }
        syms = java.util.Arrays.copyOf(out, w)
      }
    }
    val arr = new Array[Any](syms.length)
    i = 0
    while (i < syms.length) { arr(i) = UTF8String.fromString(syms(i)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** 60-bit SimHash of a token-array column in ONE pass — the per-row
  * (streaming-side) fingerprint. The composed form it replaces
  * evaluated, per bit position, an interpreted `aggregate` lambda over
  * a `transform(toks, h60)` subtree: 60 separate fold passes per row,
  * and because higher-order functions are interpreted with no
  * cross-lambda subexpression elimination, each pass re-hashed every
  * token — 60 md5 walks of the document. Here each token is hashed
  * ONCE (`suffix` appended first — the wide family's second hash is
  * `h60(token ‖ "#2")`) and all 60 bit votes accumulate in one walk.
  * Arithmetic is identical: vote_b = Σ_tokens ±1 by hash bit b (a null
  * token votes −1 on every bit, like the null-propagating `when`), bit
  * set iff vote > 0. */
case class SimHash60(child: Expression, suffix: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override def nullSafeEval(v: Any): Any =
    SimHash60.compute(v.asInstanceOf[ArrayData], suffix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sfx = ctx.addReferenceObj("suffix", suffix, "java.lang.String")
      s"${ev.value} = graft.functions.SimHash60.compute($v, $sfx);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {
  /** `conv(substring(md5(s), 1, 15), 16, 10)` — first 60 digest bits. */
  private def h60(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    ((d(0) & 0xFFL) << 52) | ((d(1) & 0xFFL) << 44) | ((d(2) & 0xFFL) << 36) |
      ((d(3) & 0xFFL) << 28) | ((d(4) & 0xFFL) << 20) | ((d(5) & 0xFFL) << 12) |
      ((d(6) & 0xFFL) << 4) | ((d(7) >> 4) & 0xFL)
  }

  def compute(toks: ArrayData, suffix: String): Long = {
    val bits = 60
    val votes = new Array[Int](bits)
    val sfx = suffix.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) {
        var b = 0
        while (b < bits) { votes(b) -= 1; b += 1 }
      } else {
        val t = toks.getUTF8String(i).getBytes
        val all = if (sfx.length == 0) t else {
          val a = java.util.Arrays.copyOf(t, t.length + sfx.length)
          System.arraycopy(sfx, 0, a, t.length, sfx.length)
          a
        }
        val h = h60(all)
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }
}

object TextFunctions {
  /** One-pass 60-bit SimHash over a token array (optional per-token
    * hash-family suffix — "" = the base family, "#2" = the wide
    * family's second hash). */
  def simhash60(tokens: Column, suffix: String = ""): Column =
    GraftBridge.toColumn(SimHash60(GraftBridge.toExpression(tokens), suffix))

  /** Stopword-overlap language ID over a token array column. */
  def lang_id_best(tokens: Column, langs: Seq[(String, Seq[String])]): Column = {
    val sorted = langs.sortBy(_._1)
    GraftBridge.toColumn(LangIdBest(GraftBridge.toExpression(tokens),
      sorted.map(_._1).toArray, sorted.map(_._2.toArray).toArray))
  }

  /** Greedy BPE encoding of a single-word string column under a ranked
    * merge table (see [[BpeEncode]]); pairs with duplicate entries keep
    * their lowest rank. Compose over documents as
    * `flatten(transform(tokens, w => bpe_encode(w, merges)))`. */
  def bpe_encode(word: Column, merges: Seq[((String, String), Int)]): Column =
    GraftBridge.toColumn(BpeEncode(GraftBridge.toExpression(word), merges))

  /** Distinct word n-grams (shingles) of a token-array column. */
  def distinct_word_ngrams(tokens: Column, n: Int): Column =
    GraftBridge.toColumn(DistinctWordNgrams(GraftBridge.toExpression(tokens), n))

  /** All positioned word n-grams (see [[WordNgrams]]). */
  def word_ngrams(tokens: Column, n: Int): Column =
    GraftBridge.toColumn(WordNgrams(GraftBridge.toExpression(tokens), n))
}

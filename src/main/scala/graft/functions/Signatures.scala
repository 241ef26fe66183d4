package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document-signature expressions for near-duplicate detection.
  *
  * MinHash and SimHash are tight per-document loops (tokens × 64); Spark's
  * higher-order functions (`transform`/`aggregate`) evaluate lambdas
  * interpreted, which made the signature stage dominate the dedup bench.
  * These native expressions run one compiled JVM pass per document inside
  * whole-stage codegen — the signature stage becomes I/O-bound, which is
  * the behavior a 100 TB dedup sweep needs (hash work scales with bytes
  * read, shuffle carries only the fixed-size signature).
  */
object SigImpl {
  /** Mersenne prime modulus for affine MinHash permutations. */
  val P = 2147483647L
  val NumHashes = 64
  val ShingleN = 5

  /** Deterministic affine permutation parameters (LCG, fixed seed). */
  val permA = new Array[Long](NumHashes)
  val permB = new Array[Long](NumHashes)
  locally {
    var s = 42L
    def next(): Long = {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 33) % (P - 1)
    }
    var i = 0
    while (i < NumHashes) { permA(i) = next() + 1; permB(i) = next(); i += 1 }
  }

  private def tokenize(s: String): Array[String] =
    s.trim.split("\\s+")

  /** Distinct word 5-gram shingles in first-occurrence order — semantics
    * identical to `array_distinct(transform(...))` over `split(trim(t),
    * '\s+')` (and to the DuckDB oracle's regexp_split_to_array slices). */
  def shingleSet(text: UTF8String): ArrayData = {
    val words = tokenize(text.toString)
    if (words.length < ShingleN)
      return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i + ShingleN <= words.length) {
      sb.setLength(0)
      var j = 0
      while (j < ShingleN) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Adjacent word pairs (bigrams) in stream order — semantics identical
    * to exploding `zip_with(slice(w, 1, n-1), slice(w, 2, n-1), struct)`
    * (equivalently `transform(sequence(1, n-1), i -> struct(w[i],
    * w[i+1]))`) over `split(trim(t), "\s+")` with a `size(w) >= 2`
    * guard: a sub-2-token document yields an empty array. Spark's
    * higher-order functions are CodegenFallback (interpreted lambdas) —
    * this native pass exists because the bigram explode is the entire
    * map-side CPU of the bigram-LM family (lmScores/rhoSelect/bpeTrain
    * rounds). */
  def bigramPairs(text: UTF8String): ArrayData = {
    val words = tokenize(text.toString)
    if (words.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - 1)
    var i = 0
    while (i < words.length - 1) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(words(i)),
          UTF8String.fromString(words(i + 1))))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent CHARACTER pairs within each whitespace token (words under
    * 2 chars contribute none), all tokens' pairs concatenated in stream
    * order — semantics identical to exploding words then exploding
    * `transform(sequence(1, length(word) - 1), i -> substring(word, i,
    * 2))` (the [[graft.exts.TextAnalysis.bpePairCounts]] shape), fused
    * into ONE compiled pass per document. */
  def charPairs(text: UTF8String): ArrayData = {
    val words = tokenize(text.toString)
    var n = 0
    var w = 0
    while (w < words.length) {
      if (words(w).length >= 2) n += words(w).length - 1
      w += 1
    }
    val out = new Array[Any](n)
    var k = 0
    w = 0
    while (w < words.length) {
      val s = words(w)
      var i = 0
      while (i + 2 <= s.length) {
        out(k) = UTF8String.fromString(s.substring(i, i + 2))
        k += 1
        i += 1
      }
      w += 1
    }
    new GenericArrayData(out)
  }

  /** FNV-1a 64-bit over a string's chars, reduced mod P (non-negative). */
  private def hashMod(s: String): Long = {
    var h = -3750763034362895579L // FNV offset basis
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 1099511628211L
      i += 1
    }
    val m = h % P
    if (m < 0) m + P else m
  }

  /** MinHash signature over word 5-gram shingles, one compiled pass. */
  def minhashSig(text: UTF8String): ArrayData = {
    val words = tokenize(text.toString)
    val sig = new Array[Long](NumHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    if (words.length >= ShingleN) {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i + ShingleN <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < ShingleN) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        val h = hashMod(sb.toString)
        var k = 0
        while (k < NumHashes) {
          val v = (h * permA(k) + permB(k)) % P
          if (v < sig(k)) sig(k) = v
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** SQL-mirrorable MinHash constants: the poly-hash variant replaces the
    * FNV fold (not expressible as a SQL aggregate) with nested polynomial
    * SUMS — word hash Σ ord(cᵢ)·WordBase^i mod P, shingle hash
    * Σ wh(wⱼ)·ShingleBase^j mod P — so a DuckDB oracle reproduces every
    * signature with a powers table + SUM + GROUP BY (the text_fingerprint
    * precedent). Same affine permutations as [[minhashSig]]. */
  val WordBase = 131L
  val ShingleBase = 1000003L
  /** Powers table size = max supported word length for the SQL mirror
    * (the Scala side is exact at any length; oracle parity requires
    * corpus words under this bound — FixturesSpec-scale corpora are). */
  val MaxWordLen = 512

  /** Word polynomial hash: Σ ord(cᵢ)·WordBase^i mod P, ascending powers
    * (no length term needed — sum-shaped for the SQL mirror). */
  def wordPolyHash(w: String): Long = {
    var h = 0L
    var p = 1L
    var i = 0
    while (i < w.length) {
      h = (h + w.charAt(i).toLong * p) % P
      p = (p * WordBase) % P
      i += 1
    }
    h
  }

  /** Shingle-base powers 0..ShingleN-1 mod P. */
  val shinglePow: Array[Long] = {
    val a = new Array[Long](ShingleN)
    a(0) = 1L
    var j = 1
    while (j < ShingleN) { a(j) = a(j - 1) * ShingleBase % P; j += 1 }
    a
  }

  /** MinHash signature with the SQL-mirrorable polynomial shingle hash,
    * one compiled pass (same loop structure as [[minhashSig]]). */
  def minhashSigPoly(text: UTF8String): ArrayData = {
    val words = tokenize(text.toString)
    val sig = new Array[Long](NumHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    if (words.length >= ShingleN) {
      val wh = new Array[Long](words.length)
      var i = 0
      while (i < words.length) { wh(i) = wordPolyHash(words(i)); i += 1 }
      i = 0
      while (i + ShingleN <= words.length) {
        var h = 0L
        var j = 0
        while (j < ShingleN) {
          h += wh(i + j) * shinglePow(j) % P // each term < P, sum < 5P
          j += 1
        }
        h %= P
        var k = 0
        while (k < NumHashes) {
          val v = (h * permA(k) + permB(k)) % P
          if (v < sig(k)) sig(k) = v
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** Per-document repetition stats in one compiled pass:
    * `[n_tokens, top_word_count, n_bigrams, distinct_bigrams]`. Feeds the
    * Gopher-style repetitious-text quality signals — as a per-row
    * projection the whole filter runs shuffle-free at any corpus size,
    * where the explode + groupBy formulation would shuffle every token. */
  def repetitionStats(text: UTF8String): ArrayData = {
    val words = tokenize(text.toString)
    val n = words.length
    val wc = new java.util.HashMap[String, Long]()
    var top = 0L
    var i = 0
    while (i < n) {
      val c = wc.getOrDefault(words(i), 0L) + 1L
      wc.put(words(i), c)
      if (c > top) top = c
      i += 1
    }
    var distinctBg = 0L
    if (n >= 2) {
      val seen = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder(32)
      i = 0
      while (i + 1 < n) {
        sb.setLength(0)
        sb.append(words(i)).append(' ').append(words(i + 1))
        if (seen.add(sb.toString)) distinctBg += 1
        i += 1
      }
    }
    val nBg = if (n >= 2) (n - 1).toLong else 0L
    new GenericArrayData(Array[Any](n.toLong, top, nBg, distinctBg))
  }

  /** Signature width of the SQL-mirrorable SimHash: each mod-P word hash
    * (P = 2³¹−1) carries 31 signal bits; two independent polynomial
    * hashes give 62 — wide enough for 16-bit band blocking to keep
    * chance collisions rare (31 bits alone would force 8-bit bands,
    * which at sf0.01 already produced ~52k chance candidate pairs — a
    * quadratic trap at corpus scale). */
  val SimBits = 62

  /** Second polynomial base — feeds the high 31 signature bits. */
  val WordBase2 = 137L

  /** [[wordPolyHash]] with [[WordBase2]]: Σ ord(cᵢ)·WordBase2^i mod P. */
  def wordPolyHash2(w: String): Long = {
    var h = 0L
    var p = 1L
    var i = 0
    while (i < w.length) {
      h = (h + w.charAt(i).toLong * p) % P
      p = (p * WordBase2) % P
      i += 1
    }
    h
  }

  /** Dimension count of [[hashEmbed]]'s feature-hashed embedding. */
  val HashEmbedDims = 16

  /** Feature-hashing ("hashing trick") document embedding: every word
    * OCCURRENCE votes ±1 on one of [[HashEmbedDims]] dimensions — the
    * dimension is [[wordPolyHash]] mod dims, the sign the next hash bit
    * — so the vector is an integer-exact, SQL-mirrorable sketch of the
    * token multiset (Weinberger et al.'s feature hashing, the
    * no-trained-model path from raw text into the vector stack). Empty
    * tokens (blank text) vote nowhere; the result is always exactly
    * [[HashEmbedDims]] longs. */
  def hashEmbed(text: UTF8String): ArrayData = {
    val words = tokenize(text.toString)
    val acc = new Array[Long](HashEmbedDims)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) {
        val h = wordPolyHash(w)
        val d = (h % HashEmbedDims).toInt
        acc(d) += (if ((h / HashEmbedDims) % 2L == 0L) 1L else -1L)
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** SQL-mirrorable SimHash: two per-word polynomial hashes (the same
    * mod-P arithmetic the minhash_band_pairs oracle recomputes), sign-sum
    * votes on each of the [[SimBits]] bits — bits 0..30 from
    * [[wordPolyHash]], 31..61 from [[wordPolyHash2]]; multiset, so every
    * occurrence votes — bit set iff its vote sum is positive (the same
    * `> 0` rule as [[simhash]]). One compiled pass per document. */
  def simhashPoly(text: UTF8String): Long = {
    val words = tokenize(text.toString)
    val weights = new Array[Int](SimBits)
    var i = 0
    while (i < words.length) {
      val h1 = wordPolyHash(words(i))
      val h2 = wordPolyHash2(words(i))
      var b = 0
      while (b < 31) {
        if (((h1 >>> b) & 1L) == 1L) weights(b) += 1 else weights(b) -= 1
        if (((h2 >>> b) & 1L) == 1L) weights(b + 31) += 1
        else weights(b + 31) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < SimBits) {
      if (weights(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** 64-bit SimHash over the token multiset, one compiled pass. */
  def simhash(text: UTF8String): Long = {
    val words = tokenize(text.toString)
    val weights = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      var h = hashMod(words(i)) * 0x9E3779B97F4A7C15L // spread to 64 bits
      h ^= (h >>> 32)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) weights(b) += 1 else weights(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (weights(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** MinHash signature expression: `array<bigint>` of 64 permutation minima. */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.minhashSig(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.minhashSig($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SQL-mirrorable MinHash signature expression (polynomial shingle hash). */
case class MinHashSigPoly(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.minhashSigPoly(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.minhashSigPoly($c)")
  override protected def withNewChildInternal(
      newChild: Expression): MinHashSigPoly =
    copy(child = newChild)
}

/** Feature-hashed doc embedding expression: `array<bigint>` of
  * [[SigImpl.HashEmbedDims]] signed occurrence counts (one compiled
  * pass per document — no explode, no shuffle). */
case class HashEmbed(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.hashEmbed(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.hashEmbed($c)")
  override protected def withNewChildInternal(newChild: Expression): HashEmbed =
    copy(child = newChild)
}

/** Shingle-set expression: `array<string>` of distinct word 5-grams. */
case class ShingleSet(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.shingleSet(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.shingleSet($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** Adjacent-word-pair expression: `array<struct<pa:string,pb:string>>`
  * (empty for sub-2-token documents) — the compiled form of the bigram
  * explode (see [[SigImpl.bigramPairs]]). */
case class BigramPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pa", StringType, nullable = true),
      StructField("pb", StringType, nullable = true))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.bigramPairs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.bigramPairs($c)")
  override protected def withNewChildInternal(
      newChild: Expression): BigramPairs =
    copy(child = newChild)
}

/** Within-word adjacent-character-pair expression: `array<string>`
  * (see [[SigImpl.charPairs]]). */
case class CharPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.charPairs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.charPairs($c)")
  override protected def withNewChildInternal(
      newChild: Expression): CharPairs =
    copy(child = newChild)
}

/** Repetition-stats expression: `array<bigint>` of
  * [n_tokens, top_word_count, n_bigrams, distinct_bigrams]. */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.repetitionStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.repetitionStats($c)")
  override protected def withNewChildInternal(
      newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** SQL-mirrorable SimHash expression: two polynomial word hashes →
  * [[SigImpl.SimBits]] = 62 signature bits (low 31 from [[SigImpl.wordPolyHash]],
  * high 31 from [[SigImpl.wordPolyHash2]]), banded 4 × 16 bits. */
case class SimHashPoly(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.simhashPoly(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.simhashPoly($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHashPoly =
    copy(child = newChild)
}

/** SimHash expression: 64-bit signature as a bigint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    SigImpl.simhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SigImpl.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object Signatures {
  import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}

  /** Register the signature functions for SQL use (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_set", exprs => ShingleSet(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig_poly", exprs => MinHashSigPoly(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_poly", exprs => SimHashPoly(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash_embed", exprs => HashEmbed(exprs.head), "built-in")
  }

  /** Column APIs (no registration required). */
  def minhash_sig(c: Column): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(c)))
  def minhash_sig_poly(c: Column): Column =
    ExpressionUtils.column(MinHashSigPoly(ExpressionUtils.expression(c)))
  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))
  def simhash_poly(c: Column): Column =
    ExpressionUtils.column(SimHashPoly(ExpressionUtils.expression(c)))
  def shingle_set(c: Column): Column =
    ExpressionUtils.column(ShingleSet(ExpressionUtils.expression(c)))
  def bigram_pairs(c: Column): Column =
    ExpressionUtils.column(BigramPairs(ExpressionUtils.expression(c)))
  def char_pairs(c: Column): Column =
    ExpressionUtils.column(CharPairs(ExpressionUtils.expression(c)))
  def repetition_stats(c: Column): Column =
    ExpressionUtils.column(RepetitionStats(ExpressionUtils.expression(c)))
  def hash_embed(c: Column): Column =
    ExpressionUtils.column(HashEmbed(ExpressionUtils.expression(c)))
}

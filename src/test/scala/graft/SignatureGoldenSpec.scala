package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{RollingHash, SigImpl}

/** Frozen signature goldens over a 10-doc mini-corpus.
  *
  * MinHash / SimHash signatures are registered rows-only with the driver
  * (engine-specific hashing has no DuckDB oracle), so this spec is their
  * semantic gate; the rolling-hash fingerprint gained a HUGEINT DuckDB
  * oracle (text_fingerprint is hash-gated) and its goldens stay as the
  * unit-level cross-check: any refactor of functions/Signatures.scala
  * or functions/RollingHash.scala that changes a single constant, the
  * tokenizer, the shingle width, or an accumulation order flips at least
  * one of these values. The values were produced by the current
  * implementation and are intentionally hard-coded — do NOT regenerate
  * them to make a refactor pass without deciding the semantic change is
  * wanted (it invalidates every signature already materialized at rest).
  *
  * Corpus covers: empty input, below/at/above the 5-word shingle width,
  * case variants, repeated tokens, punctuation-in-token, and a near-dup
  * pair (docs 4/5) whose signatures must agree on most permutations.
  */
class SignatureGoldenSpec extends AnyFunSuite {

  private val docs = Seq(
    "",
    "one two three four",
    "one two three four five",
    "one two three four five six",
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy dog again and again and again",
    "The Quick Brown Fox Jumps Over The Lazy Dog",
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor",
    "spam spam spam spam spam spam spam",
    "hello, world! hello, world! hello, world! one two")

  /** (docIdx, rollingHash, simhash64, nShingles, minhashSum, minhashHead4).
    * minhashSum is the wrapping Long sum of all 64 slots (empty docs hold
    * 64 × Long.MaxValue, which wraps to -64). */
  private case class GOLD(i: Int, rolling: Long, simhash: Long,
      nShingles: Int, mhSum: Long, mhHead: Seq[Long])

  private val golden = Seq(
    GOLD(0, 0L, 511434626561445988L, 0, -64L,
      Seq(9223372036854775807L, 9223372036854775807L, 9223372036854775807L,
        9223372036854775807L)),
    GOLD(1, -6221937342200554615L, -3143194481587059712L, 0, -64L,
      Seq(9223372036854775807L, 9223372036854775807L, 9223372036854775807L,
        9223372036854775807L)),
    GOLD(2, -7671169048269481300L, -2995692789031154399L, 1, 77847664520L,
      Seq(2037411352L, 2050268276L, 1063033110L, 1390222141L)),
    GOLD(3, -7748756831784808114L, -3015968062696766463L, 2, 47700073051L,
      Seq(1317148285L, 465473419L, 1063033110L, 1390222141L)),
    GOLD(4, -8974811617539419368L, -5627937481294345852L, 5, 25522951550L,
      Seq(74852919L, 1084171171L, 304413735L, 120507829L)),
    GOLD(5, -9097830382814226850L, -9105279845083609084L, 10, 12703998502L,
      Seq(74852919L, 577745295L, 304413735L, 120507829L)),
    GOLD(6, -8712901514480601134L, 7088635725514491598L, 5, 24833333723L,
      Seq(344975884L, 180034754L, 213728767L, 884893702L)),
    GOLD(7, -9087804941410757818L, -9070065779474142015L, 8, 11087224757L,
      Seq(127744286L, 30143707L, 41332501L, 144204153L)),
    GOLD(8, -6410487179464751915L, 723411375283228552L, 1, 72453261026L,
      Seq(964428906L, 1202295184L, 1332542795L, 861314397L)),
    GOLD(9, -8436204873529932108L, 5845954704925444048L, 4, 27166404653L,
      Seq(288302201L, 684985528L, 226841847L, 945656621L)))

  test("rolling hash, simhash, minhash, shingle count match frozen goldens") {
    golden.foreach { g =>
      val u = UTF8String.fromString(docs(g.i))
      val mh = SigImpl.minhashSig(u).toLongArray()
      assert(RollingHash.minWindowHash(u.getBytes) === g.rolling,
        s"rolling_hash changed for doc ${g.i}")
      assert(SigImpl.simhash(u) === g.simhash,
        s"simhash64 changed for doc ${g.i}")
      assert(SigImpl.shingleSet(u).numElements() === g.nShingles,
        s"shingle count changed for doc ${g.i}")
      assert(mh.sum === g.mhSum, s"minhash signature changed for doc ${g.i}")
      assert(mh.take(4).toSeq === g.mhHead,
        s"minhash head changed for doc ${g.i}")
      assert(mh.length === SigImpl.NumHashes)
    }
  }

  test("goldens encode the intended cross-doc relationships") {
    def sig(i: Int) =
      SigImpl.minhashSig(UTF8String.fromString(docs(i))).toLongArray()
    // near-dup pair (4 is a prefix of 5, shingle Jaccard = 0.5): slot
    // agreement tracks Jaccard (~32/64 expected) and dwarfs an unrelated
    // pair's
    def agree(a: Array[Long], b: Array[Long]) =
      a.zip(b).count { case (x, y) => x == y }
    val nearDup = agree(sig(4), sig(5))
    val unrelated = agree(sig(4), sig(7))
    assert(nearDup >= SigImpl.NumHashes / 3, s"only $nearDup/64 slots agree")
    assert(nearDup > 4 * math.max(unrelated, 1),
      s"near-dup $nearDup vs unrelated $unrelated")
    // case variant (6) is a DIFFERENT document to the raw signatures
    assert(sig(4).toSeq !== sig(6).toSeq)
    // hamming(simhash(4), simhash(5)) small; vs doc 7 large
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val s4 = SigImpl.simhash(UTF8String.fromString(docs(4)))
    val s5 = SigImpl.simhash(UTF8String.fromString(docs(5)))
    val s7 = SigImpl.simhash(UTF8String.fromString(docs(7)))
    assert(ham(s4, s5) < ham(s4, s7))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.EventOps

/** Fixture-drift guard (VERDICT r7 "next round" #1/#7): the driver
  * regenerates /root/testdata between rounds and has already changed the
  * physical `ts` encoding once (TIMESTAMP(NANOS) → timestamp[us]), which
  * silently broke 27 queries. This suite turns any future drift into ONE
  * clear failure naming the table/column instead of a pile of opaque
  * analysis errors.
  *
  * Two layers:
  *  - column NAMES and logical types are pinned per FIXTURES.md — these the
  *    engine requires exactly;
  *  - physically-flexible columns (`events.ts` may arrive as nanos Long or
  *    as a native timestamp) are asserted through the normalization
  *    contract instead: `EventOps.tsMillis` must accept the loaded dtype
  *    and the normalized epoch-millis must land in a sane instant range
  *    (a seconds- or micros-scale mistake misses the window by 1000×).
  */
class FixturesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def fields(name: String): Map[String, DataType] =
    Tables.load(spark, dir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  test("relational fixture schemas match the FIXTURES.md contract") {
    val expected: Map[String, Map[String, DataType]] = Map(
      "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
      "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
        "n_regionkey" -> IntegerType),
      "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
        "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
        "c_mktsegment" -> StringType),
      "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
        "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
      "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
        "p_brand" -> StringType, "p_type" -> StringType,
        "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    expected.foreach { case (table, cols) =>
      val got = fields(table)
      cols.foreach { case (c, t) =>
        assert(got.get(c).contains(t), s"$table.$c: expected $t, got ${got.get(c)}")
      }
      assert(got.keySet === cols.keySet, s"$table column set drifted")
    }
  }

  test("date-bearing fixtures carry timestamp-family date columns") {
    // o_orderdate / l_shipdate have drifted ms→us across regenerations;
    // the engine only requires "some timestamp type" (no unit arithmetic
    // is done on them), so pin the family, not the physical unit.
    val tsFamily = Set[DataType](TimestampType, TimestampNTZType)
    assert(tsFamily.contains(fields("orders")("o_orderdate")))
    assert(tsFamily.contains(fields("lineitem")("l_shipdate")))
    assert(fields("lineitem")("l_quantity") === DoubleType)
    assert(fields("orders")("o_orderkey") === LongType)
  }

  test("pipeline fixture schemas match the FIXTURES.md contract") {
    assert(fields("documents") === Map("doc_id" -> LongType,
      "text" -> StringType, "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType))
    val emb = fields("embeddings")
    assert(emb("vec_id") === LongType && emb("label") === IntegerType)
    assert(emb("embedding") === ArrayType(FloatType, containsNull = true) ||
      emb("embedding") === ArrayType(FloatType, containsNull = false))
    // PQ's subspace split assumes this dimensionality (PqIndex.SubSpaces
    // × SubDim); a regeneration with different dims must fail HERE, not
    // as a wrong-length subvector somewhere inside the codebook chain
    val dims = Tables.load(spark, dir, "embeddings")
      .select(size(col("embedding"))).distinct().collect().map(_.getInt(0))
    assert(dims.toSeq === Seq(
      graft.exts.PqIndex.SubSpaces * graft.exts.PqIndex.SubDim),
      s"embedding dims drifted to ${dims.mkString(",")}")
  }

  test("events.event_type domain covers what the decision/analytics family maps") {
    // FIXTURES.md §3 maps 'purchase' ⇒ replace and the write-ops set;
    // funnel/attribution additionally key on view/click — a regenerated
    // domain must fail loudly here
    val types = Tables.events(spark, dir)
      .select(col("event_type")).distinct().collect()
      .map(_.getString(0)).toSet
    assert(Set("view", "click", "purchase").subsetOf(types),
      s"event_type domain drifted: $types")
    assert(graft.model.Fixture.WriteOps.toSet.subsetOf(types),
      s"WriteOps ${graft.model.Fixture.WriteOps} ⊄ $types")
  }

  test("events.ts is a dtype tsMillis understands; ts_ms is epoch-millis-scale") {
    // Accepting the dtype IS the contract: a new physical encoding must be
    // added to EventOps.tsMillis, not worked around per-query.
    val ev = EventOps.events(spark, dir)
    val dtype = Tables.events(spark, dir).schema("ts").dataType
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType)
      .contains(dtype), s"events.ts drifted to $dtype — extend EventOps.tsMillis")
    val Array(lo, hi) = ev.agg(min(col("ts_ms")), max(col("ts_ms")))
      .collect().head.toSeq.map(_.asInstanceOf[Long]).toArray
    // Fixture events are synthesized near "now" (seed 42, driver-generated
    // 2025-26); epoch-millis for 2020..2035 is ~1.58e12..2.05e12. A unit
    // slip (seconds ~1.7e9, micros ~1.7e15) misses by 1000×.
    assert(lo > 1.5e12.toLong && hi < 2.1e12.toLong,
      s"events.ts_ms out of epoch-millis range: [$lo, $hi]")
    // other event columns the decision family depends on
    val got = fields("events")
    assert(got("event_id") === LongType && got("user_id") === LongType &&
      got("event_type") === StringType && got("value") === DoubleType &&
      got("props") === StringType)
  }

  test("documents.text words are BMP-only and under the oracle powers bound") {
    // The minhash_band_pairs / simhash_band_pairs oracles hash words as
    // Σ ord(cᵢ)·base^i with (a) a powers table of MaxWordLen entries and
    // (b) DuckDB's ord() over CODEPOINTS, while the engine's wordPolyHash
    // iterates UTF-16 code units. Both engines agree exactly iff every
    // corpus word is ≤ MaxWordLen chars and surrogate-free (BMP). That is
    // an ASSUMPTION about the fixture, not the corpus in general — pin it
    // so a regenerated corpus that breaks it fails here by name instead
    // of as a silent oracle-parity drift.
    import graft.functions.SigImpl
    // both the spec fixture AND the driver's oracle-gate scale
    for (d <- Seq(dir, "/root/testdata/sf0.01")) {
      val bad = Tables.load(spark, d, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")) > SigImpl.MaxWordLen ||
          col("w").rlike("[\\uD800-\\uDFFF]"))
        .count()
      assert(bad === 0L,
        s"$bad corpus words in $d exceed MaxWordLen=${SigImpl.MaxWordLen} " +
          "or contain surrogate pairs — the poly-hash oracles no longer " +
          "match wordPolyHash; iterate codepoints or regenerate the fixture")
    }
  }

  test("caption convention (FIXTURES.md §4): closed form over doc_id, both planted branches populated") {
    import org.apache.spark.sql.functions.col
    import graft.exts.Multimodal
    val caps = Multimodal.captions(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(caps.size === 500)
    // the driver regenerating documents.parquet cannot break this
    // convention (captions derive from doc_id only), but a fixture
    // regeneration that changed the doc_id domain would surface here
    def expected(d: Long): String = {
      val capId =
        if (d % Multimodal.CapBranchMod == 3L) 100000L + d
        else if (d % Multimodal.CapBranchMod == 4L)
          90000L + d % Multimodal.CapStockPool
        else d % Multimodal.DupContentMod
      s"caption $capId about subject ${(capId * 7) % 97}"
    }
    caps.foreach { case (d, c) => assert(c === expected(d), s"doc $d") }
    // planted branches present: re-captioned (unique) and stock (pool)
    assert(caps.keys.count(_ % Multimodal.CapBranchMod == 3L) > 0)
    assert(caps.keys.count(_ % Multimodal.CapBranchMod == 4L) > 0)
    // stock pool actually SHARES captions across different images
    val stock = caps.filter(_._1 % Multimodal.CapBranchMod == 4L)
    assert(stock.values.toSet.size.toLong === Multimodal.CapStockPool)
  }

  test("near-pair caption convention (FIXTURES.md §4): tail-edit plant populated and positioned on dup images") {
    import graft.exts.Multimodal
    val dir = "/root/testdata/sf0.001"
    val near = Multimodal.pairCaptionsNear(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = Multimodal.pairCaptions(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(near.keySet === base.keySet,
      "near fixture must cover exactly the incoming pair population")
    val docsOf = near.keys.map(b => b - Multimodal.IncomingIdOffset)
    val tailDocs = docsOf.filter(_ % Multimodal.PairCapTailMod == 43L)
    assert(tailDocs.nonEmpty, "tail-edit branch must be populated")
    tailDocs.foreach { d =>
      // every tail doc is an image RE-UPLOAD (d ≡ 11 mod 16, never the
      // d%16==3 novel cell) — the divergence the plant exists for needs
      // a duplicate image under the edited caption
      assert(d % 16L === 11L, s"tail doc $d must carry a dup image")
      val capId = d % Multimodal.DupContentMod
      val expected =
        s"caption $capId about subject ${(capId * 7) % 97} v2"
      assert(near(d + Multimodal.IncomingIdOffset) === expected,
        s"tail caption of doc $d must be its base caption + ' v2'")
    }
    // all non-tail branches are byte-identical to the exact-gate fixture
    docsOf.filterNot(_ % Multimodal.PairCapTailMod == 43L).foreach { d =>
      val b = d + Multimodal.IncomingIdOffset
      assert(near(b) === base(b), s"non-tail doc $d must not drift")
    }
    // at least one tail doc's BASE caption exists in the corpus — the
    // rows where near catches what md5 misses (the others' base caption
    // is absent at this sf, a genuinely new text either way)
    val corpusCaps = Multimodal.captions(spark, dir)
      .collect().map(_.getString(1)).toSet
    assert(tailDocs.exists { d =>
      val capId = d % Multimodal.DupContentMod
      corpusCaps.contains(
        s"caption $capId about subject ${(capId * 7) % 97}")
    }, "at least one tail edit must shadow a LIVE corpus caption")
  }
}

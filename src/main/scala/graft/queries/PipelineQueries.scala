package graft.queries

import graft.QueryPack
import graft.exts.{BpeIndex, Dedup, LmIndex, Multimodal, Packing, PqIndex, Sampling, Similarity, TextAnalysis}
import graft.Tables

/** Driver-contract queries for the training-data-pipeline extensions:
  * text analysis, deduplication, similarity search, multimodal metadata.
  * Oracles recompute the same pure derivations (including planted
  * duplicates) in DuckDB; MinHash/SimHash/fingerprint use engine-specific
  * hashing and are registered rows-only (covered by ScalaTest instead). */
object PipelineQueries {

  /** documents ∪ planted exact copies — DuckDB side. */
  private val exactCorpusCte =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 10 = 0)""".stripMargin

  /** Closed-form canonical-raster signature chain (CTE prefix `p`,
    * ends in `<p>sig(doc_id, cw, ch, lo, hi)`), parameterized by a docs
    * CTE emitting (doc_id, g, v) — g drives the ramp/dims, v the
    * variant (0/3 base, 1 = exact 2× NN upscale, 2 = (0,0)-noise):
    * variant-aware source raster, NN-resample to the CanonDim canvas —
    * floor division composes, so the upscale's canonical pixel
    * ((x·2w div cw) div 2, …) lands on the base's (x·w div cw, …) —
    * then the 8×8 block/bit chain split into two 32-bit halves (bit 63
    * of one BIGINT would need `1 << 63`, which overflows). Shared by
    * the near-dup pair chain (corpus) and the incremental ingest gate
    * (corpus + incoming batch populations). */
  private def canonSigChain(p: String, docsSelect: String): String = {
    val d = Multimodal.NearNoiseDelta
    val c = Multimodal.CanonDim
    val gr = Multimodal.CanonGrid
    s"""${p}docs AS ($docsSelect),
       |${p}dims AS (SELECT doc_id, g, v,
       |    CASE WHEN v = 1 THEN (g % 13 + 4) * 2 ELSE g % 13 + 4 END AS aw,
       |    CASE WHEN v = 1 THEN (g % 11 + 4) * 2 ELSE g % 11 + 4 END AS ah
       |  FROM ${p}docs),
       |${p}cd AS (SELECT doc_id, g, v, aw, ah,
       |    greatest(1, aw * $c // greatest(aw, ah)) AS cw,
       |    greatest(1, ah * $c // greatest(aw, ah)) AS ch
       |  FROM ${p}dims),
       |${p}px AS (
       |  SELECT d.doc_id, d.g, d.v, d.cw, d.ch, x.i AS x, y.j AS y,
       |    CASE WHEN d.v = 1 THEN ((x.i * d.aw) // d.cw) // 2
       |         ELSE (x.i * d.aw) // d.cw END AS bx,
       |    CASE WHEN d.v = 1 THEN ((y.j * d.ah) // d.ch) // 2
       |         ELSE (y.j * d.ah) // d.ch END AS by
       |  FROM ${p}cd d,
       |    LATERAL (SELECT unnest(generate_series(0, d.cw - 1)) AS i) x,
       |    LATERAL (SELECT unnest(generate_series(0, d.ch - 1)) AS j) y),
       |${p}gr AS (
       |  SELECT doc_id, cw, ch, x, y,
       |    CASE WHEN v = 2 AND bx = 0 AND by = 0
       |      THEN (((g * 3 + bx + by) * 37 + bx * by * (g % 17 + 1) * 11)
       |             % 256 + $d) % 256
       |         + (((g * 5 + 2 * bx) * 59 + bx * bx * (g % 19 + 1) * 13)
       |             % 256 + $d) % 256
       |         + (((g * 7 + 3 * by) * 83 + by * by * (g % 23 + 1) * 17)
       |             % 256 + $d) % 256
       |      ELSE ((g * 3 + bx + by) * 37 + bx * by * (g % 17 + 1) * 11) % 256
       |         + ((g * 5 + 2 * bx) * 59 + bx * bx * (g % 19 + 1) * 13) % 256
       |         + ((g * 7 + 3 * by) * 83 + by * by * (g % 23 + 1) * 17) % 256
       |      END AS gray
       |  FROM ${p}px),
       |${p}tot AS (SELECT doc_id, max(cw) AS cw, max(ch) AS ch,
       |    CAST(sum(gray) AS BIGINT) AS total, count(*) AS n
       |  FROM ${p}gr GROUP BY 1),
       |${p}blk AS (SELECT doc_id, (x * $gr) // cw AS bi, (y * $gr) // ch AS bj,
       |    CAST(sum(gray) AS BIGINT) AS bs, count(*) AS bn
       |  FROM ${p}gr GROUP BY 1, 2, 3),
       |${p}bits AS (SELECT b.doc_id, b.bj * $gr + b.bi AS k,
       |    CASE WHEN b.bs * t.n > t.total * b.bn THEN 1 ELSE 0 END AS bit
       |  FROM ${p}blk b JOIN ${p}tot t USING (doc_id)),
       |${p}sig AS (SELECT t.doc_id, t.cw, t.ch,
       |    CAST(coalesce(sum(CASE WHEN b.k < 32 AND b.bit = 1
       |      THEN CAST(1 AS BIGINT) << CAST(b.k AS INTEGER) END), 0)
       |      AS BIGINT) AS lo,
       |    CAST(coalesce(sum(CASE WHEN b.k >= 32 AND b.bit = 1
       |      THEN CAST(1 AS BIGINT) << CAST(b.k - 32 AS INTEGER) END), 0)
       |      AS BIGINT) AS hi
       |  FROM ${p}tot t JOIN ${p}bits b ON b.doc_id = t.doc_id
       |  GROUP BY 1, 2, 3)""".stripMargin
  }

  /** 16-bit band explosion over a `<p>sig` chain (prefix-matched). */
  private def canonBandCte(p: String): String =
    s"""${p}bnd AS (SELECT doc_id, cw, ch, lo, hi, b.b AS band,
       |    (CASE WHEN b.b < 2 THEN lo >> CAST(16 * b.b AS INTEGER)
       |      ELSE hi >> CAST(16 * (b.b - 2) AS INTEGER) END) & 65535 AS bval
       |  FROM ${p}sig, LATERAL (SELECT unnest(generate_series(0, 3)) AS b) b)"""
      .stripMargin

  /** The near-dup fixture's corpus population: group = doc div 4,
    * variant = doc mod 4. */
  private val mmNearDocsSelect: String = {
    val g = Multimodal.NearGroup
    s"SELECT doc_id, doc_id // $g AS g, doc_id % $g AS v FROM documents"
  }

  /** Closed-form mirror of the canonical-raster image near-dup chain
    * (prefix `i`, ends in `ipairs(a_id, b_id, hamming)`): the
    * [[canonSigChain]] over the planted fixture, 16-bit band
    * bucketing, and the Hamming ≤ NearHamMax verify. */
  private val mmNearCtes: String = {
    val hm = Multimodal.NearHamMax
    s"""${canonSigChain("i", mmNearDocsSelect)},
       |${canonBandCte("i")},
       |ipairs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
       |      AS BIGINT) AS hamming
       |  FROM ibnd a JOIN ibnd b ON a.cw = b.cw AND a.ch = b.ch
       |    AND a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi))
       |    <= $hm)""".stripMargin
  }

  /** Closed-form per-frame video fingerprint chain (prefix `p`, ends
    * in `<p>sig(doc_id, f, gray_sum, ahash)`), parameterized by a docs
    * CTE emitting (doc_id, g, off, nf): frames f ∈ [0, nf) cut from
    * group g's stock stream at position g·ClipStride + off + f,
    * rendered at the group's dimensions through the mm_video_fp
    * pixel/block/bit chain. Shared by the corpus matcher and the
    * incremental ingest gate's two populations. */
  private def vidFpChain(p: String, docsSelect: String): String = {
    val g = Multimodal.AhashGrid
    val cs = Multimodal.ClipStride
    s"""${p}docs AS ($docsSelect),
       |${p}px AS (
       |  SELECT d.doc_id, f.f,
       |    CAST(d.g % 13 + 4 AS BIGINT) AS w,
       |    CAST(d.g % 11 + 4 AS BIGINT) AS h,
       |    x.i AS x, y.j AS y,
       |    ((d.g * $cs + d.off + f.f) * 7 + 5 * x.i + 3 * y.j) % 256
       |      AS gray
       |  FROM ${p}docs d,
       |    LATERAL (SELECT unnest(generate_series(0, d.nf - 1)) AS f) f,
       |    LATERAL (SELECT unnest(generate_series(0,
       |      CAST(d.g % 13 + 3 AS BIGINT))) AS i) x,
       |    LATERAL (SELECT unnest(generate_series(0,
       |      CAST(d.g % 11 + 3 AS BIGINT))) AS j) y),
       |${p}tot AS (SELECT doc_id, f, max(w) AS w, max(h) AS h,
       |    CAST(sum(gray) AS BIGINT) AS total, count(*) AS n
       |  FROM ${p}px GROUP BY 1, 2),
       |${p}blk AS (SELECT doc_id, f, (x * $g) // w AS i, (y * $g) // h AS j,
       |    CAST(sum(gray) AS BIGINT) AS bs, count(*) AS bn
       |  FROM ${p}px GROUP BY 1, 2, 3, 4),
       |${p}bits AS (SELECT b.doc_id, b.f,
       |    CASE WHEN b.bs * t.n > t.total * b.bn
       |      THEN CAST(1 AS BIGINT) << CAST(b.j * $g + b.i AS INTEGER)
       |      ELSE CAST(0 AS BIGINT) END AS bit
       |  FROM ${p}blk b JOIN ${p}tot t ON t.doc_id = b.doc_id
       |    AND t.f = b.f),
       |${p}sig AS (SELECT t.doc_id, t.f, t.total AS gray_sum,
       |    CAST(sum(b.bit) AS BIGINT) AS ahash
       |  FROM ${p}tot t JOIN ${p}bits b ON b.doc_id = t.doc_id
       |    AND b.f = t.f
       |  GROUP BY 1, 2, 3)""".stripMargin
  }

  /** The shared-clip video corpus population: group = doc div 8,
    * frame offset = doc mod 4, doc mod 5 + 2 frames. */
  private val vidCorpusDocs: String =
    s"""SELECT doc_id, doc_id // ${Multimodal.ClipGroup} AS g,
       |  doc_id % 4 AS off,
       |  CAST(doc_id % 5 + 2 AS BIGINT) AS nf FROM documents"""
      .stripMargin

  /** Closed-form mirror of the shared-clip video chain (prefix `v`,
    * ends in `vruns(a_id, b_id, gap, start_a, run_len)`): the
    * [[vidFpChain]] over the corpus population, then signature join →
    * gap band → island run assembly. */
  private val mmVideoRunCtes: String =
    s"""${vidFpChain("v", vidCorpusDocs)},
       |vm AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(b.f - a.f AS BIGINT) AS gap, CAST(a.f AS BIGINT) AS pa
       |  FROM vsig a JOIN vsig b ON a.gray_sum = b.gray_sum
       |    AND a.ahash = b.ahash AND a.doc_id < b.doc_id),
       |visl AS (SELECT a_id, b_id, gap, pa,
       |    pa - CAST(row_number() OVER (PARTITION BY a_id, b_id, gap
       |      ORDER BY pa) AS BIGINT) AS island
       |  FROM vm),
       |vruns AS (SELECT a_id, b_id, gap, CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(count(*) AS BIGINT) AS run_len
       |  FROM visl GROUP BY a_id, b_id, gap, island
       |  HAVING count(*) >= ${Multimodal.MinSharedRun})""".stripMargin

  /** Closed-form per-window audio fingerprint chain (prefix `p`, ends
    * in `<p>fp(doc_id, win, wfp)`), parameterized by a docs CTE
    * emitting (doc_id, g, off, nw): windows k ∈ [0, nw) cut from group
    * g's stream at window g·ClipStride + off + k, each fingerprinted
    * by the envelope-share weighted sum (the engine's 8-sample sub-bin
    * sums are 8·level each — the 8 cancels in the floor division, so
    * levels stand in exactly). Shared by the corpus matcher and the
    * incremental ingest gate's two populations. */
  private def audFpChain(p: String, docsSelect: String): String = {
    val cs = Multimodal.ClipStride
    val pCase = Multimodal.ClipLevelPrimes.zipWithIndex
      .map { case (pr, m) => s"WHEN $m THEN $pr" }.mkString(" ")
    val wCase = Multimodal.WfpWeights.zipWithIndex
      .map { case (w, m) => s"WHEN $m THEN $w" }.mkString(" ")
    s"""${p}docs AS ($docsSelect),
       |${p}wins AS (
       |  SELECT d.doc_id, k.k AS win, d.g * $cs + d.off + k.k AS b
       |  FROM ${p}docs d,
       |    LATERAL (SELECT unnest(generate_series(0, d.nw - 1)) AS k) k),
       |${p}lv AS (SELECT doc_id, win,
       |    (b * 48271) % (CASE m.m $pCase END) + 16 AS lvl,
       |    CAST(m.m AS BIGINT) AS m
       |  FROM ${p}wins,
       |    LATERAL (SELECT unnest(generate_series(0, 7)) AS m) m),
       |${p}ws AS (SELECT doc_id, win, CAST(sum(lvl) AS BIGINT) AS wsum
       |  FROM ${p}lv GROUP BY 1, 2),
       |${p}fp AS (SELECT l.doc_id, l.win,
       |    CAST(sum((l.lvl * 65536 // w.wsum)
       |      * (CASE l.m $wCase END)) AS BIGINT) AS wfp
       |  FROM ${p}lv l JOIN ${p}ws w ON w.doc_id = l.doc_id
       |    AND w.win = l.win
       |  GROUP BY 1, 2)""".stripMargin
  }

  /** The trimmed-copy audio corpus population: group = doc div 8,
    * window offset = doc mod 4, 4 + doc mod 3 windows. */
  private val audCorpusDocs: String =
    s"""SELECT doc_id, doc_id // ${Multimodal.ClipGroup} AS g,
       |  doc_id % 4 AS off,
       |  CAST(4 + doc_id % 3 AS BIGINT) AS nw FROM documents"""
      .stripMargin

  /** Closed-form mirror of the trimmed-copy audio chain (prefix `a`,
    * ends in `aruns(a_id, b_id, gap, start_a, run_len)`): the
    * [[audFpChain]] over the corpus population, then the same join →
    * gap band → island run assembly. */
  private val mmAudioRunCtes: String =
    s"""${audFpChain("a", audCorpusDocs)},
       |am AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |    CAST(b.win - a.win AS BIGINT) AS gap,
       |    CAST(a.win AS BIGINT) AS pa
       |  FROM afp a JOIN afp b ON a.wfp = b.wfp
       |    AND a.doc_id < b.doc_id),
       |aisl AS (SELECT a_id, b_id, gap, pa,
       |    pa - CAST(row_number() OVER (PARTITION BY a_id, b_id, gap
       |      ORDER BY pa) AS BIGINT) AS island
       |  FROM am),
       |aruns AS (SELECT a_id, b_id, gap, CAST(min(pa) AS BIGINT) AS start_a,
       |    CAST(count(*) AS BIGINT) AS run_len
       |  FROM aisl GROUP BY a_id, b_id, gap, island
       |  HAVING count(*) >= ${Multimodal.MinSharedRun})""".stripMargin

  /** Cross-population run-gate assembly (batch `q` chain vs a corpus
    * chain ending in `<c>(doc_id, <pos>, <sig cols>)`): signature
    * equi-join, islands per (batch, corpus, gap), runs ≥ MinSharedRun,
    * and the per-asset rollup with −1 sentinels — the oracle mirror of
    * the engine's runGateRollup ∘ sharedRunsAgainst. */
  private def runGateSql(corpusRel: String, batchRel: String,
      posCol: String, sigJoin: String): String =
    s"""qm AS (SELECT q.doc_id AS batch_id, c.doc_id AS corpus_id,
       |    CAST(c.$posCol - q.$posCol AS BIGINT) AS gap,
       |    CAST(q.$posCol AS BIGINT) AS pb
       |  FROM $batchRel q JOIN $corpusRel c ON $sigJoin),
       |qisl AS (SELECT batch_id, corpus_id, gap, pb,
       |    pb - CAST(row_number() OVER (PARTITION BY batch_id, corpus_id,
       |      gap ORDER BY pb) AS BIGINT) AS island
       |  FROM qm),
       |qruns AS (SELECT batch_id, corpus_id,
       |    CAST(count(*) AS BIGINT) AS run_len
       |  FROM qisl GROUP BY batch_id, corpus_id, gap, island
       |  HAVING count(*) >= ${Multimodal.MinSharedRun}),
       |qagg AS (SELECT batch_id,
       |    CAST(count(DISTINCT corpus_id) AS BIGINT) AS n_matches,
       |    min(corpus_id) AS matched_id, max(run_len) AS best_run
       |  FROM qruns GROUP BY 1),
       |qids AS (SELECT DISTINCT doc_id AS batch_id FROM $batchRel)
       |SELECT i.batch_id, coalesce(a.n_matches, 0) AS n_matches,
       |  coalesce(a.matched_id, -1) AS matched_id,
       |  coalesce(a.best_run, -1) AS best_run,
       |  CAST(CASE WHEN a.batch_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_new
       |FROM qids i LEFT JOIN qagg a ON a.batch_id = i.batch_id"""
      .stripMargin

  /** Base^k mod 2⁶⁴ for k = 0..Window-1, rendered as DuckDB HUGEINT
    * literals — derived from [[graft.functions.RollingHash]]'s constants
    * so the oracle can never drift from the Spark expression. DuckDB has
    * no wrapping 64-bit multiply (it raises on overflow where the JVM
    * wraps), so the oracle evaluates the window polynomial in HUGEINT
    * with an explicit mod-2⁶⁴ reduction and converts to signed at the
    * end; the Scala side's rolling add/subtract recurrence is
    * algebraically the same windowed sum mod 2⁶⁴. */
  private val rollingPowersCte: String = {
    val m = java.math.BigInteger.ONE.shiftLeft(64)
    val base = java.math.BigInteger.valueOf(graft.functions.RollingHash.Base)
    var p = java.math.BigInteger.ONE
    val rows = (0 until graft.functions.RollingHash.Window).map { k =>
      val cur = p
      p = p.multiply(base).mod(m)
      s"($k, $cur::HUGEINT)"
    }
    s"pw(e, p) AS (VALUES ${rows.mkString(", ")})"
  }

  /** Powers/permutation tables for the minhash_band_pairs oracle,
    * generated from the SAME SigImpl constants the engine compiles in:
    * word-hash powers WordBase^e mod P, the 64 affine permutation
    * (a, b) pairs, and the 5 shingle-base powers. */
  private val minhashPolyCtes: String = {
    import graft.functions.SigImpl
    val bigP = java.math.BigInteger.valueOf(SigImpl.P)
    val base = java.math.BigInteger.valueOf(SigImpl.WordBase)
    val wpw = (0 until SigImpl.MaxWordLen)
      .map(e => s"($e, ${base.modPow(java.math.BigInteger.valueOf(e), bigP)})")
      .mkString(", ")
    val perm = (0 until SigImpl.NumHashes)
      .map(k => s"($k, ${SigImpl.permA(k)}, ${SigImpl.permB(k)})")
      .mkString(", ")
    val wsj = SigImpl.shinglePow.zipWithIndex
      .map { case (p, j) => s"($j, $p)" }.mkString(", ")
    s"""wpw(e, p) AS (VALUES $wpw),
       |perm(k, a, b) AS (VALUES $perm),
       |wsj(j, p) AS (VALUES $wsj)""".stripMargin
  }

  /** Full SQL mirror of the PQ chain (exts/PqIndex.scala): fixed-point
    * subvectors, per-subspace integer k-means ([[graft.exts.PqIndex.PqIters]]
    * Lloyd rounds, truncated-toward-zero integer means — Spark `div` and
    * DuckDB `//` both truncate, so negative sums agree —
    * min-L2² ties→lowest code), and final code
    * assignment — all integer arithmetic, so codebooks/codes/distances are
    * engine-exact with no float mirroring. Ends in `pcodes(vec_id, m,
    * code, d2)` + `pcbN` (the final codebook). */
  private def pqCtes: String = {
    import graft.exts.PqIndex.{CodeWords, PqIters, SubDim, SubSpaces}
    def l2(a: String, b: String) =
      s"CAST(list_sum(list_transform(range($SubDim), i -> " +
        s"($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1]))) AS BIGINT)"
    val iterCtes = (1 to PqIters).map { i =>
      s"""pasg$i AS (
         |  SELECT m, code, qsub FROM (
         |    SELECT s.vec_id, s.m, s.qsub, c.code,
         |      row_number() OVER (PARTITION BY s.vec_id, s.m
         |        ORDER BY ${l2("s.qsub", "c.cw")}, c.code) AS rn
         |    FROM psamp s JOIN pcb${i - 1} c ON c.m = s.m)
         |  WHERE rn = 1),
         |pm$i AS (
         |  SELECT m, code, d, CAST(sum(v) // count(*) AS BIGINT) AS mv FROM (
         |    SELECT m, code, unnest(qsub) AS v,
         |           unnest(range(len(qsub))) AS d
         |    FROM pasg$i)
         |  GROUP BY m, code, d),
         |pcb$i AS (SELECT m, code, list(mv ORDER BY d) AS cw
         |          FROM pm$i GROUP BY m, code)""".stripMargin
    }.mkString(",\n")
    s"""qsubs AS (
       |  SELECT vec_id, mm.m AS m,
       |    list_transform(range($SubDim), d ->
       |      CAST(round(CAST(embedding[mm.m * $SubDim + d + 1] AS DOUBLE)
       |        * 10000) AS BIGINT)) AS qsub
       |  FROM embeddings,
       |    LATERAL (SELECT unnest(range($SubSpaces)) AS m) mm),
       |psamp AS (SELECT * FROM qsubs
       |          WHERE vec_id < ${graft.exts.Similarity.IvfTrainSample}),
       |pcb0 AS (SELECT m, CAST(vec_id AS INTEGER) AS code, qsub AS cw
       |         FROM qsubs WHERE vec_id < $CodeWords),
       |$iterCtes,
       |pcodes AS (
       |  SELECT vec_id, m, code, d2 FROM (
       |    SELECT q.vec_id, q.m, c.code,
       |      ${l2("q.qsub", "c.cw")} AS d2,
       |      row_number() OVER (PARTITION BY q.vec_id, q.m
       |        ORDER BY ${l2("q.qsub", "c.cw")}, c.code) AS rn
       |    FROM qsubs q JOIN pcb$PqIters c ON c.m = q.m)
       |  WHERE rn = 1)""".stripMargin
  }

  /** ADC search CTEs over [[pqCtes]]'s outputs, ending in
    * `pranked(query_id, neighbor_id, dist_q, rank)` — shared by the
    * pq_search and pq_recall oracles. */
  private def pqSearchCtes: String =
    s"""pdist AS (
       |  SELECT q.vec_id AS query_id, q.m, c.code,
       |    CAST(list_sum(list_transform(range(${graft.exts.PqIndex.SubDim}),
       |      i -> (q.qsub[i+1] - c.cw[i+1]) * (q.qsub[i+1] - c.cw[i+1])))
       |      AS BIGINT) AS dq
       |  FROM qsubs q JOIN pcb${graft.exts.PqIndex.PqIters} c ON c.m = q.m
       |  WHERE q.vec_id < 8),
       |pscored AS (
       |  SELECT d.query_id, n.vec_id AS neighbor_id,
       |    CAST(sum(d.dq) AS BIGINT) AS dist_q
       |  FROM pcodes n JOIN pdist d ON d.m = n.m AND d.code = n.code
       |  WHERE n.vec_id <> d.query_id
       |  GROUP BY 1, 2),
       |pranked AS (
       |  SELECT query_id, neighbor_id, dist_q,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist_q, neighbor_id) AS rank
       |  FROM pscored)""".stripMargin

  /** Composed IVF×PQ search CTEs — corpus/query cell assignment against
    * the shared k-means centroids ([[trainCtes]]'s `cent2`), then the ADC
    * scoring restricted to probed cells, reusing [[pqSearchCtes]]'s
    * `pdist` distance tables so the composed oracle cannot drift from the
    * pq_search one. Ends in `ipranked(query_id, neighbor_id, dist_q,
    * rank)`. */
  private def ivfPqCtes(nprobe: Int): String = {
    val fin = trainFinalCte
    s"""cca AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
       |                 c.cent_id) AS rn
       |    FROM embeddings e CROSS JOIN $fin c)
       |  WHERE rn = 1),
       |qca AS (
       |  SELECT query_id, cell FROM (
       |    SELECT e.vec_id AS query_id, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
       |                 c.cent_id) AS rn
       |    FROM embeddings e CROSS JOIN $fin c WHERE e.vec_id < 8)
       |  WHERE rn <= $nprobe),
       |ipscored AS (
       |  SELECT d.query_id, n.vec_id AS neighbor_id,
       |    CAST(sum(d.dq) AS BIGINT) AS dist_q
       |  FROM pcodes n
       |  JOIN cca ON cca.vec_id = n.vec_id
       |  JOIN qca ON qca.cell = cca.cell
       |  JOIN pdist d ON d.query_id = qca.query_id
       |    AND d.m = n.m AND d.code = n.code
       |  WHERE n.vec_id <> qca.query_id
       |  GROUP BY 1, 2),
       |ipranked AS (
       |  SELECT query_id, neighbor_id, dist_q,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist_q, neighbor_id) AS rank
       |  FROM ipscored)""".stripMargin
  }

  /** documents ∪ planted near-copies — DuckDB side. */
  private val nearCorpusCte =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000, text || ' zqx wvk'
      |  FROM documents WHERE doc_id % 7 = 0)""".stripMargin

  /** embeddings ∪ planted scaled copies — DuckDB side. */
  private val embCorpusCte =
    """corpus AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000, list_transform(embedding, x -> x * 2)
      |  FROM embeddings WHERE vec_id % 10 = 0)""".stripMargin

  /** Sign-bucket expression over a lists column — DuckDB side (1-based). */
  private val bucketSql = (1 to Similarity.BucketBits).map { k =>
    s"(CASE WHEN embedding[$k] >= 0 THEN ${1 << (k - 1)} ELSE 0 END)"
  }.mkString(" + ")

  /** knn_graph's CTE chain (adaptive bits → buckets → within-bucket
    * candidates → per-node top-k edges `e`), shared by knn_graph and
    * knn_components so the clustering can't drift from the graph. */
  private val knnGraphCtes =
    s"""n AS (SELECT count(*) AS n_corpus FROM embeddings),
       |p AS (SELECT coalesce(min(b), ${Similarity.MaxBucketBits}) AS bits
       |      FROM (SELECT unnest(range(${Similarity.BucketBits},
       |                               ${Similarity.MaxBucketBits + 1})) AS b), n
       |      WHERE n_corpus <= ${Similarity.TargetCellVectors}
       |                        * (CAST(1 AS BIGINT) << b)),
       |bkt AS (SELECT vec_id, embedding,
       |    CAST(list_sum(list_transform(range(1, bits + 1),
       |      k -> CASE WHEN embedding[k] >= 0
       |                THEN CAST(1 AS BIGINT) << (k - 1)
       |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
       |  FROM embeddings CROSS JOIN p),
       |cand AS (
       |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
       |    list_cosine_similarity(x.embedding, y.embedding) AS cos
       |  FROM bkt x JOIN bkt y
       |    ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
       |e AS (
       |  SELECT src_id, dst_id, CAST(rn AS INTEGER) AS rank
       |  FROM (SELECT src_id, dst_id,
       |          row_number() OVER (PARTITION BY src_id
       |            ORDER BY cos DESC, dst_id) AS rn
       |        FROM cand)
       |  WHERE rn <= ${Similarity.KnnGraphK})""".stripMargin

  /** graph_walks' CTE chain on top of [[knnGraphCtes]] — the ranked edge
    * index `ei` plus one unrolled CTE per walk step and the full `walks`
    * union; shared by graph_walks and walk_skipgrams so the skip-gram
    * pairs cannot drift from the walk corpus. DuckDB's % is left-assoc,
    * so a % m2 % outdeg parses as ((a % m2) % outdeg) — the Spark order.
    */
  private val walkCtes: String = {
    def walkStep(prev: String, t: Int): String =
      s"""w$t AS (
         |  SELECT w.walk_id, CAST($t AS BIGINT) AS step,
         |    ei.dst_id AS vec_id
         |  FROM $prev w JOIN ei ON ei.src_id = w.vec_id
         |    AND ei.idx = ((w.walk_id % ${Similarity.WalkModA})
         |        * ${Similarity.WalkMulA}
         |        + $t * ${Similarity.WalkMulB}
         |        + ${Similarity.WalkAddC})
         |      % ${Similarity.WalkModB} % ei.outdeg)""".stripMargin
    val steps = (1 to Similarity.WalkLen)
      .map(t => walkStep(s"w${t - 1}", t)).mkString(",\n")
    val union = (0 to Similarity.WalkLen)
      .map(t => s"SELECT walk_id, step, vec_id FROM w$t")
      .mkString("\nUNION ALL ")
    s"""$knnGraphCtes,
       |ei AS (SELECT src_id, dst_id, CAST(rank AS BIGINT) - 1 AS idx,
       |  CAST(count(*) OVER (PARTITION BY src_id) AS BIGINT) AS outdeg
       |  FROM e),
       |w0 AS (SELECT vec_id AS walk_id, CAST(0 AS BIGINT) AS step,
       |  vec_id FROM embeddings),
       |$steps,
       |walks AS ($union)""".stripMargin
  }

  /** knn_components' mutual-edge → recursive-reach → component → size CTE
    * chain on top of [[knnGraphCtes]] (requires WITH RECURSIVE); shared
    * by knn_components and d4_prune so pruning cannot drift from the
    * clustering. */
  private val knnComponentCtes: String =
    s"""m AS (
       |  SELECT e1.src_id AS u, e1.dst_id AS v
       |  FROM e e1 JOIN e e2
       |    ON e2.src_id = e1.dst_id AND e2.dst_id = e1.src_id),
       |reach(u, v) AS (
       |  SELECT u, v FROM m
       |  UNION
       |  SELECT r.u, b.v FROM reach r JOIN m b ON r.v = b.u),
       |comp AS (
       |  SELECT u AS vec_id, least(u, min(v)) AS component,
       |    (u = least(u, min(v))) AS is_canonical
       |  FROM reach GROUP BY u),
       |sz AS (SELECT component, count(*) AS cluster_size
       |       FROM comp GROUP BY component)""".stripMargin

  /** Marker regexes interpolated from the single source in TextAnalysis so
    * Spark and oracle sides cannot drift. */
  private val Seq(langEn, langEs, langDe, langFr) =
    TextAnalysis.LangMarkers.map(_._2)

  /** Max-across-languages stopword count (mirror of the qualitySignals
    * `greatest` over all markers) — generated from LangMarkers so the
    * marker set stays single-sourced. */
  private val stopwordCaseSql =
    TextAnalysis.LangMarkers
      .map { case (_, p) => s"len(regexp_extract_all(text, '$p'))" }
      .mkString("greatest(", ", ", ")")

  /** The quality_filter signal/threshold chain over any (doc_id, text)
    * source `src` — shared by the quality_filter and incremental_curate
    * oracles so the signal definitions cannot drift. Ends in
    * `flagged(doc_id, signals…, reasons)`. */
  private def qualitySigCtes(src: String): String =
    s"""t AS (SELECT doc_id,
       |            CAST(length(text) AS INTEGER) AS n_chars_measured,
       |            CAST(len(regexp_split_to_array(trim(text), '\\s+'))
       |              AS INTEGER) AS n_tokens,
       |            CAST($stopwordCaseSql
       |              AS INTEGER) AS n_stopwords,
       |            regexp_split_to_array(trim(text), '\\s+') AS w
       |          FROM $src),
       |wc AS (SELECT doc_id, word, count(*) AS c
       |       FROM (SELECT doc_id, unnest(w) AS word FROM t)
       |       GROUP BY doc_id, word),
       |ws AS (SELECT doc_id, max(c) AS top_word_count,
       |         CAST(sum(c) AS BIGINT) AS rep_tokens
       |       FROM wc GROUP BY doc_id),
       |bgr AS (SELECT doc_id, bg, count(*) AS c FROM (
       |    SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
       |    FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))
       |                     AS i) x
       |    WHERE len(w) >= 2)
       |  GROUP BY doc_id, bg),
       |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       |         count(*) AS d_bigrams
       |       FROM bgr GROUP BY doc_id),
       |sig AS (
       |  SELECT t.doc_id, n_chars_measured, n_tokens,
       |    CAST((n_chars_measured * 100) // greatest(n_tokens, 1)
       |      AS BIGINT) AS mean_token_len_x100,
       |    CAST((n_stopwords * 1000) // greatest(n_tokens, 1)
       |      AS BIGINT) AS stopword_ratio_x1000,
       |    CAST(top_word_count * 1000 // rep_tokens AS BIGINT)
       |      AS top_word_x1000,
       |    CAST(coalesce((n_bigrams - d_bigrams) * 1000 // n_bigrams, 0)
       |      AS BIGINT) AS dup_bigram_x1000
       |  FROM t JOIN ws ON ws.doc_id = t.doc_id
       |  LEFT JOIN bs ON bs.doc_id = t.doc_id),
       |flagged AS (
       |  SELECT *, concat_ws(',',
       |    CASE WHEN n_chars_measured < 100 THEN 'too_short' END,
       |    CASE WHEN n_chars_measured > 20000 THEN 'too_long' END,
       |    CASE WHEN mean_token_len_x100 < 300
       |           OR mean_token_len_x100 > 1200 THEN 'token_shape' END,
       |    CASE WHEN stopword_ratio_x1000 < 20 THEN 'low_stopword' END,
       |    CASE WHEN top_word_x1000 > 200 THEN 'top_word' END,
       |    CASE WHEN dup_bigram_x1000 > 200 THEN 'dup_bigram' END)
       |    AS reasons
       |  FROM sig)""".stripMargin

  /** DuckDB mirror of [[TextAnalysis.ccnetBuckets]]: bigram-LM scoring →
    * (lang × distinct score) histogram → value-threshold tercile cuts.
    * Final CTE: `bucketed(doc_id, lang, lm_score_ppm, bucket)` — shared
    * by the ccnet_buckets and ccnet_sample oracles. */
  /** Per-doc bigram-LM score CTE chain (final CTE: `sc` with
    * (doc_id, lm_score_ppm)) — shared by the CCNet bucket chain and
    * mix_doremi so the perplexity surrogate is single-sourced. */
  /** BM25 core chain (docs → postings `tf` → vocabulary `dfr` → 1-row
    * `st`), shared by bm25_retrieve / bm25_batch / hybrid_search so the
    * index definition cannot drift between the retrieval oracles. */
  private val bm25CoreCtes: String =
    s"""d AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
       |  FROM documents),
       |tok AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl,
       |          unnest(ws) AS term FROM d),
       |tf AS (SELECT doc_id, term, count(*) AS tf, max(dl) AS dl
       |       FROM tok GROUP BY 1, 2),
       |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |st AS (SELECT count(*) AS n_docs,
       |         (CAST(sum(len(ws)) AS BIGINT) * 1000) // count(*)
       |           AS avgdl_x1000
       |       FROM d)""".stripMargin

  /** The BM25 per-(query, doc) contribution expression over joined
    * tf/dfr/st rows — the integer Okapi shape both engines share. */
  private val bm25ContribSql: String =
    s"""(((2 * (n_docs - df) + 1) * 1000) // (2 * df + 1))
       |      * ((tf * ${TextAnalysis.Bm25K1x1000 + 1000} * 1000)
       |         // (tf * 1000
       |             + (${TextAnalysis.Bm25K1x1000}
       |                * ((1000 - ${TextAnalysis.Bm25Bx1000})
       |                   + (${TextAnalysis.Bm25Bx1000} * dl * 1000)
       |                     // avgdl_x1000)) // 1000))
       |      // 1000""".stripMargin

  private val lmScoreCtes: String =
    s"""tok AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
       |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
       |  WHERE len(w) >= 2),
       |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
       |bgc AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c_bg
       |        FROM tf GROUP BY 1, 2),
       |ctx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx
       |        FROM bgc GROUP BY 1),
       |sc AS (
       |  SELECT doc_id,
       |    CAST(CAST(sum(tf * ((c_bg * 1000000) // c_ctx)) AS BIGINT)
       |      // CAST(sum(tf) AS BIGINT) AS BIGINT) AS lm_score_ppm
       |  FROM tf JOIN bgc USING (w1, w2) JOIN ctx USING (w1)
       |  GROUP BY doc_id)""".stripMargin

  private val ccnetBucketCtes: String =
    s"""$lmScoreCtes,
       |s AS (
       |  SELECT d.lang, sc.doc_id, sc.lm_score_ppm
       |  FROM sc JOIN documents d USING (doc_id)),
       |h AS (SELECT lang, lm_score_ppm, count(*) AS c
       |      FROM s GROUP BY 1, 2),
       |cums AS (
       |  SELECT lang, lm_score_ppm, c,
       |    sum(c) OVER (PARTITION BY lang
       |                 ORDER BY lm_score_ppm DESC) AS cum,
       |    sum(c) OVER (PARTITION BY lang) AS n
       |  FROM h),
       |th AS (SELECT lang, lm_score_ppm AS t_head FROM cums
       |       WHERE cum >= (n + 2) // 3 AND cum - c < (n + 2) // 3),
       |tm AS (SELECT lang, lm_score_ppm AS t_mid FROM cums
       |       WHERE cum >= (2 * n + 2) // 3
       |         AND cum - c < (2 * n + 2) // 3),
       |bucketed AS (
       |  SELECT s.doc_id, s.lang, s.lm_score_ppm,
       |    CASE WHEN s.lm_score_ppm >= th.t_head THEN 'head'
       |         WHEN s.lm_score_ppm >= tm.t_mid THEN 'middle'
       |         ELSE 'tail' END AS bucket
       |  FROM s JOIN th USING (lang) JOIN tm USING (lang))""".stripMargin

  /** DuckDB mirror of [[TextAnalysis.gopherRules]]' signal block (CTE
    * names prefixed g- to compose with [[qualitySigCtes]] in the
    * agreement oracle). Final CTE: `gsig`. */
  private def gopherSigCtes(src: String): String =
    s"""gw AS (
       |  SELECT doc_id, text,
       |    regexp_split_to_array(trim(text), '\\s+') AS gws
       |  FROM $src),
       |gsig AS (
       |  SELECT doc_id,
       |    CAST(len(gws) AS BIGINT) AS n_words,
       |    CAST(length(array_to_string(gws, '')) * 100 // len(gws)
       |      AS BIGINT) AS mean_word_len_x100,
       |    CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS BIGINT)
       |      AS n_symbols,
       |    CAST(len(list_filter(gws,
       |      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
       |      AS n_alpha_words,
       |    CAST(len(list_intersect(
       |      list_transform(gws,
       |        x -> regexp_replace(lower(x), '[^a-z]', '', 'g')),
       |      ['the','be','to','of','and','that','have','with']))
       |      AS BIGINT) AS n_stop_hits
       |  FROM gw)""".stripMargin

  /** The Gopher conjunction over `gsig`'s columns — single-sourced for
    * the gopher_rules and filter_agreement oracles. */
  private val gopherKeepSql: String =
    """((n_words >= 50 AND n_words <= 100000)
      |    AND (mean_word_len_x100 >= 300 AND mean_word_len_x100 <= 1000)
      |    AND (n_symbols * 10 <= n_words)
      |    AND (n_alpha_words * 5 >= n_words * 4)
      |    AND (n_stop_hits >= 1))""".stripMargin

  private def qualityOracleSql(src: String): String =
    s"""WITH ${qualitySigCtes(src)}
       |SELECT doc_id, n_chars_measured, mean_token_len_x100,
       |  stopword_ratio_x1000, top_word_x1000, dup_bigram_x1000,
       |  reasons, (reasons = '') AS keep
       |FROM flagged""".stripMargin

  /** DuckDB mirror of [[Similarity.trainedCentroids]] + the IVF search:
    * seeds → [[Similarity.IvfIters]] Lloyd iterations (assignment CTE +
    * per-dimension mean via parallel unnest, centroid cast to FLOAT so
    * both engines round the same double mean) → corpus/query assignment
    * against the final centroids. Generated so the iteration count stays
    * sourced from the one constant. @param probeRn the query-assignment
    * rank predicate (`rn = 1` / `rn <= 2`). */
  /** Shared k-means training CTE chain (seeds + Lloyd iterations); the
    * final centroid set is CTE `cent${Similarity.IvfIters}` (see
    * [[trainFinalCte]]). Used by the IVF search oracles AND the semantic
    * dedup oracle, so all three pin the same training semantics. */
  /** Oracle body of `ivf_maintenance` — factored so index_fleet_health
    * reuses the exact committed chain as a scoped subquery. */
  /** Oracle body of `mm_dup_incremental` — factored so mm_pair_gate
    * reuses the exact committed image-gate chain as a scoped
    * subquery. */
  private def mmDupIncrementalSql: String = {
    val hm = Multimodal.NearHamMax
    val off = Multimodal.IncomingIdOffset
    val nov = Multimodal.IncomingNovelOffset
    val g = Multimodal.NearGroup
    val batchDocs =
      s"""SELECT doc_id + $off AS doc_id,
         |    CASE WHEN doc_id % 16 = 3 THEN doc_id // $g + $nov
         |      ELSE doc_id // $g END AS g,
         |    CASE WHEN doc_id % 16 = 3 THEN 0 ELSE 1 END AS v
         |  FROM documents WHERE doc_id % 8 = 3""".stripMargin
    s"""WITH ${canonSigChain("i", mmNearDocsSelect)},
       |${canonSigChain("n", batchDocs)},
       |${canonBandCte("i")},
       |${canonBandCte("n")},
       |nmatch AS (
       |  SELECT DISTINCT n.doc_id AS batch_id, i.doc_id AS corpus_id,
       |    CAST(bit_count(xor(n.lo, i.lo)) + bit_count(xor(n.hi, i.hi))
       |      AS BIGINT) AS hamming
       |  FROM nbnd n JOIN ibnd i ON n.cw = i.cw AND n.ch = i.ch
       |    AND n.band = i.band AND n.bval = i.bval
       |  WHERE bit_count(xor(n.lo, i.lo)) + bit_count(xor(n.hi, i.hi))
       |    <= $hm),
       |nagg AS (SELECT batch_id, CAST(count(*) AS BIGINT) AS n_matches,
       |    min(corpus_id) AS matched_id, min(hamming) AS min_hamming
       |  FROM nmatch GROUP BY 1)
       |SELECT s.doc_id AS batch_id,
       |  coalesce(a.n_matches, 0) AS n_matches,
       |  coalesce(a.matched_id, -1) AS matched_id,
       |  coalesce(a.min_hamming, -1) AS min_hamming,
       |  CAST(CASE WHEN a.batch_id IS NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS is_new
       |FROM nsig s LEFT JOIN nagg a ON a.batch_id = s.doc_id"""
      .stripMargin
  }

  /** Shared CTE chain of the NEAR pair gate and its audit
    * (mm_pair_gate_near / mm_pair_audit): the mm_dup_incremental image
    * chain as `ginc`, the near-pair caption fixture (tail-edit branch
    * d%48==43), the distinct-corpus-caption index with its canonical
    * (min) carrier doc, the generic shingle / df-cap / integer-Jaccard
    * near law, and the per-batch caption flags + canonical source in
    * `cflag`. */
  private def mmPairNearCtes: String =
    s"""ginc AS ($mmDupIncrementalSql),
       |icap AS (SELECT doc_id,
       |    doc_id + ${Multimodal.IncomingIdOffset} AS batch_id,
       |    CASE WHEN doc_id % ${Multimodal.PairCapTailMod} = 43
       |           THEN doc_id % ${Multimodal.DupContentMod}
       |         WHEN doc_id % ${Multimodal.PairCapBranchMod} = 1
       |           THEN 300000 + doc_id
       |         WHEN doc_id % ${Multimodal.PairCapBranchMod} = 2
       |           THEN 90000 + doc_id % ${Multimodal.CapStockPool}
       |         ELSE doc_id % ${Multimodal.DupContentMod} END
       |      AS cap_id,
       |    (doc_id % ${Multimodal.PairCapTailMod} = 43) AS tail
       |  FROM documents WHERE doc_id % 8 = 3),
       |ictext AS (SELECT batch_id,
       |    'caption ' || cap_id || ' about subject ' ||
       |      ((cap_id * 7) % 97) ||
       |      CASE WHEN tail THEN ' v2' ELSE '' END AS caption
       |  FROM icap),
       |ccap AS (SELECT doc_id,
       |    CASE WHEN doc_id % ${Multimodal.CapBranchMod} = 3
       |           THEN 100000 + doc_id
       |         WHEN doc_id % ${Multimodal.CapBranchMod} = 4
       |           THEN 90000 + doc_id % ${Multimodal.CapStockPool}
       |         ELSE doc_id % ${Multimodal.DupContentMod} END
       |      AS cap_id
       |  FROM documents),
       |cdist AS (SELECT 'caption ' || cap_id ||
       |    ' about subject ' || ((cap_id * 7) % 97) AS caption,
       |    min(doc_id) AS doc_id
       |  FROM ccap GROUP BY 1),
       |csh AS (
       |  SELECT DISTINCT caption,
       |    array_to_string(words[i:i+4], ' ') AS sh
       |  FROM (SELECT caption,
       |          regexp_split_to_array(trim(caption), '\\s+') AS words
       |        FROM cdist),
       |       LATERAL (SELECT unnest(generate_series(1,
       |         len(words) - 4)) AS i) t
       |  WHERE len(words) >= 5),
       |hot AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM csh
       |                        GROUP BY sh)
       |        WHERE df > ${Dedup.DefaultMaxShingleDf}),
       |ck AS (SELECT caption, sh FROM csh ANTI JOIN hot USING (sh)),
       |bsh AS (
       |  SELECT DISTINCT batch_id,
       |    array_to_string(words[i:i+4], ' ') AS sh
       |  FROM (SELECT batch_id,
       |          regexp_split_to_array(trim(caption), '\\s+') AS words
       |        FROM ictext),
       |       LATERAL (SELECT unnest(generate_series(1,
       |         len(words) - 4)) AS i) t
       |  WHERE len(words) >= 5),
       |bk AS (SELECT batch_id, sh FROM bsh ANTI JOIN hot USING (sh)),
       |cs AS (SELECT caption, count(*) AS n_c FROM ck GROUP BY 1),
       |bs AS (SELECT batch_id, count(*) AS n_b FROM bk GROUP BY 1),
       |inter AS (SELECT bk.batch_id, ck.caption, count(*) AS inter
       |  FROM bk JOIN ck USING (sh) GROUP BY 1, 2),
       |near AS (SELECT i.batch_id, count(*) AS n,
       |    min(cd.doc_id) AS m_id
       |  FROM inter i
       |  JOIN cs ON cs.caption = i.caption
       |  JOIN bs ON bs.batch_id = i.batch_id
       |  JOIN cdist cd ON cd.caption = i.caption
       |  WHERE i.inter * 3 >= bs.n_b + cs.n_c GROUP BY 1),
       |cm AS (SELECT DISTINCT md5(caption) AS m FROM cdist),
       |cflag AS (SELECT i.batch_id,
       |    CAST(CASE WHEN cm.m IS NOT NULL THEN 1 ELSE 0 END
       |      AS BIGINT) AS cap_dup,
       |    CAST(coalesce(near.n, 0) AS BIGINT) AS cap_near_matches,
       |    CAST(CASE WHEN coalesce(near.n, 0) > 0 THEN 1 ELSE 0 END
       |      AS BIGINT) AS cap_dup_near,
       |    coalesce(near.m_id, -1) AS cap_match_id
       |  FROM (SELECT batch_id, md5(caption) AS m FROM ictext) i
       |  LEFT JOIN cm ON cm.m = i.m
       |  LEFT JOIN near ON near.batch_id = i.batch_id)""".stripMargin

  /** Planted-duplicate image SIGNATURE chain (ends in
    * `sig(doc_id, w, h, total, ahash)`): content id c = doc_id mod the
    * planted modulus drives the same pixel/block/bit chain as
    * mm_phash. Shared by mm_dup_groups and mm_caption_pairs so the
    * image-side grouping the two keys pin cannot drift. */
  private val mmDupSigCtes: String = {
    val g = Multimodal.AhashGrid
    val m = Multimodal.DupContentMod
    s"""px AS (
       |  SELECT d.doc_id, d.doc_id % $m AS c,
       |    CAST(d.doc_id % $m % 13 + 4 AS BIGINT) AS w,
       |    CAST(d.doc_id % $m % 11 + 4 AS BIGINT) AS h,
       |    x.i AS x, y.j AS y,
       |    (d.doc_id % $m * 3 + x.i + y.j) % 256
       |    + (d.doc_id % $m * 5 + 2 * x.i) % 256
       |    + (d.doc_id % $m * 7 + 3 * y.j) % 256 AS gray
       |  FROM documents d,
       |    LATERAL (SELECT unnest(generate_series(0,
       |      CAST(d.doc_id % $m % 13 + 3 AS BIGINT))) AS i) x,
       |    LATERAL (SELECT unnest(generate_series(0,
       |      CAST(d.doc_id % $m % 11 + 3 AS BIGINT))) AS j) y),
       |tot AS (SELECT doc_id, max(w) AS w, max(h) AS h,
       |    CAST(sum(gray) AS BIGINT) AS total, count(*) AS n
       |  FROM px GROUP BY 1),
       |blk AS (SELECT doc_id, (x * $g) // w AS i, (y * $g) // h AS j,
       |    CAST(sum(gray) AS BIGINT) AS bs, count(*) AS bn
       |  FROM px GROUP BY 1, 2, 3),
       |bits AS (SELECT b.doc_id,
       |    CASE WHEN b.bs * t.n > t.total * b.bn
       |      THEN CAST(1 AS BIGINT) << CAST(b.j * $g + b.i AS INTEGER)
       |      ELSE CAST(0 AS BIGINT) END AS bit
       |  FROM blk b JOIN tot t USING (doc_id)),
       |sig AS (SELECT t.doc_id, t.w, t.h, t.total,
       |    CAST(sum(bits.bit) AS BIGINT) AS ahash
       |  FROM tot t JOIN bits ON bits.doc_id = t.doc_id
       |  GROUP BY 1, 2, 3, 4)""".stripMargin
  }

  private def ivfMaintenanceSql: String =
    s"""WITH $trainCtes,
       |asgn AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
       |                 c.cent_id) AS rn
       |    FROM embeddings e CROSS JOIN $trainFinalCte c)
       |  WHERE rn = 1),
       |cells AS (
       |  SELECT cell, count(*) AS n_vectors, min(vec_id) AS min_vec_id
       |  FROM asgn GROUP BY cell),
       |tot AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS total,
       |               CAST(count(*) AS BIGINT) AS n_cells FROM cells)
       |SELECT cell, n_vectors, min_vec_id,
       |  CAST(n_vectors * n_cells * 1000 // total AS BIGINT)
       |    AS occupancy_x1000,
       |  CASE WHEN n_vectors * n_cells > total * 2 THEN 'split'
       |       WHEN n_vectors * n_cells * 2 < total THEN 'merge'
       |       ELSE 'keep' END AS action
       |FROM cells CROSS JOIN tot""".stripMargin
  /** Oracle body of `graph_health` — factored so index_fleet_health
    * reuses the exact committed chain as a scoped subquery. */
  private def graphHealthSql: String =
    s"""WITH $knnGraphCtes,
       |g AS (
       |  SELECT e.src_id,
       |    CASE WHEN r.src_id IS NULL THEN 0 ELSE 1 END AS mutual
       |  FROM e LEFT JOIN e r
       |    ON r.src_id = e.dst_id AND r.dst_id = e.src_id),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n_edges,
       |    CAST(coalesce(sum(mutual), 0) AS BIGINT) AS n_mutual
       |  FROM g),
       |d AS (SELECT src_id, count(*) AS n FROM g GROUP BY 1),
       |dd AS (SELECT CAST(coalesce(max(n), 0) AS BIGINT)
       |      AS max_out_deg,
       |    CAST(count(*) AS BIGINT) AS n_srcs
       |  FROM d),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes
       |  FROM embeddings)
       |SELECT nn.n_nodes, s.n_edges, s.n_mutual,
       |  CASE WHEN s.n_edges = 0 THEN CAST(0 AS BIGINT)
       |    ELSE s.n_mutual * 1000 // s.n_edges END AS mutual_permille,
       |  nn.n_nodes - dd.n_srcs AS n_isolated, dd.max_out_deg
       |FROM nn, s, dd""".stripMargin
  /** Oracle body of `media_health` — factored so index_fleet_health
    * reuses the exact committed chain as a scoped subquery. */
  private def mediaHealthSql: String =
    s"""WITH RECURSIVE $mmNearCtes,
       |$mmVideoRunCtes,
       |$mmAudioRunCtes,
       |edges AS (
       |  SELECT a_id, b_id FROM ipairs
       |  UNION SELECT a_id, b_id FROM vruns
       |  UNION SELECT a_id, b_id FROM aruns),
       |bi AS (SELECT a_id AS u, b_id AS v FROM edges
       |  UNION ALL SELECT b_id, a_id FROM edges),
       |reach(u, v) AS (
       |  SELECT u, v FROM bi
       |  UNION
       |  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
       |comp AS (SELECT u AS doc_id, least(u, min(v)) AS component
       |  FROM reach GROUP BY u),
       |sizes AS (SELECT component, count(*) AS sz
       |  FROM comp GROUP BY 1),
       |tagged AS (SELECT count(*) AS n_pairs FROM (
       |  SELECT a_id, b_id FROM ipairs
       |  UNION ALL SELECT DISTINCT a_id, b_id FROM vruns
       |  UNION ALL SELECT DISTINCT a_id, b_id FROM aruns)),
       |dup AS (SELECT count(*) AS n_dup_assets FROM (
       |  SELECT a_id AS d FROM edges UNION SELECT b_id FROM edges)),
       |na AS (SELECT count(*) AS n_assets FROM documents)
       |SELECT CAST(na.n_assets AS BIGINT) AS n_assets,
       |  CAST(tagged.n_pairs AS BIGINT) AS n_pairs,
       |  CAST(dup.n_dup_assets AS BIGINT) AS n_dup_assets,
       |  CAST(dup.n_dup_assets * 1000 // na.n_assets AS BIGINT)
       |    AS dup_permille,
       |  CAST((SELECT count(*) FROM sizes) AS BIGINT) AS n_components,
       |  CAST((SELECT coalesce(max(sz), 0) FROM sizes) AS BIGINT)
       |    AS max_component
       |FROM na, tagged, dup""".stripMargin

  private def trainCtes: String = {
    val iterCtes = (1 to Similarity.IvfIters).map { i =>
      s"""asg$i AS (
         |  SELECT cell, embedding FROM (
         |    SELECT s.vec_id, s.embedding, c.cent_id AS cell,
         |      row_number() OVER (PARTITION BY s.vec_id
         |        ORDER BY list_cosine_similarity(s.embedding, c.cent) DESC,
         |                 c.cent_id) AS rn
         |    FROM samp s CROSS JOIN cent${i - 1} c)
         |  WHERE rn = 1),
         |m$i AS (
         |  SELECT cell, dim, avg(val) AS m FROM (
         |    SELECT cell, unnest(embedding) AS val,
         |           unnest(range(len(embedding))) AS dim
         |    FROM asg$i)
         |  GROUP BY cell, dim),
         |cent$i AS (SELECT cell AS cent_id,
         |             list(CAST(m AS FLOAT) ORDER BY dim) AS cent
         |           FROM m$i GROUP BY cell)""".stripMargin
    }.mkString(",\n")
    s"""samp AS (SELECT vec_id, embedding FROM embeddings
       |         WHERE vec_id < ${Similarity.IvfTrainSample}),
       |cent0 AS (SELECT vec_id AS cent_id, embedding AS cent
       |          FROM embeddings WHERE vec_id < ${Similarity.IvfCentroids}),
       |$iterCtes""".stripMargin
  }

  private def trainFinalCte: String = s"cent${Similarity.IvfIters}"

  /** IVF search as a CTE chain ending in `ivf_res(query_id, neighbor_id,
    * rank)` — shared by the sim_ivf oracles and the ann_recall oracle so
    * all three pin the same search semantics. */
  private def ivfSearchCtes(probeRn: String): String = {
    val fin = trainFinalCte
    s"""ca AS (
       |  SELECT neighbor_id, emb_n, cell FROM (
       |    SELECT e.vec_id AS neighbor_id, e.embedding AS emb_n,
       |      c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
       |                 c.cent_id) AS rn
       |    FROM embeddings e CROSS JOIN $fin c)
       |  WHERE rn = 1),
       |qa AS (
       |  SELECT query_id, emb_q, cell FROM (
       |    SELECT e.vec_id AS query_id, e.embedding AS emb_q,
       |      c.cent_id AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
       |                 c.cent_id) AS rn
       |    FROM embeddings e CROSS JOIN $fin c WHERE e.vec_id < 8)
       |  WHERE $probeRn),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    list_cosine_similarity(emb_q, emb_n) AS cos
       |  FROM qa JOIN ca USING (cell) WHERE neighbor_id <> query_id),
       |ivf_res AS (
       |  SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
       |  FROM (SELECT query_id, neighbor_id,
       |          row_number() OVER (PARTITION BY query_id
       |            ORDER BY cos DESC, neighbor_id) AS rank
       |        FROM scored)
       |  WHERE rank <= 5)""".stripMargin
  }

  /** DuckDB mirror of [[TextAnalysis.bpeTrain]]: the same
    * [[TextAnalysis.BpeRounds]]-round merge loop as generated CTEs —
    * per-round pair counts from the delimiter-doubled encoding, the
    * deterministic argmax rule, and the literal-replace rewrite feeding
    * the next round. Generated from the one constant so Spark and oracle
    * cannot disagree on the round count. */
  /** The [[TextAnalysis.bpeTrain]] CTE chain (e0 + per-round pair counts,
    * argmax rules b1..bN, rewrites e1..e(N−1)) — shared by the bpe_train
    * and bpe_encode oracles. */
  private def bpeTrainCtes: String = {
    val rounds = TextAnalysis.BpeRounds
    val roundCtes = (1 to rounds).map { r =>
      val prev = s"e${r - 1}"
      // MATERIALIZED + single-reference rule joins: without them DuckDB
      // re-inlines the whole training chain at every reference and the
      // oracle's cost explodes combinatorially with the round count.
      val rewrite =
        if (r == rounds) ""
        else s""",
           |e$r AS MATERIALIZED (
           |  SELECT replace(enc, ' ' || pa || '  ' || pb || ' ',
           |                 ' ' || merged || ' ') AS enc
           |  FROM $prev, b$r)""".stripMargin
      s"""p$r AS (
         |  SELECT w[i] AS pa, w[i + 1] AS pb, count(*) AS cnt
         |  FROM (SELECT regexp_split_to_array(trim(enc), '\\s+') AS w
         |        FROM $prev),
         |    LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) x
         |  WHERE len(w) >= 2
         |  GROUP BY pa, pb),
         |b$r AS MATERIALIZED (
         |  SELECT $r AS round, pa, pb, pa || '_' || pb AS merged, cnt
         |  FROM p$r ORDER BY cnt DESC, pa, pb LIMIT 1)$rewrite""".stripMargin
    }.mkString(",\n")
    s"""e0 AS MATERIALIZED (
       |  SELECT ' ' || array_to_string(
       |      regexp_split_to_array(trim(text), '\\s+'), '  ') || ' ' AS enc
       |  FROM documents),
       |$roundCtes""".stripMargin
  }

  private def bpeOracleSql: String = {
    val union = (1 to TextAnalysis.BpeRounds)
      .map(r => s"SELECT round, pa, pb, merged, CAST(cnt AS BIGINT) AS cnt " +
        s"FROM b$r")
      .mkString("\nUNION ALL ")
    s"""WITH $bpeTrainCtes
       |$union""".stripMargin
  }

  /** bpe_fertility oracle: train on documents (shared CTEs), replay the
    * rules over the WHOLE corpus with lang carried, aggregate per
    * language — tokens-per-word ×1000. */
  private def bpeFertilityOracleSql: String = {
    val rounds = TextAnalysis.BpeRounds
    val applyCtes = (1 to rounds).map { r =>
      s"""f$r AS MATERIALIZED (
         |  SELECT doc_id, lang, n_tokens_before,
         |    replace(enc, ' ' || pa || '  ' || pb || ' ',
         |            ' ' || merged || ' ') AS enc
         |  FROM f${r - 1}, b$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeTrainCtes,
       |f0 AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
       |      AS n_tokens_before,
       |    ' ' || array_to_string(
       |      regexp_split_to_array(trim(text), '\\s+'), '  ') || ' ' AS enc
       |  FROM documents),
       |$applyCtes,
       |per AS (SELECT lang, n_tokens_before,
       |          CAST(len(regexp_split_to_array(trim(enc), '\\s+'))
       |            AS INTEGER) AS n_tokens_after
       |        FROM f$rounds)
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens_before) AS BIGINT) AS n_words,
       |  CAST(sum(n_tokens_after) AS BIGINT) AS n_tokens,
       |  CAST(CAST(sum(n_tokens_after) AS BIGINT) * 1000 //
       |    CAST(sum(n_tokens_before) AS BIGINT) AS BIGINT)
       |    AS fertility_x1000
       |FROM per GROUP BY lang""".stripMargin
  }

  /** bpe_encode oracle: train on documents (shared CTEs), then replay the
    * rules in round order over the incoming batch. */
  private def bpeEncodeOracleSql: String = {
    val rounds = TextAnalysis.BpeRounds
    val applyCtes = (1 to rounds).map { r =>
      s"""x$r AS MATERIALIZED (
         |  SELECT doc_id, n_tokens_before,
         |    replace(enc, ' ' || pa || '  ' || pb || ' ',
         |            ' ' || merged || ' ') AS enc
         |  FROM x${r - 1}, b$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH $bpeTrainCtes,
       |batch AS (
       |  SELECT doc_id + 600000 AS doc_id, text FROM documents
       |  WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 700000 AS doc_id, text || ' qq zz' FROM documents
       |  WHERE doc_id % 7 = 0),
       |x0 AS (
       |  SELECT doc_id,
       |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
       |      AS n_tokens_before,
       |    ' ' || array_to_string(
       |      regexp_split_to_array(trim(text), '\\s+'), '  ') || ' ' AS enc
       |  FROM batch),
       |$applyCtes
       |SELECT doc_id, n_tokens_before,
       |  CAST(len(regexp_split_to_array(trim(enc), '\\s+')) AS INTEGER)
       |    AS n_tokens_after,
       |  CAST(n_tokens_before -
       |    len(regexp_split_to_array(trim(enc), '\\s+')) AS INTEGER)
       |    AS n_merges,
       |  md5(enc) AS enc_md5
       |FROM x$rounds""".stripMargin
  }

  /** Shared emb_gram / emb_pca corpus chain: fixed-point-quantized
    * vectors → ROW-LOCAL upper-triangle pair sums (no self-join of the
    * exploded frame) → centered integer scatter `m = n·sxy − s_i·s_j`.
    * MATERIALIZED marks stop DuckDB re-inlining the corpus scan into
    * every consumer — without them the recursive power iteration re-runs
    * the whole gram chain per step (measured 24×: 15.8 s → 0.65 s at
    * sf0.1; the bpe_train MATERIALIZED lesson). Ends in
    * `ct(i, j, sxy, m)`, upper triangle only. */
  private val gramCtes: String =
    """q2 AS (
      |  SELECT vec_id, list_transform(embedding,
      |    x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS ql
      |  FROM embeddings),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
      |pr AS MATERIALIZED (
      |  SELECT i, j, CAST(sum(ql[i + 1] * ql[j + 1]) AS BIGINT) AS p
      |  FROM q2,
      |       LATERAL (SELECT unnest(range(0, len(ql))) AS i) a,
      |       LATERAL (SELECT unnest(range(i, len(ql))) AS j) b
      |  GROUP BY i, j),
      |sx AS MATERIALIZED (
      |  SELECT dim, CAST(sum(ql[dim + 1]) AS BIGINT) AS s
      |  FROM q2, LATERAL (SELECT unnest(range(0, len(ql))) AS dim) a
      |  GROUP BY dim),
      |ct AS MATERIALIZED (
      |  SELECT i, j, p AS sxy,
      |    CAST(nn.n * p - sa.s * sb.s AS BIGINT) AS m
      |  FROM pr CROSS JOIN nn
      |  JOIN sx sa ON sa.dim = i JOIN sx sb ON sb.dim = j)""".stripMargin

  /** Shared DSIR model chain (expects `flagged` from qualitySigCtes in
    * scope): quality-kept target + raw corpus token counts out of ONE
    * token stream, top-[[TextAnalysis.DsirHeadTerms]] head vocabulary
    * with its ppm lean. Ends in `vocab(term, s)` (and `tokk` — the
    * corpus token stream with keep flags, reused by the self-scoring
    * dsir_weights oracle). */
  private val dsirVocabCtes: String =
    s"""kf AS (SELECT doc_id, (reasons = '') AS keep FROM flagged),
       |tokk AS (SELECT d.doc_id, keep,
       |           unnest(regexp_split_to_array(trim(text), '\\s+'))
       |             AS term
       |         FROM documents d JOIN kf USING (doc_id)),
       |cnt AS (SELECT term, CAST(count(*) AS BIGINT) AS g_cnt,
       |          CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
       |            AS t_cnt
       |        FROM tokk GROUP BY term),
       |tot AS (SELECT CAST(sum(g_cnt) AS BIGINT) AS g_tot,
       |          CAST(sum(t_cnt) AS BIGINT) AS t_tot FROM cnt),
       |vocab AS MATERIALIZED (SELECT term,
       |          CAST(t_cnt * 1000000 // greatest(t_tot, 1)
       |            - g_cnt * 1000000 // greatest(g_tot, 1)
       |            AS BIGINT) AS s
       |        FROM cnt CROSS JOIN tot
       |        ORDER BY g_cnt DESC, term LIMIT ${
      graft.exts.TextAnalysis.DsirHeadTerms})""".stripMargin

  /** Per-doc DSIR scoring of token stream `src(doc_id, term)` against
    * `vocab` — the apply half, shared verbatim by both DSIR oracles. */
  private def dsirScoreCtes(src: String): String =
    s"""feat AS (SELECT t.doc_id,
       |           CAST(count(*) AS BIGINT) AS n_terms,
       |           CAST(count(v.s) AS BIGINT) AS n_feats,
       |           CAST(coalesce(sum(v.s), 0) AS BIGINT) AS sum_s
       |         FROM $src t LEFT JOIN vocab v USING (term)
       |         GROUP BY t.doc_id)""".stripMargin

  private val dsirScoreSelect: String =
    """SELECT doc_id, n_terms, n_feats,
      |  CAST(sum_s // greatest(n_feats, 1) AS BIGINT) AS dsir_ppm,
      |  (sum_s // greatest(n_feats, 1)) > 0 AS dsir_keep
      |FROM feat""".stripMargin

  private def ivfOracleSql(probeRn: String): String =
    s"""WITH $trainCtes,
       |${ivfSearchCtes(probeRn)}
       |SELECT query_id, neighbor_id, rank FROM ivf_res""".stripMargin

  val pack: QueryPack = QueryPack(
    queries = Map(
      "text_tokens" -> ((s, dir) => TextAnalysis.tokenCounts(s, dir)),
      "text_quality" -> ((s, dir) => TextAnalysis.qualityScores(s, dir)),
      "text_langid" -> ((s, dir) => TextAnalysis.langId(s, dir)),
      "lang_confusion" -> ((s, dir) => TextAnalysis.langConfusion(s, dir)),
      "text_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(s, dir)),
      // Feature-hashing-trick doc embeddings — one codegen'd compiled
      // pass per doc, zero shuffles; integer-exact and SQL-mirrorable.
      "text_hash_embed" -> ((s, dir) => TextAnalysis.textHashEmbed(s, dir)),
      "text_repetition" -> ((s, dir) => TextAnalysis.repetitionSignals(s, dir)),
      "quality_filter" -> ((s, dir) => TextAnalysis.qualityFilter(s, dir)),
      "text_pii_redact" -> ((s, dir) =>
        TextAnalysis.piiRedact(TextAnalysis.corpusWithPii(s, dir))),
      // Source-level boilerplate stripping (C4-style header removal) —
      // the boilerplate set is provably tiny and broadcasts back.
      "boilerplate_strip" -> ((s, dir) =>
        TextAnalysis.boilerplateStrip(s, dir)),
      "mix_sources" -> ((s, dir) => Sampling.mixSources(s, dir)),
      "mix_temperature" -> ((s, dir) => Sampling.mixTemperature(s, dir)),
      // DoReMi-style multiplicative-weights domain reweighting over the
      // bigram-LM loss surrogate — exact integer rounds.
      "mix_doremi" -> ((s, dir) => Sampling.mixDoremi(s, dir)),
      // UniMax-style budget waterfill with a per-source epoch cap —
      // closed-form integer threshold over the sources frame.
      "unimax_alloc" -> ((s, dir) => Sampling.unimaxAlloc(s, dir)),
      "mix_epochs" -> ((s, dir) => Sampling.mixEpochs(s, dir)),
      "epoch_expand" -> ((s, dir) => Sampling.epochExpand(s, dir)),
      "lsh_tune" -> ((s, _) => Dedup.lshTune(s)),
      "dup_weights" -> ((s, dir) => Dedup.dupWeights(s, dir)),
      "shard_manifest" -> ((s, dir) => Sampling.shardManifest(s, dir)),
      // end-to-end curation over documents ∪ planted exact copies: the
      // dedup stage must collapse every planted copy for the per-lang
      // totals to match the oracle
      "corpus_curate" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val base = graft.Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"), col("lang"))
        TextAnalysis.curateCorpus(base.unionByName(
          base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 100000L).as("doc_id"), col("text"),
              col("lang"))))
      }),
      "curation_funnel" -> ((s, dir) =>
        TextAnalysis.curationFunnel(Dedup.corpusWithExactDups(s, dir))),
      "dedup_semantic" -> ((s, dir) => Similarity.semanticDupPairs(s, dir)),
      "corpus_curate_semantic" -> ((s, dir) =>
        TextAnalysis.curateCorpusSemantic(s, dir)),

      "dedup_exact" -> ((s, dir) =>
        Dedup.exactDupGroups(Dedup.corpusWithExactDups(s, dir))),
      "dedup_exact_normalized" -> ((s, dir) =>
        Dedup.exactDupGroupsNormalized(Dedup.corpusWithCaseDups(s, dir))),
      "dedup_ngram_jaccard" -> ((s, dir) =>
        Dedup.ngramJaccardPairs(Dedup.corpusWithNearDups(s, dir))),
      "dedup_ngram_jaccard_capped" -> ((s, dir) =>
        Dedup.ngramJaccardPairsCapped(Dedup.corpusWithNearDups(s, dir))),
      "dedup_containment" -> ((s, dir) =>
        Dedup.containmentPairs(Dedup.corpusWithExcerpts(s, dir))),
      "dedup_incremental" -> ((s, dir) => Dedup.incrementalNew(s, dir)),
      "dedup_minhash_lsh" -> ((s, dir) =>
        Dedup.minhashLshPairs(Dedup.corpusWithNearDups(s, dir))),
      // the SQL-mirrorable MinHash band-bucketing twin: polynomial
      // signature + raw band tuples, hash-gated against a DuckDB oracle
      // that recomputes every signature (the FNV production variant above
      // stays golden-gated)
      "minhash_band_pairs" -> ((s, dir) =>
        Dedup.minhashBandPairs(Dedup.corpusWithNearDups(s, dir))),
      "simhash_band_pairs" -> ((s, dir) =>
        Dedup.simhashBandPairs(Dedup.corpusWithNearDups(s, dir))),
      "dedup_simhash" -> ((s, dir) =>
        Dedup.simhashPairs(Dedup.corpusWithNearDups(s, dir))),
      "dedup_embedding" -> ((s, dir) => Similarity.nearDupPairs(s, dir)),
      // the vector-store ingest gate: batch vs corpus, bucket-blocked
      "emb_incremental" -> ((s, dir) => Similarity.embIncremental(s, dir)),
      // the near tier of incremental ingest: batch vs corpus resemblance
      // over the df-capped shingle index, batch side broadcast
      "dedup_incremental_near" -> ((s, dir) =>
        Dedup.incrementalNearDups(s, dir)),
      "dedup_groups" -> ((s, dir) =>
        Dedup.dupComponents(
          Dedup.ngramJaccardPairs(Dedup.corpusWithNearDups(s, dir)))),
      "dedup_keep_list" -> ((s, dir) =>
        Dedup.dupKeepList(Dedup.corpusWithNearDups(s, dir))),
      "dedup_keep_best" -> ((s, dir) =>
        Dedup.dupKeepBest(Dedup.corpusWithNearDups(s, dir))),
      "corpus_diff" -> ((s, dir) => {
        import org.apache.spark.sql.functions.col
        Dedup.corpusDiff(
          Tables.load(s, dir, "documents")
            .select(col("doc_id"), col("text")),
          Dedup.corpusNextVersion(s, dir))
      }),
      // Distribution-level version drift: exact-integer total-variation
      // distance over token frequencies between releases + the
      // vocabulary ledger — the mixture monitor corpus_diff's md5
      // ledger can't see (a release can keep every doc_id and still
      // shift the token mixture).
      "corpus_drift" -> ((s, dir) => TextAnalysis.corpusDrift(s, dir)),
      // the economy corpus_diff buys: only added/changed docs re-enter
      // the (quality) pipeline — never the whole corpus
      "incremental_curate" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val base = Tables.load(s, dir, "documents")
          .select(col("doc_id"), md5(col("text")).as("h_base"))
        val delta = Dedup.corpusNextVersion(s, dir)
          .withColumn("h_next", md5(col("text")))
          .join(base, Seq("doc_id"), "left")
          .filter(col("h_base").isNull || col("h_base") =!= col("h_next"))
          .select(col("doc_id"), col("text"),
            when(col("h_base").isNull, lit("added"))
              .otherwise(lit("changed")).as("status"))
        TextAnalysis.qualitySignals(delta)
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(col("n_tokens").cast("long")).as("n_tokens"))
      }),
      "dedup_groups_ensemble" -> ((s, dir) =>
        Dedup.dupComponents(
          Dedup.ensemblePairs(Dedup.corpusWithMixedDups(s, dir)))),
      "dedup_report" -> ((s, dir) =>
        Dedup.dedupReport(Dedup.corpusWithMixedDups(s, dir))),
      // Feed-level contamination matrix over a planted syndication
      // scenario: a "wire" source re-publishing every 7th document (7 is
      // coprime with the 20-source id cycle, so every source syndicates
      // into the wire feed and every (srcN, src_wire) pair must light up).
      "source_overlap" -> ((s, dir) => {
        import org.apache.spark.sql.functions._
        val base = Tables.load(s, dir, "documents")
          .select(col("source"), col("text"))
        Dedup.sourceOverlap(base.unionByName(
          Tables.load(s, dir, "documents")
            .filter(col("doc_id") % 7 === 0)
            .select(lit("src_wire").as("source"), col("text"))))
      }),
      "text_dup_spans" -> ((s, dir) =>
        TextAnalysis.dupSpanScores(Dedup.corpusWithNearDups(s, dir))),
      "text_scrub_spans" -> ((s, dir) =>
        TextAnalysis.scrubSpans(Dedup.corpusWithNearDups(s, dir))),
      "decontaminate_scrub" -> ((s, dir) =>
        TextAnalysis.decontaminateScrub(Dedup.corpusWithLeaks(s, dir))),
      "curation_audit" -> ((s, dir) =>
        TextAnalysis.curationAudit(TextAnalysis.auditCorpus(s, dir))),
      "ccnet_buckets" -> ((s, dir) => TextAnalysis.ccnetBuckets(s, dir)),
      "ccnet_sample" -> ((s, dir) => TextAnalysis.ccnetSample(s, dir)),
      "corpus_stats" -> ((s, dir) => TextAnalysis.corpusStats(s, dir)),
      "gopher_rules" -> ((s, dir) => TextAnalysis.gopherRules(s, dir)),
      "filter_agreement" -> ((s, dir) => TextAnalysis.filterAgreement(s, dir)),
      "cluster_balance" -> ((s, dir) => Similarity.clusterBalance(s, dir)),
      "cluster_topics" -> ((s, dir) => Similarity.clusterTopics(s, dir)),
      // bitext_mine (exact all-pairs) is DEMOTED from the registered
      // surface (r13): its candidate stage is quadratic by design (the
      // measured 27× sf1 growth) and exists only as the oracle baseline
      // the LSH path's recall is spec-gated against
      // (Similarity.bitextMineOver, PipelineSpec "bitext mining" /
      // "bitext mutual mining"). The deployable key is the LSH path.
      "bitext_mine_lsh" -> ((s, dir) => Similarity.bitextMineLsh(s, dir)),
      "ivf_cells" -> ((s, dir) => Similarity.ivfCells(s, dir)),
      "ivf_maintenance" -> ((s, dir) => Similarity.ivfMaintenance(s, dir)),
      "decontaminate" -> ((s, dir) =>
        Dedup.contaminationPairs(Dedup.corpusWithLeaks(s, dir))),

      "sim_topk" -> ((s, dir) => Similarity.bruteTopK(s, dir)),
      "hard_negatives" -> ((s, dir) => Similarity.hardNegatives(s, dir)),
      "sim_ann_lsh" -> ((s, dir) => Similarity.lshTopK(s, dir)),
      "sim_ivf" -> ((s, dir) => Similarity.ivfTopK(s, dir)),
      "sim_ivf_probe2" -> ((s, dir) => Similarity.ivfTopK(s, dir, nprobe = 2)),
      // Index quality metric: IVF hits vs the brute-force ground truth.
      "ann_recall" -> ((s, dir) => Similarity.annRecall(s, dir)),
      "ann_mrr" -> ((s, dir) => Similarity.annMrr(s, dir)),
      // Scalar stats + md5-of-codes projection (not the int8 array) —
      // the harness row-sort can't hash array cells; q_md5 pins the full
      // code array. Oracle mirrors the IEEE-exact float→double→round
      // chain, so this is hash-gated (reconstruction quality additionally
      // asserted in PipelineSpec).
      "emb_quantize" -> ((s, dir) => Similarity.quantizeInt8Stats(s, dir)),
      // product quantization: integer-exact per-subspace codebooks,
      // codes, and ADC search (exts/PqIndex.scala) — oracle recomputes
      // the whole chain in SQL
      "pq_encode" -> ((s, dir) => PqIndex.pqEncode(s, dir)),
      "pq_search" -> ((s, dir) => PqIndex.pqSearch(s, dir)),
      "pq_recall" -> ((s, dir) => PqIndex.pqRecall(s, dir)),
      // the composed deployment shape: ADC over PQ codes WITHIN
      // IVF-probed cells (both halves' CTE chains reused by the oracle)
      "ivf_pq_search" -> ((s, dir) => PqIndex.ivfPqSearch(s, dir)),
      "ivf_pq_recall" -> ((s, dir) => PqIndex.ivfPqRecall(s, dir)),
      // two-stage: ADC shortlist → exact rerank of just the shortlist
      "ivf_pq_refine" -> ((s, dir) => PqIndex.ivfPqRefine(s, dir)),
      "ivf_pq_refine_recall" -> ((s, dir) =>
        PqIndex.ivfPqRefineRecall(s, dir)),
      "emb_stats" -> ((s, dir) => Similarity.embStats(s, dir)),
      // Release-over-release embedding drift: per-dim moment + norm-
      // profile deltas between release A and the planted re-embedding
      // release B, with the integer drift verdict a monitor alerts on
      // — corpus_drift's vector sibling.
      "emb_drift" -> ((s, dir) => Similarity.embDrift(s, dir)),
      // Per-vector release ledger: added/removed/changed/kept via the
      // fixed-point code digest — corpus_diff's vector sibling, the
      // id-level edit log an incremental re-index plans from.
      "emb_diff" -> ((s, dir) => Similarity.embDiff(s, dir)),
      "emb_outliers" -> ((s, dir) => Similarity.embOutliers(s, dir)),
      // distributed integer-exact scatter matrix + its top principal
      // component by fixed-count power iteration (bit-reproducible IEEE
      // steps; d×d matrix is metadata)
      "emb_gram" -> ((s, dir) => Similarity.embGram(s, dir)),
      "emb_pca" -> ((s, dir) => Similarity.embPca(s, dir)),
      "emb_project" -> ((s, dir) => Similarity.embProject(s, dir)),
      "knn_graph" -> ((s, dir) => Similarity.knnGraph(s, dir)),
      // Incremental graph maintenance: merge the vector ingest batch
      // into the persisted KnnIndex edges bucket-locally — bit-equal
      // to a full rebuild over corpus ∪ batch (the oracle IS that
      // rebuild), without re-scoring untouched buckets.
      "knn_incremental" -> ((s, dir) => Similarity.knnIncremental(s, dir)),
      // The graph index's maintenance-dashboard report — the
      // reference's metrics-evaluator role for this index family
      // (small_file_metrics' sibling): the numbers a rebuild policy
      // reads, one integer-exact row.
      "graph_health" -> ((s, dir) => Similarity.graphHealth(s, dir)),
      "knn_components" -> ((s, dir) => Similarity.knnComponents(s, dir)),
      // Fixed-point integer PageRank over the knn_graph edges — the
      // corpus-centrality record (bit-reproducible across engines).
      "graph_pagerank" -> ((s, dir) => Similarity.graphPagerank(s, dir)),
      // Deterministic random-walk corpus over knn_graph (integer-hash
      // step choice — node2vec-style walks with no RNG state).
      "graph_walks" -> ((s, dir) => Similarity.graphWalks(s, dir)),
      // word2vec-style (center, context) pair counts from the walk
      // corpus — the skip-gram trainer's input.
      "walk_skipgrams" -> ((s, dir) => Similarity.walkSkipgrams(s, dir)),
      // Directed wedge closure per vector over knn_graph — dense-clique
      // vs unrelated-hub diagnostic, ratio in exact integer permille.
      "graph_triangles" -> ((s, dir) => Similarity.graphTriangles(s, dir)),
      // Synchronous label-propagation communities over the mutual
      // knn_graph edges — finer than knn_components, min-label tie-break
      // so the fixed-round result is bit-reproducible.
      "graph_lpa" -> ((s, dir) => Similarity.graphLpa(s, dir)),
      // D4-style redundancy pruning: drop the most-prototypical quarter
      // of every mutual-kNN cluster (exact-integer centroid distances).
      "d4_prune" -> ((s, dir) => Similarity.d4Prune(s, dir)),
      // Greedy k-center coreset (Gonzalez): k corpus passes with fused
      // integer distances to literal centers — maximum-diversity seed
      // selection, bit-reproducible argmax/argmin.
      "kcenter_coreset" -> ((s, dir) => Similarity.kcenterCoreset(s, dir)),
      // MMR diversified rerank of the cosine top-k — integer quantized
      // distances; the greedy rounds run on queries×candidates rows.
      "mmr_select" -> ((s, dir) => Similarity.mmrSelect(s, dir)),
      // Majority-label purity per mutual-kNN cluster — the external
      // clustering metric against the fixture's labels.
      "cluster_purity" -> ((s, dir) => Similarity.clusterPurity(s, dir)),
      "project_recall" -> ((s, dir) => Similarity.projectRecall(s, dir)),

      "dsir_weights" -> ((s, dir) => TextAnalysis.dsirWeights(s, dir)),
      // Train/apply split via the DsirIndex parquet artifact (trained
      // once per corpus snapshot, replayed on the incoming batch).
      "dsir_score_batch" -> ((s, dir) =>
        TextAnalysis.dsirScoreWith(
          graft.exts.DsirIndex.scores(s, dir),
          Dedup.incomingBatch(s, dir))),
      "span_corrupt" -> ((s, dir) => TextAnalysis.spanCorrupt(s, dir)),
      "text_tfidf" -> ((s, dir) => TextAnalysis.tfidfTop(s, dir)),
      "bm25_retrieve" -> ((s, dir) => TextAnalysis.bm25Retrieve(s, dir)),
      // Reciprocal-rank fusion of the BM25 and cosine rankings — the
      // two-tower hybrid serving shape; fusion runs on the bounded
      // top-k frames, never the corpus.
      "hybrid_search" -> ((s, dir) => TextAnalysis.hybridSearch(s, dir)),
      // Train/apply split: the persisted inverted-index artifact
      // (Bm25Index — postings + df + stats parquet) serving an incoming
      // query batch with zero corpus-text scans. The batch is a BOUNDED
      // micro-batch (original ids < 160, the AnnServing serving shape):
      // per-batch cost is |batch| × Σ_queryterm df(term), and on this
      // fixture's degenerate 31-word vocabulary EVERY term is a stopword
      // (df ≈ N), so a corpus-proportional batch would cost
      // |batch|·N — the serving deployment amortizes by micro-batch,
      // not by letting batches grow with the corpus.
      "bm25_batch" -> ((s, dir) =>
        graft.exts.Bm25Index.scoreBatch(s, dir,
          Dedup.incomingBatch(s, dir)
            .filter(org.apache.spark.sql.functions
              .col("doc_id") % 100000L < 160L))),
      "text_rarity" -> ((s, dir) => TextAnalysis.rarityScores(s, dir)),
      // Lexical diversity (TTR / Simpson / top-share) in exact integers.
      "text_diversity" -> ((s, dir) => TextAnalysis.diversityScores(s, dir)),
      "text_lm_score" -> ((s, dir) => TextAnalysis.lmScores(s, dir)),
      // RHO-loss-shaped two-model selection: source-local vs global
      // bigram fluency, keep the domain-signal margin — integer ppm.
      "rho_select" -> ((s, dir) => TextAnalysis.rhoSelect(s, dir)),
      "text_bpe_pairs" -> ((s, dir) => TextAnalysis.bpePairCounts(s, dir)),
      // The full iterative merge loop over the pair statistic above.
      "bpe_train" -> ((s, dir) => TextAnalysis.bpeTrain(s, dir)),
      // Train/apply split: corpus-trained merges (session-memoized
      // BpeIndex artifact — trained once per corpus, not per batch)
      // replayed on the incoming batch.
      "bpe_encode" -> ((s, dir) =>
        TextAnalysis.bpeEncode(Dedup.incomingBatch(s, dir),
          BpeIndex.rules(s, dir))),
      // Per-language tokens-per-word after the trained merges — the
      // multilingual tokenizer-fairness metric.
      "bpe_fertility" -> ((s, dir) =>
        TextAnalysis.bpeFertility(
          graft.Tables.load(s, dir, "documents"),
          BpeIndex.rules(s, dir))),
      // Train/apply split via the LmIndex parquet artifact: the model
      // trains once per corpus snapshot; every batch scores against the
      // persisted table (values identical to an inline lmTrain).
      "lm_score_batch" -> ((s, dir) =>
        TextAnalysis.lmScoreWith(
          LmIndex.model(s, dir),
          Dedup.incomingBatch(s, dir))),
      "chunk_docs" -> ((s, dir) => TextAnalysis.chunkDocs(s, dir)),
      "dedup_chunks" -> ((s, dir) =>
        TextAnalysis.dupChunks(Dedup.corpusWithExactDups(s, dir))),
      "source_quality_report" -> ((s, dir) =>
        TextAnalysis.sourceQualityReport(s, dir)),
      "source_divergence" -> ((s, dir) =>
        TextAnalysis.sourceDivergence(s, dir)),
      "quality_calibrate" -> ((s, dir) =>
        TextAnalysis.qualityCalibrate(s, dir)),
      "quality_winsorize" -> ((s, dir) =>
        TextAnalysis.qualityWinsorize(s, dir)),
      // Incremental index maintenance: merge the standard incoming batch
      // into the persisted BM25 index with zero corpus-text scans; the
      // merge is bit-exact vs a full rebuild (doc-disjoint postings,
      // additive df/stats — PipelineSpec asserts the equivalence).
      "bm25_update" -> ((s, dir) =>
        graft.exts.Bm25Index.mergeReport(s, dir,
          Dedup.incomingBatch(s, dir))),
      "text_docfreq" -> ((s, dir) => TextAnalysis.docFreqTop(s, dir)),
      "text_heavy_hitters" -> ((s, dir) => TextAnalysis.heavyHitters(s, dir)),

      "mm_meta" -> ((s, dir) => Multimodal.metadata(s, dir)),
      // frame sampling + resize are integer-exact over ASCII payloads, so
      // both are hash-gated (the byte at each sampled offset = ord of the
      // character there; resize is floor integer division)
      "mm_frames" -> ((s, dir) =>
        Multimodal.sampleFrames(Multimodal.assets(s, dir), 4)),
      "mm_resize" -> ((s, dir) =>
        Multimodal.resizeMeta(Multimodal.assets(s, dir), 256)),
      // REAL pixel resize over the decoded PNG: nearest-neighbor
      // integer downscale to resizeMeta's dimension law, signature of
      // the RESIZED raster — the thumbnail/feature stage after decode.
      "mm_resize_px" -> ((s, dir) => Multimodal.resizePixels(s, dir, 8)),
      "mm_audio" -> ((s, dir) =>
        Multimodal.audioWindows(Multimodal.assets(s, dir))),
      // REAL codec round-trip: genuine PNG bytes through javax.imageio
      // encode + decode; the oracle recomputes the deterministic pixel
      // ramps in closed form, so a decode defect breaks the hash.
      "mm_decode" -> ((s, dir) => Multimodal.decodeStats(s, dir).toDF()),
      // Perceptual average-hash over the real decode — the image-side
      // near-dup bucket key, every bit integer-exact.
      "mm_phash" -> ((s, dir) => Multimodal.ahashStats(s, dir).toDF()),
      // Energy-profile fingerprint over the real WAV decode — the
      // audio near-dup bucket key, gain-invariant by construction.
      "mm_audio_fp" -> ((s, dir) =>
        Multimodal.audioFingerprints(s, dir).toDF()),
      // Per-frame perceptual hashes over the real GIF decode — the
      // video near-dup sequence key.
      "mm_video_fp" -> ((s, dir) =>
        Multimodal.videoFingerprints(s, dir).toDF()),
      // Image dedup by DECODED signature over the planted-duplicate
      // media fixture — the end-to-end media-dedup composition.
      "mm_dup_groups" -> ((s, dir) => Multimodal.mmDupGroups(s, dir)),
      // Video shared-footage pairs: per-frame hashes joined on the
      // signature, banded by frame gap, assembled into consecutive
      // runs — the consumer of mm_video_fp's exploded layout.
      "mm_video_dups" -> ((s, dir) => Multimodal.mmVideoDups(s, dir)),
      // Trim-robust audio matching: FIXED-size window fingerprints
      // (window-local, gain-invariant) joined and run-assembled — the
      // trimmed/padded-copy case the whole-file mm_audio_fp provably
      // misses.
      "mm_audio_dups" -> ((s, dir) => Multimodal.mmAudioDups(s, dir)),
      // Robust image near-dup: canonical-raster signature (rescaled
      // copies collide exactly — floor division composes) + banded
      // Hamming matching (noisy re-encodes within NearHamMax bits
      // bucket together) — the two wild cases exact mm_dup_groups
      // provably misses (PipelineSpec).
      "mm_dup_near" -> ((s, dir) => Multimodal.mmDupNear(s, dir)),
      // The media ACTION operator: per-asset keep/drop + canonical
      // pointer composed from all three robust matchers (image near,
      // video shared-footage, audio shared-clip) via connected
      // components — the media analog of dedup_keep_list.
      "mm_media_verdict" -> ((s, dir) => Multimodal.mmMediaVerdict(s, dir)),
      // Incremental media ingest gate: an incoming image batch decoded
      // to canonical signatures and banded-matched against the
      // PERSISTED corpus signature artifact — zero corpus decodes per
      // batch; the media analog of dedup_incremental_near.
      "mm_dup_incremental" -> ((s, dir) =>
        Multimodal.mmDupIncremental(s, dir)),
      // Incremental VIDEO ingest gate: an incoming clip batch's
      // per-frame hashes run-matched against the PERSISTED corpus
      // frame-fingerprint artifact — a trimmed-clip re-upload is
      // gated at ingest with zero corpus decodes.
      "mm_vid_incremental" -> ((s, dir) =>
        Multimodal.mmVidIncremental(s, dir)),
      // Incremental AUDIO ingest gate: trim-robust window fingerprints
      // probed against the persisted corpus window artifact — the
      // re-mastered/trimmed track gated at ingest.
      "mm_aud_incremental" -> ((s, dir) =>
        Multimodal.mmAudIncremental(s, dir)),
      // Media-index health report over the committed pair/component
      // artifacts — the metrics-evaluator role (graph_health's sibling)
      // for the media index family; zero codec work.
      "media_health" -> ((s, dir) => Multimodal.mediaHealth(s, dir)),
      // Per-asset media EXPLAIN record — curation_audit's symmetry on
      // the media side: canonical pointer, component size, per-modality
      // pair degrees + flags, composed disposition; artifact-only.
      "media_audit" -> ((s, dir) => Multimodal.mediaAudit(s, dir)),
      // Cross-modal asset × caption pairs (r16): the agreement matrix
      // between image-signature grouping and caption md5 dedup — the
      // same-image-re-captioned / same-caption-different-image cells a
      // VLM pipeline curates on; canonical pairs only (linear).
      "mm_caption_pairs" -> ((s, dir) =>
        Multimodal.mmCaptionPairs(s, dir)),
      // The agreement matrix with the caption NEAR tier (r18): the
      // corpus-audit view of pair dedup upgraded to the same
      // shingle-Jaccard caption grouping the r17 ingest gate keys on —
      // a tail-edited recaption of a duplicate image lands `both`
      // (with cap_dup=0, cap_dup_near=1 as evidence) where the md5
      // matrix provably files it `img_only`, so gate and matrix can no
      // longer disagree on that class.
      "mm_caption_pairs_near" -> ((s, dir) =>
        Multimodal.mmCaptionPairsNear(s, dir)),
      // Cross-modal PAIR ingest gate (r16): each incoming (image,
      // caption) pair gated on BOTH sides — banded signature probe of
      // the persisted corpus artifact for the image, corpus caption
      // md5-set probe for the text — composed into the curation-queue
      // disposition (drop / review_recaptioned / review_restocked /
      // admit).
      "mm_pair_gate" -> ((s, dir) => Multimodal.mmPairGate(s, dir)),
      // Pair gate with the caption NEAR-dup tier (r17): the md5 tier
      // misses a tail-edited recaption of a corpus caption, so a
      // duplicate image + lightly-edited caption would queue as
      // review_recaptioned instead of dropping; the near tier runs the
      // engine's own df-capped shingle-Jaccard gate over the DISTINCT
      // corpus caption texts and the disposition keys on it (exact
      // flag kept as evidence — near subsumes exact).
      "mm_pair_gate_near" -> ((s, dir) =>
        Multimodal.mmPairGateNear(s, dir)),
      // Per-pair audit record (r17): curation_audit / media_audit's
      // pair analog — both tiers' evidence (image match count /
      // canonical / Hamming; caption exact flag, near count, canonical
      // caption source doc) joined to the composed disposition, one
      // explain row per incoming pair.
      "mm_pair_audit" -> ((s, dir) => Multimodal.mmPairAudit(s, dir)),
      // Fleet-scope index health (r16): the four index families'
      // health rows normalized to one integer pressure each and
      // ranked — "which index needs maintenance next", the
      // metrics-evaluator role one level above the per-family keys.
      "index_fleet_health" -> ((s, dir) =>
        graft.exts.IndexFleet.indexFleetHealth(s, dir)),
      // REAL codec round-trip for audio: genuine RIFF/WAVE PCM bytes
      // through javax.sound.sampled encode + decode; the oracle
      // recomputes the deterministic sample train in closed form.
      "mm_audio_decode" -> ((s, dir) =>
        Multimodal.decodeWavStats(s, dir).toDF()),
      // REAL codec round-trip for video: genuine multi-frame animated
      // GIFs through javax.imageio sequence encode + per-frame decode;
      // the oracle recomputes the per-frame grayscale ramps in closed
      // form (frame-index-weighted sum catches reorders/drops).
      "mm_video_decode" -> ((s, dir) =>
        Multimodal.decodeGifStats(s, dir).toDF()),

      "sample_docs" -> ((s, dir) => Sampling.sampleDocs(s, dir)),
      "weighted_sample" -> ((s, dir) => Sampling.weightedSample(s, dir)),
      "train_test_split" -> ((s, dir) => Sampling.trainTestSplit(s, dir)),
      "class_balance" -> ((s, dir) => Sampling.classBalanceWeights(s, dir)),
      "token_histogram" -> ((s, dir) => Sampling.tokenLenHistogram(s, dir)),
      "stratified_sample" -> ((s, dir) => Sampling.stratifiedSample(s, dir)),
      "token_budget_select" -> ((s, dir) =>
        Sampling.tokenBudgetSelect(s, dir)),
      "training_order" -> ((s, dir) => Sampling.trainingOrder(s, dir)),
      "curriculum_order" -> ((s, dir) => Sampling.curriculumOrder(s, dir)),
      "pack_sequences" -> ((s, dir) =>
        Packing.packSequences(Tables.load(s, dir, "documents"))),
      "pack_efficiency" -> ((s, dir) =>
        Packing.packEfficiency(Tables.load(s, dir, "documents")))),

    oracles = Map(
      "text_tokens" ->
        s"""SELECT doc_id,
          |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
          |    AS n_tokens,
          |  CAST(len(regexp_extract_all(text, '${TextAnalysis.WordpiecePattern}'))
          |    AS INTEGER) AS n_wordpieces,
          |  CAST(length(text) AS INTEGER) AS n_chars_measured,
          |  n_chars
          |FROM documents""".stripMargin,

      // Per-word poly hashes as SUM over char·power rows (the
      // minhash_band_pairs wh contract), then dim = hash mod dims and
      // sign = the next hash bit, zero dims materialized by a
      // dims-range cross join — bit-exact vs the engine's compiled
      // HashEmbed pass.
      "text_hash_embed" -> {
        import graft.functions.SigImpl
        val dims = SigImpl.HashEmbedDims
        s"""WITH $minhashPolyCtes,
           |words AS (
           |  SELECT doc_id, ws, len(ws) AS nw FROM (
           |    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
           |    FROM documents)),
           |wh AS (
           |  SELECT w.doc_id, wi.wi,
           |    CAST(sum(ord(substr(w.ws[wi.wi], CAST(ci.ci AS INTEGER), 1))
           |      ::BIGINT * wpw.p) % ${SigImpl.P} AS BIGINT) AS wh
           |  FROM words w,
           |    LATERAL (SELECT unnest(generate_series(1, w.nw)) AS wi) wi,
           |    LATERAL (SELECT unnest(generate_series(1,
           |      len(w.ws[wi.wi]))) AS ci) ci,
           |    wpw
           |  WHERE wpw.e = ci.ci - 1
           |  GROUP BY 1, 2),
           |v AS (
           |  SELECT doc_id, wh % $dims AS dim,
           |    CASE WHEN (wh // $dims) % 2 = 0 THEN 1 ELSE -1 END AS s
           |  FROM wh),
           |agg AS (SELECT doc_id, dim, CAST(sum(s) AS BIGINT) AS weight
           |        FROM v GROUP BY 1, 2),
           |dm AS (SELECT unnest(range($dims)) AS dim)
           |SELECT d.doc_id, dm.dim,
           |  CAST(coalesce(agg.weight, 0) AS BIGINT) AS weight
           |FROM documents d CROSS JOIN dm
           |LEFT JOIN agg ON agg.doc_id = d.doc_id AND agg.dim = dm.dim"""
          .stripMargin
      },

      "text_quality" ->
        s"""WITH t AS (
           |  SELECT doc_id,
           |    CAST(length(text) AS INTEGER) AS n_chars_measured,
           |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
           |      AS n_tokens,
           |    CAST(len(regexp_extract_all(text, '$langEn')) AS INTEGER)
           |      AS n_stopwords,
           |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS INTEGER)
           |      AS n_punct
           |  FROM documents)
           |SELECT doc_id, n_chars_measured, n_tokens, n_stopwords, n_punct,
           |  CAST((n_chars_measured * 100) // greatest(n_tokens, 1) AS BIGINT)
           |    AS mean_token_len_x100,
           |  CAST((n_stopwords * 1000) // greatest(n_tokens, 1) AS BIGINT)
           |    AS stopword_ratio_x1000,
           |  (n_chars_measured >= 100 AND n_chars_measured <= 20000 AND
           |   (n_stopwords * 1000) // greatest(n_tokens, 1) >= 20)
           |    AS passes_quality
           |FROM t""".stripMargin,

      "text_langid" ->
        s"""WITH t AS (
           |  SELECT doc_id, lang,
           |    CAST(len(regexp_extract_all(text, '$langEn')) AS INTEGER) AS score_en,
           |    CAST(len(regexp_extract_all(text, '$langEs')) AS INTEGER) AS score_es,
           |    CAST(len(regexp_extract_all(text, '$langDe')) AS INTEGER) AS score_de,
           |    CAST(len(regexp_extract_all(text, '$langFr')) AS INTEGER) AS score_fr
           |  FROM documents)
           |SELECT doc_id, score_en, score_es, score_de, score_fr,
           |  CASE WHEN score_en >= greatest(score_es, score_de, score_fr) THEN 'en'
           |       WHEN score_es >= greatest(score_de, score_fr) THEN 'es'
           |       WHEN score_de >= score_fr THEN 'de'
           |       ELSE 'fr' END AS predicted_lang,
           |  lang AS labeled_lang,
           |  (CASE WHEN score_en >= greatest(score_es, score_de, score_fr) THEN 'en'
           |        WHEN score_es >= greatest(score_de, score_fr) THEN 'es'
           |        WHEN score_de >= score_fr THEN 'de'
           |        ELSE 'fr' END) = lang AS is_match
           |FROM t""".stripMargin,

      // The text_langid argmax CASE collapsed to the confusion matrix.
      "lang_confusion" ->
        s"""WITH t AS (
           |  SELECT doc_id, lang,
           |    CAST(len(regexp_extract_all(text, '$langEn')) AS INTEGER) AS score_en,
           |    CAST(len(regexp_extract_all(text, '$langEs')) AS INTEGER) AS score_es,
           |    CAST(len(regexp_extract_all(text, '$langDe')) AS INTEGER) AS score_de,
           |    CAST(len(regexp_extract_all(text, '$langFr')) AS INTEGER) AS score_fr
           |  FROM documents)
           |SELECT lang AS labeled_lang,
           |  CASE WHEN score_en >= greatest(score_es, score_de, score_fr) THEN 'en'
           |       WHEN score_es >= greatest(score_de, score_fr) THEN 'es'
           |       WHEN score_de >= score_fr THEN 'de'
           |       ELSE 'fr' END AS predicted_lang,
           |  count(*) AS n_docs
           |FROM t GROUP BY 1, 2""".stripMargin,

      "text_repetition" ->
        """WITH t AS (SELECT doc_id,
          |            regexp_split_to_array(trim(text), '\s+') AS w
          |          FROM documents),
          |wc AS (SELECT doc_id, word, count(*) AS c
          |       FROM (SELECT doc_id, unnest(w) AS word FROM t)
          |       GROUP BY doc_id, word),
          |ws AS (SELECT doc_id, max(c) AS top_word_count,
          |         CAST(sum(c) AS BIGINT) AS n_tokens
          |       FROM wc GROUP BY doc_id),
          |bgr AS (SELECT doc_id, bg, count(*) AS c FROM (
          |    SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
          |    FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))
          |                     AS i) x
          |    WHERE len(w) >= 2)
          |  GROUP BY doc_id, bg),
          |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
          |         count(*) AS d_bigrams
          |       FROM bgr GROUP BY doc_id)
          |SELECT ws.doc_id, n_tokens,
          |  CAST(top_word_count AS BIGINT) AS top_word_count,
          |  CAST(top_word_count * 1000 // n_tokens AS BIGINT)
          |    AS top_word_x1000,
          |  CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
          |  CAST(coalesce((n_bigrams - d_bigrams) * 1000 // n_bigrams, 0)
          |    AS BIGINT) AS dup_bigram_x1000
          |FROM ws LEFT JOIN bs USING (doc_id)""".stripMargin,

      // Mirrors the one-pass Spark filter: quality CTE + repetition CTEs
      // joined on doc_id, reason codes concat_ws'd in the same fixed order
      // (both engines skip NULL args).
      "quality_filter" -> qualityOracleSql("documents"),

      // 64-token windows stepping by the 48-token stride; the final chunk
      // truncates at the document end. Slice bounds are integer-identical
      // on both engines (Spark slice(start, len) vs DuckDB 1-based
      // inclusive w[a:b]).
      "chunk_docs" ->
        """WITH t AS (
          |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, w, len(w) AS n,
          |    unnest(generate_series(0,
          |      (greatest(len(w) - 64, 0) + 47) // 48)) AS k
          |  FROM t)
          |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
          |  CAST(len(w[(k*48 + 1):least(k*48 + 64, n)]) AS INTEGER)
          |    AS n_chunk_tokens,
          |  md5(array_to_string(w[(k*48 + 1):least(k*48 + 64, n)], ' '))
          |    AS chunk_md5
          |FROM c""".stripMargin,

      // Chunk derivation over the exact-dup-planted corpus, grouped by
      // content hash; the keep-first verdict is a lexicographic struct
      // min on (doc_id, chunk_idx), mirroring the Spark aggregate.
      "dedup_chunks" ->
        s"""WITH $exactCorpusCte,
           |t AS (
           |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
           |  FROM corpus),
           |c AS (
           |  SELECT doc_id, w, len(w) AS n,
           |    unnest(generate_series(0,
           |      (greatest(len(w) - 64, 0) + 47) // 48)) AS k
           |  FROM t),
           |ch AS (
           |  SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
           |    md5(array_to_string(w[(k*48 + 1):least(k*48 + 64, n)], ' '))
           |      AS chunk_md5
           |  FROM c)
           |SELECT chunk_md5, count(*) AS n_copies,
           |  count(DISTINCT doc_id) AS n_docs,
           |  min({'doc_id': doc_id, 'chunk_idx': chunk_idx}).doc_id
           |    AS keep_doc_id,
           |  min({'doc_id': doc_id, 'chunk_idx': chunk_idx}).chunk_idx
           |    AS keep_chunk_idx
           |FROM ch GROUP BY chunk_md5 HAVING count(*) > 1""".stripMargin,

      // The quality_filter signal CTEs with source carried through, then
      // one aggregate per source — the curation dashboard row.
      "source_quality_report" ->
        s"""WITH t AS (SELECT doc_id, source,
           |            CAST(length(text) AS INTEGER) AS n_chars_measured,
           |            CAST(len(regexp_split_to_array(trim(text), '\\s+'))
           |              AS INTEGER) AS n_tokens,
           |            CAST($stopwordCaseSql
           |              AS INTEGER) AS n_stopwords,
           |            regexp_split_to_array(trim(text), '\\s+') AS w
           |          FROM documents),
           |wc AS (SELECT doc_id, word, count(*) AS c
           |       FROM (SELECT doc_id, unnest(w) AS word FROM t)
           |       GROUP BY doc_id, word),
           |ws AS (SELECT doc_id, max(c) AS top_word_count,
           |         CAST(sum(c) AS BIGINT) AS rep_tokens
           |       FROM wc GROUP BY doc_id),
           |bgr AS (SELECT doc_id, bg, count(*) AS c FROM (
           |    SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
           |    FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))
           |                     AS i) x
           |    WHERE len(w) >= 2)
           |  GROUP BY doc_id, bg),
           |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           |         count(*) AS d_bigrams
           |       FROM bgr GROUP BY doc_id),
           |sig AS (
           |  SELECT t.doc_id, t.source, t.n_tokens, n_chars_measured,
           |    CAST((n_chars_measured * 100) // greatest(n_tokens, 1)
           |      AS BIGINT) AS mean_token_len_x100,
           |    CAST((n_stopwords * 1000) // greatest(n_tokens, 1)
           |      AS BIGINT) AS stopword_ratio_x1000,
           |    CAST(top_word_count * 1000 // rep_tokens AS BIGINT)
           |      AS top_word_x1000,
           |    CAST(coalesce((n_bigrams - d_bigrams) * 1000 // n_bigrams, 0)
           |      AS BIGINT) AS dup_bigram_x1000
           |  FROM t JOIN ws ON ws.doc_id = t.doc_id
           |  LEFT JOIN bs ON bs.doc_id = t.doc_id),
           |flagged AS (
           |  SELECT *, concat_ws(',',
           |    CASE WHEN n_chars_measured < 100 THEN 'too_short' END,
           |    CASE WHEN n_chars_measured > 20000 THEN 'too_long' END,
           |    CASE WHEN mean_token_len_x100 < 300
           |           OR mean_token_len_x100 > 1200 THEN 'token_shape' END,
           |    CASE WHEN stopword_ratio_x1000 < 20 THEN 'low_stopword' END,
           |    CASE WHEN top_word_x1000 > 200 THEN 'top_word' END,
           |    CASE WHEN dup_bigram_x1000 > 200 THEN 'dup_bigram' END)
           |    AS reasons
           |  FROM sig)
           |SELECT source, count(*) AS n_docs,
           |  CAST(sum(CASE WHEN reasons = '' THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_kept,
           |  CAST(CAST(sum(CASE WHEN reasons = '' THEN 1 ELSE 0 END)
           |    AS BIGINT) * 1000 // count(*) AS BIGINT) AS kept_frac_x1000,
           |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
           |  CAST(CAST(sum(n_tokens) AS BIGINT) // count(*) AS BIGINT)
           |    AS mean_tokens,
           |  CAST(CAST(sum(stopword_ratio_x1000) AS BIGINT) // count(*)
           |    AS BIGINT) AS mean_stopword_x1000
           |FROM flagged GROUP BY source""".stripMargin,

      // Mirrors the fused curation plan: quality rules over the planted
      // corpus → keep → md5 dedup keeping min doc_id → per-lang totals.
      "corpus_curate" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text, lang FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000, text, lang FROM documents
           |  WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, lang, text,
           |        CAST(length(text) AS INTEGER) AS n_chars_measured,
           |        CAST(len(regexp_split_to_array(trim(text), '\\s+'))
           |          AS INTEGER) AS n_tokens,
           |        CAST($stopwordCaseSql
           |          AS INTEGER) AS n_stopwords,
           |        regexp_split_to_array(trim(text), '\\s+') AS w
           |      FROM corpus),
           |wc AS (SELECT doc_id, word, count(*) AS c
           |       FROM (SELECT doc_id, unnest(w) AS word FROM t)
           |       GROUP BY doc_id, word),
           |ws AS (SELECT doc_id, max(c) AS top_word_count,
           |         CAST(sum(c) AS BIGINT) AS rep_tokens
           |       FROM wc GROUP BY doc_id),
           |bgr AS (SELECT doc_id, bg, count(*) AS c FROM (
           |    SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
           |    FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))
           |                     AS i) x
           |    WHERE len(w) >= 2)
           |  GROUP BY doc_id, bg),
           |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           |         count(*) AS d_bigrams
           |       FROM bgr GROUP BY doc_id),
           |sig AS (
           |  SELECT t.doc_id, t.lang, t.text, t.n_tokens,
           |    n_chars_measured,
           |    (n_chars_measured * 100) // greatest(n_tokens, 1) AS mt,
           |    (n_stopwords * 1000) // greatest(n_tokens, 1) AS sr,
           |    top_word_count * 1000 // rep_tokens AS tw,
           |    coalesce((n_bigrams - d_bigrams) * 1000 // n_bigrams, 0) AS db
           |  FROM t JOIN ws ON ws.doc_id = t.doc_id
           |  LEFT JOIN bs ON bs.doc_id = t.doc_id),
           |keep AS (
           |  SELECT * FROM sig
           |  WHERE NOT (n_chars_measured < 100 OR n_chars_measured > 20000
           |    OR mt < 300 OR mt > 1200 OR sr < 20 OR tw > 200 OR db > 200)),
           |ded AS (
           |  SELECT arg_min(lang, doc_id) AS lang,
           |         arg_min(n_tokens, doc_id) AS n_tokens
           |  FROM keep GROUP BY md5(text))
           |SELECT lang, count(*) AS n_docs_kept,
           |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_kept
           |FROM ded GROUP BY lang""".stripMargin,

      // The corpus_curate signal chain over the exact-dup planting, with
      // three stage aggregates instead of the per-lang rollup.
      "curation_funnel" ->
        s"""WITH $exactCorpusCte,
           |t AS (SELECT doc_id, text,
           |        CAST(length(text) AS INTEGER) AS n_chars_measured,
           |        CAST(len(regexp_split_to_array(trim(text), '\\s+'))
           |          AS INTEGER) AS n_tokens,
           |        CAST($stopwordCaseSql
           |          AS INTEGER) AS n_stopwords,
           |        regexp_split_to_array(trim(text), '\\s+') AS w
           |      FROM corpus),
           |wc AS (SELECT doc_id, word, count(*) AS c
           |       FROM (SELECT doc_id, unnest(w) AS word FROM t)
           |       GROUP BY doc_id, word),
           |ws AS (SELECT doc_id, max(c) AS top_word_count,
           |         CAST(sum(c) AS BIGINT) AS rep_tokens
           |       FROM wc GROUP BY doc_id),
           |bgr AS (SELECT doc_id, bg, count(*) AS c FROM (
           |    SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
           |    FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))
           |                     AS i) x
           |    WHERE len(w) >= 2)
           |  GROUP BY doc_id, bg),
           |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           |         count(*) AS d_bigrams
           |       FROM bgr GROUP BY doc_id),
           |sig AS (
           |  SELECT t.doc_id, t.text, CAST(t.n_tokens AS BIGINT) AS n_tokens,
           |    n_chars_measured,
           |    (n_chars_measured * 100) // greatest(t.n_tokens, 1) AS mt,
           |    (n_stopwords * 1000) // greatest(t.n_tokens, 1) AS sr,
           |    top_word_count * 1000 // rep_tokens AS tw,
           |    coalesce((n_bigrams - d_bigrams) * 1000 // n_bigrams, 0) AS db
           |  FROM t JOIN ws ON ws.doc_id = t.doc_id
           |  LEFT JOIN bs ON bs.doc_id = t.doc_id),
           |keep AS (
           |  SELECT * FROM sig
           |  WHERE NOT (n_chars_measured < 100 OR n_chars_measured > 20000
           |    OR mt < 300 OR mt > 1200 OR sr < 20 OR tw > 200 OR db > 200)),
           |ded AS (
           |  SELECT min(n_tokens) AS n_tokens FROM keep GROUP BY md5(text))
           |SELECT '1_raw' AS stage, count(*) AS n_docs,
           |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM sig
           |UNION ALL SELECT '2_quality_kept', count(*),
           |  CAST(sum(n_tokens) AS BIGINT) FROM keep
           |UNION ALL SELECT '3_deduped', count(*),
           |  CAST(sum(n_tokens) AS BIGINT) FROM ded""".stripMargin,

      // curation + semantic tier: the corpus_curate quality/exact-dedup
      // chain over a tail-perturbed planting (md5 misses it) + the
      // dedup_semantic cell-pair drops over the ×2-scaled embeddings
      // (cosine 1 catches it), anti-joined before the per-lang rollup.
      "corpus_curate_semantic" ->
        s"""WITH $trainCtes,
           |ecorpus AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT vec_id + 100000, list_transform(embedding, x -> x * 2)
           |  FROM embeddings WHERE vec_id % 10 = 0),
           |easgn AS (
           |  SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
           |                 c.cent_id) AS rn
           |    FROM ecorpus e CROSS JOIN $trainFinalCte c)
           |  WHERE rn = 1),
           |drops AS (
           |  SELECT DISTINCT y.vec_id AS doc_id
           |  FROM easgn x JOIN easgn y ON x.cell = y.cell AND x.vec_id < y.vec_id
           |  WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.999),
           |corpus AS (
           |  SELECT doc_id, text, lang FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000, text || ' zqx wvk', lang
           |  FROM documents WHERE doc_id % 10 = 0),
           |t AS (SELECT doc_id, lang, text,
           |        CAST(length(text) AS INTEGER) AS n_chars_measured,
           |        CAST(len(regexp_split_to_array(trim(text), '\\s+'))
           |          AS INTEGER) AS n_tokens,
           |        CAST($stopwordCaseSql
           |          AS INTEGER) AS n_stopwords,
           |        regexp_split_to_array(trim(text), '\\s+') AS w
           |      FROM corpus),
           |wc AS (SELECT doc_id, word, count(*) AS c
           |       FROM (SELECT doc_id, unnest(w) AS word FROM t)
           |       GROUP BY doc_id, word),
           |ws AS (SELECT doc_id, max(c) AS top_word_count,
           |         CAST(sum(c) AS BIGINT) AS rep_tokens
           |       FROM wc GROUP BY doc_id),
           |bgr AS (SELECT doc_id, bg, count(*) AS c FROM (
           |    SELECT doc_id, w[i] || ' ' || w[i+1] AS bg
           |    FROM t, LATERAL (SELECT unnest(generate_series(1, len(w) - 1))
           |                     AS i) x
           |    WHERE len(w) >= 2)
           |  GROUP BY doc_id, bg),
           |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
           |         count(*) AS d_bigrams
           |       FROM bgr GROUP BY doc_id),
           |sig AS (
           |  SELECT t.doc_id, t.lang, t.text, t.n_tokens,
           |    n_chars_measured,
           |    (n_chars_measured * 100) // greatest(n_tokens, 1) AS mt,
           |    (n_stopwords * 1000) // greatest(n_tokens, 1) AS sr,
           |    top_word_count * 1000 // rep_tokens AS tw,
           |    coalesce((n_bigrams - d_bigrams) * 1000 // n_bigrams, 0) AS db
           |  FROM t JOIN ws ON ws.doc_id = t.doc_id
           |  LEFT JOIN bs ON bs.doc_id = t.doc_id),
           |keep AS (
           |  SELECT * FROM sig
           |  WHERE NOT (n_chars_measured < 100 OR n_chars_measured > 20000
           |    OR mt < 300 OR mt > 1200 OR sr < 20 OR tw > 200 OR db > 200)),
           |ded AS (
           |  SELECT min(doc_id) AS doc_id,
           |         arg_min(lang, doc_id) AS lang,
           |         arg_min(n_tokens, doc_id) AS n_tokens
           |  FROM keep GROUP BY md5(text)),
           |fin AS (
           |  SELECT * FROM ded
           |  WHERE doc_id NOT IN (SELECT doc_id FROM drops))
           |SELECT lang, count(*) AS n_docs_kept,
           |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_kept
           |FROM fin GROUP BY lang""".stripMargin,

      "text_pii_redact" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 700000, text || '${TextAnalysis.PlantedPii}'
           |  FROM documents WHERE doc_id % 13 = 0),
           |r AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailPattern}'))
           |      AS INTEGER) AS n_emails,
           |    CAST(len(regexp_extract_all(text, '${TextAnalysis.PhonePattern}'))
           |      AS INTEGER) AS n_phones,
           |    regexp_replace(regexp_replace(text,
           |      '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
           |      '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS pre_ip
           |  FROM corpus),
           |r2 AS (
           |  SELECT doc_id, n_emails, n_phones,
           |    CAST(len(regexp_extract_all(pre_ip, '${TextAnalysis.Ipv4Pattern}'))
           |      AS INTEGER) AS n_ips,
           |    regexp_replace(pre_ip,
           |      '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g') AS redacted
           |  FROM r)
           |SELECT doc_id, n_emails, n_phones, n_ips,
           |  (n_emails + n_phones + n_ips) > 0 AS has_pii,
           |  md5(redacted) AS redacted_md5
           |FROM r2""".stripMargin,

      "mix_sources" ->
        s"""WITH w(lang, wt) AS (VALUES ${Sampling.DefaultMixWeights
             .map { case (l, v) => s"('$l', $v)" }.mkString(", ")}),
           |tok AS (SELECT doc_id, lang,
           |          CAST(len(regexp_split_to_array(trim(text), '\\s+'))
           |            AS BIGINT) AS n_tokens
           |        FROM documents),
           |stats AS (SELECT lang, count(*) AS n_docs,
           |            CAST(sum(n_tokens) AS BIGINT) AS t
           |          FROM tok GROUP BY lang),
           |sw AS (SELECT s.lang, n_docs, t, CAST(wt AS BIGINT) AS wt
           |       FROM stats s JOIN w USING (lang)),
           |sc AS (SELECT CAST(min(t * 1000 // wt) AS BIGINT) AS scale FROM sw),
           |rates AS (SELECT lang, n_docs, t, wt,
           |            CAST(least(1000, (wt * scale) // t) AS BIGINT)
           |              AS rate_x1000
           |          FROM sw CROSS JOIN sc),
           |kept AS (SELECT lang, count(*) AS n_docs_kept,
           |           CAST(sum(n_tokens) AS BIGINT) AS n_tokens_kept
           |         FROM tok JOIN rates USING (lang)
           |         WHERE ((doc_id % 1000000007) * 2654435761) % 1000 < rate_x1000
           |         GROUP BY lang)
           |SELECT lang, n_docs, t AS n_tokens, wt AS weight_x1000,
           |  rate_x1000,
           |  CAST(coalesce(n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
           |  CAST(coalesce(n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
           |FROM rates LEFT JOIN kept USING (lang)""".stripMargin,

      // Budget/epoch planner: same weights table, one global-stats CTE,
      // then pure integer arithmetic; the 4000‰ budget and free-epoch
      // knee render from the Sampling constants.
      "mix_epochs" ->
        s"""WITH w(lang, wt) AS (VALUES ${Sampling.DefaultMixWeights
             .map { case (l, v) => s"('$l', $v)" }.mkString(", ")}),
           |tok AS (SELECT lang,
           |          CAST(len(regexp_split_to_array(trim(text), '\\s+'))
           |            AS BIGINT) AS n_tokens
           |        FROM documents),
           |stats AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
           |          FROM tok GROUP BY lang),
           |sw AS (SELECT s.lang, t, CAST(wt AS BIGINT) AS wt
           |       FROM stats s JOIN w USING (lang)),
           |tot AS (SELECT CAST(sum(t) AS BIGINT) AS t_all,
           |          CAST(sum(wt) AS BIGINT) AS w_sum
           |        FROM sw),
           |y AS (SELECT lang, t, wt,
           |        (t_all * ${Sampling.EpochBudgetX1000}) // 1000 AS budget,
           |        ((t_all * ${Sampling.EpochBudgetX1000}) // 1000 * wt)
           |          // w_sum AS desired_tokens
           |      FROM sw CROSS JOIN tot)
           |SELECT lang, t AS n_tokens, wt AS weight_x1000, budget,
           |  desired_tokens,
           |  CAST((desired_tokens * 1000) // t AS BIGINT) AS epochs_x1000,
           |  CAST(greatest(desired_tokens - t, 0) AS BIGINT)
           |    AS repeat_excess,
           |  CAST(CASE WHEN (desired_tokens * 1000) // t
           |              > ${Sampling.FreeEpochsX1000}
           |       THEN 1 ELSE 0 END AS BIGINT) AS beyond_free
           |FROM y""".stripMargin,

      // The epoch plan materialized: mix_epochs' CTE chain (shared so
      // plan and action can't drift) expanded per doc × epoch; the
      // fractional remainder epoch keeps by the standard ‰ id-hash coin.
      "epoch_expand" ->
        s"""WITH w(lang, wt) AS (VALUES ${Sampling.DefaultMixWeights
             .map { case (l, v) => s"('$l', $v)" }.mkString(", ")}),
           |tok AS (SELECT lang,
           |          CAST(len(regexp_split_to_array(trim(text), '\\s+'))
           |            AS BIGINT) AS n_tokens
           |        FROM documents),
           |stats AS (SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS t
           |          FROM tok GROUP BY lang),
           |sw AS (SELECT s.lang, t, CAST(wt AS BIGINT) AS wt
           |       FROM stats s JOIN w USING (lang)),
           |tot AS (SELECT CAST(sum(t) AS BIGINT) AS t_all,
           |          CAST(sum(wt) AS BIGINT) AS w_sum
           |        FROM sw),
           |y AS (SELECT lang, t, wt,
           |        ((t_all * ${Sampling.EpochBudgetX1000}) // 1000 * wt)
           |          // w_sum AS desired_tokens
           |      FROM sw CROSS JOIN tot),
           |plan AS (SELECT lang,
           |           (desired_tokens * 1000) // t AS epochs_x1000
           |         FROM y),
           |cap AS (SELECT lang,
           |          least(epochs_x1000 // 1000,
           |                ${Sampling.ExpandMaxEpochs}) AS full_e,
           |          CASE WHEN epochs_x1000 // 1000
           |                    > ${Sampling.ExpandMaxEpochs}
           |               THEN 0 ELSE epochs_x1000 % 1000 END AS frac
           |        FROM plan)
           |SELECT d.doc_id, d.lang, CAST(i AS BIGINT) AS epoch_idx
           |FROM documents d
           |JOIN cap USING (lang),
           |LATERAL (SELECT unnest(generate_series(0, full_e)) AS i) t
           |WHERE CAST(i AS BIGINT) < full_e
           |   OR ((d.doc_id % 1000000007) * 2654435761) % 1000 < frac""".stripMargin,

      // LSH S-curve tuner: the squaring chains render from the same
      // LshTuneRs constant as the engine, one floor division per step in
      // the same order — engine-exact fixed-point, no float pow.
      "lsh_tune" -> {
        val pChain = (1 to 6).map(k =>
          s"c$k AS (SELECT *, (p${1 << (k - 1)} * p${1 << (k - 1)}) " +
          s"// 1000000 AS p${1 << k} FROM c${k - 1})").mkString(",\n")
        val qChain = (1 to 6).map(k =>
          s"d$k AS (SELECT *, (q${1 << (k - 1)} * q${1 << (k - 1)}) " +
          s"// 1000000 AS q${1 << k} FROM d${k - 1})").mkString(",\n")
        val pCase = Dedup.LshTuneRs.map(r => s"WHEN $r THEN p$r")
          .mkString(" ")
        val qCase = Dedup.LshTuneRs.map(b => s"WHEN $b THEN q$b")
          .mkString(" ")
        s"""WITH rs(r0) AS (VALUES ${Dedup.LshTuneRs
             .map(r => s"($r)").mkString(", ")}),
           |g AS (SELECT CAST(r0 AS BIGINT) AS r,
           |        CAST(${Dedup.NumHashes} // r0 AS BIGINT) AS b,
           |        CAST(s AS BIGINT) * 5 AS s_pct
           |      FROM rs, (SELECT unnest(generate_series(1, 19)) AS s) t),
           |c0 AS (SELECT *, s_pct * 10000 AS p1 FROM g),
           |$pChain,
           |ps AS (SELECT r, b, s_pct,
           |         CAST(CASE r $pCase END AS BIGINT) AS p_ppm
           |       FROM c6),
           |d0 AS (SELECT *, 1000000 - p_ppm AS q1 FROM ps),
           |$qChain
           |SELECT b, r, s_pct, p_ppm,
           |  CAST(1000000 - (CASE b $qCase END) AS BIGINT) AS detect_ppm,
           |  CAST(CASE WHEN b = ${Dedup.NumBands}
           |             AND r = ${Dedup.NumHashes / Dedup.NumBands}
           |       THEN 1 ELSE 0 END AS BIGINT) AS deployed
           |FROM d6""".stripMargin
      },

      // mix_sources' rate law with the weight DERIVED from source size:
      // w = floor(sqrt(tokens)) — τ=2 temperature sampling. IEEE sqrt is
      // correctly rounded on both engines, so the integer weight (and
      // everything after it) is engine-exact.
      "mix_temperature" ->
        """WITH tok AS (SELECT doc_id, source,
          |          CAST(len(regexp_split_to_array(trim(text), '\s+'))
          |            AS BIGINT) AS n_tokens
          |        FROM documents),
          |stats AS (SELECT source, count(*) AS n_docs,
          |            CAST(sum(n_tokens) AS BIGINT) AS t
          |          FROM tok GROUP BY source),
          |sw AS (SELECT source, n_docs, t,
          |         CAST(floor(sqrt(CAST(t AS DOUBLE))) AS BIGINT) AS w
          |       FROM stats),
          |sc AS (SELECT CAST(min(t * 1000 // w) AS BIGINT) AS scale FROM sw),
          |rates AS (SELECT source, n_docs, t, w,
          |            CAST(least(1000, (w * scale) // t) AS BIGINT)
          |              AS rate_x1000
          |          FROM sw CROSS JOIN sc),
          |kept AS (SELECT source, count(*) AS n_docs_kept,
          |           CAST(sum(n_tokens) AS BIGINT) AS n_tokens_kept
          |         FROM tok JOIN rates USING (source)
          |         WHERE ((doc_id % 1000000007) * 2654435761) % 1000 < rate_x1000
          |         GROUP BY source)
          |SELECT source, n_docs, t AS n_tokens, w AS weight_sqrt,
          |  rate_x1000,
          |  CAST(coalesce(n_docs_kept, 0) AS BIGINT) AS n_docs_kept,
          |  CAST(coalesce(n_tokens_kept, 0) AS BIGINT) AS n_tokens_kept
          |FROM rates LEFT JOIN kept USING (source)""".stripMargin,

      // DoReMi multiplicative-weights rounds unrolled as one CTE per
      // round over the shared per-doc LM chain. The clamp-to-1 erases
      // the only spot truncate-vs-floor integer division could diverge
      // (negative multipliers drive both quotients below 1).
      "mix_doremi" -> {
        def round(prev: String, next: String): String =
          s"""$next AS (
             |  SELECT source, n_docs, loss_ppm, excess_ppm,
             |    CAST((w2 * 1000000) //
             |      CAST(sum(w2) OVER () AS BIGINT) AS BIGINT) AS w
             |  FROM (SELECT source, n_docs, loss_ppm, excess_ppm,
             |      greatest(CAST(1 AS BIGINT),
             |        CAST((w * (1000000 + ${Sampling.DoremiEta}
             |          * excess_ppm)) // 1000000 AS BIGINT)) AS w2
             |    FROM $prev))""".stripMargin
        val rounds = (1 to Sampling.DoremiRounds)
          .map(i => round(s"dw${i - 1}", s"dw$i")).mkString(",\n")
        s"""WITH $lmScoreCtes,
           |dom AS (
           |  SELECT d.source, count(*) AS n_docs,
           |    CAST(1000000 - CAST(sum(sc.lm_score_ppm) AS BIGINT)
           |      // count(*) AS BIGINT) AS loss_ppm
           |  FROM sc JOIN documents d USING (doc_id)
           |  GROUP BY 1),
           |db AS (
           |  SELECT source, n_docs, loss_ppm,
           |    CAST(loss_ppm -
           |      CAST(sum(loss_ppm * n_docs) OVER () AS BIGINT)
           |        // CAST(sum(n_docs) OVER () AS BIGINT) AS BIGINT)
           |      AS excess_ppm
           |  FROM dom),
           |dw0 AS (SELECT source, n_docs, loss_ppm, excess_ppm,
           |  CAST(1000000 AS BIGINT) AS w FROM db),
           |$rounds
           |SELECT source, n_docs, loss_ppm, excess_ppm, w AS weight_ppm
           |FROM dw${Sampling.DoremiRounds}""".stripMargin
      },

      // Same closed-form waterfill in SQL: the saturation test's
      // possibly-negative numerator only feeds a < comparison against a
      // positive capacity, so truncate-vs-floor division parity holds.
      "unimax_alloc" ->
        s"""WITH stats AS (
           |  SELECT source, count(*) AS n_docs,
           |    CAST(sum(CAST(len(regexp_split_to_array(trim(text),
           |      '\\s+')) AS BIGINT)) AS BIGINT) AS t
           |  FROM documents GROUP BY source),
           |f AS (
           |  SELECT source, n_docs, t,
           |    CAST(t * ${Sampling.UnimaxCapEpochsX1000} // 1000
           |      AS BIGINT) AS capacity,
           |    CAST(CAST(sum(t) OVER () AS BIGINT)
           |      * ${Sampling.UnimaxBudgetX1000} // 1000 AS BIGINT)
           |      AS budget,
           |    CAST(row_number() OVER (ORDER BY
           |      t * ${Sampling.UnimaxCapEpochsX1000} // 1000, source)
           |      AS BIGINT) AS rn,
           |    CAST(count(*) OVER () AS BIGINT) AS l,
           |    CAST(sum(t * ${Sampling.UnimaxCapEpochsX1000} // 1000)
           |      OVER (ORDER BY
           |        t * ${Sampling.UnimaxCapEpochsX1000} // 1000, source)
           |      AS BIGINT) AS prefix
           |  FROM stats),
           |g AS (
           |  SELECT *, (capacity <=
           |      (budget - (prefix - capacity)) // (l - rn + 1)) AS sat
           |  FROM f),
           |h AS (
           |  SELECT *,
           |    CAST(coalesce(max(CASE WHEN sat THEN rn END) OVER (), 0)
           |      AS BIGINT) AS kstar,
           |    CAST(coalesce(max(CASE WHEN sat THEN prefix END) OVER (), 0)
           |      AS BIGINT) AS satprefix
           |  FROM g)
           |SELECT source, n_docs, t AS n_tokens, capacity,
           |  CAST(CASE WHEN rn <= kstar THEN capacity
           |    ELSE (budget - satprefix) // (l - kstar) END AS BIGINT)
           |    AS alloc_tokens,
           |  CAST((CASE WHEN rn <= kstar THEN capacity
           |    ELSE (budget - satprefix) // (l - kstar) END) * 1000 // t
           |    AS BIGINT) AS epochs_x1000
           |FROM h""".stripMargin,

      "shard_manifest" ->
        """WITH s AS (
          |  SELECT ((doc_id % 1000000007) * 2654435761) % 16 AS shard,
          |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
          |      AS n_tokens,
          |    CAST(length(text) AS BIGINT) AS n_chars, lang
          |  FROM documents)
          |SELECT shard, count(*) AS n_docs,
          |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
          |  CAST(sum(n_chars) AS BIGINT) AS n_chars_total,
          |  count(DISTINCT lang) AS n_langs
          |FROM s GROUP BY shard""".stripMargin,

      // Same training CTEs as the sim_ivf oracles; corpus (with planted
      // scaled copies) assigned to its nearest trained centroid, pairs
      // searched within-cell only.
      "dedup_semantic" ->
        s"""WITH $trainCtes,
           |$embCorpusCte,
           |asgn AS (
           |  SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, c.cent_id AS cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
           |                 c.cent_id) AS rn
           |    FROM corpus e CROSS JOIN $trainFinalCte c)
           |  WHERE rn = 1)
           |SELECT x.vec_id AS a_id, y.vec_id AS b_id
           |FROM asgn x JOIN asgn y ON x.cell = y.cell AND x.vec_id < y.vec_id
           |WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.999""".stripMargin,

      "dedup_exact" ->
        s"""WITH $exactCorpusCte
           |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM corpus GROUP BY md5(text) HAVING count(*) > 1""".stripMargin,

      // Full SQL recomputation of the polynomial MinHash pipeline: word
      // hashes as SUM over char·power rows, shingle hashes as SUM over
      // 5 word-hash·power rows, 64 affine permutation minima, 16-band
      // grouping, band-tuple self-join. Every step is integer mod-P
      // arithmetic, so the candidate set and per-pair band counts match
      // the engine bit-exactly.
      "minhash_band_pairs" ->
        s"""WITH $nearCorpusCte,
           |$minhashPolyCtes,
           |words AS (
           |  SELECT doc_id, ws, len(ws) AS nw FROM (
           |    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
           |    FROM corpus)
           |  WHERE len(ws) >= 5),
           |wh AS (
           |  SELECT w.doc_id, wi.wi,
           |    CAST(sum(ord(substr(w.ws[wi.wi], CAST(ci.ci AS INTEGER), 1))
           |      ::BIGINT * wpw.p) % 2147483647 AS BIGINT) AS wh
           |  FROM words w,
           |    LATERAL (SELECT unnest(generate_series(1, w.nw)) AS wi) wi,
           |    LATERAL (SELECT unnest(generate_series(1,
           |      len(w.ws[wi.wi]))) AS ci) ci,
           |    wpw
           |  WHERE wpw.e = ci.ci - 1
           |  GROUP BY 1, 2),
           |sh AS (
           |  SELECT w.doc_id, i.i,
           |    CAST(sum(wh.wh * wsj.p % 2147483647) % 2147483647 AS BIGINT)
           |      AS sh
           |  FROM words w,
           |    LATERAL (SELECT unnest(generate_series(1, w.nw - 4)) AS i) i,
           |    LATERAL (SELECT unnest(generate_series(0, 4)) AS j) j,
           |    wh, wsj
           |  WHERE wh.doc_id = w.doc_id AND wh.wi = i.i + j.j AND wsj.j = j.j
           |  GROUP BY 1, 2),
           |sig AS (
           |  SELECT sh.doc_id, perm.k,
           |    min((perm.a * sh.sh + perm.b) % 2147483647) AS v
           |  FROM sh CROSS JOIN perm GROUP BY 1, 2),
           |bands AS (
           |  SELECT doc_id, k // 4 AS band,
           |    max(CASE WHEN k % 4 = 0 THEN v END) AS v0,
           |    max(CASE WHEN k % 4 = 1 THEN v END) AS v1,
           |    max(CASE WHEN k % 4 = 2 THEN v END) AS v2,
           |    max(CASE WHEN k % 4 = 3 THEN v END) AS v3
           |  FROM sig GROUP BY 1, 2)
           |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |  CAST(count(*) AS BIGINT) AS n_shared_bands
           |FROM bands a JOIN bands b ON a.band = b.band AND a.v0 = b.v0
           |  AND a.v1 = b.v1 AND a.v2 = b.v2 AND a.v3 = b.v3
           |  AND a.doc_id < b.doc_id
           |GROUP BY 1, 2""".stripMargin,

      // SQL-recomputed SimHash twin: TWO per-word mod-P polynomial
      // hashes (the minhash_band_pairs wh CTE, plus a second powers
      // table for WordBase2), sign-sum votes on 62 bits, bit set iff the
      // sum is positive, 4 × 16-bit band blocking, and exact integer
      // Hamming ≤ 3 over the signatures — every step integer arithmetic,
      // so candidates, band counts, and distances match the engine
      // bit-exactly.
      "simhash_band_pairs" -> {
        import graft.functions.SigImpl
        val bigP = java.math.BigInteger.valueOf(SigImpl.P)
        val base2 = java.math.BigInteger.valueOf(SigImpl.WordBase2)
        val wpw2 = (0 until SigImpl.MaxWordLen)
          .map(e =>
            s"($e, ${base2.modPow(java.math.BigInteger.valueOf(e), bigP)})")
          .mkString(", ")
        // (bit index, source hash 1/2, in-hash power, signature power)
        val p2 = (0 until SigImpl.SimBits)
          .map(b => s"($b, ${if (b < 31) 1 else 2}, ${1L << (b % 31)}, " +
            s"${1L << b})")
          .mkString(", ")
        s"""WITH $nearCorpusCte,
           |$minhashPolyCtes,
           |wpw2(e, p) AS (VALUES $wpw2),
           |p2(b, src, v, sv) AS (VALUES $p2),
           |b64k(band, bv) AS (VALUES (0, 1::BIGINT), (1, 65536::BIGINT),
           |  (2, 4294967296::BIGINT), (3, 281474976710656::BIGINT)),
           |words AS (
           |  SELECT doc_id, ws, len(ws) AS nw FROM (
           |    SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
           |    FROM corpus)
           |  WHERE len(ws) >= 5),
           |wh AS (
           |  SELECT w.doc_id, wi.wi,
           |    CAST(sum(ord(substr(w.ws[wi.wi], CAST(ci.ci AS INTEGER), 1))
           |      ::BIGINT * wpw.p) % 2147483647 AS BIGINT) AS wh1,
           |    CAST(sum(ord(substr(w.ws[wi.wi], CAST(ci.ci AS INTEGER), 1))
           |      ::BIGINT * wpw2.p) % 2147483647 AS BIGINT) AS wh2
           |  FROM words w,
           |    LATERAL (SELECT unnest(generate_series(1, w.nw)) AS wi) wi,
           |    LATERAL (SELECT unnest(generate_series(1,
           |      len(w.ws[wi.wi]))) AS ci) ci,
           |    wpw, wpw2
           |  WHERE wpw.e = ci.ci - 1 AND wpw2.e = ci.ci - 1
           |  GROUP BY 1, 2),
           |wt AS (
           |  SELECT wh.doc_id, p2.b,
           |    sum(CASE WHEN ((CASE WHEN p2.src = 1 THEN wh.wh1
           |                         ELSE wh.wh2 END) // p2.v) % 2 = 1
           |        THEN 1 ELSE -1 END) AS w
           |  FROM wh CROSS JOIN p2 GROUP BY 1, 2),
           |sg AS (
           |  SELECT wt.doc_id,
           |    CAST(sum(CASE WHEN wt.w > 0 THEN p2.sv ELSE 0 END)
           |      AS BIGINT) AS sig
           |  FROM wt JOIN p2 ON p2.b = wt.b GROUP BY 1),
           |bands AS (
           |  SELECT s.doc_id, s.sig, b.band, (s.sig // b.bv) % 65536 AS v
           |  FROM sg s CROSS JOIN b64k b)
           |SELECT * FROM (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           |    CAST(count(*) AS BIGINT) AS n_shared_bands,
           |    CAST(bit_count(xor(min(a.sig), min(b.sig))) AS INTEGER)
           |      AS hamming
           |  FROM bands a JOIN bands b ON a.band = b.band AND a.v = b.v
           |    AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |WHERE hamming <= 3""".stripMargin
      },

      // Content-level dataset-version diff: both versions reduce to
      // (doc_id, md5) before one full-outer join — the oracle derives
      // the same deterministic "next release".
      "corpus_diff" ->
        """WITH nextv AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 10 = 0 THEN text || ' rev2'
          |         ELSE text END AS text
          |  FROM documents WHERE doc_id % 13 <> 0
          |  UNION ALL
          |  SELECT doc_id + 800000, text FROM documents
          |  WHERE doc_id % 11 = 0),
          |b AS (SELECT doc_id, md5(text) AS h_base FROM documents),
          |n AS (SELECT doc_id, md5(text) AS h_next FROM nextv)
          |SELECT coalesce(b.doc_id, n.doc_id) AS doc_id,
          |  CASE WHEN b.doc_id IS NULL THEN 'added'
          |       WHEN n.doc_id IS NULL THEN 'removed'
          |       WHEN b.h_base <> n.h_next THEN 'changed'
          |       ELSE 'kept' END AS status
          |FROM b FULL OUTER JOIN n ON n.doc_id = b.doc_id""".stripMargin,

      // Drift mirror: the same deterministic next release, token
      // frequencies full-outer-joined on term, the L1 sum over the
      // common denominator in HUGEINT, ppm division at the end.
      "corpus_drift" ->
        """WITH nextv AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 10 = 0 THEN text || ' rev2'
          |         ELSE text END AS text
          |  FROM documents WHERE doc_id % 13 <> 0
          |  UNION ALL
          |  SELECT doc_id + 800000, text FROM documents
          |  WHERE doc_id % 11 = 0),
          |ta AS (SELECT t AS term, count(*) AS c_a FROM (
          |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          |  FROM documents) GROUP BY 1),
          |tb AS (SELECT t AS term, count(*) AS c_b FROM (
          |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS t
          |  FROM nextv) GROUP BY 1),
          |j AS (SELECT coalesce(ta.term, tb.term) AS term,
          |    coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
          |  FROM ta FULL OUTER JOIN tb ON tb.term = ta.term),
          |tot AS (SELECT CAST(sum(c_a) AS BIGINT) AS na,
          |    CAST(sum(c_b) AS BIGINT) AS nb,
          |    CAST(count(CASE WHEN c_a > 0 THEN 1 END) AS BIGINT) AS nta,
          |    CAST(count(CASE WHEN c_b > 0 THEN 1 END) AS BIGINT) AS ntb,
          |    CAST(count(CASE WHEN c_a = 0 THEN 1 END) AS BIGINT) AS nnew,
          |    CAST(count(CASE WHEN c_b = 0 THEN 1 END) AS BIGINT) AS ngone
          |  FROM j),
          |l1 AS (SELECT sum(abs(j.c_a * t.nb - j.c_b * t.na)) AS l1
          |  FROM j, tot t)
          |SELECT t.na AS n_tokens_a, t.nb AS n_tokens_b,
          |  t.nta AS n_terms_a, t.ntb AS n_terms_b,
          |  t.nnew AS n_new_terms, t.ngone AS n_gone_terms,
          |  CAST(l1.l1 * 1000000 // (2 * t.na * t.nb) AS BIGINT)
          |    AS tvd_ppm
          |FROM tot t, l1""".stripMargin,

      // Only the added/changed delta runs the quality chain — the shared
      // qualitySigCtes signal definitions over the `delta` CTE.
      "incremental_curate" -> {
        s"""WITH nextv AS (
           |  SELECT doc_id,
           |    CASE WHEN doc_id % 10 = 0 THEN text || ' rev2'
           |         ELSE text END AS text
           |  FROM documents WHERE doc_id % 13 <> 0
           |  UNION ALL
           |  SELECT doc_id + 800000, text FROM documents
           |  WHERE doc_id % 11 = 0),
           |b AS (SELECT doc_id, md5(text) AS h_base FROM documents),
           |delta AS (
           |  SELECT n.doc_id, n.text,
           |    CASE WHEN b.doc_id IS NULL THEN 'added'
           |         ELSE 'changed' END AS status
           |  FROM (SELECT doc_id, text, md5(text) AS h_next FROM nextv) n
           |  LEFT JOIN b ON b.doc_id = n.doc_id
           |  WHERE b.doc_id IS NULL OR b.h_base <> n.h_next),
           |${qualitySigCtes("delta")}
           |SELECT d.status, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(CASE WHEN f.reasons = '' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_kept,
           |  CAST(sum(f.n_tokens) AS BIGINT) AS n_tokens
           |FROM flagged f JOIN delta d ON d.doc_id = f.doc_id
           |GROUP BY 1""".stripMargin
      },

      // Batch-vs-corpus near-dup gate: the corpus hot set caps BOTH
      // sides' kept shingles; Jaccard >= 1/2 in integer arithmetic.
      "dedup_incremental_near" ->
        s"""WITH batch AS (
          |  SELECT doc_id + ${Dedup.NearVerbatimOff} AS b_id, text
          |  FROM documents WHERE doc_id % 5 = 0
          |  UNION ALL
          |  SELECT doc_id + ${Dedup.NearTailOff}, text || ' qq zz'
          |  FROM documents WHERE doc_id % 7 = 0
          |  UNION ALL
          |  SELECT doc_id + ${Dedup.NearScrambleOff},
          |    translate(text, 'abcdefghijklmnopqrst',
          |              'bcdefghijklmnopqrsta')
          |  FROM documents WHERE doc_id % 11 = 0),
          |csh AS (
          |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(trim(text), '\\s+') AS words
          |        FROM documents),
          |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
          |  WHERE len(words) >= 5),
          |hot AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM csh
          |                        GROUP BY sh) WHERE df > 100),
          |ck AS (SELECT doc_id, sh FROM csh ANTI JOIN hot USING (sh)),
          |bsh AS (
          |  SELECT DISTINCT b_id, array_to_string(words[i:i+4], ' ') AS sh
          |  FROM (SELECT b_id,
          |          regexp_split_to_array(trim(text), '\\s+') AS words
          |        FROM batch),
          |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
          |  WHERE len(words) >= 5),
          |bk AS (SELECT b_id, sh FROM bsh ANTI JOIN hot USING (sh)),
          |cs AS (SELECT doc_id, count(*) AS n_c FROM ck GROUP BY doc_id),
          |bs AS (SELECT b_id, count(*) AS n_b FROM bk GROUP BY b_id),
          |inter AS (
          |  SELECT bk.b_id, ck.doc_id, count(*) AS inter
          |  FROM bk JOIN ck USING (sh) GROUP BY 1, 2),
          |near AS (
          |  SELECT i.b_id, count(*) AS n
          |  FROM inter i
          |  JOIN cs ON cs.doc_id = i.doc_id
          |  JOIN bs ON bs.b_id = i.b_id
          |  WHERE i.inter * 3 >= bs.n_b + cs.n_c
          |  GROUP BY 1)
          |SELECT b.b_id AS doc_id,
          |  CAST(coalesce(near.n, 0) AS BIGINT) AS n_near_matches,
          |  coalesce(near.n, 0) > 0 AS is_near_dup
          |FROM batch b LEFT JOIN near ON near.b_id = b.b_id""".stripMargin,

      "dedup_ngram_jaccard" ->
        s"""WITH $nearCorpusCte,
           |sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\\s+') AS words
           |        FROM corpus),
           |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
           |  WHERE len(words) >= 5),
           |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT a_id, b_id, inter,
           |  na.n_sh + nb.n_sh - inter AS union_size
           |FROM inter
           |JOIN sizes na ON na.doc_id = a_id
           |JOIN sizes nb ON nb.doc_id = b_id
           |WHERE inter * 3 >= na.n_sh + nb.n_sh""".stripMargin,

      "dedup_ngram_jaccard_capped" ->
        s"""WITH $nearCorpusCte,
           |sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\\s+') AS words
           |        FROM corpus),
           |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
           |  WHERE len(words) >= 5),
           |rare AS (
           |  SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
           |  WHERE df <= 100),
           |kept AS (SELECT sh.doc_id, sh.sh FROM sh JOIN rare USING (sh)),
           |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
           |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT a_id, b_id, inter,
           |  na.n_sh + nb.n_sh - inter AS union_size
           |FROM inter
           |JOIN sizes na ON na.doc_id = a_id
           |JOIN sizes nb ON nb.doc_id = b_id
           |WHERE inter * 3 >= na.n_sh + nb.n_sh""".stripMargin,

      // The Bloom pre-filter has no false negatives and every positive is
      // settled by the exact md5 anti-join, so the two-tier Spark plan is
      // bit-identical to this plain anti-join semantics.
      "dedup_incremental" ->
        """WITH batch AS (
          |  SELECT doc_id + 600000 AS doc_id, text FROM documents
          |  WHERE doc_id % 5 = 0
          |  UNION ALL
          |  SELECT doc_id + 700000 AS doc_id, text || ' qq zz' FROM documents
          |  WHERE doc_id % 7 = 0)
          |SELECT b.doc_id FROM batch b
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM documents d WHERE md5(d.text) = md5(b.text))""".stripMargin,

      // Containment coefficient over the excerpt-planted corpus: the
      // shingle derivation matches the jaccard oracles; the threshold and
      // score use the MIN-size denominator (10·inter ≥ 9·min).
      "dedup_containment" ->
        """WITH corpus AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 400000,
          |    array_to_string(words[1:greatest(len(words)//3, 6)], ' ')
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(trim(text), '\s+') AS words
          |        FROM documents)
          |  WHERE doc_id % 13 = 0),
          |sh AS (
          |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(trim(text), '\s+') AS words
          |        FROM corpus),
          |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
          |  WHERE len(words) >= 5),
          |rare AS (
          |  SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
          |  WHERE df <= 100),
          |kept AS (SELECT sh.doc_id, sh.sh FROM sh JOIN rare USING (sh)),
          |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
          |inter AS (
          |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
          |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2)
          |SELECT a_id, b_id, inter, na.n_sh AS n_a, nb.n_sh AS n_b,
          |  CAST(inter * 1000 // least(na.n_sh, nb.n_sh) AS BIGINT)
          |    AS containment_x1000
          |FROM inter
          |JOIN sizes na ON na.doc_id = a_id
          |JOIN sizes nb ON nb.doc_id = b_id
          |WHERE inter * 10 >= least(na.n_sh, nb.n_sh) * 9""".stripMargin,

      "dedup_exact_normalized" ->
        """WITH corpus AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 300000, upper(text) || ' !!'
          |  FROM documents WHERE doc_id % 11 = 0),
          |norm AS (
          |  SELECT doc_id,
          |    md5(trim(regexp_replace(regexp_replace(lower(text),
          |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h
          |  FROM corpus)
          |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
          |FROM norm GROUP BY h HAVING count(*) > 1""".stripMargin,

      // Transitive closure of the jaccard pair list (UNION dedups, so the
      // recursion terminates); component = min reachable id, mirroring
      // the Spark min-label propagation's fixpoint.
      "dedup_groups" ->
        s"""WITH RECURSIVE $nearCorpusCte,
           |sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\\s+') AS words
           |        FROM corpus),
           |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
           |  WHERE len(words) >= 5),
           |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |pairs AS (
           |  SELECT a_id, b_id FROM inter
           |  JOIN sizes na ON na.doc_id = a_id
           |  JOIN sizes nb ON nb.doc_id = b_id
           |  WHERE inter * 3 >= na.n_sh + nb.n_sh),
           |bi AS (SELECT a_id AS u, b_id AS v FROM pairs
           |       UNION ALL SELECT b_id, a_id FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM bi
           |  UNION
           |  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u)
           |SELECT u AS doc_id, least(u, min(v)) AS component,
           |  (u = least(u, min(v))) AS is_canonical
           |FROM reach GROUP BY u""".stripMargin,

      // Downweighting: dedup_groups' exact CTE chain (pairs → reach →
      // components) plus a size rollup, LEFT-joined onto the corpus so
      // pair-free documents keep weight 1000.
      "dup_weights" ->
        s"""WITH RECURSIVE $nearCorpusCte,
           |sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\\s+') AS words
           |        FROM corpus),
           |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
           |  WHERE len(words) >= 5),
           |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |pairs AS (
           |  SELECT a_id, b_id FROM inter
           |  JOIN sizes na ON na.doc_id = a_id
           |  JOIN sizes nb ON nb.doc_id = b_id
           |  WHERE inter * 3 >= na.n_sh + nb.n_sh),
           |bi AS (SELECT a_id AS u, b_id AS v FROM pairs
           |       UNION ALL SELECT b_id, a_id FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM bi
           |  UNION
           |  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
           |comp AS (
           |  SELECT u AS doc_id, least(u, min(v)) AS component
           |  FROM reach GROUP BY u),
           |gs AS (SELECT component, count(*) AS n FROM comp
           |       GROUP BY component),
           |cw AS (SELECT doc_id, n FROM comp JOIN gs USING (component))
           |SELECT c.doc_id,
           |  CAST(coalesce(cw.n, 1) AS BIGINT) AS group_size,
           |  CAST(1000 // coalesce(cw.n, 1) AS BIGINT) AS weight_x1000
           |FROM corpus c LEFT JOIN cw ON cw.doc_id = c.doc_id""".stripMargin,

      // dedup_groups over the two-mode corpus with BOTH pair thresholds as
      // one disjunction (resemblance OR containment) — the ensemble form.
      // Per-detector audit from the same inverted-index join, with the
      // method predicates as tags; planted markers follow the fixture id
      // conventions (+100000 near-copy, +400000 excerpt).
      "dedup_report" ->
        """WITH corpus AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000, text || ' zqx wvk'
          |  FROM documents WHERE doc_id % 7 = 0
          |  UNION ALL
          |  SELECT doc_id + 400000,
          |    array_to_string(words[1:greatest(len(words)//3, 6)], ' ')
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(trim(text), '\s+') AS words
          |        FROM documents)
          |  WHERE doc_id % 13 = 0),
          |sh AS (
          |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(trim(text), '\s+') AS words
          |        FROM corpus),
          |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
          |  WHERE len(words) >= 5),
          |rare AS (
          |  SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
          |  WHERE df <= 100),
          |kept AS (SELECT sh.doc_id, sh.sh FROM sh JOIN rare USING (sh)),
          |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
          |inter AS (
          |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
          |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |tagged AS (
          |  SELECT a_id, b_id,
          |    inter * 3 >= na.n_sh + nb.n_sh AS is_res,
          |    inter * 10 >= least(na.n_sh, nb.n_sh) * 9 AS is_con,
          |    b_id = a_id + 100000 AS is_near,
          |    b_id = a_id + 400000 AS is_exc
          |  FROM inter
          |  JOIN sizes na ON na.doc_id = a_id
          |  JOIN sizes nb ON nb.doc_id = b_id
          |  WHERE inter * 3 >= na.n_sh + nb.n_sh
          |     OR inter * 10 >= least(na.n_sh, nb.n_sh) * 9),
          |m AS (
          |  SELECT 'resemblance' AS method, * FROM tagged WHERE is_res
          |  UNION ALL
          |  SELECT 'containment', * FROM tagged WHERE is_con
          |  UNION ALL
          |  SELECT 'either', * FROM tagged)
          |SELECT method, count(*) AS n_pairs,
          |  CAST(sum(CASE WHEN is_near THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_near_planted,
          |  CAST(sum(CASE WHEN is_exc THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_excerpt_planted
          |FROM m GROUP BY method""".stripMargin,

      // Distinct (source, shingle) inventory; DuckDB compares raw
      // shingles where Spark joins their xxhash64 (same convention as the
      // document-level inverted-index family — counts agree modulo
      // content-address collisions).
      "source_overlap" ->
        """WITH corpus AS (
          |  SELECT source, text FROM documents
          |  UNION ALL
          |  SELECT 'src_wire', text FROM documents WHERE doc_id % 7 = 0),
          |sh AS (
          |  SELECT DISTINCT source, array_to_string(words[i:i+4], ' ') AS sh
          |  FROM (SELECT source,
          |          regexp_split_to_array(trim(text), '\s+') AS words
          |        FROM corpus),
          |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
          |  WHERE len(words) >= 5),
          |rare AS (
          |  SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
          |  WHERE df <= 100),
          |kept AS (SELECT sh.source, sh.sh FROM sh JOIN rare USING (sh)),
          |sizes AS (SELECT source, count(*) AS n_sh FROM kept GROUP BY source),
          |ov AS (
          |  SELECT a.source AS source_a, b.source AS source_b,
          |    count(*) AS n_shared
          |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.source < b.source
          |  GROUP BY 1, 2)
          |SELECT source_a, source_b, n_shared,
          |  CAST(n_shared * 1000 // least(na.n_sh, nb.n_sh) AS BIGINT)
          |    AS containment_x1000
          |FROM ov
          |JOIN sizes na ON na.source = source_a
          |JOIN sizes nb ON nb.source = source_b""".stripMargin,

      "dedup_groups_ensemble" ->
        """WITH RECURSIVE corpus AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 100000, text || ' zqx wvk'
          |  FROM documents WHERE doc_id % 7 = 0
          |  UNION ALL
          |  SELECT doc_id + 400000,
          |    array_to_string(words[1:greatest(len(words)//3, 6)], ' ')
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(trim(text), '\s+') AS words
          |        FROM documents)
          |  WHERE doc_id % 13 = 0),
          |sh AS (
          |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(trim(text), '\s+') AS words
          |        FROM corpus),
          |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
          |  WHERE len(words) >= 5),
          |rare AS (
          |  SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
          |  WHERE df <= 100),
          |kept AS (SELECT sh.doc_id, sh.sh FROM sh JOIN rare USING (sh)),
          |sizes AS (SELECT doc_id, count(*) AS n_sh FROM kept GROUP BY doc_id),
          |inter AS (
          |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
          |  FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT a_id, b_id FROM inter
          |  JOIN sizes na ON na.doc_id = a_id
          |  JOIN sizes nb ON nb.doc_id = b_id
          |  WHERE inter * 3 >= na.n_sh + nb.n_sh
          |     OR inter * 10 >= least(na.n_sh, nb.n_sh) * 9),
          |bi AS (SELECT a_id AS u, b_id AS v FROM pairs
          |       UNION ALL SELECT b_id, a_id FROM pairs),
          |reach(u, v) AS (
          |  SELECT u, v FROM bi
          |  UNION
          |  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u)
          |SELECT u AS doc_id, least(u, min(v)) AS component,
          |  (u = least(u, min(v))) AS is_canonical
          |FROM reach GROUP BY u""".stripMargin,

      // Same recursive-closure CTEs as dedup_groups, then the verdict:
      // every corpus doc, keep = (component minimum or untouched).
      "dedup_keep_list" ->
        s"""WITH RECURSIVE $nearCorpusCte,
           |sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\\s+') AS words
           |        FROM corpus),
           |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
           |  WHERE len(words) >= 5),
           |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |pairs AS (
           |  SELECT a_id, b_id FROM inter
           |  JOIN sizes na ON na.doc_id = a_id
           |  JOIN sizes nb ON nb.doc_id = b_id
           |  WHERE inter * 3 >= na.n_sh + nb.n_sh),
           |bi AS (SELECT a_id AS u, b_id AS v FROM pairs
           |       UNION ALL SELECT b_id, a_id FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM bi
           |  UNION
           |  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
           |comp AS (
           |  SELECT u AS doc_id, least(u, min(v)) AS component
           |  FROM reach GROUP BY u)
           |SELECT c.doc_id,
           |  coalesce(component, c.doc_id) AS component,
           |  (coalesce(component, c.doc_id) = c.doc_id) AS keep
           |FROM corpus c LEFT JOIN comp USING (doc_id)""".stripMargin,

      // Same closure CTEs as dedup_keep_list, different keep rule: the
      // component winner is the LONGEST text (ties → lowest id) — on
      // this fixture the planted tail-appended copies win over their
      // originals, so the two keys provably differ.
      "dedup_keep_best" ->
        s"""WITH RECURSIVE $nearCorpusCte,
           |sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\\s+') AS words
           |        FROM corpus),
           |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
           |  WHERE len(words) >= 5),
           |sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |pairs AS (
           |  SELECT a_id, b_id FROM inter
           |  JOIN sizes na ON na.doc_id = a_id
           |  JOIN sizes nb ON nb.doc_id = b_id
           |  WHERE inter * 3 >= na.n_sh + nb.n_sh),
           |bi AS (SELECT a_id AS u, b_id AS v FROM pairs
           |       UNION ALL SELECT b_id, a_id FROM pairs),
           |reach(u, v) AS (
           |  SELECT u, v FROM bi
           |  UNION
           |  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
           |comp AS (
           |  SELECT u AS doc_id, least(u, min(v)) AS component
           |  FROM reach GROUP BY u),
           |win AS (
           |  SELECT component, doc_id AS keep_id FROM (
           |    SELECT m.component, m.doc_id,
           |      row_number() OVER (PARTITION BY m.component
           |        ORDER BY length(c.text) DESC, m.doc_id) AS rn
           |    FROM comp m JOIN corpus c USING (doc_id))
           |  WHERE rn = 1)
           |SELECT c.doc_id,
           |  coalesce(m.component, c.doc_id) AS component,
           |  CASE WHEN m.component IS NULL THEN TRUE
           |       ELSE c.doc_id = w.keep_id END AS keep
           |FROM corpus c
           |LEFT JOIN comp m USING (doc_id)
           |LEFT JOIN win w ON w.component = m.component""".stripMargin,

      "text_dup_spans" ->
        s"""WITH $nearCorpusCte,
           |sh AS (
           |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\\s+') AS words
           |        FROM corpus),
           |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
           |  WHERE len(words) >= 5),
           |dfr AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
           |SELECT doc_id, count(*) AS n_spans,
           |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_dup_spans,
           |  CAST(CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |    * 1000 // count(*) AS BIGINT) AS dup_span_frac_x1000
           |FROM sh JOIN dfr USING (sh)
           |GROUP BY doc_id""".stripMargin,

      // Exact-substring span SCRUB: keep the FIRST (doc_id, position)
      // occurrence of every duplicated 5-gram span, remove the word
      // positions covered by every later occurrence, hash the rewritten
      // text. The oracle keys spans by STRING where the engine keys by
      // xxhash64 — identical duplicate sets under the standard
      // content-address bet.
      "text_scrub_spans" ->
        s"""WITH $nearCorpusCte,
           |w AS (SELECT doc_id,
           |        regexp_split_to_array(trim(text), '\\s+') AS ws
           |      FROM corpus),
           |occ AS (
           |  SELECT doc_id, i - 1 AS p, array_to_string(ws[i:i+4], ' ') AS s
           |  FROM w,
           |       LATERAL (SELECT unnest(generate_series(1, len(ws) - 4)) AS i) t
           |  WHERE len(ws) >= 5),
           |marked AS (
           |  SELECT doc_id, p,
           |    count(*) OVER (PARTITION BY s) AS n_occ,
           |    row_number() OVER (PARTITION BY s ORDER BY doc_id, p) AS rn
           |  FROM occ),
           |removedpos AS (
           |  SELECT DISTINCT doc_id, p + off AS wp
           |  FROM marked,
           |       LATERAL (SELECT unnest(generate_series(0, 4)) AS off) o
           |  WHERE n_occ >= 2 AND rn > 1),
           |words AS (
           |  SELECT doc_id, i - 1 AS wp, ws[i] AS word
           |  FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t),
           |kept AS (
           |  SELECT wo.doc_id, wo.wp, wo.word FROM words wo
           |  ANTI JOIN removedpos r USING (doc_id, wp)),
           |agg AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           |    md5(string_agg(word, ' ' ORDER BY wp)) AS m
           |  FROM kept GROUP BY doc_id)
           |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
           |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           |  CAST(len(w.ws) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
           |  coalesce(a.m, md5('')) AS scrubbed_md5
           |FROM w LEFT JOIN agg a USING (doc_id)""".stripMargin,

      // Per-document curation EXPLAIN: every tier's verdict plus the
      // composed disposition, assembled from the quality, exact-dedup,
      // dup-span and PII CTE families over the audit fixture.
      "curation_audit" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 100000, text FROM documents
           |  WHERE doc_id % 10 = 0
           |  UNION ALL
           |  SELECT doc_id + 700000, text || '${TextAnalysis.PlantedPii}'
           |  FROM documents WHERE doc_id % 13 = 0),
           |${qualitySigCtes("corpus")},
           |kp AS (SELECT doc_id, md5(text) AS h FROM corpus),
           |ex AS (
           |  SELECT kp.doc_id, k2.content_keeper
           |  FROM kp JOIN (SELECT h, min(doc_id) AS content_keeper
           |                FROM kp GROUP BY h) k2 USING (h)),
           |shsp AS (
           |  SELECT DISTINCT doc_id, array_to_string(w2[i:i+4], ' ') AS sh
           |  FROM (SELECT doc_id,
           |          regexp_split_to_array(trim(text), '\\s+') AS w2
           |        FROM corpus),
           |       LATERAL (SELECT unnest(generate_series(1, len(w2) - 4)) AS i) t
           |  WHERE len(w2) >= 5),
           |dfr AS (SELECT sh, count(*) AS df FROM shsp GROUP BY sh),
           |sp AS (
           |  SELECT doc_id,
           |    CAST(CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |      * 1000 // count(*) AS BIGINT) AS dup_span_frac_x1000
           |  FROM shsp JOIN dfr USING (sh) GROUP BY doc_id),
           |pr AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_extract_all(text, '${TextAnalysis.EmailPattern}'))
           |      AS INTEGER) AS n_emails,
           |    CAST(len(regexp_extract_all(text, '${TextAnalysis.PhonePattern}'))
           |      AS INTEGER) AS n_phones,
           |    regexp_replace(regexp_replace(text,
           |      '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
           |      '${TextAnalysis.PhonePattern}', '<PHONE>', 'g') AS pre_ip
           |  FROM corpus),
           |pii AS (
           |  SELECT doc_id, CAST(n_emails + n_phones +
           |    len(regexp_extract_all(pre_ip, '${TextAnalysis.Ipv4Pattern}'))
           |    AS BIGINT) AS n_pii
           |  FROM pr)
           |SELECT f.doc_id, CAST(f.n_tokens AS BIGINT) AS n_tokens,
           |  f.reasons, (f.reasons = '') AS quality_keep,
           |  ex.content_keeper,
           |  (f.doc_id = ex.content_keeper) AS is_content_keeper,
           |  CAST(coalesce(sp.dup_span_frac_x1000, 0) AS BIGINT)
           |    AS dup_span_frac_x1000,
           |  pii.n_pii,
           |  CASE WHEN f.reasons <> '' THEN 'drop_quality'
           |       WHEN f.doc_id <> ex.content_keeper THEN 'drop_duplicate'
           |       ELSE 'keep' END AS disposition
           |FROM flagged f
           |JOIN ex ON ex.doc_id = f.doc_id
           |LEFT JOIN sp ON sp.doc_id = f.doc_id
           |JOIN pii ON pii.doc_id = f.doc_id""".stripMargin,

      // Index-build stats: the sim_ivf training CTEs + full-corpus
      // assignment, rolled up per cell.
      "ivf_cells" ->
        s"""WITH $trainCtes,
           |asgn AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cent_id AS cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
           |                 c.cent_id) AS rn
           |    FROM embeddings e CROSS JOIN $trainFinalCte c)
           |  WHERE rn = 1)
           |SELECT cell, count(*) AS n_vectors, min(vec_id) AS min_vec_id
           |FROM asgn GROUP BY cell""".stripMargin,

      // The event-driven maintenance decision lifted to the vector
      // index: per-cell occupancy vs the corpus mean, integer
      // cross-multiplied thresholds (split > 2× mean, merge < ½ mean).
      "ivf_maintenance" -> ivfMaintenanceSql,

      "decontaminate" ->
        """WITH corpus AS (
          |  SELECT doc_id, text FROM documents
          |  UNION ALL
          |  SELECT doc_id + 500000, text || ' zqx wvk'
          |  FROM documents WHERE doc_id % 97 = 0),
          |sh AS (
          |  SELECT DISTINCT doc_id, array_to_string(words[i:i+4], ' ') AS sh
          |  FROM (SELECT doc_id,
          |          regexp_split_to_array(trim(text), '\s+') AS words
          |        FROM corpus),
          |       LATERAL (SELECT unnest(generate_series(1, len(words) - 4)) AS i) t
          |  WHERE len(words) >= 5)
          |SELECT c.doc_id AS corpus_id, e.doc_id AS eval_id,
          |  count(*) AS n_shared
          |FROM sh c JOIN sh e ON c.sh = e.sh
          |WHERE e.doc_id % 97 = 0 AND c.doc_id % 97 <> 0
          |GROUP BY 1, 2 HAVING count(*) >= 3""".stripMargin,

      // Decontamination ACTION: remove every corpus word position
      // covered by a span that appears anywhere in the held-out eval
      // partition; eval docs themselves are excluded from the output.
      "decontaminate_scrub" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + 500000, text || ' zqx wvk'
           |  FROM documents WHERE doc_id % 97 = 0),
           |w AS (SELECT doc_id,
           |        regexp_split_to_array(trim(text), '\\s+') AS ws
           |      FROM corpus),
           |occ AS (
           |  SELECT doc_id, i - 1 AS p, array_to_string(ws[i:i+4], ' ') AS s
           |  FROM w,
           |       LATERAL (SELECT unnest(generate_series(1, len(ws) - 4)) AS i) t
           |  WHERE len(ws) >= 5),
           |evals AS (SELECT DISTINCT s FROM occ WHERE doc_id % 97 = 0),
           |removedpos AS (
           |  SELECT DISTINCT m.doc_id, m.p + off AS wp
           |  FROM (SELECT o.doc_id, o.p FROM occ o
           |        SEMI JOIN evals e USING (s)
           |        WHERE o.doc_id % 97 <> 0) m,
           |       LATERAL (SELECT unnest(generate_series(0, 4)) AS off) o2),
           |cw AS (SELECT * FROM w WHERE doc_id % 97 <> 0),
           |words AS (
           |  SELECT doc_id, i - 1 AS wp, ws[i] AS word
           |  FROM cw, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) t),
           |kept AS (
           |  SELECT wo.doc_id, wo.wp, wo.word FROM words wo
           |  ANTI JOIN removedpos r USING (doc_id, wp)),
           |agg AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
           |    md5(string_agg(word, ' ' ORDER BY wp)) AS m
           |  FROM kept GROUP BY doc_id)
           |SELECT cw.doc_id, CAST(len(cw.ws) AS BIGINT) AS n_words,
           |  CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
           |  CAST(len(cw.ws) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
           |  coalesce(a.m, md5('')) AS scrubbed_md5
           |FROM cw LEFT JOIN agg a USING (doc_id)""".stripMargin,

      "stratified_sample" ->
        """SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn
          |FROM (SELECT doc_id, lang,
          |        row_number() OVER (PARTITION BY lang
          |          ORDER BY md5(text), doc_id) AS rn
          |      FROM documents)
          |WHERE rn <= 40""".stripMargin,

      // Greedy per-source prefix under the 800-token budget, ordered by
      // the multilingual stopword-fluency signal (desc, doc_id tiebreak).
      // The running sum's ordering is unique, so RANGE/ROWS frames agree.
      "token_budget_select" ->
        s"""WITH t AS (
           |  SELECT doc_id, source,
           |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           |      AS n_tokens,
           |    CAST($stopwordCaseSql AS BIGINT) AS n_stop
           |  FROM documents),
           |q AS (
           |  SELECT doc_id, source, n_tokens,
           |    (n_stop * 1000) // greatest(n_tokens, 1) AS quality_x1000
           |  FROM t),
           |c AS (
           |  SELECT source, doc_id, n_tokens, quality_x1000,
           |    CAST(sum(n_tokens) OVER (PARTITION BY source
           |      ORDER BY quality_x1000 DESC, doc_id) AS BIGINT)
           |      AS cum_tokens
           |  FROM q)
           |SELECT source, doc_id, n_tokens, quality_x1000, cum_tokens
           |FROM c WHERE cum_tokens <= 800""".stripMargin,

      // Quality-banded curriculum: highest-fluency bands first per shard,
      // id-hash shuffle within a band.
      "curriculum_order" ->
        s"""WITH t AS (
           |  SELECT doc_id,
           |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
           |      AS n_tokens,
           |    CAST($stopwordCaseSql AS BIGINT) AS n_stop
           |  FROM documents),
           |q AS (
           |  SELECT doc_id,
           |    ((n_stop * 1000) // greatest(n_tokens, 1)) // 100 AS band,
           |    ((doc_id % 1000000007) * 2654435761) % 1000000007 AS h
           |  FROM t)
           |SELECT doc_id, h % 8 AS shard, band,
           |  CAST(row_number() OVER (PARTITION BY h % 8
           |    ORDER BY band DESC, h, doc_id) AS INTEGER) AS pos
           |FROM q""".stripMargin,

      // Epoch-seeded hash ordering: position = rank of the hash within
      // (epoch, shard); deterministic integer arithmetic on both engines.
      "training_order" ->
        """WITH e AS (
          |  SELECT doc_id, unnest(range(2)) AS epoch FROM documents),
          |h AS (
          |  SELECT doc_id, epoch,
          |    ((doc_id % 1000000007) * 2654435761 + (epoch + 1) * 2246822519) % 1000000007
          |      AS h
          |  FROM e)
          |SELECT epoch, doc_id, h % 8 AS shard,
          |  CAST(row_number() OVER (PARTITION BY epoch, h % 8
          |    ORDER BY h, doc_id) AS INTEGER) AS pos
          |FROM h""".stripMargin,

      "text_tfidf" ->
        """WITH tok AS (
          |  SELECT doc_id,
          |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          |  FROM documents),
          |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
          |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          |n AS (SELECT count(*) AS n_docs FROM documents),
          |s AS (
          |  SELECT doc_id, term, tf, df, (tf * n_docs) // df AS score
          |  FROM tf JOIN dfr USING (term) CROSS JOIN n)
          |SELECT doc_id, term, tf, df, score
          |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
          |        ORDER BY score DESC, tf DESC, term) AS rn
          |      FROM s)
          |WHERE rn = 1""".stripMargin,

      // BM25 in integer fixed-point: the idf is the Robertson argument
      // kept rational (×1000, no ln), k1/b are the ×1000 Okapi defaults
      // rendered from the Scala constants so the two sides can't drift.
      "bm25_retrieve" ->
        s"""WITH $bm25CoreCtes,
           |q AS (SELECT doc_id AS query_id,
           |        unnest(list_distinct(ws)) AS term
           |      FROM d WHERE doc_id < 8),
           |c AS (
           |  SELECT q.query_id, tf.doc_id,
           |    $bm25ContribSql AS contrib
           |  FROM tf JOIN dfr USING (term) JOIN q USING (term)
           |  CROSS JOIN st
           |  WHERE tf.doc_id <> q.query_id),
           |s AS (SELECT query_id, doc_id,
           |        CAST(sum(contrib) AS BIGINT) AS score
           |      FROM c GROUP BY 1, 2)
           |SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank, score
           |FROM (SELECT query_id, doc_id, score,
           |        row_number() OVER (PARTITION BY query_id
           |          ORDER BY score DESC, doc_id) AS rank
           |      FROM s)
           |WHERE rank <= 10""".stripMargin,

      // The artifact-served batch variant: same postings/df/stats chain,
      // queries = the standard incoming batch (verbatim %5 copies at
      // +600000, tail-perturbed %7 copies at +700000), no self-exclusion
      // (batch ids live in their own offset range).
      "bm25_batch" ->
        s"""WITH $bm25CoreCtes,
           |batch AS (
           |  SELECT doc_id + 600000 AS query_id, text FROM documents
           |  WHERE doc_id % 5 = 0 AND (doc_id + 600000) % 100000 < 160
           |  UNION ALL
           |  SELECT doc_id + 700000, text || ' qq zz' FROM documents
           |  WHERE doc_id % 7 = 0 AND (doc_id + 700000) % 100000 < 160),
           |q AS (SELECT query_id,
           |        unnest(list_distinct(
           |          regexp_split_to_array(trim(text), '\\s+'))) AS term
           |      FROM batch),
           |c AS (
           |  SELECT q.query_id, tf.doc_id,
           |    $bm25ContribSql AS contrib
           |  FROM tf JOIN dfr USING (term) JOIN q USING (term)
           |  CROSS JOIN st),
           |s AS (SELECT query_id, doc_id,
           |        CAST(sum(contrib) AS BIGINT) AS score
           |      FROM c GROUP BY 1, 2)
           |SELECT query_id, doc_id, CAST(rank AS INTEGER) AS rank, score
           |FROM (SELECT query_id, doc_id, score,
           |        row_number() OVER (PARTITION BY query_id
           |          ORDER BY score DESC, doc_id) AS rank
           |      FROM s)
           |WHERE rank <= 10""".stripMargin,

      // RRF fusion over the SAME bm25 core chain and the sim_topk
      // cosine ranking — both component rank lists recomputed at depth
      // HybridTopK, fused with coalesce-to-0 absent ranks, ties on
      // doc_id; every constant interpolated from the engine's.
      "hybrid_search" -> {
        val kk = TextAnalysis.HybridTopK
        val rrf = TextAnalysis.RrfKConst
        s"""WITH $bm25CoreCtes,
           |q AS (SELECT doc_id AS query_id,
           |        unnest(list_distinct(ws)) AS term
           |      FROM d WHERE doc_id < 8),
           |c AS (
           |  SELECT q.query_id, tf.doc_id,
           |    $bm25ContribSql AS contrib
           |  FROM tf JOIN dfr USING (term) JOIN q USING (term)
           |  CROSS JOIN st
           |  WHERE tf.doc_id <> q.query_id),
           |s AS (SELECT query_id, doc_id,
           |        CAST(sum(contrib) AS BIGINT) AS score
           |      FROM c GROUP BY 1, 2),
           |lr AS (SELECT query_id, doc_id, rank
           |  FROM (SELECT query_id, doc_id,
           |          row_number() OVER (PARTITION BY query_id
           |            ORDER BY score DESC, doc_id) AS rank
           |        FROM s)
           |  WHERE rank <= $kk),
           |vq AS (SELECT vec_id AS query_id, embedding AS e_q
           |       FROM embeddings WHERE vec_id < 8),
           |vc AS (SELECT vec_id AS neighbor_id, embedding AS e_n
           |       FROM embeddings),
           |vsc AS (
           |  SELECT query_id, neighbor_id,
           |    list_cosine_similarity(e_q, e_n) AS cos
           |  FROM vq CROSS JOIN vc WHERE neighbor_id <> query_id),
           |vr AS (SELECT query_id, neighbor_id AS doc_id, rank
           |  FROM (SELECT query_id, neighbor_id,
           |          row_number() OVER (PARTITION BY query_id
           |            ORDER BY cos DESC, neighbor_id) AS rank
           |        FROM vsc)
           |  WHERE rank <= $kk),
           |f AS (
           |  SELECT coalesce(lr.query_id, vr.query_id) AS query_id,
           |    coalesce(lr.doc_id, vr.doc_id) AS doc_id,
           |    lr.rank AS lex_rank, vr.rank AS vec_rank
           |  FROM lr FULL OUTER JOIN vr
           |    ON lr.query_id = vr.query_id AND lr.doc_id = vr.doc_id),
           |g AS (
           |  SELECT query_id, doc_id,
           |    coalesce(1000000 // ($rrf + lex_rank), 0)
           |      + coalesce(1000000 // ($rrf + vec_rank), 0) AS rrf_x1e6,
           |    coalesce(lex_rank, 0) AS lex_rank,
           |    coalesce(vec_rank, 0) AS vec_rank
           |  FROM f)
           |SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank,
           |  CAST(rrf_x1e6 AS BIGINT) AS rrf_x1e6,
           |  CAST(lex_rank AS BIGINT) AS lex_rank,
           |  CAST(vec_rank AS BIGINT) AS vec_rank
           |FROM (SELECT g.*, row_number() OVER (PARTITION BY query_id
           |        ORDER BY rrf_x1e6 DESC, doc_id) AS rank FROM g)
           |WHERE rank <= $kk""".stripMargin
      },

      "text_diversity" ->
        """WITH tok AS (
          |  SELECT doc_id,
          |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          |  FROM documents),
          |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2)
          |SELECT doc_id,
          |  CAST(sum(tf) AS BIGINT) AS n_tokens,
          |  count(*) AS n_types,
          |  CAST(count(*) * 1000 // CAST(sum(tf) AS BIGINT) AS BIGINT)
          |    AS ttr_x1000,
          |  CAST(CAST(sum(tf * tf) AS BIGINT) * 1000000 //
          |    (CAST(sum(tf) AS BIGINT) * CAST(sum(tf) AS BIGINT))
          |    AS BIGINT) AS simpson_x1m,
          |  CAST(max(tf) * 1000 // CAST(sum(tf) AS BIGINT) AS BIGINT)
          |    AS top_share_x1000
          |FROM tf GROUP BY doc_id""".stripMargin,

      "text_rarity" ->
        """WITH tok AS (
          |  SELECT doc_id,
          |    unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          |  FROM documents),
          |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
          |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
          |SELECT doc_id, count(*) AS n_terms,
          |  CAST(sum(tf) AS BIGINT) AS n_tokens,
          |  CAST(CAST(sum(tf * df) AS BIGINT) // CAST(sum(tf) AS BIGINT)
          |    AS BIGINT) AS mean_token_df,
          |  CAST(CAST(sum(CASE WHEN df = 1 THEN tf ELSE 0 END) AS BIGINT)
          |    * 1000 // CAST(sum(tf) AS BIGINT) AS BIGINT)
          |    AS rare_frac_x1000
          |FROM tf JOIN dfr USING (term)
          |GROUP BY doc_id""".stripMargin,

      // Bigram LM trained on the corpus itself; integer ppm surrogate.
      // Same doc exclusion rule as the Spark side (len >= 2 ⇔ has a
      // bigram); casts per the DuckDB HUGEINT-widening convention.
      // Two-model RHO selection over the shared lm CTE chain plus its
      // per-source split — the same integer ppm contract on both
      // engines, so excess and keep match bit-for-bit.
      "rho_select" ->
        s"""WITH $lmScoreCtes,
           |tfs AS (SELECT tf.*, d.source FROM tf
           |        JOIN documents d USING (doc_id)),
           |sbg AS (SELECT source, w1, w2, CAST(sum(tf) AS BIGINT) AS s_bg
           |        FROM tfs GROUP BY 1, 2, 3),
           |sctx AS (SELECT source, w1, CAST(sum(s_bg) AS BIGINT) AS s_ctx
           |         FROM sbg GROUP BY 1, 2),
           |sco AS (
           |  SELECT tfs.doc_id, tfs.source,
           |    CAST(sum(tfs.tf) AS BIGINT) AS n_bigrams,
           |    CAST(sum(tfs.tf * ((bgc.c_bg * 1000000) // ctx.c_ctx))
           |      AS BIGINT) AS gmass,
           |    CAST(sum(tfs.tf * ((sbg.s_bg * 1000000) // sctx.s_ctx))
           |      AS BIGINT) AS smass
           |  FROM tfs
           |  JOIN bgc ON bgc.w1 = tfs.w1 AND bgc.w2 = tfs.w2
           |  JOIN ctx ON ctx.w1 = tfs.w1
           |  JOIN sbg ON sbg.source = tfs.source AND sbg.w1 = tfs.w1
           |    AND sbg.w2 = tfs.w2
           |  JOIN sctx ON sctx.source = tfs.source AND sctx.w1 = tfs.w1
           |  GROUP BY 1, 2)
           |SELECT doc_id, source, n_bigrams,
           |  CAST(gmass // n_bigrams AS BIGINT) AS global_ppm,
           |  CAST(smass // n_bigrams AS BIGINT) AS source_ppm,
           |  CAST(smass // n_bigrams - gmass // n_bigrams AS BIGINT)
           |    AS excess_ppm,
           |  CAST(CASE WHEN (smass // n_bigrams) * 1000 >
           |      (gmass // n_bigrams) * ${TextAnalysis.RhoMarginPermille}
           |    THEN 1 ELSE 0 END AS BIGINT) AS keep
           |FROM sco""".stripMargin,

      // Planted prefix + leading-window threshold + md5-of-rewrite, all
      // constants interpolated from the engine's single source.
      "boilerplate_strip" ->
        s"""WITH corpus AS (
           |  SELECT doc_id, source,
           |    CASE WHEN doc_id % 3 = 0
           |      THEN '${TextAnalysis.PlantedBoiler} ' || text
           |      ELSE text END AS text
           |  FROM documents),
           |k AS (SELECT doc_id, source, text, w, len(w) AS nw,
           |    CASE WHEN len(w) >= ${TextAnalysis.BoilerW}
           |      THEN array_to_string(w[1:${TextAnalysis.BoilerW}], ' ')
           |    END AS lead_w
           |  FROM (SELECT doc_id, source, text,
           |          regexp_split_to_array(trim(text), '\\s+') AS w
           |        FROM corpus)),
           |tot AS (SELECT source, count(*) AS n_src FROM k GROUP BY 1),
           |b AS (SELECT k.source, lead_w
           |      FROM k JOIN tot USING (source)
           |      WHERE lead_w IS NOT NULL
           |      GROUP BY k.source, lead_w, n_src
           |      HAVING count(*) >= 2 AND count(*) * 1000 >=
           |        n_src * ${TextAnalysis.BoilerPermille})
           |SELECT k.doc_id, k.source,
           |  CAST(CASE WHEN b.lead_w IS NOT NULL THEN 1 ELSE 0 END
           |    AS BIGINT) AS is_boiler,
           |  CAST(CASE WHEN b.lead_w IS NOT NULL
           |    THEN ${TextAnalysis.BoilerW} ELSE 0 END AS BIGINT)
           |    AS n_dropped_words,
           |  md5(CASE WHEN b.lead_w IS NOT NULL
           |    THEN array_to_string(k.w[${TextAnalysis.BoilerW + 1}:], ' ')
           |    ELSE k.text END) AS out_md5
           |FROM k LEFT JOIN b
           |  ON b.source = k.source AND b.lead_w = k.lead_w"""
          .stripMargin,

      "text_lm_score" ->
        """WITH tok AS (
          |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          |  FROM documents),
          |bg AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
          |  WHERE len(w) >= 2),
          |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
          |bgc AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c_bg
          |        FROM tf GROUP BY 1, 2),
          |ctx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx
          |        FROM bgc GROUP BY 1)
          |SELECT doc_id,
          |  CAST(sum(tf) AS BIGINT) AS n_bigrams,
          |  CAST(CAST(sum(tf * ((c_bg * 1000000) // c_ctx)) AS BIGINT)
          |    // CAST(sum(tf) AS BIGINT) AS BIGINT) AS lm_score_ppm,
          |  CAST(CAST(sum(CASE WHEN c_bg = tf THEN tf ELSE 0 END) AS BIGINT)
          |    * 1000 // CAST(sum(tf) AS BIGINT) AS BIGINT) AS novel_frac_x1000
          |FROM tf JOIN bgc USING (w1, w2) JOIN ctx USING (w1)
          |GROUP BY doc_id""".stripMargin,

      // CCNet head/middle/tail: per-language perplexity terciles cut by
      // value thresholds over the (lang, score) histogram — ties land in
      // one bucket, no per-doc rank.
      "ccnet_buckets" ->
        s"""WITH $ccnetBucketCtes
           |SELECT doc_id, lang, lm_score_ppm, bucket FROM bucketed"""
          .stripMargin,

      // The CCNet loop's ACTION: tier-weighted sampling over the
      // perplexity buckets (head kept whole, middle halved, tail
      // decimated) by the deterministic ‰ id-hash — the bucket CTE
      // chain is shared with ccnet_buckets so tiers cannot drift.
      "ccnet_sample" ->
        s"""WITH $ccnetBucketCtes,
           |r AS (SELECT doc_id, lang, bucket,
           |        CAST(CASE bucket WHEN 'head' THEN 1000
           |                         WHEN 'middle' THEN 500
           |                         ELSE 100 END AS BIGINT) AS rate_x1000
           |      FROM bucketed)
           |SELECT doc_id, lang, bucket, rate_x1000 FROM r
           |WHERE ((doc_id % 1000000007) * 2654435761) % 1000 < rate_x1000"""
          .stripMargin,

      // The Gopher rule set recomputed rule by rule: every signal is an
      // integer (×100 fixed-point for the mean word length), so each
      // threshold compare is exact on both sides.
      "gopher_rules" ->
        s"""WITH ${gopherSigCtes("documents")}
           |SELECT doc_id, n_words, mean_word_len_x100, n_symbols,
           |  n_alpha_words, n_stop_hits,
           |  (n_words >= 50 AND n_words <= 100000) AS r_word_count,
           |  (mean_word_len_x100 >= 300 AND mean_word_len_x100 <= 1000)
           |    AS r_word_len,
           |  (n_symbols * 10 <= n_words) AS r_symbol,
           |  (n_alpha_words * 5 >= n_words * 4) AS r_alpha,
           |  (n_stop_hits >= 1) AS r_stop,
           |  $gopherKeepSql AS keep
           |FROM gsig""".stripMargin,

      // DSIR importance weights: unigram ppm lean toward the quality-kept
      // target over the top-512 head vocabulary (count DESC, term ASC).
      // The keep verdict CTE family is shared with quality_filter's
      // oracle, and the vocab chain with dsir_score_batch's, so neither
      // the target nor the model definition can drift.
      "dsir_weights" ->
        s"""WITH ${qualitySigCtes("documents")},
           |$dsirVocabCtes,
           |${dsirScoreCtes("tokk")}
           |$dsirScoreSelect""".stripMargin,

      // Train/apply split via the DsirIndex parquet artifact: the score
      // table trains once per corpus snapshot; the incoming batch (the
      // lm_score_batch fixture) scores against the persisted table —
      // values identical to an inline dsirHead.
      "dsir_score_batch" ->
        s"""WITH ${qualitySigCtes("documents")},
           |$dsirVocabCtes,
           |batch AS (
           |  SELECT doc_id + 600000 AS doc_id, text FROM documents
           |  WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 700000 AS doc_id, text || ' qq zz'
           |  FROM documents WHERE doc_id % 7 = 0),
           |btok AS (SELECT doc_id,
           |           unnest(regexp_split_to_array(trim(text), '\\s+'))
           |             AS term
           |         FROM batch),
           |${dsirScoreCtes("btok")}
           |$dsirScoreSelect""".stripMargin,

      // T5 span corruption: per-block deterministic span cut, sentinel
      // in the input, sentinel+words in the target; same block-salted
      // id-hash arithmetic as the engine, ordered string_agg rebuild.
      "span_corrupt" -> {
        val b = TextAnalysis.SpanBlock; val mod = TextAnalysis.SpanStartMod
        val last = TextAnalysis.SpanWords - 1
        s"""WITH t AS (SELECT doc_id,
           |             regexp_split_to_array(trim(text), '\\s+') AS ws
           |           FROM documents),
           |pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, ws[i] AS w,
           |          ((doc_id % 1000000007) * 2654435761 +
           |            ((i - 1) // $b) * 40503) % $mod AS s
           |        FROM t, LATERAL (SELECT
           |          unnest(generate_series(1, len(ws))) AS i) x),
           |cls AS (SELECT doc_id, p, w, p // $b AS blk,
           |          CASE WHEN p % $b = s THEN 'first'
           |               WHEN p % $b > s AND p % $b <= s + $last
           |                 THEN 'mask'
           |               ELSE 'keep' END AS c
           |        FROM pos),
           |agg AS (SELECT doc_id,
           |    CAST(count(*) AS BIGINT) AS n_words,
           |    CAST(sum(CASE WHEN c = 'first' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_spans,
           |    CAST(sum(CASE WHEN c <> 'keep' THEN 1 ELSE 0 END)
           |      AS BIGINT) AS n_masked,
           |    coalesce(string_agg(
           |      CASE WHEN c = 'keep' THEN w
           |           WHEN c = 'first'
           |             THEN '<extra_id_' || CAST(blk AS VARCHAR) || '>'
           |      END, ' ' ORDER BY p), '') AS inp,
           |    coalesce(string_agg(
           |      CASE WHEN c = 'first'
           |             THEN '<extra_id_' || CAST(blk AS VARCHAR) || '> '
           |                    || w
           |           WHEN c = 'mask' THEN w END, ' ' ORDER BY p), '')
           |      AS tgt
           |  FROM cls GROUP BY doc_id)
           |SELECT doc_id, n_words, n_spans, n_masked,
           |  md5(inp) AS input_md5, md5(tgt) AS target_md5
           |FROM agg""".stripMargin
      },

      // The one-row dataset card: totals, cardinalities, exact-dup
      // pressure, quality yield — the quality CTE family shared with
      // quality_filter's oracle.
      "corpus_stats" ->
        s"""WITH ${qualitySigCtes("documents")}
           |SELECT
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(f.n_tokens) AS BIGINT) AS n_tokens,
           |  CAST(count(DISTINCT d.lang) AS BIGINT) AS n_langs,
           |  CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
           |  CAST(count(DISTINCT md5(d.text)) AS BIGINT)
           |    AS n_distinct_texts,
           |  CAST(sum(CASE WHEN f.reasons = '' THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_quality_keep,
           |  CAST(CAST(sum(f.n_tokens) AS BIGINT) // count(*) AS BIGINT)
           |    AS mean_doc_tokens
           |FROM flagged f JOIN documents d USING (doc_id)""".stripMargin,

      // Filter-ensemble observability: the agreement matrix between the
      // C4-ish quality_filter stack and the Gopher stack, per language —
      // both verdict CTE families shared with their own oracles so the
      // definitions cannot drift.
      "filter_agreement" ->
        s"""WITH ${qualitySigCtes("documents")},
           |${gopherSigCtes("documents")},
           |qf AS (SELECT doc_id, (reasons = '') AS qf_keep FROM flagged),
           |g AS (SELECT doc_id, n_words, $gopherKeepSql AS gopher_keep
           |      FROM gsig)
           |SELECT d.lang, qf.qf_keep, g.gopher_keep,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(g.n_words) AS BIGINT) AS sum_words
           |FROM qf JOIN g USING (doc_id) JOIN documents d USING (doc_id)
           |GROUP BY 1, 2, 3""".stripMargin,

      // Occupancy-proportional downsampling over the learned cells: the
      // oracle retrains the centroids (trainCtes), reassigns, and
      // replays the multiplicative id-hash keep decision per vector.
      "cluster_balance" ->
        s"""WITH $trainCtes,
           |asgn AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cent_id AS cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
           |                 c.cent_id) AS rn
           |    FROM embeddings e CROSS JOIN $trainFinalCte c)
           |  WHERE rn = 1),
           |cells AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_vectors
           |          FROM asgn GROUP BY cell),
           |tot AS (SELECT CAST(sum(n_vectors) AS BIGINT) AS total,
           |               CAST(count(*) AS BIGINT) AS n_cells FROM cells),
           |rates AS (
           |  SELECT cell, n_vectors,
           |    CAST(least(1000, total * 1000 // (n_cells * n_vectors))
           |      AS BIGINT) AS keep_x1000
           |  FROM cells CROSS JOIN tot),
           |kept AS (
           |  SELECT r.cell, CAST(count(*) AS BIGINT) AS n_kept
           |  FROM asgn a JOIN rates r USING (cell)
           |  WHERE ((a.vec_id % 1000000007) * 2654435761) % 1000
           |    < r.keep_x1000
           |  GROUP BY r.cell)
           |SELECT r.cell, r.n_vectors, r.keep_x1000,
           |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
           |FROM rates r LEFT JOIN kept k USING (cell)""".stripMargin,

      // Per-cell top terms: doc→cell through the aligned embedding row,
      // one (cell, term) count aggregate, rank over the reduced frame.
      "cluster_topics" ->
        s"""WITH $trainCtes,
           |asgn AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cent_id AS cell,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY list_cosine_similarity(e.embedding, c.cent) DESC,
           |                 c.cent_id) AS rn
           |    FROM embeddings e CROSS JOIN $trainFinalCte c)
           |  WHERE rn = 1),
           |terms AS (
           |  SELECT doc_id,
           |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
           |  FROM documents),
           |ct AS (
           |  SELECT a.cell, t.term, CAST(count(*) AS BIGINT) AS cnt
           |  FROM terms t JOIN asgn a ON t.doc_id = a.vec_id
           |  GROUP BY 1, 2)
           |SELECT cell, term, cnt, CAST(rank AS INTEGER) AS rank
           |FROM (SELECT cell, term, cnt,
           |        row_number() OVER (PARTITION BY cell
           |          ORDER BY cnt DESC, term) AS rank
           |      FROM ct)
           |WHERE rank <= 5""".stripMargin,

      // The mining scale path: same mutual-top-1 law, candidates
      // restricted to the adaptive sign bucket (identical bits
      // derivation as dedup_embedding's oracle).
      "bitext_mine_lsh" ->
        s"""WITH n AS (SELECT count(*) AS n_corpus FROM embeddings),
           |p AS (SELECT coalesce(min(b), ${Similarity.MaxBucketBits}) AS bits
           |      FROM (SELECT unnest(range(${Similarity.BucketBits},
           |                               ${Similarity.MaxBucketBits + 1})) AS b), n
           |      WHERE n_corpus <= ${Similarity.TargetCellVectors}
           |                        * (CAST(1 AS BIGINT) << b)),
           |e AS (
           |  SELECT d.lang, v.vec_id, v.embedding,
           |    CAST(list_sum(list_transform(range(1, bits + 1),
           |      k -> CASE WHEN embedding[k] >= 0
           |                THEN CAST(1 AS BIGINT) << (k - 1)
           |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
           |  FROM embeddings v JOIN documents d ON v.vec_id = d.doc_id
           |  CROSS JOIN p),
           |en AS (SELECT bucket, vec_id AS en_id, embedding AS e_en
           |       FROM e WHERE lang = 'en'),
           |xx AS (SELECT bucket, lang, vec_id AS xx_id, embedding AS e_xx
           |       FROM e WHERE lang <> 'en'),
           |scored AS (
           |  SELECT lang, xx_id, en_id,
           |    list_cosine_similarity(e_xx, e_en) AS cos
           |  FROM xx JOIN en USING (bucket)),
           |d1 AS (
           |  SELECT xx_id, en_id FROM (
           |    SELECT xx_id, en_id,
           |      row_number() OVER (PARTITION BY xx_id
           |        ORDER BY cos DESC, en_id) AS rn
           |    FROM scored) WHERE rn = 1),
           |d2 AS (
           |  SELECT lang, en_id, xx_id FROM (
           |    SELECT lang, en_id, xx_id,
           |      row_number() OVER (PARTITION BY en_id, lang
           |        ORDER BY cos DESC, xx_id) AS rn
           |    FROM scored) WHERE rn = 1)
           |SELECT d2.lang, d1.en_id AS src_id, d1.xx_id AS tgt_id
           |FROM d1 JOIN d2 ON d1.en_id = d2.en_id AND d1.xx_id = d2.xx_id"""
          .stripMargin,

      // Train on documents, score the incoming batch: unseen transitions
      // score 0 ppm and count as novel (cross-corpus novelty).
      "lm_score_batch" ->
        """WITH tok AS (
          |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          |  FROM documents),
          |bg AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM tok, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
          |  WHERE len(w) >= 2),
          |tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bg GROUP BY 1, 2, 3),
          |bgc AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c_bg
          |        FROM tf GROUP BY 1, 2),
          |ctx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx
          |        FROM bgc GROUP BY 1),
          |lm AS (SELECT w1, w2, c_bg, c_ctx FROM bgc JOIN ctx USING (w1)),
          |batch AS (
          |  SELECT doc_id + 600000 AS doc_id, text FROM documents
          |  WHERE doc_id % 5 = 0
          |  UNION ALL
          |  SELECT doc_id + 700000 AS doc_id, text || ' qq zz' FROM documents
          |  WHERE doc_id % 7 = 0),
          |btok AS (
          |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          |  FROM batch),
          |bbg AS (
          |  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
          |  FROM btok, LATERAL (SELECT unnest(generate_series(1, len(w) - 1)) AS i) t
          |  WHERE len(w) >= 2),
          |btf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM bbg GROUP BY 1, 2, 3),
          |j AS (SELECT btf.doc_id, btf.tf, lm.c_bg, lm.c_ctx
          |      FROM btf LEFT JOIN lm USING (w1, w2))
          |SELECT doc_id,
          |  CAST(sum(tf) AS BIGINT) AS n_bigrams,
          |  CAST(CAST(sum(tf * coalesce((c_bg * 1000000) // c_ctx, 0))
          |    AS BIGINT) // CAST(sum(tf) AS BIGINT) AS BIGINT) AS lm_score_ppm,
          |  CAST(CAST(sum(CASE WHEN c_bg IS NULL THEN tf ELSE 0 END)
          |    AS BIGINT) * 1000 // CAST(sum(tf) AS BIGINT) AS BIGINT)
          |    AS novel_frac_x1000
          |FROM j GROUP BY doc_id""".stripMargin,

      // Within-word adjacent character pairs (the BPE merge statistic);
      // string slice s[i:i+1] is 1-based inclusive = 2 chars, matching
      // Spark's substring(word, i, 2).
      "text_bpe_pairs" ->
        """WITH w AS (
          |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
          |  FROM documents),
          |p AS (
          |  SELECT word[i:i+1] AS pair
          |  FROM w, LATERAL (SELECT unnest(generate_series(1, length(word) - 1)) AS i) t
          |  WHERE length(word) >= 2)
          |SELECT pair, count(*) AS cnt FROM p
          |GROUP BY pair ORDER BY cnt DESC, pair LIMIT 30""".stripMargin,

      "bpe_train" -> bpeOracleSql,

      "bpe_encode" -> bpeEncodeOracleSql,
      "bpe_fertility" -> bpeFertilityOracleSql,

      // L1 drift in integer ppm over the top-1000-term head vocabulary;
      // the grid is sources × head terms so absent terms still count.
      "source_divergence" ->
        s"""WITH tok AS (
           |  SELECT source,
           |    unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
           |  FROM documents),
           |g AS (SELECT term, count(*) AS g_cnt FROM tok GROUP BY term),
           |gt AS (SELECT CAST(sum(g_cnt) AS BIGINT) AS g_tot FROM g),
           |gp AS (SELECT term, g_cnt * 1000000 // g_tot AS g_ppm
           |       FROM g, gt
           |       ORDER BY g_cnt DESC, term
           |       LIMIT ${TextAnalysis.DivergenceHeadTerms}),
           |s AS (SELECT source, term, count(*) AS s_cnt
           |      FROM tok GROUP BY source, term),
           |st AS (SELECT source, CAST(sum(s_cnt) AS BIGINT) AS s_tot
           |       FROM s GROUP BY source),
           |sp AS (SELECT source, term, s_cnt * 1000000 // s_tot AS s_ppm
           |       FROM s JOIN st USING (source)),
           |grid AS (SELECT st.source, st.s_tot, gp.term, gp.g_ppm
           |         FROM st CROSS JOIN gp)
           |SELECT grid.source, grid.s_tot AS n_tokens,
           |  CAST(sum(abs(coalesce(sp.s_ppm, 0) - grid.g_ppm)) AS BIGINT)
           |    AS l1_ppm
           |FROM grid LEFT JOIN sp
           |  ON sp.source = grid.source AND sp.term = grid.term
           |GROUP BY grid.source, grid.s_tot""".stripMargin,

      // Exact discrete lower median per language: the value at row
      // ceil(n/2) of the (ratio, doc_id) ordering.
      "quality_calibrate" ->
        s"""WITH sig AS (
           |  SELECT lang, doc_id,
           |    (CAST($stopwordCaseSql AS BIGINT) * 1000)
           |      // greatest(CAST(len(regexp_split_to_array(trim(text),
           |           '\\s+')) AS BIGINT), 1) AS ratio_x1000
           |  FROM documents),
           |r AS (
           |  SELECT lang, ratio_x1000,
           |    row_number() OVER (PARTITION BY lang
           |      ORDER BY ratio_x1000, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY lang) AS n
           |  FROM sig),
           |bars AS (
           |  SELECT lang, ratio_x1000 AS median_x1000,
           |    ratio_x1000 // 2 AS threshold_x1000
           |  FROM r WHERE rn = (n + 1) // 2)
           |SELECT sig.lang, median_x1000, threshold_x1000,
           |  count(*) AS n_docs,
           |  CAST(sum(CASE WHEN ratio_x1000 >= threshold_x1000
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
           |FROM sig JOIN bars ON bars.lang = sig.lang
           |GROUP BY sig.lang, median_x1000, threshold_x1000""".stripMargin,

      // Counting percentiles over the bounded ratio domain — the
      // quality_calibrate histogram chain with p5/p95 ranks.
      "quality_winsorize" ->
        s"""WITH sig AS (
           |  SELECT lang, doc_id,
           |    (CAST($stopwordCaseSql AS BIGINT) * 1000)
           |      // greatest(CAST(len(regexp_split_to_array(trim(text),
           |           '\\s+')) AS BIGINT), 1) AS ratio_x1000
           |  FROM documents),
           |hist AS (
           |  SELECT lang, ratio_x1000, count(*) AS c
           |  FROM sig GROUP BY 1, 2),
           |cums AS (
           |  SELECT lang, ratio_x1000,
           |    sum(c) OVER (PARTITION BY lang ORDER BY ratio_x1000)
           |      AS cum,
           |    sum(c) OVER (PARTITION BY lang) AS n
           |  FROM hist),
           |cuts AS (
           |  SELECT lang,
           |    CAST(min(CASE WHEN cum >= greatest((n * 5) // 100, 1)
           |             THEN ratio_x1000 END) AS BIGINT) AS p05_x1000,
           |    CAST(min(CASE WHEN cum >= (n * 95 + 99) // 100
           |             THEN ratio_x1000 END) AS BIGINT) AS p95_x1000
           |  FROM cums GROUP BY lang)
           |SELECT doc_id, sig.lang, ratio_x1000, p05_x1000, p95_x1000,
           |  greatest(p05_x1000, least(p95_x1000, ratio_x1000))
           |    AS winsorized_x1000
           |FROM sig JOIN cuts ON cuts.lang = sig.lang""".stripMargin,

      // Index-merge report: corpus-side df/stats CTEs (what the
      // persisted artifact holds) + the batch's own tokenize/agg; the
      // merged columns are the additive laws the engine applies.
      "bm25_update" ->
        s"""WITH d AS (
           |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws
           |  FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf
           |       FROM (SELECT doc_id, unnest(ws) AS term FROM d) t
           |       GROUP BY 1, 2),
           |dfr AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
           |st AS (SELECT count(*) AS n_docs,
           |         CAST(sum(len(ws)) AS BIGINT) AS n_tokens
           |       FROM d),
           |batch AS (
           |  SELECT doc_id + 600000 AS doc_id,
           |    regexp_split_to_array(trim(text), '\\s+') AS ws
           |  FROM documents WHERE doc_id % 5 = 0
           |  UNION ALL
           |  SELECT doc_id + 700000,
           |    regexp_split_to_array(trim(text || ' qq zz'), '\\s+')
           |  FROM documents WHERE doc_id % 7 = 0),
           |bdf AS (
           |  SELECT term, count(*) AS df_batch
           |  FROM (SELECT DISTINCT doc_id, unnest(ws) AS term FROM batch) t
           |  GROUP BY 1),
           |bst AS (SELECT count(*) AS n_docs_b,
           |          CAST(sum(len(ws)) AS BIGINT) AS n_tokens_b
           |        FROM batch),
           |merged AS (
           |  SELECT ((n_tokens + n_tokens_b) * 1000)
           |           // (n_docs + n_docs_b) AS avgdl_merged_x1000
           |  FROM st CROSS JOIN bst)
           |SELECT bdf.term,
           |  CAST(coalesce(dfr.df, 0) AS BIGINT) AS df_corpus,
           |  bdf.df_batch,
           |  CAST(coalesce(dfr.df, 0) + bdf.df_batch AS BIGINT)
           |    AS df_merged,
           |  CAST(CASE WHEN dfr.df IS NULL THEN 1 ELSE 0 END AS BIGINT)
           |    AS new_term,
           |  avgdl_merged_x1000
           |FROM bdf LEFT JOIN dfr USING (term)
           |CROSS JOIN merged""".stripMargin,

      "text_docfreq" ->
        """WITH tok AS (
          |  SELECT DISTINCT doc_id, term FROM (
          |    SELECT doc_id,
          |      unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          |    FROM documents))
          |SELECT term, count(*) AS df FROM tok
          |GROUP BY term ORDER BY df DESC, term LIMIT 20""".stripMargin,

      "text_heavy_hitters" ->
        """WITH tok AS (
          |  SELECT DISTINCT doc_id, term FROM (
          |    SELECT doc_id,
          |      unnest(regexp_split_to_array(trim(text), '\s+')) AS term
          |    FROM documents)),
          |n AS (SELECT count(*) AS n_docs FROM documents)
          |SELECT term, count(*) AS df FROM tok CROSS JOIN n
          |GROUP BY term, n_docs HAVING count(*) * 20 > n_docs""".stripMargin,

      // Mirrors Similarity.adaptiveBucketBits: smallest b in
      // [BucketBits, MaxBucketBits] with n <= TargetCellVectors * 2^b,
      // integer arithmetic only (identical b on both engines), then the
      // first-b-dims sign bucket.
      "dedup_embedding" ->
        s"""WITH $embCorpusCte,
           |n AS (SELECT count(*) AS n_corpus FROM corpus),
           |p AS (SELECT coalesce(min(b), ${Similarity.MaxBucketBits}) AS bits
           |      FROM (SELECT unnest(range(${Similarity.BucketBits},
           |                               ${Similarity.MaxBucketBits + 1})) AS b), n
           |      WHERE n_corpus <= ${Similarity.TargetCellVectors}
           |                        * (CAST(1 AS BIGINT) << b)),
           |bkt AS (SELECT vec_id, embedding,
           |    CAST(list_sum(list_transform(range(1, bits + 1),
           |      k -> CASE WHEN embedding[k] >= 0
           |                THEN CAST(1 AS BIGINT) << (k - 1)
           |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
           |  FROM corpus CROSS JOIN p)
           |SELECT x.vec_id AS a_id, y.vec_id AS b_id
           |FROM bkt x JOIN bkt y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
           |WHERE list_cosine_similarity(x.embedding, y.embedding) >= 0.999""".stripMargin,

      // Batch-vs-corpus embedding gate: same adaptive-bits derivation as
      // dedup_embedding (over the PLAIN corpus count), planted ×2 copies
      // must be dropped, sign-flipped novelties must survive.
      "emb_incremental" ->
        s"""WITH n AS (SELECT count(*) AS n_corpus FROM embeddings),
           |p AS (SELECT coalesce(min(b), ${Similarity.MaxBucketBits}) AS bits
           |      FROM (SELECT unnest(range(${Similarity.BucketBits},
           |                               ${Similarity.MaxBucketBits + 1})) AS b), n
           |      WHERE n_corpus <= ${Similarity.TargetCellVectors}
           |                        * (CAST(1 AS BIGINT) << b)),
           |batch AS (
           |  SELECT vec_id + ${Similarity.VecScaledOff} AS batch_id,
           |    list_transform(embedding, x -> x * 2) AS embedding
           |  FROM embeddings WHERE vec_id % 6 = 0
           |  UNION ALL
           |  SELECT vec_id + ${Similarity.VecFlippedOff},
           |    list_transform(embedding, x -> -x)
           |  FROM embeddings WHERE vec_id % 9 = 0),
           |bb AS (SELECT batch_id, embedding,
           |    CAST(list_sum(list_transform(range(1, bits + 1),
           |      k -> CASE WHEN embedding[k] >= 0
           |                THEN CAST(1 AS BIGINT) << (k - 1)
           |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
           |  FROM batch CROSS JOIN p),
           |cb AS (SELECT vec_id, embedding,
           |    CAST(list_sum(list_transform(range(1, bits + 1),
           |      k -> CASE WHEN embedding[k] >= 0
           |                THEN CAST(1 AS BIGINT) << (k - 1)
           |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
           |  FROM embeddings CROSS JOIN p),
           |m AS (
           |  SELECT bb.batch_id, count(*) AS n
           |  FROM bb JOIN cb ON cb.bucket = bb.bucket
           |  WHERE list_cosine_similarity(bb.embedding, cb.embedding)
           |    >= 0.999
           |  GROUP BY 1)
           |SELECT b.batch_id,
           |  CAST(coalesce(m.n, 0) AS BIGINT) AS n_matches,
           |  coalesce(m.n, 0) > 0 AS is_dup
           |FROM batch b LEFT JOIN m ON m.batch_id = b.batch_id""".stripMargin,

      "sim_topk" ->
        """WITH q AS (SELECT vec_id AS query_id, embedding AS e_q
          |           FROM embeddings WHERE vec_id < 8),
          |c AS (SELECT vec_id AS neighbor_id, embedding AS e_n FROM embeddings),
          |scored AS (
          |  SELECT query_id, neighbor_id,
          |    list_cosine_similarity(e_q, e_n) AS cos
          |  FROM q CROSS JOIN c WHERE neighbor_id <> query_id)
          |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
          |FROM (SELECT query_id, neighbor_id,
          |        row_number() OVER (PARTITION BY query_id
          |          ORDER BY cos DESC, neighbor_id) AS rank
          |      FROM scored)
          |WHERE rank <= 5""".stripMargin,

      // sim_topk with the positive class excluded: nearest neighbors
      // whose ground-truth label differs from the query's.
      "hard_negatives" ->
        """WITH q AS (SELECT vec_id AS query_id, embedding AS e_q, label
          |           FROM embeddings WHERE vec_id < 8),
          |c AS (SELECT vec_id AS neighbor_id, embedding AS e_n, label
          |      FROM embeddings),
          |scored AS (
          |  SELECT query_id, neighbor_id,
          |    list_cosine_similarity(e_q, e_n) AS cos
          |  FROM q CROSS JOIN c
          |  WHERE neighbor_id <> query_id AND c.label <> q.label)
          |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
          |FROM (SELECT query_id, neighbor_id,
          |        row_number() OVER (PARTITION BY query_id
          |          ORDER BY cos DESC, neighbor_id) AS rank
          |      FROM scored)
          |WHERE rank <= 5""".stripMargin,

      "sim_ann_lsh" ->
        s"""WITH b AS (SELECT vec_id, embedding, $bucketSql AS bucket
           |           FROM embeddings),
           |q AS (SELECT vec_id AS query_id, embedding AS e_q, bucket
           |      FROM b WHERE vec_id < 8),
           |scored AS (
           |  SELECT query_id, c.vec_id AS neighbor_id,
           |    list_cosine_similarity(e_q, c.embedding) AS cos
           |  FROM q JOIN b c USING (bucket) WHERE c.vec_id <> query_id)
           |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
           |FROM (SELECT query_id, neighbor_id,
           |        row_number() OVER (PARTITION BY query_id
           |          ORDER BY cos DESC, neighbor_id) AS rank
           |      FROM scored)
           |WHERE rank <= 5""".stripMargin,

      "sim_ivf" -> ivfOracleSql("rn = 1"),

      "sim_ivf_probe2" -> ivfOracleSql("rn <= 2"),

      // Recall@5 of the nprobe=1 IVF search vs the brute-force truth:
      // shares the ivf_res CTE chain with the sim_ivf oracle, so the
      // metric and the search it grades cannot drift apart.
      "ann_recall" ->
        s"""WITH $trainCtes,
           |${ivfSearchCtes("rn = 1")},
           |bt_scored AS (
           |  SELECT query_id, neighbor_id,
           |    list_cosine_similarity(e_q, e_n) AS cos
           |  FROM (SELECT vec_id AS query_id, embedding AS e_q
           |        FROM embeddings WHERE vec_id < 8) q
           |  CROSS JOIN (SELECT vec_id AS neighbor_id, embedding AS e_n
           |              FROM embeddings) c
           |  WHERE neighbor_id <> query_id),
           |bt AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY cos DESC, neighbor_id) AS rank
           |    FROM bt_scored)
           |  WHERE rank <= 5)
           |SELECT bt.query_id,
           |  CAST(count(*) AS BIGINT) AS k_truth,
           |  CAST(count(i.query_id) AS BIGINT) AS n_hits,
           |  CAST(count(i.query_id) * 1000 // count(*) AS BIGINT)
           |    AS recall_x1000
           |FROM bt LEFT JOIN ivf_res i
           |  ON i.query_id = bt.query_id
           |  AND i.neighbor_id = bt.neighbor_id
           |GROUP BY bt.query_id""".stripMargin,

      // MRR of the IVF search vs the brute-force top-1 truth: shares
      // the ivf_res CTE chain with sim_ivf / ann_recall.
      "ann_mrr" ->
        s"""WITH $trainCtes,
           |${ivfSearchCtes("rn = 1")},
           |fh AS (
           |  SELECT i.query_id, min(i.rank) AS rank_found
           |  FROM ivf_res i
           |  JOIN embeddings n ON n.vec_id = i.neighbor_id
           |  JOIN embeddings q ON q.vec_id = i.query_id
           |  WHERE n.label = q.label
           |  GROUP BY i.query_id)
           |SELECT q.vec_id AS query_id,
           |  CAST(coalesce(fh.rank_found, 0) AS BIGINT) AS rank_found,
           |  CAST(CASE WHEN fh.rank_found IS NULL THEN 0
           |            ELSE 1000 // fh.rank_found END AS BIGINT)
           |    AS rr_x1000
           |FROM (SELECT vec_id FROM embeddings WHERE vec_id < 8) q
           |LEFT JOIN fh ON fh.query_id = q.vec_id""".stripMargin,

      // Integer-exact PQ: the oracle retrains the per-subspace codebooks
      // and reassigns every code in SQL (pqCtes), so codes_md5 pins the
      // full code matrix and err_q the total quantization error.
      "pq_encode" ->
        s"""WITH $pqCtes
           |SELECT vec_id,
           |  md5(array_to_string(list(code ORDER BY m), ',')) AS codes_md5,
           |  CAST(sum(d2) AS BIGINT) AS err_q
           |FROM pcodes GROUP BY vec_id""".stripMargin,

      // ADC search: per-query M×K integer distance table joined to the
      // corpus CODES on (m, code), summed over m, ranked (dist asc,
      // neighbor asc), self excluded, top 5.
      "pq_search" ->
        s"""WITH $pqCtes,
           |$pqSearchCtes
           |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           |  dist_q
           |FROM pranked WHERE rank <= 5""".stripMargin,

      // recall@5 of the ADC search vs the exact integer-L2 ground truth
      // over FULL vectors — shares the pq CTE chain so the metric grades
      // exactly the search the pq_search key runs.
      "pq_recall" ->
        s"""WITH $pqCtes,
           |$pqSearchCtes,
           |ptop AS (SELECT query_id, neighbor_id FROM pranked
           |         WHERE rank <= 5),
           |tscored AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |    CAST(sum(CAST(list_sum(list_transform(
           |      range(${PqIndex.SubDim}), i ->
           |        (q.qsub[i+1] - n.qsub[i+1]) *
           |        (q.qsub[i+1] - n.qsub[i+1]))) AS BIGINT)) AS BIGINT)
           |      AS dist_q
           |  FROM qsubs q JOIN qsubs n
           |    ON n.m = q.m AND n.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY dist_q, neighbor_id) AS rank
           |    FROM tscored)
           |  WHERE rank <= 5)
           |SELECT t.query_id,
           |  CAST(count(*) AS BIGINT) AS k_truth,
           |  CAST(count(p.query_id) AS BIGINT) AS n_hits,
           |  CAST(count(p.query_id) * 1000 // count(*) AS BIGINT)
           |    AS recall_x1000
           |FROM truth t LEFT JOIN ptop p
           |  ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
           |GROUP BY t.query_id""".stripMargin,

      // Composed IVF×PQ: ADC over codes restricted to each query's probed
      // cell — the oracle retrains BOTH artifacts (k-means centroids +
      // per-subspace codebooks) in SQL and reuses pq_search's pdist
      // distance tables, so the composed ranking is hash-gated end to end.
      "ivf_pq_search" ->
        s"""WITH $trainCtes,
           |$pqCtes,
           |$pqSearchCtes,
           |${ivfPqCtes(1)}
           |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           |  dist_q
           |FROM ipranked WHERE rank <= 5""".stripMargin,

      // Two-stage refine: the ADC ranking's top k·RefineExpand become the
      // shortlist; exact integer-L2 over full subvectors reranks ONLY the
      // shortlist. Shares every CTE with ivf_pq_search, so the shortlist
      // the oracle reranks is bit-identical to the engine's.
      "ivf_pq_refine" -> {
        val short = 5 * PqIndex.RefineExpand
        s"""WITH $trainCtes,
           |$pqCtes,
           |$pqSearchCtes,
           |${ivfPqCtes(1)},
           |rshort AS (SELECT query_id, neighbor_id FROM ipranked
           |           WHERE rank <= $short),
           |rex AS (
           |  SELECT s.query_id, s.neighbor_id,
           |    CAST(sum(CAST(list_sum(list_transform(
           |      range(${PqIndex.SubDim}), i ->
           |        (q.qsub[i+1] - n.qsub[i+1]) *
           |        (q.qsub[i+1] - n.qsub[i+1]))) AS BIGINT)) AS BIGINT)
           |      AS dist_q
           |  FROM rshort s
           |  JOIN qsubs q ON q.vec_id = s.query_id
           |  JOIN qsubs n ON n.vec_id = s.neighbor_id AND n.m = q.m
           |  GROUP BY 1, 2),
           |rranked AS (
           |  SELECT query_id, neighbor_id, dist_q,
           |    row_number() OVER (PARTITION BY query_id
           |      ORDER BY dist_q, neighbor_id) AS rank
           |  FROM rex)
           |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           |  dist_q
           |FROM rranked WHERE rank <= 5""".stripMargin
      },

      // recall@5 of the two-stage refine vs the exact truth — the third
      // point of the tuning curve (same rshort/rex/rranked chain as the
      // ivf_pq_refine oracle, same truth CTEs as the other recall keys).
      "ivf_pq_refine_recall" -> {
        val short = 5 * PqIndex.RefineExpand
        s"""WITH $trainCtes,
           |$pqCtes,
           |$pqSearchCtes,
           |${ivfPqCtes(1)},
           |rshort AS (SELECT query_id, neighbor_id FROM ipranked
           |           WHERE rank <= $short),
           |rex AS (
           |  SELECT s.query_id, s.neighbor_id,
           |    CAST(sum(CAST(list_sum(list_transform(
           |      range(${PqIndex.SubDim}), i ->
           |        (q.qsub[i+1] - n.qsub[i+1]) *
           |        (q.qsub[i+1] - n.qsub[i+1]))) AS BIGINT)) AS BIGINT)
           |      AS dist_q
           |  FROM rshort s
           |  JOIN qsubs q ON q.vec_id = s.query_id
           |  JOIN qsubs n ON n.vec_id = s.neighbor_id AND n.m = q.m
           |  GROUP BY 1, 2),
           |rtop AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY dist_q, neighbor_id) AS rank
           |    FROM rex)
           |  WHERE rank <= 5),
           |tscored AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |    CAST(sum(CAST(list_sum(list_transform(
           |      range(${PqIndex.SubDim}), i ->
           |        (q.qsub[i+1] - n.qsub[i+1]) *
           |        (q.qsub[i+1] - n.qsub[i+1]))) AS BIGINT)) AS BIGINT)
           |      AS dist_q
           |  FROM qsubs q JOIN qsubs n
           |    ON n.m = q.m AND n.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY dist_q, neighbor_id) AS rank
           |    FROM tscored)
           |  WHERE rank <= 5)
           |SELECT t.query_id,
           |  CAST(count(*) AS BIGINT) AS k_truth,
           |  CAST(count(p.query_id) AS BIGINT) AS n_hits,
           |  CAST(count(p.query_id) * 1000 // count(*) AS BIGINT)
           |    AS recall_x1000
           |FROM truth t LEFT JOIN rtop p
           |  ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
           |GROUP BY t.query_id""".stripMargin
      },

      // recall@5 of the composed search vs the same exact integer-L2
      // full-vector truth pq_recall grades against — one metric for both
      // approximation losses (cell pruning + code compression).
      "ivf_pq_recall" ->
        s"""WITH $trainCtes,
           |$pqCtes,
           |$pqSearchCtes,
           |${ivfPqCtes(1)},
           |iptop AS (SELECT query_id, neighbor_id FROM ipranked
           |          WHERE rank <= 5),
           |tscored AS (
           |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
           |    CAST(sum(CAST(list_sum(list_transform(
           |      range(${PqIndex.SubDim}), i ->
           |        (q.qsub[i+1] - n.qsub[i+1]) *
           |        (q.qsub[i+1] - n.qsub[i+1]))) AS BIGINT)) AS BIGINT)
           |      AS dist_q
           |  FROM qsubs q JOIN qsubs n
           |    ON n.m = q.m AND n.vec_id <> q.vec_id
           |  WHERE q.vec_id < 8
           |  GROUP BY 1, 2),
           |truth AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY dist_q, neighbor_id) AS rank
           |    FROM tscored)
           |  WHERE rank <= 5)
           |SELECT t.query_id,
           |  CAST(count(*) AS BIGINT) AS k_truth,
           |  CAST(count(p.query_id) AS BIGINT) AS n_hits,
           |  CAST(count(p.query_id) * 1000 // count(*) AS BIGINT)
           |    AS recall_x1000
           |FROM truth t LEFT JOIN iptop p
           |  ON p.query_id = t.query_id AND p.neighbor_id = t.neighbor_id
           |GROUP BY t.query_id""".stripMargin,

      // IEEE-deterministic mirror of Similarity.quantizeInt8Stats: the
      // float inputs are exact, both engines promote to DOUBLE for the
      // divisions, round() is half-away-from-zero in both, and the scale
      // rounds to nearest back to REAL — so the int8 code array (pinned
      // whole via q_md5) matches bit-for-bit.
      "emb_quantize" ->
        """WITH s AS (
          |  SELECT vec_id, embedding,
          |    CAST(CAST(list_max(list_transform(embedding, x -> abs(x)))
          |      AS DOUBLE) / CAST(127 AS DOUBLE) AS REAL) AS scale
          |  FROM embeddings),
          |qv AS (
          |  SELECT vec_id, len(embedding) AS nd,
          |    CASE WHEN scale > 0 THEN
          |      list_transform(embedding, x ->
          |        CAST(round(CAST(x AS DOUBLE) / CAST(scale AS DOUBLE))
          |          AS TINYINT))
          |    ELSE list_transform(embedding, x -> CAST(0 AS TINYINT))
          |    END AS q
          |  FROM s)
          |SELECT vec_id, CAST(nd AS INTEGER) AS n_dims,
          |  CAST(list_sum(q) AS BIGINT) AS q_sum,
          |  CAST(list_min(q) AS INTEGER) AS q_min,
          |  CAST(list_max(q) AS INTEGER) AS q_max,
          |  md5(array_to_string(q, ',')) AS q_md5
          |FROM qv""".stripMargin,

      // Integer-exact scatter matrix: fixed-point 1e-4 quantization, then
      // upper-triangle product sums + centered m = n·sxy − s_i·s_j. The
      // MATERIALIZED marks stop DuckDB re-inlining the corpus chain into
      // every consumer (the bpe_train lesson).
      "emb_gram" ->
        s"""WITH $gramCtes
           |SELECT i, j, sxy, m FROM ct""".stripMargin,

      // JL random-sign projection: the sign is an LCG-parity hash of the
      // flat index i·d + j (0-based i to match Spark's 0-based arrays;
      // DuckDB lists are 1-based, hence embedding[i + 1]); inputs are the
      // shared ×10000 quantization, so every output is an exact integer.
      "emb_project" ->
        s"""WITH q AS (
           |  SELECT vec_id, CAST(i AS BIGINT) AS i,
           |    CAST(round(CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE)
           |         * 10000) AS BIGINT) AS ql
           |  FROM embeddings,
           |    LATERAL (SELECT unnest(generate_series(0, len(embedding) - 1))
           |             AS i) t)
           |SELECT vec_id,
           |  CAST(j AS BIGINT) AS dim_out,
           |  CAST(sum((CASE WHEN ((1103515245 * (i * ${Similarity.ProjectDims}
           |                         + j) + 12345) // 65536) % 2 = 0
           |            THEN 1 ELSE -1 END) * ql) AS BIGINT) AS proj_q
           |FROM q, LATERAL (SELECT
           |    unnest(generate_series(0,
           |      CAST(${Similarity.ProjectDims - 1} AS BIGINT))) AS j) s
           |GROUP BY vec_id, j""".stripMargin,

      // Recall of the projected-space search vs the full-precision truth:
      // the projection CTEs recompute emb_project's integer coordinates,
      // the cosine is the same explicitly-spelled double formula, the
      // truth CTE is ann_recall's brute-force chain.
      "project_recall" ->
        s"""WITH q AS (
           |  SELECT vec_id, CAST(i AS BIGINT) AS i,
           |    CAST(round(CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE)
           |         * 10000) AS BIGINT) AS ql
           |  FROM embeddings,
           |    LATERAL (SELECT unnest(generate_series(0, len(embedding) - 1))
           |             AS i) t),
           |pr AS (
           |  SELECT vec_id, CAST(j AS BIGINT) AS j,
           |    CAST(sum((CASE WHEN ((1103515245 * (i * ${Similarity.ProjectDims}
           |                           + j) + 12345) // 65536) % 2 = 0
           |              THEN 1 ELSE -1 END) * ql) AS BIGINT) AS p
           |  FROM q, LATERAL (SELECT
           |      unnest(generate_series(0,
           |        CAST(${Similarity.ProjectDims - 1} AS BIGINT))) AS j) s
           |  GROUP BY vec_id, j),
           |pl AS (SELECT vec_id, list(p ORDER BY j) AS proj
           |       FROM pr GROUP BY vec_id),
           |pcand AS (
           |  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
           |    CAST(list_sum(list_transform(
           |        range(1, ${Similarity.ProjectDims + 1}),
           |        t -> qq.proj[t] * cc.proj[t])) AS DOUBLE)
           |    / (sqrt(CAST(list_sum(list_transform(qq.proj, x -> x * x))
           |            AS DOUBLE))
           |       * sqrt(CAST(list_sum(list_transform(cc.proj, x -> x * x))
           |              AS DOUBLE))) AS cos
           |  FROM pl qq JOIN pl cc ON cc.vec_id <> qq.vec_id
           |  WHERE qq.vec_id < 8),
           |pf AS (
           |  SELECT query_id, neighbor_id
           |  FROM (SELECT query_id, neighbor_id,
           |          row_number() OVER (PARTITION BY query_id
           |            ORDER BY cos DESC, neighbor_id) AS rank
           |        FROM pcand)
           |  WHERE rank <= 5),
           |bt_scored AS (
           |  SELECT query_id, neighbor_id,
           |    list_cosine_similarity(e_q, e_n) AS cos
           |  FROM (SELECT vec_id AS query_id, embedding AS e_q
           |        FROM embeddings WHERE vec_id < 8) tq
           |  CROSS JOIN (SELECT vec_id AS neighbor_id, embedding AS e_n
           |              FROM embeddings) tc
           |  WHERE neighbor_id <> query_id),
           |bt AS (
           |  SELECT query_id, neighbor_id FROM (
           |    SELECT query_id, neighbor_id,
           |      row_number() OVER (PARTITION BY query_id
           |        ORDER BY cos DESC, neighbor_id) AS rank
           |    FROM bt_scored)
           |  WHERE rank <= 5)
           |SELECT bt.query_id,
           |  CAST(count(*) AS BIGINT) AS k_truth,
           |  CAST(count(pf.query_id) AS BIGINT) AS n_hits,
           |  CAST(count(pf.query_id) * 1000 // count(*) AS BIGINT)
           |    AS recall_x1000
           |FROM bt LEFT JOIN pf
           |  ON pf.query_id = bt.query_id
           |  AND pf.neighbor_id = bt.neighbor_id
           |GROUP BY bt.query_id""".stripMargin,

      // Whole-corpus kNN graph within the SAME adaptive sign bucket the
      // engine derives (bits CTE = dedup_embedding's), ranked by cosine
      // with the engine's (cos DESC, dst ASC) tie-break; mutual = the
      // reverse edge also survived its endpoint's top-k.
      "knn_graph" ->
        s"""WITH $knnGraphCtes
           |SELECT e.src_id, e.dst_id, e.rank,
           |  CAST(CASE WHEN r.src_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           |    AS mutual
           |FROM e LEFT JOIN e r
           |  ON r.src_id = e.dst_id AND r.dst_id = e.src_id""".stripMargin,

      // FULL REBUILD over corpus ∪ the mirrored ingest batch at the
      // BASE corpus's bucket width — the equivalence law itself: the
      // engine's bucket-local merge must be bit-equal to this rebuild,
      // so a stale kept edge, a missed displacement, or a wrong mutual
      // flag on either side of the touched/untouched boundary
      // hash-mismatches.
      "knn_incremental" ->
        s"""WITH n AS (SELECT count(*) AS n_corpus FROM embeddings),
           |p AS (SELECT coalesce(min(b), ${Similarity.MaxBucketBits}) AS bits
           |      FROM (SELECT unnest(range(${Similarity.BucketBits},
           |                               ${Similarity.MaxBucketBits + 1})) AS b), n
           |      WHERE n_corpus <= ${Similarity.TargetCellVectors}
           |                        * (CAST(1 AS BIGINT) << b)),
           |allv AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT vec_id + ${Similarity.VecScaledOff},
           |    list_transform(embedding, x -> x * 2)
           |  FROM embeddings WHERE vec_id % 6 = 0
           |  UNION ALL
           |  SELECT vec_id + ${Similarity.VecFlippedOff},
           |    list_transform(embedding, x -> -x)
           |  FROM embeddings WHERE vec_id % 9 = 0),
           |bkt AS (SELECT vec_id, embedding,
           |    CAST(list_sum(list_transform(range(1, bits + 1),
           |      k -> CASE WHEN embedding[k] >= 0
           |                THEN CAST(1 AS BIGINT) << (k - 1)
           |                ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS bucket
           |  FROM allv CROSS JOIN p),
           |cand AS (
           |  SELECT x.vec_id AS src_id, y.vec_id AS dst_id,
           |    list_cosine_similarity(x.embedding, y.embedding) AS cos
           |  FROM bkt x JOIN bkt y
           |    ON x.bucket = y.bucket AND x.vec_id <> y.vec_id),
           |e AS (
           |  SELECT src_id, dst_id, CAST(rn AS INTEGER) AS rank
           |  FROM (SELECT src_id, dst_id,
           |          row_number() OVER (PARTITION BY src_id
           |            ORDER BY cos DESC, dst_id) AS rn
           |        FROM cand)
           |  WHERE rn <= ${Similarity.KnnGraphK})
           |SELECT e.src_id, e.dst_id, e.rank,
           |  CAST(CASE WHEN r.src_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           |    AS mutual
           |FROM e LEFT JOIN e r
           |  ON r.src_id = e.dst_id AND r.dst_id = e.src_id""".stripMargin,

      // One-row health report over the same single-sourced graph CTE
      // chain — mutual flag recomputed like knn_graph's oracle, then
      // three rollups; guarded permille so an empty graph reads 0.
      "graph_health" -> graphHealthSql,

      // Connected components over the MUTUAL edges of the knn_graph CTE
      // chain (single-sourced, so graph and clustering cannot drift) —
      // the dedup_groups reach pattern over the symmetric edge list.
      "knn_components" ->
        s"""WITH RECURSIVE $knnGraphCtes,
           |$knnComponentCtes
           |SELECT vec_id, component, cluster_size, is_canonical
           |FROM comp JOIN sz USING (component)""".stripMargin,

      // D4-style prototypicality pruning over the SAME component chain
      // knn_components uses — all-integer ‖n·q − S‖² distances, so the
      // rank and keep flags are bit-reproducible on both engines.
      // Majority-label purity per cluster over the shared component
      // chain; the majority tie breaks on smallest label both sides.
      "cluster_purity" ->
        s"""WITH RECURSIVE $knnGraphCtes,
           |$knnComponentCtes,
           |cl AS (SELECT vec_id, component, cluster_size
           |       FROM comp JOIN sz USING (component)),
           |cnt AS (
           |  SELECT cl.component, cl.cluster_size,
           |    CAST(e.label AS BIGINT) AS label, count(*) AS c
           |  FROM cl JOIN embeddings e USING (vec_id)
           |  GROUP BY 1, 2, 3),
           |rr AS (
           |  SELECT component, cluster_size, label, c,
           |    count(*) OVER (PARTITION BY component) AS n_labels,
           |    CAST(row_number() OVER (PARTITION BY component
           |      ORDER BY c DESC, label) AS INTEGER) AS rn
           |  FROM cnt)
           |SELECT component, cluster_size, n_labels,
           |  label AS major_label, c AS major_count,
           |  CAST(c * 1000 // cluster_size AS BIGINT) AS purity_x1000
           |FROM rr WHERE rn = 1""".stripMargin,

      "d4_prune" ->
        s"""WITH RECURSIVE $knnGraphCtes,
           |$knnComponentCtes,
           |cl AS (SELECT vec_id, component, cluster_size
           |       FROM comp JOIN sz USING (component)),
           |q AS (SELECT vec_id,
           |    list_transform(embedding, x ->
           |      CAST(round(CAST(x AS DOUBLE) * ${Similarity.ProtoQ})
           |        AS BIGINT)) AS q
           |  FROM embeddings),
           |cent AS (
           |  SELECT component, i, CAST(sum(q.q[i]) AS BIGINT) AS s
           |  FROM cl JOIN q USING (vec_id),
           |    LATERAL (SELECT unnest(generate_series(1, len(q.q))) AS i) t
           |  GROUP BY 1, 2),
           |dist AS (
           |  SELECT cl.vec_id, cl.component, cl.cluster_size,
           |    CAST(sum((q.q[cent.i] * cl.cluster_size - cent.s)
           |           * (q.q[cent.i] * cl.cluster_size - cent.s))
           |      AS BIGINT) AS dist_q
           |  FROM cl JOIN q USING (vec_id)
           |  JOIN cent ON cent.component = cl.component
           |  GROUP BY 1, 2, 3),
           |r AS (SELECT vec_id, component, cluster_size, dist_q,
           |    CAST(row_number() OVER (PARTITION BY component
           |      ORDER BY dist_q, vec_id) AS BIGINT) AS proto_rank
           |  FROM dist)
           |SELECT vec_id, component, cluster_size, dist_q, proto_rank,
           |  CAST(CASE WHEN proto_rank >
           |      cluster_size * ${Similarity.D4DropPermille} // 1000
           |    THEN 1 ELSE 0 END AS BIGINT) AS keep
           |FROM r""".stripMargin,

      // Greedy k-center unrolled round by round: each c$r is the
      // ORDER BY mind DESC, vec_id LIMIT 1 farthest point (the engine's
      // max(struct(d, −id))), each d$r folds the new center in with
      // least(); distances are the same quantized integer squared-L2 on
      // both engines, so selection and assignment match bit-for-bit.
      "kcenter_coreset" -> {
        def dist(a: String, b: String): String =
          s"CAST(list_sum(list_transform(range(1, len($a) + 1)," +
            s" i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
        val rounds = (2 to Similarity.KCenterK).map { r =>
          s"""c$r AS (
             |  SELECT q.vec_id, q.qv FROM d${r - 1} dd
             |  JOIN q ON q.vec_id = dd.vec_id
             |  ORDER BY dd.mind DESC, q.vec_id LIMIT 1),
             |d$r AS (
             |  SELECT dd.vec_id,
             |    least(dd.mind, ${dist("q.qv", s"c$r.qv")}) AS mind
             |  FROM d${r - 1} dd JOIN q ON q.vec_id = dd.vec_id
             |  CROSS JOIN c$r)""".stripMargin
        }.mkString(",\n")
        val centUnion = (1 to Similarity.KCenterK)
          .map(r => s"SELECT vec_id AS center_id, qv FROM c$r")
          .mkString("\nUNION ALL ")
        s"""WITH q AS (SELECT vec_id,
           |    list_transform(embedding, x ->
           |      CAST(round(CAST(x AS DOUBLE) * ${Similarity.ProtoQ})
           |        AS BIGINT)) AS qv
           |  FROM embeddings),
           |c1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
           |d1 AS (SELECT q.vec_id, ${dist("q.qv", "c1.qv")} AS mind
           |       FROM q CROSS JOIN c1),
           |$rounds,
           |cent AS ($centUnion),
           |a AS (SELECT q.vec_id, c.center_id,
           |    ${dist("q.qv", "c.qv")} AS dist_sq
           |  FROM q CROSS JOIN cent c),
           |b AS (SELECT vec_id, center_id, dist_sq FROM a
           |  QUALIFY row_number() OVER (PARTITION BY vec_id
           |    ORDER BY dist_sq, center_id) = 1)
           |SELECT b.vec_id, b.center_id, b.dist_sq,
           |  CAST(CASE WHEN b.vec_id IN (SELECT center_id FROM cent)
           |    THEN 1 ELSE 0 END AS BIGINT) AS is_center
           |FROM b""".stripMargin
      },

      // MMR unrolled greedy rounds over the sim_topk chain at candidate
      // depth MmrCand: pick 1 = rank 1; each later pick maximizes
      // min-dist-to-selected − dist-to-query (quantized integer L2, the
      // kcenter dist formula), ties on neighbor_id; the already-selected
      // are excluded by the pair-count HAVING (the engine's n_against
      // filter, literally).
      "mmr_select" -> {
        def dist(a: String, b: String): String =
          s"CAST(list_sum(list_transform(range(1, len($a) + 1)," +
            s" i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))) AS BIGINT)"
        val rounds = (2 to Similarity.MmrK).map { r =>
          s"""sc$r AS (
             |  SELECT c.query_id, c.neighbor_id, c.rel, c.qn,
             |    min(${dist("c.qn", "s.qn")}) AS divmin
             |  FROM candq c JOIN sel${r - 1} s USING (query_id)
             |  WHERE c.neighbor_id <> s.neighbor_id
             |  GROUP BY c.query_id, c.neighbor_id, c.rel, c.qn
             |  HAVING count(*) = ${r - 1}),
             |p$r AS (
             |  SELECT query_id, CAST($r AS BIGINT) AS mmr_rank,
             |    neighbor_id, qn
             |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
             |          ORDER BY divmin - rel DESC, neighbor_id) AS rn
             |        FROM sc$r) WHERE rn = 1),
             |sel$r AS (
             |  SELECT query_id, mmr_rank, neighbor_id, qn
             |  FROM sel${r - 1}
             |  UNION ALL
             |  SELECT query_id, mmr_rank, neighbor_id, qn FROM p$r)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH q AS (SELECT vec_id,
           |    list_transform(embedding, x ->
           |      CAST(round(CAST(x AS DOUBLE) * ${Similarity.ProtoQ})
           |        AS BIGINT)) AS qv
           |  FROM embeddings),
           |vq AS (SELECT vec_id AS query_id, embedding AS e_q
           |       FROM embeddings WHERE vec_id < 8),
           |vc AS (SELECT vec_id AS neighbor_id, embedding AS e_n
           |       FROM embeddings),
           |vsc AS (
           |  SELECT query_id, neighbor_id,
           |    list_cosine_similarity(e_q, e_n) AS cos
           |  FROM vq CROSS JOIN vc WHERE neighbor_id <> query_id),
           |cand AS (SELECT query_id, neighbor_id, rank
           |  FROM (SELECT query_id, neighbor_id,
           |          row_number() OVER (PARTITION BY query_id
           |            ORDER BY cos DESC, neighbor_id) AS rank
           |        FROM vsc)
           |  WHERE rank <= ${Similarity.MmrCand}),
           |candq AS (
           |  SELECT c.query_id, c.neighbor_id, c.rank, qn.qv AS qn,
           |    ${dist("qq.qv", "qn.qv")} AS rel
           |  FROM cand c JOIN q qq ON qq.vec_id = c.query_id
           |  JOIN q qn ON qn.vec_id = c.neighbor_id),
           |sel1 AS (SELECT query_id, CAST(1 AS BIGINT) AS mmr_rank,
           |    neighbor_id, qn
           |  FROM candq WHERE rank = 1),
           |$rounds
           |SELECT s.query_id, s.neighbor_id AS vec_id, s.mmr_rank,
           |  c.rel AS rel_dist_sq
           |FROM sel${Similarity.MmrK} s JOIN candq c
           |  ON c.query_id = s.query_id
           |  AND c.neighbor_id = s.neighbor_id""".stripMargin
      },

      // Fixed-point integer PageRank over the knn_graph CTE chain —
      // ranks ×1e6, per-edge contribution r // outdeg, damping
      // (850·Σ) // 1000, [[Similarity.PagerankIters]] unrolled rounds.
      // Integer arithmetic end-to-end, so both engines agree
      // bit-for-bit at every round (float PageRank would differ in ULPs
      // by summation order).
      "graph_pagerank" -> {
        def prRound(prev: String, next: String): String =
          s"""$next AS (
             |  SELECT v.vec_id,
             |    CAST(${Similarity.PagerankBase} +
             |      (850 * coalesce(s.m, 0)) // 1000 AS BIGINT) AS r
             |  FROM v LEFT JOIN (
             |    SELECT ed.dst_id, CAST(sum($prev.r // deg.outdeg)
             |      AS BIGINT) AS m
             |    FROM ed JOIN deg ON ed.src_id = deg.src_id
             |    JOIN $prev ON $prev.vec_id = ed.src_id
             |    GROUP BY ed.dst_id) s ON v.vec_id = s.dst_id)"""
            .stripMargin
        val prRounds = (1 to Similarity.PagerankIters)
          .map(i => prRound(s"r${i - 1}", s"r$i")).mkString(",\n")
        val prLast = s"r${Similarity.PagerankIters}"
        s"""WITH $knnGraphCtes,
           |ed AS (SELECT src_id, dst_id FROM e),
           |deg AS (SELECT src_id, count(*) AS outdeg FROM ed GROUP BY 1),
           |v AS (SELECT vec_id FROM embeddings),
           |r0 AS (SELECT vec_id,
           |  CAST(${Similarity.PagerankScale} AS BIGINT) AS r FROM v),
           |$prRounds,
           |ind AS (SELECT dst_id AS vec_id, count(*) AS in_deg
           |        FROM ed GROUP BY 1)
           |SELECT v.vec_id, $prLast.r AS pagerank_x6,
           |  CAST(coalesce(deg.outdeg, 0) AS BIGINT) AS out_deg,
           |  CAST(coalesce(ind.in_deg, 0) AS BIGINT) AS in_deg
           |FROM v JOIN $prLast ON v.vec_id = $prLast.vec_id
           |LEFT JOIN deg ON v.vec_id = deg.src_id
           |LEFT JOIN ind ON v.vec_id = ind.vec_id""".stripMargin
      },

      // Deterministic walk corpus over the shared walk CTE chain — the
      // cosine rank (−1) is the edge index, the next hop is the same
      // pure integer hash of (walk_id, step) mod out-degree on both
      // engines, one unrolled CTE per step.
      "graph_walks" ->
        s"""WITH $walkCtes
           |SELECT walk_id, step, vec_id FROM walks""".stripMargin,

      // Skip-gram pairs over the SAME walk CTE chain graph_walks uses —
      // the pair table cannot drift from the walk corpus.
      "walk_skipgrams" ->
        s"""WITH $walkCtes
           |SELECT a.vec_id AS center_id, b.vec_id AS context_id,
           |  count(*) AS n_pairs
           |FROM walks a JOIN walks b ON a.walk_id = b.walk_id
           |  AND a.step <> b.step
           |  AND abs(a.step - b.step) <= ${Similarity.SkipWindow}
           |GROUP BY 1, 2""".stripMargin,

      // Directed wedge/closure counts over the knn_graph CTE chain; the
      // closure test is a correlated EXISTS against the same edge list.
      "graph_triangles" ->
        s"""WITH $knnGraphCtes,
           |ed AS (SELECT src_id, dst_id FROM e),
           |w AS (SELECT e1.src_id, e2.dst_id AS far_id
           |      FROM ed e1 JOIN ed e2 ON e1.dst_id = e2.src_id
           |      WHERE e2.dst_id <> e1.src_id),
           |wc AS (SELECT src_id, count(*) AS n_wedges FROM w GROUP BY 1),
           |cc AS (SELECT w.src_id, count(*) AS n_closed FROM w
           |       WHERE EXISTS (SELECT 1 FROM ed
           |         WHERE ed.src_id = w.src_id AND ed.dst_id = w.far_id)
           |       GROUP BY 1)
           |SELECT wc.src_id AS vec_id, n_wedges,
           |  CAST(coalesce(n_closed, 0) AS BIGINT) AS n_closed,
           |  CAST(coalesce(n_closed, 0) * 1000 // n_wedges AS BIGINT)
           |    AS closure_x1000
           |FROM wc LEFT JOIN cc ON wc.src_id = cc.src_id""".stripMargin,

      // Synchronous LPA over the mutual knn_graph edges — one unrolled
      // CTE per round; the per-node majority pick (count DESC, label
      // ASC) is the same total order as the engine's
      // max(struct(c, −label)) hash aggregate, so both engines adopt
      // identical labels every round.
      "graph_lpa" -> {
        def lpaRound(prev: String, next: String): String =
          s"""$next AS (
             |  SELECT l.vec_id,
             |    coalesce(b.community, l.community) AS community
             |  FROM $prev l LEFT JOIN (
             |    SELECT u, community FROM (
             |      SELECT m.u, $prev.community,
             |        row_number() OVER (PARTITION BY m.u
             |          ORDER BY count(*) DESC, $prev.community) AS rn
             |      FROM m JOIN $prev ON $prev.vec_id = m.v
             |      GROUP BY m.u, $prev.community) WHERE rn = 1) b
             |    ON b.u = l.vec_id)""".stripMargin
        val rounds = (1 to Similarity.LpaIters)
          .map(i => lpaRound(s"l${i - 1}", s"l$i")).mkString(",\n")
        val last = s"l${Similarity.LpaIters}"
        s"""WITH $knnGraphCtes,
           |m AS (SELECT e1.src_id AS u, e1.dst_id AS v
           |      FROM e e1 JOIN e e2
           |        ON e2.src_id = e1.dst_id AND e2.dst_id = e1.src_id),
           |l0 AS (SELECT vec_id, vec_id AS community FROM embeddings),
           |$rounds,
           |sz AS (SELECT community, count(*) AS community_size
           |       FROM $last GROUP BY 1)
           |SELECT l.vec_id, l.community, sz.community_size
           |FROM $last l JOIN sz ON sz.community = l.community"""
          .stripMargin
      },

      // Power iteration on the emb_gram matrix: exactly PcaIterations
      // steps from all-ones, max-abs normalization, left-to-right matvec
      // accumulation — each IEEE step identical to the engine's driver
      // loop, so the ×1e6 eigenvector hash-matches regardless of
      // convergence. Recursive CTE carries the RAW u; normalization is
      // recomputed at use (linear algebra would allow dividing after the
      // matvec, but IEEE wouldn't — the order here mirrors the engine).
      "emb_pca" ->
        s"""WITH RECURSIVE $gramCtes,
           |cov AS (SELECT i, j, m FROM ct
           |        UNION ALL
           |        SELECT j AS i, i AS j, m FROM ct WHERE i <> j),
           |mf AS MATERIALIZED (
           |  SELECT list(m ORDER BY i, j) AS mflat,
           |    CAST(max(i) + 1 AS INTEGER) AS d FROM cov),
           |it AS (
           |  SELECT 0 AS t, list_transform(range(1, d + 1),
           |    x -> CAST(1 AS DOUBLE)) AS u FROM mf
           |  UNION ALL
           |  SELECT t + 1,
           |    list_transform(range(0, mf.d),
           |      i -> list_reduce(
           |             list_transform(range(0, mf.d),
           |               j -> CAST(mflat[i * mf.d + j + 1] AS DOUBLE)
           |                      * (v[j + 1])),
           |             (a, b) -> a + b))
           |  FROM (SELECT t,
           |          list_transform(u, x -> x / mx) AS v
           |        FROM (SELECT t, u,
           |                list_max(list_transform(u, x -> abs(x))) AS mx
           |              FROM it)) s
           |       CROSS JOIN mf
           |  WHERE t < ${Similarity.PcaIterations}),
           |fx AS (SELECT u, list_max(list_transform(u, x -> abs(x))) AS mx
           |       FROM it WHERE t = ${Similarity.PcaIterations})
           |SELECT c.i AS dim, c.m AS var_m,
           |  CAST(round(u[c.i + 1] / mx * 1000000) AS BIGINT) AS eigvec_q,
           |  CAST(round(mx) AS BIGINT) AS eigval_q
           |FROM fx CROSS JOIN ct c WHERE c.i = c.j""".stripMargin,

      // Fixed-point 1e-4 quantization before aggregation (the emb_quantize
      // float→double→round chain), so every sum is an exact integer sum.
      // DuckDB `//` and round() match Spark `div`/HALF_UP on negatives
      // (both truncate toward zero / round half away from zero).
      "emb_stats" ->
        """WITH q AS (
          |  SELECT CAST(i - 1 AS INTEGER) AS dim,
          |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT) AS q
          |  FROM embeddings,
          |       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t)
          |SELECT dim, count(*) AS n,
          |  CAST(sum(q) AS BIGINT) AS sum_q,
          |  CAST(CAST(sum(q) AS BIGINT) // count(*) AS BIGINT) AS mean_q,
          |  CAST(sum(q * q) AS BIGINT) AS sumsq_q,
          |  min(q) AS min_q, max(q) AS max_q
          |FROM q GROUP BY dim""".stripMargin,

      // Release-drift mirror: the next-release plant (drop %13, re-key
      // %11, re-embed %10 at exact ×2) recomputed, both releases'
      // per-dim fixed-point moments (squares in HUGEINT — the
      // decimal(38,0) twin), and the same two-step integer mean-square
      // ratio + verdict thresholds.
      "emb_drift" -> {
        val mt = Similarity.EmbDriftMeanTol
        val rt = Similarity.EmbDriftMsqTolPpm
        s"""WITH nextv AS (
           |  SELECT vec_id, CASE WHEN vec_id % 10 = 0
           |      THEN list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
           |      ELSE embedding END AS embedding
           |    FROM embeddings WHERE vec_id % 13 != 0
           |  UNION ALL
           |  SELECT vec_id + 800000, embedding FROM embeddings
           |  WHERE vec_id % 11 = 0),
           |qa AS (SELECT CAST(i - 1 AS INTEGER) AS dim,
           |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
           |      AS q
           |  FROM embeddings,
           |    LATERAL (SELECT unnest(generate_series(1, len(embedding)))
           |             AS i) t),
           |qb AS (SELECT CAST(i - 1 AS INTEGER) AS dim,
           |    CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
           |      AS q
           |  FROM nextv,
           |    LATERAL (SELECT unnest(generate_series(1, len(embedding)))
           |             AS i) t),
           |sa AS (SELECT dim, count(*) AS n_a,
           |    CAST(sum(q) AS BIGINT) AS sum_a,
           |    sum(CAST(q AS HUGEINT) * q) AS sumsq_a
           |  FROM qa GROUP BY 1),
           |sb AS (SELECT dim, count(*) AS n_b,
           |    CAST(sum(q) AS BIGINT) AS sum_b,
           |    sum(CAST(q AS HUGEINT) * q) AS sumsq_b
           |  FROM qb GROUP BY 1),
           |j AS (SELECT sa.dim, n_a, n_b,
           |    CAST(sum_a // n_a AS BIGINT) AS mean_q_a,
           |    CAST(sum_b // n_b AS BIGINT) AS mean_q_b,
           |    CAST(sumsq_a // n_a AS BIGINT) AS msq_a,
           |    CAST(sumsq_b // n_b AS BIGINT) AS msq_b
           |  FROM sa JOIN sb USING (dim))
           |SELECT dim, CAST(n_a AS BIGINT) AS n_a,
           |  CAST(n_b AS BIGINT) AS n_b, mean_q_a, mean_q_b,
           |  mean_q_b - mean_q_a AS mean_shift_q, msq_a, msq_b,
           |  CASE WHEN msq_a = 0 THEN CAST(-1 AS BIGINT)
           |    ELSE CAST(msq_b * 1000000 // msq_a AS BIGINT) END
           |    AS msq_ratio_ppm,
           |  CAST(CASE WHEN abs(mean_q_b - mean_q_a) > $mt
           |      OR msq_a = 0
           |      OR abs(CAST(msq_b * 1000000 // msq_a AS BIGINT)
           |          - 1000000) > $rt
           |    THEN 1 ELSE 0 END AS BIGINT) AS drifted
           |FROM j""".stripMargin
      },

      // Vector-ledger mirror: the same next-release plant, both
      // releases reduced to md5 of the comma-joined fixed-point codes
      // (the quantizeInt8Stats digest chain — bit-identical rendering
      // on both engines), one full outer join on vec_id.
      "emb_diff" ->
        """WITH nextv AS (
          |  SELECT vec_id, CASE WHEN vec_id % 10 = 0
          |      THEN list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
          |      ELSE embedding END AS embedding
          |    FROM embeddings WHERE vec_id % 13 != 0
          |  UNION ALL
          |  SELECT vec_id + 800000, embedding FROM embeddings
          |  WHERE vec_id % 11 = 0),
          |b AS (SELECT vec_id, md5(array_to_string(
          |    list_transform(embedding, x -> CAST(CAST(round(
          |      CAST(x AS DOUBLE) * 10000) AS BIGINT) AS VARCHAR)), ','))
          |    AS h_base
          |  FROM embeddings),
          |n AS (SELECT vec_id, md5(array_to_string(
          |    list_transform(embedding, x -> CAST(CAST(round(
          |      CAST(x AS DOUBLE) * 10000) AS BIGINT) AS VARCHAR)), ','))
          |    AS h_next
          |  FROM nextv)
          |SELECT coalesce(b.vec_id, n.vec_id) AS vec_id,
          |  CASE WHEN b.vec_id IS NULL THEN 'added'
          |       WHEN n.vec_id IS NULL THEN 'removed'
          |       WHEN b.h_base <> n.h_next THEN 'changed'
          |       ELSE 'kept' END AS status
          |FROM b FULL OUTER JOIN n ON n.vec_id = b.vec_id""".stripMargin,

      // Fixed-point squared norms over the outlier-planted corpus; the
      // ×8 / ÷16 plantings are power-of-two float scalings, IEEE-exact on
      // both engines. Median = value at row ceil(n/2).
      "emb_outliers" ->
        """WITH corpus AS (
          |  SELECT vec_id, embedding FROM embeddings
          |  UNION ALL
          |  SELECT vec_id + 200000,
          |    list_transform(embedding, x -> x * CAST(8.0 AS FLOAT))
          |  FROM embeddings WHERE vec_id % 20 = 0
          |  UNION ALL
          |  SELECT vec_id + 300000,
          |    list_transform(embedding, x -> x / CAST(16.0 AS FLOAT))
          |  FROM embeddings WHERE vec_id % 25 = 0),
          |n AS (
          |  SELECT vec_id,
          |    CAST(sum(q * q) AS BIGINT) AS normsq_q
          |  FROM (
          |    SELECT vec_id,
          |      CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
          |        AS q
          |    FROM corpus,
          |      LATERAL (SELECT unnest(generate_series(1, len(embedding)))
          |               AS i) t)
          |  GROUP BY vec_id),
          |m AS (
          |  SELECT normsq_q AS median_q FROM (
          |    SELECT normsq_q,
          |      row_number() OVER (ORDER BY normsq_q, vec_id) AS rn,
          |      count(*) OVER () AS cnt
          |    FROM n)
          |  WHERE rn = (cnt + 1) // 2)
          |SELECT vec_id, normsq_q, median_q
          |FROM n, m
          |WHERE normsq_q > median_q * 9 OR normsq_q * 9 < median_q""".stripMargin,

      // Greedy packing needs running state (each sequence boundary depends
      // on every earlier doc), so the oracle walks docs in id order per
      // language with a recursive CTE carrying (seq_id, acc).
      "pack_sequences" ->
        """WITH RECURSIVE t AS (
          |  SELECT lang, doc_id,
          |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)
          |      AS n_tokens
          |  FROM documents),
          |seq AS (
          |  SELECT lang, doc_id, n_tokens,
          |    CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
          |      AS BIGINT) AS rn
          |  FROM t),
          |g AS (
          |  SELECT lang, doc_id, n_tokens, rn,
          |    CAST(0 AS BIGINT) AS seq_id, CAST(n_tokens AS BIGINT) AS acc
          |  FROM seq WHERE rn = 1
          |  UNION ALL
          |  SELECT s.lang, s.doc_id, s.n_tokens, s.rn,
          |    CASE WHEN g.acc + s.n_tokens > 256
          |         THEN g.seq_id + 1 ELSE g.seq_id END AS seq_id,
          |    CASE WHEN g.acc + s.n_tokens > 256
          |         THEN CAST(s.n_tokens AS BIGINT)
          |         ELSE g.acc + s.n_tokens END AS acc
          |  FROM g JOIN seq s ON s.lang = g.lang AND s.rn = g.rn + 1)
          |SELECT lang, doc_id, n_tokens, seq_id FROM g""".stripMargin,

      // Same recursive greedy-packing chain, aggregated to the per-lang
      // quality report (budget 256 mirrored from Packing's default).
      "pack_efficiency" ->
        """WITH RECURSIVE t AS (
          |  SELECT lang, doc_id,
          |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)
          |      AS n_tokens
          |  FROM documents),
          |seq AS (
          |  SELECT lang, doc_id, n_tokens,
          |    CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
          |      AS BIGINT) AS rn
          |  FROM t),
          |g AS (
          |  SELECT lang, doc_id, n_tokens, rn,
          |    CAST(0 AS BIGINT) AS seq_id, CAST(n_tokens AS BIGINT) AS acc
          |  FROM seq WHERE rn = 1
          |  UNION ALL
          |  SELECT s.lang, s.doc_id, s.n_tokens, s.rn,
          |    CASE WHEN g.acc + s.n_tokens > 256
          |         THEN g.seq_id + 1 ELSE g.seq_id END AS seq_id,
          |    CASE WHEN g.acc + s.n_tokens > 256
          |         THEN CAST(s.n_tokens AS BIGINT)
          |         ELSE g.acc + s.n_tokens END AS acc
          |  FROM g JOIN seq s ON s.lang = g.lang AND s.rn = g.rn + 1),
          |agg AS (
          |  SELECT lang, count(*) AS n_docs,
          |    CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
          |    CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs
          |  FROM g GROUP BY lang)
          |SELECT lang, n_docs, total_tokens, n_seqs,
          |  (total_tokens + 255) // 256 AS lb_seqs,
          |  total_tokens * 1000 // (n_seqs * 256) AS fill_x1000,
          |  ((total_tokens + 255) // 256) * 1000 // n_seqs
          |    AS efficiency_x1000
          |FROM agg""".stripMargin,

      "sample_docs" ->
        """SELECT doc_id, lang, ((doc_id % 1000000007) * 2654435761) % 100 AS bucket
          |FROM documents
          |WHERE ((doc_id % 1000000007) * 2654435761) % 100 < 10""".stripMargin,

      // Keep probability = quality floor + 4× the multilingual stopword
      // ratio, decided by the same multiplicative id-hash at ‰ grain.
      "weighted_sample" ->
        s"""WITH t AS (
           |  SELECT doc_id, lang,
           |    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER)
           |      AS n_tokens,
           |    $stopwordCaseSql AS n_stop
           |  FROM documents),
           |p AS (
           |  SELECT doc_id, lang,
           |    least(1000, 200 +
           |      CAST((n_stop * 1000) // greatest(n_tokens, 1) AS BIGINT) * 4)
           |      AS p_x1000,
           |    ((doc_id % 1000000007) * 2654435761) % 1000 AS bucket
           |  FROM t)
           |SELECT doc_id, lang, CAST(p_x1000 AS BIGINT) AS p_x1000, bucket
           |FROM p WHERE bucket < p_x1000""".stripMargin,

      "train_test_split" ->
        """WITH b AS (
          |  SELECT lang, ((doc_id % 1000000007) * 2654435761) % 100 AS bucket
          |  FROM documents)
          |SELECT lang,
          |  CASE WHEN bucket < 80 THEN 'train'
          |       WHEN bucket < 90 THEN 'valid'
          |       ELSE 'test' END AS split,
          |  count(*) AS n_docs
          |FROM b GROUP BY 1, 2""".stripMargin,

      "class_balance" ->
        """WITH c AS (
          |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
          |m AS (SELECT max(n_docs) AS max_n FROM c)
          |SELECT lang, n_docs,
          |  CAST((max_n * 1000) // n_docs AS BIGINT) AS weight_x1000
          |FROM c CROSS JOIN m""".stripMargin,

      "token_histogram" ->
        """WITH t AS (
          |  SELECT CAST(len(regexp_split_to_array(trim(text), '\s+'))
          |    AS INTEGER) AS n_tokens
          |  FROM documents)
          |SELECT CAST((n_tokens // 25) * 25 AS BIGINT) AS bin_lo,
          |  count(*) AS n_docs,
          |  min(n_tokens) AS min_tokens,
          |  max(n_tokens) AS max_tokens
          |FROM t GROUP BY 1""".stripMargin,

      "mm_meta" ->
        """SELECT doc_id,
          |  CASE (doc_id % 3) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
          |       ELSE 'webp' END AS format,
          |  CAST(n_chars % 640 + 16 AS INTEGER) AS width,
          |  CAST(n_chars * 7 % 480 + 16 AS INTEGER) AS height,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
          |FROM documents""".stripMargin,

      // payload is the UTF-8 text bytes (pure-ASCII corpus: byte at
      // offset o = ord of the character at o+1, 1-based)
      "mm_frames" ->
        """WITH a AS (
          |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT)
          |    AS n
          |  FROM documents WHERE length(text) > 0)
          |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
          |  CAST(i * n // 4 AS INTEGER) AS byte_offset,
          |  ord(substr(text, CAST(i * n // 4 AS INTEGER) + 1, 1))
          |    AS frame_byte
          |FROM a, LATERAL (SELECT unnest(range(0, 4)) AS i) t""".stripMargin,

      // 256-byte tiles over the ASCII payload; energy = mean |byte-128|
      // in truncating integer division, identical on both engines.
      "mm_audio" ->
        """WITH a AS (
          |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS BIGINT)
          |    AS n
          |  FROM documents WHERE length(text) > 0),
          |w AS (
          |  SELECT doc_id, text, CAST(k AS INTEGER) AS window_idx,
          |    CAST(k * 256 + 1 AS INTEGER) AS a_off,
          |    CAST(least((k + 1) * 256, n) AS INTEGER) AS b_off
          |  FROM a, LATERAL (SELECT unnest(range(0, (n + 255) // 256)) AS k) t)
          |SELECT doc_id, window_idx,
          |  CAST(b_off - a_off + 1 AS INTEGER) AS n_bytes,
          |  CAST(CAST(list_sum(list_transform(range(a_off, b_off + 1),
          |    j -> abs(ord(substr(text, CAST(j AS INTEGER), 1)) - 128)))
          |    AS BIGINT) // (b_off - a_off + 1) AS BIGINT) AS energy
          |FROM w""".stripMargin,

      // Winnowing fingerprint = min over 16-byte windows of the wrapping
      // polynomial hash. Pure-ASCII corpus ⇒ byte i = ord of character i
      // (the mm_frames convention); powers and window width derive from
      // the RollingHash constants (see rollingPowersCte). Short docs
      // hash the whole string; empty docs are 0.
      "text_fingerprint" -> {
        val W = graft.functions.RollingHash.Window
        s"""WITH $rollingPowersCte,
           |d AS (SELECT doc_id, text, length(text) AS n FROM documents),
           |win AS (
           |  SELECT d.doc_id, s.s, j.j,
           |    ord(substr(d.text, CAST(s.s + j.j AS INTEGER), 1))::HUGEINT
           |      AS byte
           |  FROM d,
           |    LATERAL (SELECT unnest(generate_series(1, d.n - ${W - 1}))
           |      AS s) s,
           |    LATERAL (SELECT unnest(generate_series(0, ${W - 1})) AS j) j
           |  WHERE d.n > $W),
           |wh AS (
           |  SELECT doc_id, s,
           |    CAST(sum(byte * pw.p) % 18446744073709551616::HUGEINT
           |      AS HUGEINT) AS hu
           |  FROM win JOIN pw ON pw.e = ${W - 1} - j
           |  GROUP BY doc_id, s),
           |wmin AS (
           |  SELECT doc_id,
           |    min(CASE WHEN hu >= 9223372036854775808::HUGEINT
           |             THEN CAST(hu - 18446744073709551616::HUGEINT AS BIGINT)
           |             ELSE CAST(hu AS BIGINT) END) AS fingerprint
           |  FROM wh GROUP BY doc_id),
           |sh AS (
           |  SELECT d.doc_id,
           |    CAST(sum(ord(substr(d.text, CAST(i.i AS INTEGER), 1))::HUGEINT
           |        * pw.p) % 18446744073709551616::HUGEINT AS HUGEINT) AS hu
           |  FROM d, LATERAL (SELECT unnest(generate_series(1, d.n)) AS i) i
           |  JOIN pw ON pw.e = d.n - i.i
           |  WHERE d.n <= $W AND d.n > 0
           |  GROUP BY d.doc_id),
           |smin AS (
           |  SELECT doc_id,
           |    CASE WHEN hu >= 9223372036854775808::HUGEINT
           |         THEN CAST(hu - 18446744073709551616::HUGEINT AS BIGINT)
           |         ELSE CAST(hu AS BIGINT) END AS fingerprint
           |  FROM sh),
           |zero AS (SELECT doc_id, CAST(0 AS BIGINT) AS fingerprint
           |         FROM d WHERE n = 0)
           |SELECT * FROM wmin UNION ALL SELECT * FROM smin
           |UNION ALL SELECT * FROM zero""".stripMargin
      },

      // Closed-form mirror of the PNG pixel ramps: the Spark side must
      // push every byte through a real encode→decode codec round-trip
      // to land on these same sums (PNG is lossless, so equality holds
      // bit-exactly).
      "mm_decode" ->
        """SELECT d.doc_id,
          |  CAST(d.doc_id % 13 + 4 AS INTEGER) AS width,
          |  CAST(d.doc_id % 11 + 4 AS INTEGER) AS height,
          |  CAST(3 AS INTEGER) AS n_channels,
          |  CAST(sum((d.doc_id * 3 + x.i + y.j) % 256) AS BIGINT) AS sum_r,
          |  CAST(sum((d.doc_id * 5 + 2 * x.i) % 256) AS BIGINT) AS sum_g,
          |  CAST(sum((d.doc_id * 7 + 3 * y.j) % 256) AS BIGINT) AS sum_b
          |FROM documents d,
          |  LATERAL (SELECT unnest(generate_series(0,
          |    CAST(d.doc_id % 13 + 3 AS BIGINT))) AS i) x,
          |  LATERAL (SELECT unnest(generate_series(0,
          |    CAST(d.doc_id % 11 + 3 AS BIGINT))) AS j) y
          |GROUP BY 1""".stripMargin,

      // Closed-form mirror of the block-average perceptual hash: the
      // same pixel ramps as mm_decode, gray = r+g+b, integer
      // pixel→block mapping, cross-multiplied mean comparison — the
      // real-decode gate extended to a derived signature.
      "mm_phash" -> {
        val g = Multimodal.AhashGrid
        s"""WITH px AS (
           |  SELECT d.doc_id,
           |    CAST(d.doc_id % 13 + 4 AS BIGINT) AS w,
           |    CAST(d.doc_id % 11 + 4 AS BIGINT) AS h,
           |    x.i AS x, y.j AS y,
           |    (d.doc_id * 3 + x.i + y.j) % 256
           |      + (d.doc_id * 5 + 2 * x.i) % 256
           |      + (d.doc_id * 7 + 3 * y.j) % 256 AS gray
           |  FROM documents d,
           |    LATERAL (SELECT unnest(generate_series(0,
           |      CAST(d.doc_id % 13 + 3 AS BIGINT))) AS i) x,
           |    LATERAL (SELECT unnest(generate_series(0,
           |      CAST(d.doc_id % 11 + 3 AS BIGINT))) AS j) y),
           |tot AS (SELECT doc_id, max(w) AS w, max(h) AS h,
           |    CAST(sum(gray) AS BIGINT) AS total, count(*) AS n
           |  FROM px GROUP BY 1),
           |blk AS (SELECT doc_id, (x * $g) // w AS i, (y * $g) // h AS j,
           |    CAST(sum(gray) AS BIGINT) AS bs, count(*) AS bn
           |  FROM px GROUP BY 1, 2, 3),
           |bits AS (SELECT b.doc_id,
           |    CASE WHEN b.bs * t.n > t.total * b.bn
           |      THEN CAST(1 AS BIGINT) << CAST(b.j * $g + b.i AS INTEGER)
           |      ELSE CAST(0 AS BIGINT) END AS bit
           |  FROM blk b JOIN tot t USING (doc_id))
           |SELECT t.doc_id, CAST(t.w AS INTEGER) AS width,
           |  CAST(t.h AS INTEGER) AS height, t.total AS gray_sum,
           |  CAST(sum(bits.bit) AS BIGINT) AS ahash
           |FROM tot t JOIN bits ON bits.doc_id = t.doc_id
           |GROUP BY 1, 2, 3, 4""".stripMargin
      },

      // Closed-form mirror of the energy-profile fingerprint: the same
      // sample train as mm_audio_decode, integer sample→window mapping,
      // per-window |amp| share quantized to a 4-bit nibble, first W−1
      // nibbles packed.
      "mm_audio_fp" -> {
        val wN = Multimodal.AudioFpWindows
        s"""WITH sm AS (
           |  SELECT d.doc_id,
           |    CAST(d.doc_id % 500 + 100 AS BIGINT) AS n,
           |    s.i,
           |    abs((d.doc_id * 31 + s.i * 17) % 65536 - 32768) AS a
           |  FROM documents d,
           |    LATERAL (SELECT unnest(generate_series(0,
           |      CAST(d.doc_id % 500 + 99 AS BIGINT))) AS i) s),
           |tot AS (SELECT doc_id, max(n) AS n,
           |    CAST(sum(a) AS BIGINT) AS total
           |  FROM sm GROUP BY 1),
           |wd AS (SELECT doc_id, (i * $wN) // n AS k,
           |    CAST(sum(a) AS BIGINT) AS ws
           |  FROM sm GROUP BY 1, 2),
           |nib AS (SELECT w.doc_id,
           |    least(w.ws * 16 // t.total, 15)
           |      << CAST(4 * w.k AS INTEGER) AS nb
           |  FROM wd w JOIN tot t USING (doc_id)
           |  WHERE w.k < ${wN - 1})
           |SELECT t.doc_id, t.n AS n_samples, t.total AS abs_sum,
           |  CAST(sum(nib.nb) AS BIGINT) AS afp
           |FROM tot t JOIN nib ON nib.doc_id = t.doc_id
           |GROUP BY 1, 2, 3""".stripMargin
      },

      // Closed-form mirror of the per-frame block-average hashes: the
      // mm_video_decode frame ramps through the mm_phash block/bit
      // chain, one row per (doc, frame).
      "mm_video_fp" -> {
        val g = Multimodal.AhashGrid
        s"""WITH px AS (
           |  SELECT d.doc_id, f.f,
           |    CAST(d.doc_id % 13 + 4 AS BIGINT) AS w,
           |    CAST(d.doc_id % 11 + 4 AS BIGINT) AS h,
           |    x.i AS x, y.j AS y,
           |    (d.doc_id * 3 + 11 * f.f + 5 * x.i + 3 * y.j) % 256
           |      AS gray
           |  FROM documents d,
           |    LATERAL (SELECT unnest(generate_series(0,
           |      CAST(d.doc_id % 5 + 1 AS BIGINT))) AS f) f,
           |    LATERAL (SELECT unnest(generate_series(0,
           |      CAST(d.doc_id % 13 + 3 AS BIGINT))) AS i) x,
           |    LATERAL (SELECT unnest(generate_series(0,
           |      CAST(d.doc_id % 11 + 3 AS BIGINT))) AS j) y),
           |tot AS (SELECT doc_id, f, CAST(sum(gray) AS BIGINT) AS total,
           |    count(*) AS n
           |  FROM px GROUP BY 1, 2),
           |blk AS (SELECT doc_id, f, (x * $g) // w AS i, (y * $g) // h AS j,
           |    CAST(sum(gray) AS BIGINT) AS bs, count(*) AS bn
           |  FROM px GROUP BY 1, 2, 3, 4),
           |bits AS (SELECT b.doc_id, b.f,
           |    CASE WHEN b.bs * t.n > t.total * b.bn
           |      THEN CAST(1 AS BIGINT) << CAST(b.j * $g + b.i AS INTEGER)
           |      ELSE CAST(0 AS BIGINT) END AS bit
           |  FROM blk b JOIN tot t ON t.doc_id = b.doc_id AND t.f = b.f)
           |SELECT t.doc_id, CAST(t.f AS INTEGER) AS frame,
           |  t.total AS gray_sum, CAST(sum(bits.bit) AS BIGINT) AS ahash
           |FROM tot t JOIN bits ON bits.doc_id = t.doc_id
           |  AND bits.f = t.f
           |GROUP BY 1, 2, 3""".stripMargin
      },

      // Planted-duplicate mirror: content id c = doc_id mod the planted
      // modulus drives the SAME pixel/block/bit chain as mm_phash, and
      // the grouping is by the recomputed SIGNATURE (never by c), so an
      // engine-side signature collision would mismatch, not mask.
      "mm_dup_groups" ->
        s"""WITH $mmDupSigCtes,
           |grp AS (SELECT w, h, total, ahash,
           |    min(doc_id) AS group_id, count(*) AS group_size
           |  FROM sig GROUP BY 1, 2, 3, 4)
           |SELECT s.doc_id, g.group_id,
           |  CAST(g.group_size AS BIGINT) AS group_size,
           |  CAST(CASE WHEN s.doc_id = g.group_id THEN 1 ELSE 0 END
           |    AS BIGINT) AS is_canonical
           |FROM sig s JOIN grp g ON g.w = s.w AND g.h = s.h
           |  AND g.total = s.total AND g.ahash = s.ahash""".stripMargin,

      // Cross-modal mirror (r16): image groups from the SAME recomputed
      // signature chain mm_dup_groups pins; captions from the planted
      // closed form (doc%5==3 re-captioned unique, doc%5==4 stock pool
      // of 7, else follows image content); text dedup groups by md5 of
      // the caption STRING (so a caption-render drift between engines
      // mismatches, never masks); pairs = each doc vs its image
      // canonical and its caption canonical (linear — never within-
      // group all-pairs); flags and cell recomputed end to end.
      "mm_caption_pairs" ->
        s"""WITH $mmDupSigCtes,
           |igrp AS (SELECT s.doc_id, g2.img_gid FROM sig s JOIN (
           |    SELECT w, h, total, ahash, min(doc_id) AS img_gid
           |    FROM sig GROUP BY 1, 2, 3, 4) g2
           |  ON g2.w = s.w AND g2.h = s.h AND g2.total = s.total
           |    AND g2.ahash = s.ahash),
           |cap0 AS (SELECT doc_id,
           |    CASE WHEN doc_id % ${Multimodal.CapBranchMod} = 3
           |           THEN 100000 + doc_id
           |         WHEN doc_id % ${Multimodal.CapBranchMod} = 4
           |           THEN 90000 + doc_id % ${Multimodal.CapStockPool}
           |         ELSE doc_id % ${Multimodal.DupContentMod} END
           |      AS cap_id
           |  FROM documents),
           |captext AS (SELECT doc_id,
           |    'caption ' || cap_id || ' about subject '
           |      || ((cap_id * 7) % 97) AS caption
           |  FROM cap0),
           |cgrp AS (SELECT c.doc_id, g3.cap_gid FROM
           |    (SELECT doc_id, md5(caption) AS m FROM captext) c
           |  JOIN (SELECT md5(caption) AS m, min(doc_id) AS cap_gid
           |        FROM captext GROUP BY 1) g3 USING (m)),
           |bothg AS (SELECT i.doc_id, i.img_gid, c.cap_gid
           |  FROM igrp i JOIN cgrp c USING (doc_id)),
           |prs AS (
           |  SELECT least(doc_id, img_gid) AS a_id,
           |    greatest(doc_id, img_gid) AS b_id
           |  FROM bothg WHERE doc_id <> img_gid
           |  UNION
           |  SELECT least(doc_id, cap_gid), greatest(doc_id, cap_gid)
           |  FROM bothg WHERE doc_id <> cap_gid),
           |flags AS (SELECT p.a_id, p.b_id,
           |    CAST(CASE WHEN a.img_gid = b.img_gid THEN 1 ELSE 0 END
           |      AS BIGINT) AS img_dup,
           |    CAST(CASE WHEN a.cap_gid = b.cap_gid THEN 1 ELSE 0 END
           |      AS BIGINT) AS cap_dup
           |  FROM prs p JOIN bothg a ON a.doc_id = p.a_id
           |    JOIN bothg b ON b.doc_id = p.b_id)
           |SELECT a_id, b_id, img_dup, cap_dup,
           |  CASE WHEN img_dup = 1 AND cap_dup = 1 THEN 'both'
           |       WHEN img_dup = 1 THEN 'img_only'
           |       ELSE 'cap_only' END AS cell
           |FROM flags""".stripMargin,

      // Near-tier matrix mirror (r18): image groups from the same
      // recomputed signature chain; captions from the planted
      // tail-edit closed form (content-branch docs with d%8==5 carry
      // base caption + ' v2'); the exact tier groups by caption md5;
      // the NEAR tier replays the engine's chain — word 5-gram
      // DISTINCT shingles over DISTINCT caption texts keyed by their
      // min carrier, df-capped (cap 100, a no-op here but mirrored),
      // integer Jaccard ≥ ½ (3·inter ≥ n_a+n_b) — and closes
      // components in ONE relax round, which IS the fixpoint because
      // the caption near graph is a perfect matching by construction
      // (a 5-token base caption has one shingle, its 6-token edit two;
      // PipelineSpec pins max degree 1), so the engine's generic
      // min-label loop lands on identical labels.
      "mm_caption_pairs_near" ->
        s"""WITH $mmDupSigCtes,
           |igrp AS (SELECT s.doc_id, g2.img_gid FROM sig s JOIN (
           |    SELECT w, h, total, ahash, min(doc_id) AS img_gid
           |    FROM sig GROUP BY 1, 2, 3, 4) g2
           |  ON g2.w = s.w AND g2.h = s.h AND g2.total = s.total
           |    AND g2.ahash = s.ahash),
           |cap0 AS (SELECT doc_id,
           |    CASE WHEN doc_id % ${Multimodal.CapBranchMod} = 3
           |           THEN 100000 + doc_id
           |         WHEN doc_id % ${Multimodal.CapBranchMod} = 4
           |           THEN 90000 + doc_id % ${Multimodal.CapStockPool}
           |         ELSE doc_id % ${Multimodal.DupContentMod} END
           |      AS cap_id,
           |    (doc_id % ${Multimodal.CapBranchMod} NOT IN (3, 4)
           |      AND doc_id % ${Multimodal.CapEditMod}
           |        = ${Multimodal.CapEditRes}) AS edited
           |  FROM documents),
           |captext AS (SELECT doc_id,
           |    'caption ' || cap_id || ' about subject ' ||
           |      ((cap_id * 7) % 97) ||
           |      CASE WHEN edited THEN ' v2' ELSE '' END AS caption
           |  FROM cap0),
           |mgrp AS (SELECT c.doc_id, g3.m_gid FROM
           |    (SELECT doc_id, md5(caption) AS m FROM captext) c
           |  JOIN (SELECT md5(caption) AS m, min(doc_id) AS m_gid
           |        FROM captext GROUP BY 1) g3 USING (m)),
           |dcap AS (SELECT caption, min(doc_id) AS rep
           |  FROM captext GROUP BY 1),
           |shng AS (SELECT DISTINCT rep,
           |    array_to_string(words[i:i+4], ' ') AS sh
           |  FROM (SELECT rep,
           |          regexp_split_to_array(trim(caption), '\\s+')
           |            AS words
           |        FROM dcap),
           |       LATERAL (SELECT unnest(
           |         generate_series(1, len(words) - 4)) AS i) t
           |  WHERE len(words) >= 5),
           |rare AS (
           |  SELECT sh FROM (SELECT sh, count(*) AS df FROM shng
           |                  GROUP BY sh)
           |  WHERE df <= 100),
           |kept AS (SELECT shng.rep, shng.sh FROM shng
           |  JOIN rare USING (sh)),
           |sizes AS (SELECT rep, count(*) AS n_sh FROM kept
           |  GROUP BY rep),
           |inter AS (
           |  SELECT a.rep AS a_r, b.rep AS b_r, count(*) AS inter
           |  FROM kept a JOIN kept b
           |    ON a.sh = b.sh AND a.rep < b.rep
           |  GROUP BY 1, 2),
           |nearp AS (SELECT a_r, b_r FROM inter
           |  JOIN sizes na ON na.rep = a_r
           |  JOIN sizes nb ON nb.rep = b_r
           |  WHERE inter.inter * 3 >= na.n_sh + nb.n_sh),
           |comp AS (SELECT d.rep,
           |    least(d.rep, coalesce(min(n.o), d.rep)) AS component
           |  FROM dcap d LEFT JOIN (
           |      SELECT a_r AS r, b_r AS o FROM nearp
           |      UNION ALL SELECT b_r, a_r FROM nearp) n
           |    ON n.r = d.rep
           |  GROUP BY d.rep),
           |capng AS (SELECT c.doc_id, cm.component AS cap_gid
           |  FROM captext c JOIN dcap d USING (caption)
           |  JOIN comp cm ON cm.rep = d.rep),
           |bothg AS (SELECT i.doc_id, i.img_gid, m.m_gid, n.cap_gid
           |  FROM igrp i JOIN mgrp m USING (doc_id)
           |  JOIN capng n USING (doc_id)),
           |prs AS (
           |  SELECT least(doc_id, img_gid) AS a_id,
           |    greatest(doc_id, img_gid) AS b_id
           |  FROM bothg WHERE doc_id <> img_gid
           |  UNION
           |  SELECT least(doc_id, cap_gid), greatest(doc_id, cap_gid)
           |  FROM bothg WHERE doc_id <> cap_gid),
           |flags AS (SELECT p.a_id, p.b_id,
           |    CAST(CASE WHEN a.img_gid = b.img_gid THEN 1 ELSE 0 END
           |      AS BIGINT) AS img_dup,
           |    CAST(CASE WHEN a.m_gid = b.m_gid THEN 1 ELSE 0 END
           |      AS BIGINT) AS cap_dup,
           |    CAST(CASE WHEN a.cap_gid = b.cap_gid THEN 1 ELSE 0 END
           |      AS BIGINT) AS cap_dup_near
           |  FROM prs p JOIN bothg a ON a.doc_id = p.a_id
           |    JOIN bothg b ON b.doc_id = p.b_id)
           |SELECT a_id, b_id, img_dup, cap_dup, cap_dup_near,
           |  CASE WHEN img_dup = 1 AND cap_dup_near = 1 THEN 'both'
           |       WHEN img_dup = 1 THEN 'img_only'
           |       ELSE 'cap_only' END AS cell
           |FROM flags""".stripMargin,

      // Shared-clip mirror: the stock-footage ramp (stream position
      // p = doc//8·16 + doc%4 + f at the GROUP's dimensions) through
      // the same pixel/block/bit chain as mm_video_fp, then the same
      // signature join → gap band → island run assembly the engine
      // runs — recomputed end to end, so a hash drift OR a run
      // miscount mismatches. CTE chain shared with mm_media_verdict.
      "mm_video_dups" ->
        s"""WITH $mmVideoRunCtes
           |SELECT a_id, b_id, gap, start_a, run_len
           |FROM vruns""".stripMargin,

      // Trimmed-copy mirror: the shared stream's per-sub-bin amplitude
      // levels (stream window B = doc//8·16 + doc%4 + k) through the
      // fixed-window envelope-share fingerprint, then the same join →
      // gap band → island run assembly. The engine decodes REAL WAV
      // bytes to land on these exact integers (each sub-bin's |amp|
      // sum is 8·level — PCM is lossless). CTE chain shared with
      // mm_media_verdict.
      "mm_audio_dups" ->
        s"""WITH $mmAudioRunCtes
           |SELECT a_id, b_id, gap, start_a, run_len
           |FROM aruns""".stripMargin,

      // Robust image near-dup mirror: the variant-aware canonical
      // raster (base / exact 2× NN upscale / (0,0)-noise) recomputed
      // pixel-for-pixel, 64-bit block hash as two 32-bit halves,
      // 16-bit band bucketing, Hamming ≤ NearHamMax verify — banding
      // is EXACT for that threshold (4 bands, ≤3 flipped bits always
      // leave one band intact), so engine and oracle provably agree on
      // the full pair set, not just the planted one.
      "mm_dup_near" ->
        s"""WITH $mmNearCtes
           |SELECT a_id, b_id, hamming FROM ipairs""".stripMargin,

      // Incremental ingest-gate mirror: the corpus signature chain and
      // the incoming batch's chain (re-uploads as exact 2× upscales of
      // their group content, novels from a far-offset fake group) both
      // recomputed closed-form, the cross-population band join at the
      // same Hamming verify, and the per-asset rollup with -1
      // sentinels — exactly the engine's artifact-probe semantics.
      "mm_dup_incremental" -> mmDupIncrementalSql,

      // Cross-modal PAIR ingest gate (r16): the image side is the
      // mm_dup_incremental chain VERBATIM (factored val — the two keys
      // cannot drift); the caption side renders the incoming pair
      // batch's planted caption branches (d%3: base / novel / stock)
      // and probes the corpus caption md5 set built from the SAME
      // convention mm_caption_pairs pins; the composed disposition is
      // recomputed end to end.
      "mm_pair_gate" ->
        s"""WITH ginc AS ($mmDupIncrementalSql),
           |icap AS (SELECT doc_id + ${Multimodal.IncomingIdOffset}
           |      AS batch_id,
           |    CASE WHEN doc_id % ${Multimodal.PairCapBranchMod} = 1
           |           THEN 300000 + doc_id
           |         WHEN doc_id % ${Multimodal.PairCapBranchMod} = 2
           |           THEN 90000 + doc_id % ${Multimodal.CapStockPool}
           |         ELSE doc_id % ${Multimodal.DupContentMod} END
           |      AS cap_id
           |  FROM documents WHERE doc_id % 8 = 3),
           |ictext AS (SELECT batch_id,
           |    'caption ' || cap_id || ' about subject '
           |      || ((cap_id * 7) % 97) AS caption
           |  FROM icap),
           |ccap AS (SELECT doc_id,
           |    CASE WHEN doc_id % ${Multimodal.CapBranchMod} = 3
           |           THEN 100000 + doc_id
           |         WHEN doc_id % ${Multimodal.CapBranchMod} = 4
           |           THEN 90000 + doc_id % ${Multimodal.CapStockPool}
           |         ELSE doc_id % ${Multimodal.DupContentMod} END
           |      AS cap_id
           |  FROM documents),
           |cm AS (SELECT DISTINCT md5('caption ' || cap_id
           |    || ' about subject ' || ((cap_id * 7) % 97)) AS m
           |  FROM ccap),
           |cflag AS (SELECT i.batch_id,
           |    CAST(CASE WHEN cm.m IS NOT NULL THEN 1 ELSE 0 END
           |      AS BIGINT) AS cap_dup
           |  FROM (SELECT batch_id, md5(caption) AS m FROM ictext) i
           |  LEFT JOIN cm ON cm.m = i.m)
           |SELECT g.batch_id, g.n_matches, g.matched_id, g.min_hamming,
           |  f.cap_dup,
           |  CASE WHEN g.is_new = 0 AND f.cap_dup = 1
           |         THEN 'drop_duplicate_pair'
           |       WHEN g.is_new = 0 THEN 'review_recaptioned'
           |       WHEN f.cap_dup = 1 THEN 'review_restocked'
           |       ELSE 'admit' END AS disposition
           |FROM ginc g JOIN cflag f USING (batch_id)""".stripMargin,

      // Pair gate, caption NEAR tier (r17): the image side is the
      // mm_dup_incremental chain verbatim; the caption side renders the
      // near-pair fixture (the planted d%48==43 tail edit appends ONE
      // token to its base caption) and replays the engine's generic
      // near law — distinct corpus captions → word 5-gram shingles →
      // df-capped inverted index → integer Jaccard ≥ 1/2 — exactly the
      // dedup_incremental_near algorithm, never a special-cased
      // membership test. The md5 flag rides along as evidence. CTE
      // chain shared with mm_pair_audit (factored val — the gate and
      // its audit cannot drift).
      "mm_pair_gate_near" ->
        s"""WITH $mmPairNearCtes
           |SELECT g.batch_id, g.n_matches, g.matched_id, g.min_hamming,
           |  f.cap_dup, f.cap_near_matches, f.cap_dup_near,
           |  CASE WHEN g.is_new = 0 AND f.cap_dup_near = 1
           |         THEN 'drop_duplicate_pair'
           |       WHEN g.is_new = 0 THEN 'review_recaptioned'
           |       WHEN f.cap_dup_near = 1 THEN 'review_restocked'
           |       ELSE 'admit' END AS disposition
           |FROM ginc g JOIN cflag f USING (batch_id)""".stripMargin,

      // Per-pair audit (r17): the SAME chain with the evidence columns
      // kept — img_dup plus the canonical caption source doc
      // (cap_match_id = smallest corpus doc whose caption near-matches;
      // -1 when the caption is genuinely new).
      "mm_pair_audit" ->
        s"""WITH $mmPairNearCtes
           |SELECT g.batch_id,
           |  CAST(CASE WHEN g.n_matches > 0 THEN 1 ELSE 0 END AS BIGINT)
           |    AS img_dup,
           |  g.n_matches, g.matched_id, g.min_hamming,
           |  f.cap_dup, f.cap_near_matches, f.cap_dup_near,
           |  f.cap_match_id,
           |  CASE WHEN g.is_new = 0 AND f.cap_dup_near = 1
           |         THEN 'drop_duplicate_pair'
           |       WHEN g.is_new = 0 THEN 'review_recaptioned'
           |       WHEN f.cap_dup_near = 1 THEN 'review_restocked'
           |       ELSE 'admit' END AS disposition
           |FROM ginc g JOIN cflag f USING (batch_id)""".stripMargin,

      // Incremental video-gate mirror: the corpus per-frame chain and
      // the incoming batch's (re-uploads trimmed one frame off their
      // group's corpus cut, novels from a far-offset fake group) both
      // recomputed closed-form, then the cross-population signature
      // join → gap islands → run threshold → per-asset rollup.
      "mm_vid_incremental" -> {
        val off = Multimodal.IncomingIdOffset
        val nov = Multimodal.IncomingNovelOffset
        val cg = Multimodal.ClipGroup
        val batchDocs =
          s"""SELECT d.doc_id + $off AS doc_id,
             |  d.doc_id // $cg + CASE WHEN d.doc_id % 16 = 6
             |    THEN $nov ELSE 0 END AS g,
             |  (d.doc_id + 1) % 4 AS off,
             |  CAST(d.doc_id % 5 + 2 AS BIGINT) AS nf
             |FROM documents d WHERE d.doc_id % 8 = 6""".stripMargin
        s"""WITH ${vidFpChain("v", vidCorpusDocs)},
           |${vidFpChain("q", batchDocs)},
           |${runGateSql("vsig", "qsig", "f",
              "c.gray_sum = q.gray_sum AND c.ahash = q.ahash")}"""
          .stripMargin
      },

      // Incremental audio-gate mirror: corpus + incoming window
      // fingerprint chains recomputed closed-form, same run-gate
      // assembly.
      "mm_aud_incremental" -> {
        val off = Multimodal.IncomingIdOffset
        val nov = Multimodal.IncomingNovelOffset
        val cg = Multimodal.ClipGroup
        val batchDocs =
          s"""SELECT d.doc_id + $off AS doc_id,
             |  d.doc_id // $cg + CASE WHEN d.doc_id % 16 = 5
             |    THEN $nov ELSE 0 END AS g,
             |  (d.doc_id + 1) % 4 AS off,
             |  CAST(4 + d.doc_id % 3 AS BIGINT) AS nw
             |FROM documents d WHERE d.doc_id % 8 = 5""".stripMargin
        s"""WITH ${audFpChain("a", audCorpusDocs)},
           |${audFpChain("q", batchDocs)},
           |${runGateSql("afp", "qfp", "win", "c.wfp = q.wfp")}"""
          .stripMargin
      },

      // Media-health mirror: the three matcher chains recomputed
      // closed-form, the tagged pair count (image pairs + distinct
      // video/audio run pairs), distinct dup endpoints, and component
      // count/max via the recursive closure — the counts the engine
      // reads off its committed artifacts.
      "media_health" -> mediaHealthSql,

      // Fleet-scope rollup (r16): the three committed per-family
      // oracle chains reused VERBATIM as scoped subqueries (each keeps
      // its own CTE namespace), plus the BM25 postings-density branch;
      // the four pressures and the rank are recomputed end to end, so
      // a drift in ANY family's health chain or in the normalization
      // mismatches here too.
      "index_fleet_health" ->
        s"""SELECT family, pressure_permille,
           |  CAST(row_number() OVER (ORDER BY pressure_permille DESC,
           |    family) AS INTEGER) AS rank
           |FROM (
           |  SELECT 'ivf' AS family,
           |    CAST(sum(abs(occupancy_x1000 - 1000)) // count(*)
           |      AS BIGINT) AS pressure_permille
           |  FROM ($ivfMaintenanceSql)
           |  UNION ALL
           |  SELECT 'graph' AS family,
           |    CAST((1000 - mutual_permille)
           |      + n_isolated * 1000 // n_nodes AS BIGINT)
           |  FROM ($graphHealthSql)
           |  UNION ALL
           |  SELECT 'media' AS family, CAST(dup_permille AS BIGINT)
           |  FROM ($mediaHealthSql)
           |  UNION ALL
           |  SELECT 'lex' AS family,
           |    CAST(sum(df) * 1000 // (count(*) * max(n_docs))
           |      AS BIGINT)
           |  FROM (WITH $bm25CoreCtes,
           |    dfn AS (SELECT term, df,
           |        (SELECT count(*) FROM documents) AS n_docs FROM dfr)
           |    SELECT * FROM dfn))""".stripMargin,

      // Media-audit mirror: the three matcher chains recomputed
      // closed-form into the tagged pair set, per-asset pair degrees
      // per modality, component sizes via the recursive closure, and
      // the composed disposition — the oracle proof that the audit is
      // a faithful view over the same pair algebra.
      "media_audit" ->
        s"""WITH RECURSIVE $mmNearCtes,
           |$mmVideoRunCtes,
           |$mmAudioRunCtes,
           |tag AS (
           |  SELECT a_id, b_id, 'img' AS m FROM ipairs
           |  UNION ALL SELECT DISTINCT a_id, b_id, 'vid' FROM vruns
           |  UNION ALL SELECT DISTINCT a_id, b_id, 'aud' FROM aruns),
           |touch AS (SELECT a_id AS doc_id, m FROM tag
           |  UNION ALL SELECT b_id, m FROM tag),
           |deg AS (SELECT doc_id,
           |    CAST(sum(CASE WHEN m = 'img' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_img_pairs,
           |    CAST(sum(CASE WHEN m = 'vid' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_vid_pairs,
           |    CAST(sum(CASE WHEN m = 'aud' THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_aud_pairs
           |  FROM touch GROUP BY 1),
           |edges AS (SELECT DISTINCT a_id, b_id FROM tag),
           |bi AS (SELECT a_id AS u, b_id AS v FROM edges
           |  UNION ALL SELECT b_id, a_id FROM edges),
           |reach(u, v) AS (
           |  SELECT u, v FROM bi
           |  UNION
           |  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
           |comp AS (SELECT u AS doc_id, least(u, min(v)) AS component
           |  FROM reach GROUP BY u),
           |sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS sz
           |  FROM comp GROUP BY 1)
           |SELECT d.doc_id,
           |  coalesce(c.component, d.doc_id) AS canonical_id,
           |  coalesce(s.sz, 1) AS component_size,
           |  coalesce(g.n_img_pairs, 0) AS n_img_pairs,
           |  coalesce(g.n_vid_pairs, 0) AS n_vid_pairs,
           |  coalesce(g.n_aud_pairs, 0) AS n_aud_pairs,
           |  CAST(CASE WHEN coalesce(g.n_img_pairs, 0) > 0 THEN 1 ELSE 0
           |    END AS BIGINT) AS img_dup,
           |  CAST(CASE WHEN coalesce(g.n_vid_pairs, 0) > 0 THEN 1 ELSE 0
           |    END AS BIGINT) AS vid_dup,
           |  CAST(CASE WHEN coalesce(g.n_aud_pairs, 0) > 0 THEN 1 ELSE 0
           |    END AS BIGINT) AS aud_dup,
           |  CAST((CASE WHEN coalesce(g.n_img_pairs, 0) > 0 THEN 1 ELSE 0
           |      END)
           |    + (CASE WHEN coalesce(g.n_vid_pairs, 0) > 0 THEN 1 ELSE 0
           |      END)
           |    + (CASE WHEN coalesce(g.n_aud_pairs, 0) > 0 THEN 1 ELSE 0
           |      END) AS BIGINT) AS n_modalities,
           |  CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id
           |    THEN 'keep' ELSE 'drop_duplicate' END AS disposition
           |FROM documents d
           |LEFT JOIN comp c ON c.doc_id = d.doc_id
           |LEFT JOIN deg g ON g.doc_id = d.doc_id
           |LEFT JOIN sizes s ON s.component = c.component""".stripMargin,

      // The media ACTION mirror: all three matcher chains (image
      // canonical-raster near-dup, video shared-footage runs, audio
      // shared-clip runs) recomputed closed-form, their pair sets
      // unioned, transitive closure via the recursive reach CTE (the
      // dedup_groups device), and the per-asset disposition assembled
      // exactly as the engine does: canonical = min reachable id,
      // keep ⟺ doc is its component's canonical, per-modality
      // evidence flags.
      "mm_media_verdict" ->
        s"""WITH RECURSIVE $mmNearCtes,
           |$mmVideoRunCtes,
           |$mmAudioRunCtes,
           |edges AS (
           |  SELECT a_id, b_id FROM ipairs
           |  UNION SELECT a_id, b_id FROM vruns
           |  UNION SELECT a_id, b_id FROM aruns),
           |bi AS (SELECT a_id AS u, b_id AS v FROM edges
           |  UNION ALL SELECT b_id, a_id FROM edges),
           |reach(u, v) AS (
           |  SELECT u, v FROM bi
           |  UNION
           |  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u),
           |comp AS (SELECT u AS doc_id, least(u, min(v)) AS component
           |  FROM reach GROUP BY u),
           |imd AS (SELECT DISTINCT u AS doc_id FROM
           |  (SELECT a_id AS u FROM ipairs UNION ALL SELECT b_id FROM ipairs)),
           |vmd AS (SELECT DISTINCT u AS doc_id FROM
           |  (SELECT a_id AS u FROM vruns UNION ALL SELECT b_id FROM vruns)),
           |amd AS (SELECT DISTINCT u AS doc_id FROM
           |  (SELECT a_id AS u FROM aruns UNION ALL SELECT b_id FROM aruns))
           |SELECT d.doc_id,
           |  coalesce(c.component, d.doc_id) AS canonical_id,
           |  CASE WHEN coalesce(c.component, d.doc_id) = d.doc_id
           |    THEN 'keep' ELSE 'drop' END AS verdict,
           |  CAST(CASE WHEN imd.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           |    AS img_dup,
           |  CAST(CASE WHEN vmd.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           |    AS vid_dup,
           |  CAST(CASE WHEN amd.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           |    AS aud_dup,
           |  CAST(CASE WHEN imd.doc_id IS NULL THEN 0 ELSE 1 END
           |     + CASE WHEN vmd.doc_id IS NULL THEN 0 ELSE 1 END
           |     + CASE WHEN amd.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
           |    AS n_modalities
           |FROM documents d
           |LEFT JOIN comp c ON c.doc_id = d.doc_id
           |LEFT JOIN imd ON imd.doc_id = d.doc_id
           |LEFT JOIN vmd ON vmd.doc_id = d.doc_id
           |LEFT JOIN amd ON amd.doc_id = d.doc_id""".stripMargin,

      // Closed-form mirror of the WAV sample train: n = id%500+100
      // samples of ((id·31 + i·17) mod 65536) − 32768. The Spark side
      // must round-trip a real RIFF/WAVE encode→decode (PCM is
      // lossless) to land on these exact integer sums.
      "mm_audio_decode" ->
        """SELECT d.doc_id,
          |  CAST(8000 AS INTEGER) AS sample_rate,
          |  CAST(1 AS INTEGER) AS n_channels,
          |  CAST(16 AS INTEGER) AS bits,
          |  CAST(d.doc_id % 500 + 100 AS BIGINT) AS n_samples,
          |  CAST(sum((d.doc_id * 31 + s.i * 17) % 65536 - 32768)
          |    AS BIGINT) AS sum_amp,
          |  CAST(sum(abs((d.doc_id * 31 + s.i * 17) % 65536 - 32768))
          |    AS BIGINT) AS sum_abs
          |FROM documents d,
          |  LATERAL (SELECT unnest(generate_series(0,
          |    CAST(d.doc_id % 500 + 99 AS BIGINT))) AS i) s
          |GROUP BY 1""".stripMargin,

      // Closed-form mirror of the GIF frame ramps: n_frames = id%5+2,
      // dims as mm_decode, pixel(f,x,y) = (id·3 + 11f + 5x + 3y) mod 256.
      "mm_video_decode" ->
        """SELECT d.doc_id,
          |  CAST(d.doc_id % 5 + 2 AS INTEGER) AS n_frames,
          |  CAST(d.doc_id % 13 + 4 AS INTEGER) AS width,
          |  CAST(d.doc_id % 11 + 4 AS INTEGER) AS height,
          |  CAST(sum((d.doc_id * 3 + 11 * f.f + 5 * x.i + 3 * y.j) % 256)
          |    AS BIGINT) AS sum_gray,
          |  CAST(sum(f.f * ((d.doc_id * 3 + 11 * f.f + 5 * x.i + 3 * y.j)
          |    % 256)) AS BIGINT) AS wsum_gray
          |FROM documents d,
          |  LATERAL (SELECT unnest(generate_series(0,
          |    CAST(d.doc_id % 5 + 1 AS BIGINT))) AS f) f,
          |  LATERAL (SELECT unnest(generate_series(0,
          |    CAST(d.doc_id % 13 + 3 AS BIGINT))) AS i) x,
          |  LATERAL (SELECT unnest(generate_series(0,
          |    CAST(d.doc_id % 11 + 3 AS BIGINT))) AS j) y
          |GROUP BY 1""".stripMargin,

      "mm_resize" ->
        """WITH a AS (
          |  SELECT doc_id,
          |    CAST(n_chars % 640 + 16 AS INTEGER) AS width,
          |    CAST(n_chars * 7 % 480 + 16 AS INTEGER) AS height
          |  FROM documents)
          |SELECT doc_id, width, height,
          |  CAST(CASE WHEN greatest(width, height) <= 256 THEN width
          |    ELSE greatest(1, width * 256 // greatest(width, height))
          |    END AS INTEGER) AS resized_w,
          |  CAST(CASE WHEN greatest(width, height) <= 256 THEN height
          |    ELSE greatest(1, height * 256 // greatest(width, height))
          |    END AS INTEGER) AS resized_h
          |FROM a""".stripMargin,

      // REAL pixel-resize mirror: nearest-neighbor sampling replayed
      // pixel-for-pixel — source (x·w0 // rw, y·h0 // rh) through the
      // PNG channel ramps, then the mm_phash block/bit chain over the
      // RESIZED raster, so a wrong sample coordinate, a dropped pixel,
      // or a block-mapping drift all hash-mismatch.
      "mm_resize_px" -> {
        val g = Multimodal.AhashGrid
        s"""WITH rd AS (
           |  SELECT doc_id,
           |    CAST(doc_id % 13 + 4 AS BIGINT) AS w0,
           |    CAST(doc_id % 11 + 4 AS BIGINT) AS h0,
           |    greatest(doc_id % 13 + 4, doc_id % 11 + 4) AS m
           |  FROM documents),
           |rz AS (
           |  SELECT doc_id, w0, h0,
           |    CASE WHEN m <= 8 THEN w0
           |      ELSE greatest(1, w0 * 8 // m) END AS rw,
           |    CASE WHEN m <= 8 THEN h0
           |      ELSE greatest(1, h0 * 8 // m) END AS rh
           |  FROM rd),
           |px AS (
           |  SELECT r.doc_id, r.rw, r.rh, x.i AS x, y.j AS y,
           |    (r.doc_id * 3 + (x.i * r.w0) // r.rw
           |       + (y.j * r.h0) // r.rh) % 256
           |    + (r.doc_id * 5 + 2 * ((x.i * r.w0) // r.rw)) % 256
           |    + (r.doc_id * 7 + 3 * ((y.j * r.h0) // r.rh)) % 256
           |      AS gray
           |  FROM rz r,
           |    LATERAL (SELECT unnest(generate_series(0, r.rw - 1))
           |      AS i) x,
           |    LATERAL (SELECT unnest(generate_series(0, r.rh - 1))
           |      AS j) y),
           |tot AS (SELECT doc_id, max(rw) AS rw, max(rh) AS rh,
           |    CAST(sum(gray) AS BIGINT) AS total, count(*) AS n
           |  FROM px GROUP BY 1),
           |blk AS (SELECT doc_id, (x * $g) // rw AS i, (y * $g) // rh AS j,
           |    CAST(sum(gray) AS BIGINT) AS bs, count(*) AS bn
           |  FROM px GROUP BY 1, 2, 3),
           |bits AS (SELECT b.doc_id,
           |    CASE WHEN b.bs * t.n > t.total * b.bn
           |      THEN CAST(1 AS BIGINT) << CAST(b.j * $g + b.i AS INTEGER)
           |      ELSE CAST(0 AS BIGINT) END AS bit
           |  FROM blk b JOIN tot t USING (doc_id))
           |SELECT t.doc_id, CAST(t.rw AS INTEGER) AS resized_w,
           |  CAST(t.rh AS INTEGER) AS resized_h, t.total AS gray_sum,
           |  CAST(sum(bits.bit) AS BIGINT) AS ahash
           |FROM tot t JOIN bits ON bits.doc_id = t.doc_id
           |GROUP BY 1, 2, 3, 4""".stripMargin
      }))
}

package graft.queries

/** Corpus-size-derived LSH sizing — the sub-linear knobs that hold the
  * bucket/candidate contracts as the corpus grows, instead of constants
  * that only fit one scale factor.
  *
  * The gate corpora (sf0.001/sf0.01: 500 documents, 500 vectors) derive
  * exactly the constants the static DuckDB oracles are generated with
  * (4 sign planes; 8 minhash bands × 4 rows), so the hash-gated queries
  * stay byte-stable while a 10⁹-row corpus gets a proportionally larger
  * hash space. Pinned at two synthetic sizes in Similarity/Dedup specs.
  */
object LshTuning {

  /** Sign-LSH hyperplane count: the bucket space 2^planes is sized so the
    * EXPECTED bucket holds ≈ `targetBucket` vectors — candidate re-rank
    * cost per query stays flat as the corpus grows. 500 → 4 (gate), 2000
    * → 6, clamped to [min, max] (at max=16 a 2⁶⁴-row corpus still probes
    * 65536 buckets, and fewer planes than 4 under-spreads tiny corpora). */
  def signPlanes(corpus: Long, targetBucket: Long = 32,
      minPlanes: Int = 4, maxPlanes: Int = 16): Int = {
    val need = math.ceil(log2(math.max(1.0, corpus.toDouble / targetBucket))).toInt
    math.min(maxPlanes, math.max(minPlanes, need))
  }

  /** MinHash banding rows-per-band: r grows with log₁₆(corpus) — as the
    * number of potentially colliding pairs grows, each band needs more
    * agreeing hashes before it emits a candidate. 500 → 4 (gate); grows
    * to 5 past 65k docs, 7 past 268M. */
  def minhashRowsPerBand(corpus: Long, minRows: Int = 4, maxRows: Int = 7): Int =
    math.min(maxRows, math.max(minRows,
      math.ceil(log2(math.max(2.0, corpus.toDouble)) / 4.0).toInt))

  /** IVF cell count: k is sized so the EXPECTED cell holds ≈ `targetCell`
    * vectors — the within-cell quadratic work (SemDeDup pairwise pruning,
    * IVF probe re-rank) stays O(corpus · targetCell) instead of
    * O(corpus²/k) with a frozen k. 500 → 16 (gate — the static DuckDB
    * oracles for x_sim_ivf_md5 / x_dedup_semantic are generated with it),
    * 2000 → 63 (sf0.1 bench), capped at 65536: a 64-dim float centroid
    * table tops out ≈ 16 MB — still broadcastable to every executor.
    * Past the cap cell populations resume growing linearly; the
    * hierarchical successor EXISTS as [[ivfTwoLevel]] (x_sim_ivf2_md5),
    * which keeps total cells growing with the corpus while only the
    * √total coarse level broadcasts. */
  def ivfCells(corpus: Long, targetCell: Long = 32, maxCells: Int = 1 << 16): Int =
    math.min(maxCells.toLong,
      math.max(1L, math.ceil(corpus.toDouble / targetCell).toLong)).toInt

  /** Two-level (coarse/fine) IVF sizing — the layout past [[ivfCells]]'s
    * 65,536-cell broadcast cap: total cells still track corpus/targetCell,
    * but they factor as kCoarse × kFinePerCell with kCoarse ≈ √total, so
    * ONLY the coarse table broadcasts (≤ 65,536 rows at 10¹⁰ vectors:
    * 3.1×10⁸ cells → 17,678 coarse) while the fine table — potentially
    * 10⁸ rows — is joined key-equi on its coarse cell id and never
    * broadcast. Per-vector fine-assignment work is kFinePerCell ≈ √total
    * comparisons instead of total, the classic IMI-style square-root
    * split. Gate corpus 500 → (4, 4) = the same 16 total cells the flat
    * oracle uses; the static x_sim_ivf2_md5 oracle is generated with it. */
  def ivfTwoLevel(corpus: Long, targetCell: Long = 32,
      maxCoarse: Int = 1 << 16): (Int, Int) = {
    val total = math.max(1L, math.ceil(corpus.toDouble / targetCell).toLong)
    val kc = math.min(maxCoarse.toLong, math.ceil(math.sqrt(total.toDouble)).toLong).toInt
    val kf = math.ceil(total.toDouble / kc).toInt
    (kc, kf)
  }

  /** PQ centroids-per-subspace: grows with corpus size so per-subspace
    * quantization error keeps shrinking as more data funds a finer
    * codebook, capped at 256 — the classic one-byte-per-subspace code.
    * 500 → 16 (gate — the static x_sim_pq_md5 / x_sim_ivfpq_md5 oracles
    * are generated with it), 2000 → 63, ≥ 8,192 → 256. The codebook is
    * always ≤ M × 256 rows — broadcast-sized at any scale. */
  def pqCentroids(corpus: Long, minK: Int = 8, maxK: Int = 256): Int =
    math.min(maxK.toLong,
      math.max(minK.toLong, math.ceil(corpus.toDouble / 32.0).toLong)).toInt

  /** Bands paired with [[minhashRowsPerBand]]: b = 2^(r-1) keeps the
    * S-curve threshold (1/b)^(1/r) pinned near 0.55–0.6 at every scale
    * (r=4,b=8 → 0.59; r=5,b=16 → 0.57; r=7,b=64 → 0.55), matching the
    * est_j ≥ 0.5 cut the pipeline applies after exact estimation. */
  def minhashBands(rowsPerBand: Int): Int = 1 << (rowsPerBand - 1)

  private def log2(x: Double): Double = math.log(x) / math.log(2.0)
}

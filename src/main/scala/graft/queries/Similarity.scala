package graft.queries

import graft.Engine.table
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>`, 64-dim).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the (small) query
  * set against a full scan of the corpus; one shuffle for the per-query
  * top-k window. At 100 TB the corpus side stays partition-parallel and
  * the query side is broadcast — no cartesian shuffle.
  *
  * Scale path: sign-random-projection LSH (x_sim_lsh) — 16 deterministic
  * hyperplanes hash every vector to a 16-bit bucket; candidates = same
  * bucket (multi-probe: Hamming-1 neighbors), exact cosine re-rank inside
  * the bucket. Bucketing is a single narrow projection + one groupable
  * key — the 100×-scale join is key-equi, not cartesian. Recall vs the
  * brute-force baseline is pinned in SimilaritySpec.
  *
  * Cosines are computed with index-ordered double accumulation so the
  * DuckDB oracle reproduces results bit-for-bit.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  /** Embedding dimensionality contract (TESTDATA.md): the LSH hyperplane
    * literals AND the static DuckDB oracle for `x_sim_lsh` are generated
    * for exactly this many dims. A corpus with different dims fails fast
    * (see the require in x_sim_lsh) instead of silently truncating the
    * dot products and skewing buckets. */
  val EmbeddingDims = 64

  /** Norms via the native float_dot expression (graft.functions) — a fused
    * codegen loop; bit-identical to the composed aggregate/zip_with form.
    * `private[queries]`: the semantic-dedup operator builds on the same
    * normed corpus. */
  private[queries] def withNorm(s: SparkSession, d: String): DataFrame = {
    graft.functions.CosineSimilarity.register(s)
    table(s, d, "embeddings").select(col("vec_id"), col("embedding"),
      sqrt(expr("float_dot(embedding, embedding)")).as("nrm"))
  }

  private val dot = expr("float_dot(qe, embedding)")

  /** Deterministic hyperplane weight for sign-LSH, identical to round 1's
    * in-query formulation `(xxhash64(p * 997 + i) % 1000) / 1000.0`:
    * evaluated once driver-side via the same Catalyst XxHash64 (seed 42),
    * then inlined as literal double arrays so the per-row bucket
    * computation is a codegen'd float_dot instead of nested interpreted
    * lambdas (~26 ms/row → µs/row at sf0.1). */
  private def planeWeight(p: Int, i: Int): Double = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = XxHash64(Seq(Literal(p * 997 + i)), 42L).eval(null).asInstanceOf[Long]
    (h % 1000).toDouble / 1000.0
  }

  val queries: Map[String, Q] = Map(
    // -- brute-force cosine top-5 for 10 query vectors
    "x_sim_topk" -> ((s, d) => {
      val e = withNorm(s, d)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      broadcast(q).join(e, col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"), (dot / (col("qn") * col("nrm"))).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"), col("cos"))
        .orderBy("qid", "rank")
    }),

    // -- LSH-bucketed ANN (sign random projection) with Hamming-1
    //    multi-probe: the query probes its own bucket plus every
    //    one-bit-flipped bucket, then exact cosine re-ranks candidates.
    //    4 planes / 16 buckets fits the ~500-vector test corpus; a 100 TB
    //    corpus raises planes so bucket size stays ~corpus/2^planes (the
    //    candidate join stays key-equi either way). Deterministic
    //    hyperplanes: plane p, dim i weight =
    //    (xxhash64(p * 997 + i) % 1000) / 1000.0.
    "x_sim_lsh" -> ((s, d) => {
      // ONE probe job (at most) for both contracts: dims (must equal
      // EmbeddingDims — hyperplanes and the static oracle are generated
      // for it; a mismatch fails fast instead of silently truncating
      // float_dot) and corpus size (derives the plane count so expected
      // bucket size stays flat at any scale; the gate corpus of 500
      // derives the oracle's 4). When plan stats are exact by
      // construction, only the single-row dims fetch runs — the trust
      // test is Engine.exactStatsRowCount's whitelist, NOT raw
      // stats.rowCount, which can carry stale ANALYZE counts that would
      // silently resize the plane space (correctness, not costing).
      val emb = table(s, d, "embeddings")
      val (dims, corpusN) = graft.Engine.exactStatsRowCount(emb) match {
        case Some(n) =>
          emb.select(size(col("embedding")).as("dims")).take(1) match {
            case Array(r) if !r.isNullAt(0) => (r.getInt(0), n)
            case _ => (EmbeddingDims, n) // NULL first row: contract dims
          }
        case None => emb
          .agg(first(size(col("embedding"))).as("dims"), count(lit(1)).as("n"))
          .take(1) match {
          case Array(r) if !r.isNullAt(0) => (r.getInt(0), r.getLong(1))
          case _ => (EmbeddingDims, 0L)
        }
      }
      require(dims == EmbeddingDims,
        s"x_sim_lsh: corpus dims $dims != contract $EmbeddingDims — hyperplanes and the " +
          "DuckDB oracle are generated for the contract dims; regenerate both for a new corpus")
      val planes = LshTuning.signPlanes(corpusN)
      val e = withNorm(s, d)
      // bucket = the `planes` sign bits of dot products against literal
      // double hyperplanes; float_dot keeps the index-ordered double fold
      // of the round-1 lambda form, so bucket values (and spec recall)
      // are unchanged — just fused into whole-stage codegen
      val bucketCol = (0 until planes).foldLeft(lit(0L)) { (acc, p) =>
        val arr = (0 until dims).map(i => s"${planeWeight(p, i)}D").mkString("array(", ",", ")")
        acc * 2 + when(expr(s"float_dot(embedding, $arr)") > 0, lit(1L)).otherwise(lit(0L))
      }
      val sig = e.withColumn("bucket", bucketCol)
      val q = sig.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("nrm").as("qn"),
          explode(expr(s"concat(array(bucket), transform(sequence(0, ${planes - 1}), " +
            "b -> bucket ^ shiftleft(1L, b)))")).as("qbucket"))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
      broadcast(q)
        .join(sig, col("qbucket") === col("bucket") && col("qid") =!= col("vec_id"))
        .select(col("qid"), col("vec_id"), (dot / (col("qn") * col("nrm"))).as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"), col("cos"))
        .orderBy("qid", "rank")
    }),

    // -- IVF (inverted-file) ANN: corpus is partitioned into Voronoi cells
    //    around k-means-fitted centroids; queries probe the nprobe=4
    //    nearest cells and re-rank exactly inside them. Scale shape: cell
    //    assignment is a broadcast of centroids + a partial-aggregatable
    //    max(struct) argmax — one scan, one reduce, no window over the
    //    corpus; the candidate join is key-equi on cell id. k is derived
    //    from corpus size (LshTuning.ivfCells: expected cell ≈ 32, so
    //    probe re-rank cost stays flat as the corpus grows; the gate
    //    corpus of 500 derives the oracle's 16).
    "x_sim_ivf" -> ((s, d) =>
      ivfSearch(withNorm(s, d), ivfCentroids(s, d, k = ivfK(s, d)), nprobe = 4)),

    // -- engine-portable IVF twin: md5 seed draw, deterministic modulo
    //    sample, and exact scaled-integer centroid means make the whole
    //    2-iteration Lloyd fit + probe reproducible in DuckDB (see the
    //    unrolled-CTE oracle) — the IVF pipeline's hash gate.
    "x_sim_ivf_md5" -> ((s, d) =>
      ivfSearch(withNorm(s, d), ivfCentroidsPortable(s, d, k = ivfK(s, d)), nprobe = 4)),

    "x_sim_quantize" -> ((s, d) => quantizeQuery(s, d).filter(col("vec_id") < 100))
  )

  /** Symmetric int8 quantization of the embedding column — the standard
    * 4× storage/bandwidth shrink before ANN serving. Per-vector scale =
    * 127 / max|x|; quantized value = floor(x·scale + 0.5) (explicit
    * floor(+0.5) instead of round(): identical IEEE double semantics in
    * every engine, so the oracle is hash-exact). Output is exploded
    * (vec_id, pos, q, qscale) rows — a pure narrow map over the scan. */
  private def quantizeQuery(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("mx", expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
      .withColumn("qscale", when(col("mx") > 0, lit(127.0) / col("mx")).otherwise(lit(0.0)))
      .select(col("vec_id"), col("qscale"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        floor(col("x").cast("double") * col("qscale") + 0.5).cast("long").as("q"),
        col("qscale"))
      .orderBy("vec_id", "pos")

  /** IVF probe + exact re-rank (shared by the xxhash64 fast path and the
    * md5-portable twin): queries probe their `nprobe` nearest cells, the
    * full corpus is cell-assigned once, candidates join key-equi on cell
    * id, and top-5 re-ranks exactly. Query side is tiny → broadcast both
    * the centroid table and the probe fan-out. */
  private def ivfSearch(e: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val assigned = assignCells(e, cents)
    val wp = Window.partitionBy("qid").orderBy(col("ccos").desc, col("cid").asc)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("nrm").as("qn"))
      .join(broadcast(cents), lit(true))
      .select(col("qid"), col("qe"), col("qn"), col("cid"),
        (expr("float_dot(qe, ce)") / (col("qn") * col("cn"))).as("ccos"))
      .withColumn("rnk", row_number().over(wp))
      .filter(col("rnk") <= nprobe)
      .select(col("qid"), col("qe"), col("qn"), col("cid"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(probes)
      .join(assigned, probes("cid") === assigned("cid") && col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), (dot / (col("qn") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("vec_id"), col("cos"))
      .orderBy("qid", "rank")
  }

  /** Nearest-centroid cell assignment: argmax via max(struct(cos, -cid))
    * — deterministic tie-break, map-side-combinable (unlike a row_number
    * window, which would shuffle the whole corpus × centroid product).
    * `cents`: (cid, ce: array<float>, cn). */
  private[queries] def assignCells(e: DataFrame, cents: DataFrame): DataFrame = {
    val ccos = (expr("float_dot(embedding, ce)") / (col("nrm") * col("cn"))).as("ccos")
    e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        struct(ccos, (lit(0L) - col("cid")).as("negcid")).as("sc"))
      .groupBy("vec_id")
      .agg(max("sc").as("m"), first("embedding").as("embedding"), first("nrm").as("nrm"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        (lit(0L) - col("m.negcid")).as("cid"))
  }

  /** Fitted IVF index registry: a real ANN index is BUILT ONCE (offline)
    * and queried many times, so the k-means fit is memoized per
    * (session, corpus, k) and only the query path runs per call. The
    * memo holds k×dims floats — index-sized by design (it is broadcast
    * to every executor anyway), never corpus-sized.
    *
    * Lifecycle: entries of STOPPED sessions are purged on every access
    * (sessions are map keys, so a JVM hosting many short-lived sessions
    * would otherwise leak them), and [[invalidateIvfIndex]] drops the
    * memo for a corpus dir whose data has been rewritten — without it a
    * re-fit would silently serve the stale centroids. */
  private val fittedCentroids = new java.util.concurrent.ConcurrentHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Array[Float])]]]()

  private def purgeStoppedSessions(): Unit =
    fittedCentroids.keySet.removeIf(sess => sess.sparkContext.isStopped)

  /** Drop the memoized IVF indexes for (session, corpus dir) — call after
    * the corpus at `d` changes; the next IVF query re-fits. */
  def invalidateIvfIndex(s: SparkSession, d: String): Unit = {
    val inner = fittedCentroids.get(s)
    if (inner != null) inner.keySet.removeIf(_.startsWith(d + "\u0000"))
  }

  /** Spec hook: number of memoized indexes for the session. */
  private[queries] def memoizedIndexCount(s: SparkSession): Int = {
    val inner = fittedCentroids.get(s)
    if (inner == null) 0 else inner.size
  }

  private def memoizedCentroids(s: SparkSession, d: String, key: String)(
      fit: => DataFrame): DataFrame = {
    purgeStoppedSessions()
    val perSession = fittedCentroids.computeIfAbsent(s,
      _ => new java.util.concurrent.ConcurrentHashMap[String, Array[(Long, Array[Float])]]())
    // fit OUTSIDE the mapping function (same contract note as
    // Dedup.clusterLabels): the Lloyd fit runs several Spark jobs, far
    // beyond computeIfAbsent's "short and simple" contract, under which
    // it would also block unrelated keys on the same hash bin. Racing
    // fitters may duplicate work; the winner's entry is served.
    val mapKey = d + "\u0000" + key
    val arr = {
      val cached = perSession.get(mapKey)
      if (cached != null) cached
      else {
        val built = fit.select(col("cid"), col("ce"))
          .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
        val prev = perSession.putIfAbsent(mapKey, built)
        if (prev != null) prev else built
      }
    }
    import s.implicits._
    arr.toSeq.toDF("cid", "ce").withColumn("cn", sqrt(expr("float_dot(ce, ce)")))
  }

  /** Corpus-derived IVF cell count shared by x_sim_ivf/_md5 and the
    * SemDeDup clustering (Dedup.x_dedup_semantic): one count probe
    * (Engine.rowCountFast — exact stats when trustworthy, else a
    * metadata-cheap count()) feeding LshTuning.ivfCells, so the
    * within-cell quadratic stays bounded at every scale while the
    * 500-vector gate corpora derive exactly the k=16 the static DuckDB
    * oracles are generated with. */
  private[queries] def ivfK(s: SparkSession, d: String): Int =
    LshTuning.ivfCells(graft.Engine.rowCountFast(table(s, d, "embeddings")))

  private def ivfCentroids(s: SparkSession, d: String, k: Int): DataFrame =
    memoizedCentroids(s, d, s"xx$k") {
      val e = withNorm(s, d)
      // the fit runs on a bounded deterministic sample — the classic IVF
      // training recipe (a few-percent sample bounds fit cost regardless
      // of corpus size); assignment + probing still cover the full corpus
      kmeansCentroids(e.sample(withReplacement = false, 0.2, seed = 42), k, iters = 2)
    }

  private[queries] def ivfCentroidsPortable(s: SparkSession, d: String, k: Int): DataFrame =
    memoizedCentroids(s, d, s"md5$k") {
      // modulo sample instead of Bernoulli: same 20% bound, reproducible
      // in any engine
      kmeansCentroidsPortable(withNorm(s, d).filter(col("vec_id") % 5 === 0), k, iters = 2)
    }

  /** k-means centroid fit for the IVF cells (Lloyd, fixed iteration
    * count), replacing round-2's every-31st-vector scaffolding.
    * Deterministic: seeds are the k corpus vectors with the smallest
    * xxhash64(vec_id) — a fixed pseudo-random draw — and every iteration
    * is the same broadcast-argmax assignment the IVF query itself uses,
    * followed by a per-(cell, dim) MEAN computed as a partial aggregate.
    * Nothing corpus-sized ever reaches the driver: the fit shuffles
    * O(corpus × dims) skinny (cid, pos, x) rows per iteration with
    * map-side combine, and the result is k rows. Empty cells simply
    * drop (k shrinks), keeping the query side total-recall-safe. */
  private[queries] def kmeansCentroids(e: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = e.orderBy(xxhash64(col("vec_id"))).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    for (_ <- 0 until iters) {
      cents = assignCells(e, cents)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), p -> CAST(p.m AS FLOAT))").as("ce"))
        .withColumn("cn", sqrt(expr("float_dot(ce, ce)")))
        .select(col("cid"), col("ce"), col("cn"))
    }
    cents
  }

  /** Engine-portable Lloyd fit: identical shape to [[kmeansCentroids]] but
    * every non-associative step is replaced by an exactly-reproducible one:
    * seeds are the k sample vectors with the smallest md5(vec_id) hex
    * string (vec_id tie-break), and each centroid component is an EXACT
    * scaled-integer mean — floor(x·10⁹) summed as DECIMAL(38,0) (partial-
    * aggregatable, order-independent, overflow-free), divided as double,
    * rounded once to float. The ~1e-9 quantization keeps the fit a valid
    * k-means variant while making it bit-reproducible in DuckDB. */
  private[queries] def kmeansCentroidsPortable(samp: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = samp.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"), col("nrm").as("cn"))
    for (_ <- 0 until iters) {
      cents = assignCells(samp, cents)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("q", floor(col("x").cast("double") * lit(1e9)).cast("decimal(38,0)"))
        .groupBy("cid", "pos")
        .agg((sum("q").cast("double") / (lit(1e9) * count(lit(1)))).cast("float").as("m"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), p -> p.m)").as("ce"))
        .withColumn("cn", sqrt(expr("float_dot(ce, ce)")))
        .select(col("cid"), col("ce"), col("cn"))
    }
    cents
  }

  /** DuckDB double dot product over the first [[EmbeddingDims]] components
    * — the same index-ordered double fold as the native float_dot. */
  private[queries] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(generate_series(1, $EmbeddingDims), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  /** Nearest-centroid assignment of `src` rows against `cents` (CTE text). */
  private def assignSql(src: String, cents: String, out: String): String =
    s"""$out AS (
       |  SELECT vec_id, embedding, nrm, cid FROM (
       |    SELECT s.vec_id, s.embedding, s.nrm, c.cid,
       |           row_number() OVER (PARTITION BY s.vec_id
       |             ORDER BY ${dotSql("s.embedding", "c.ce")} / (s.nrm * c.cn) DESC, c.cid ASC) rn
       |    FROM $src s CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin

  /** Centroid update: exact scaled-integer mean per (cid, pos) (CTE text). */
  private def updateSql(asg: String, n: Int): String =
    s"""x$n AS (
       |  SELECT a.cid, t.i AS pos,
       |         CAST(floor(CAST(a.embedding[t.i] AS DOUBLE) * 1000000000.0) AS DECIMAL(38,0)) AS q
       |  FROM $asg a, range(1, ${EmbeddingDims + 1}) t(i)),
       |m$n AS (
       |  SELECT cid, pos,
       |         CAST(CAST(sum(q) AS DOUBLE) / (1000000000.0 * count(*)) AS REAL) AS m
       |  FROM x$n GROUP BY cid, pos),
       |l$n AS (SELECT cid, list(m ORDER BY pos) AS ce FROM m$n GROUP BY cid),
       |c$n AS (SELECT cid, ce, sqrt(${dotSql("ce", "ce")}) AS cn FROM l$n)""".stripMargin

  /** The md5-portable IVF pipeline as a DuckDB CTE chain: norms (`e`), the
    * modulo sample (`samp`), the md5 seed draw (`c0`), the unrolled
    * 2-iteration Lloyd fit (ending at `c2`), and the full-corpus
    * nearest-centroid assignment (`asgf`). Every step mirrors the Spark
    * side bit-for-bit; shared by the x_sim_ivf_md5 and x_dedup_semantic
    * oracles so both hash-gate the same fit. */
  private[queries] def portableIvfCtes: String =
    s"""e AS (SELECT vec_id, embedding, sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings),
       |samp AS (SELECT * FROM e WHERE vec_id % 5 = 0),
       |c0 AS (SELECT vec_id AS cid, embedding AS ce, nrm AS cn FROM samp
       |       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
       |${assignSql("samp", "c0", "a1")},
       |${updateSql("a1", 1)},
       |${assignSql("samp", "c1", "a2")},
       |${updateSql("a2", 2)},
       |${assignSql("e", "c2", "asgf")}""".stripMargin

  val oracle: Map[String, String] = Map(
    "x_sim_topk" ->
      """WITH e AS (SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
        |       i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) nrm
        |  FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id qid, t.vec_id,
        |    list_sum(list_transform(generate_series(1, len(q.embedding)),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE)))
        |      / (q.nrm * t.nrm) AS cos
        |  FROM e q, e t WHERE q.vec_id < 10 AND q.vec_id != t.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, cos,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, cos
        |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // The LSH hyperplanes are LITERAL doubles (planeWeight is evaluated
    // driver-side), so DuckDB can reproduce the buckets bit-for-bit with
    // the same index-ordered double arithmetic as float_dot — making the
    // whole multi-probe pipeline hash-gated, not rows-only. Both sides are
    // generated for EmbeddingDims (TESTDATA.md contract) and for the plane
    // count LshTuning derives at the GATE corpus (500 vectors → 4); the
    // Spark query probes the corpus and derives the same values there.
    "x_sim_lsh" -> {
      val gatePlanes = LshTuning.signPlanes(500)
      def w(p: Int) = (0 until EmbeddingDims).map(i => planeWeight(p, i)).mkString("[", ", ", "]")
      def dot(p: Int) =
        s"list_sum(list_transform(generate_series(1, $EmbeddingDims), i -> CAST(embedding[i] AS DOUBLE) * (${w(p)})[i]))"
      val bucket = (0 until gatePlanes)
        .map(p => s"(CASE WHEN ${dot(p)} > 0 THEN ${1L << (gatePlanes - 1 - p)} ELSE 0 END)")
        .mkString("\n        |     + ")
      s"""WITH e AS (SELECT vec_id, embedding,
        |  sqrt(list_sum(list_transform(generate_series(1, len(embedding)),
        |       i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) nrm
        |  FROM embeddings),
        |b AS (SELECT vec_id, embedding, nrm,
        |       $bucket AS bucket
        |  FROM e),
        |q AS (SELECT vec_id qid, embedding qe, nrm qn,
        |        unnest([bucket${(0 until gatePlanes)
                  .map(b => s", xor(bucket, ${1L << b})").mkString}]) AS qbucket
        |      FROM b WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.qid, t.vec_id,
        |    list_sum(list_transform(generate_series(1, len(q.qe)),
        |      i -> CAST(q.qe[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE)))
        |      / (q.qn * t.nrm) AS cos
        |  FROM q JOIN b t ON q.qbucket = t.bucket AND q.qid != t.vec_id),
        |ranked AS (
        |  SELECT qid, vec_id, cos,
        |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) rank
        |  FROM scored)
        |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, cos
        |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
    },

    // x_sim_ivf: xxhash64 seeds + Bernoulli sample are Spark-specific →
    // rows-only; x_sim_ivf_md5 below hash-gates the same pipeline with
    // engine-portable arithmetic. The oracle unrolls the 2-iteration
    // Lloyd fit as CTEs: every step (md5 seed draw, cosine argmax
    // assignment, exact scaled-integer means) mirrors the Spark side
    // bit-for-bit.
    "x_sim_ivf_md5" -> {
      val dotq = dotSql _
      s"""WITH $portableIvfCtes,
         |probes AS (
         |  SELECT qid, qe, qn, cid FROM (
         |    SELECT q.vec_id qid, q.embedding qe, q.nrm qn, c.cid,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${dotq("q.embedding", "c.ce")} / (q.nrm * c.cn) DESC, c.cid ASC) rn
         |    FROM e q CROSS JOIN c2 c WHERE q.vec_id < 10) WHERE rn <= 4),
         |scored AS (
         |  SELECT p.qid, t.vec_id, ${dotq("p.qe", "t.embedding")} / (p.qn * t.nrm) AS cos
         |  FROM probes p JOIN asgf t ON p.cid = t.cid AND p.qid != t.vec_id),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id ASC) rank
         |  FROM scored)
         |SELECT qid, CAST(rank AS BIGINT) AS rank, vec_id, cos
         |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin
    },

    "x_sim_quantize" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings WHERE vec_id < 100),
        |sc AS (
        |  SELECT vec_id, embedding,
        |    CASE WHEN mx > 0 THEN 127.0 / mx ELSE 0.0 END AS qscale
        |  FROM m)
        |SELECT vec_id,
        |  CAST(unnest(generate_series(1, len(embedding))) - 1 AS BIGINT) AS pos,
        |  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * qscale + 0.5) AS BIGINT) AS q,
        |  qscale
        |FROM sc ORDER BY vec_id, pos""".stripMargin
  )
}

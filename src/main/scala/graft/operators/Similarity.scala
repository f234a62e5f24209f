package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Native

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (64-dim `Array[Float]`, 10-way `label` partitioning) — the north-star
  * similarity-search component.
  *
  * Two paths, per the brief:
  *  - [[cosineTopK]] — brute-force cosine top-k: the exact baseline. Query
  *    set is broadcast; the corpus is scanned ONCE with norms precomputed
  *    per row; ranking is a per-query window. Cost O(|Q|·N·d) — correct at
  *    any scale where |Q| is small, and embarrassingly parallel (no shuffle
  *    of the corpus, only of the top candidates).
  *  - [[ivfTopK]] — the scale path: IVF-style partition pruning. Vectors are
  *    coarsely clustered (here the table's own `label` plays the centroid
  *    assignment); a query probes ONLY its own cluster (nprobe=1), cutting
  *    scanned rows by the cluster fan-out. On a real lake the table would be
  *    partitioned/bucketed by the cluster id so probing is a partition-pruned
  *    scan, not a filter.
  *
  * All arithmetic is double (floats are cast up LOSSLESSLY), accumulated
  * sequentially via the `aggregate` higher-order function — bit-identical to
  * the DuckDB oracle's `list_reduce` left-fold, which is what makes an
  * IEEE-float query hash-comparable across engines. No UDFs.
  */
object Similarity {

  /** The query set: a FIXED literal ID list (≤ 20 vectors at every SF).
    *
    * Round-2 verdict finding: the previous definition (`vec_id % 50 == 0`)
    * was 2% OF THE CORPUS — scale-proportional, so `broadcast(q)` meant
    * shipping ~20M vectors at a 1e9-row corpus (driver/executor OOM), the
    * same class of bug as round 1's `broadcast(customer)`. A literal ID
    * list is what a real ANN query actually is: K externally-chosen probe
    * vectors, constant in corpus size. With |Q| bounded, broadcasting the
    * query side is the CORRECT plan at any scale (the corpus never
    * shuffles; each scan task gets the 20 queries). PlanSpec asserts the
    * broadcast side carries the pushed `In(vec_id, ...)` filter. */
  val QueryIds: Seq[Long] = (0L to 950L by 50L)
  private def isQuery: Column = col("vec_id").isin(QueryIds: _*)
  private val queryIdsSql: String = QueryIds.mkString("(", ", ", ")")

  /** Elementwise-double view of the embedding + its L2 norm, computed once
    * per row (not once per pair). */
  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** Sequential-fold dot product — the native kernel; same fold order as
    * `aggregate(zip_with(...))` and the oracle's `list_reduce`, so float
    * results stay bit-identical (NativeSpec asserts it). */
  private def dot(a: Column, b: Column): Column =
    graft.functions.Native.dotProduct(a, b)

  /** Micro-units similarity: floor(sim*1e6 + 0.5) — same literal IEEE ops as
    * the oracle, so equality is exact. */
  private def simMicro(c: Column): Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast("long")

  private def rankTopK(pairs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sim").desc, col("n_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), simMicro(col("sim"))
        .as("sim_micro"))
      .orderBy(col("q_id"), col("rank"))
  }

  // ── q23: brute-force cosine top-k (exact baseline) ──────────────────────
  /** Core of the brute-force scan over an already-normalized corpus frame
    * `(vec_id, label, v, nrm)` — factored out so the recall spec can drive
    * the SAME operator over a constructed corpus (ground truth for the
    * IVF recall gate). */
  private[graft] def bruteTopK(e: DataFrame, k: Int): DataFrame = {
    val q = e.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
              col("nrm").as("qn"))
    val pairs = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    rankTopK(pairs, k)
  }

  def cosineTopK(s: SparkSession, d: String): DataFrame =
    bruteTopK(withNorm(Tables.embeddings(s, d)), 10)

  private val normedSql: String =
    """n AS (
      |  SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |      (a, b) -> a + b)) AS nrm
      |  FROM embeddings)""".stripMargin

  /** DuckDB dot product with the same left-fold order as Spark's
    * `aggregate(..., 0.0, _+_)`: prepend the 0.0 init so the reduction
    * sequence is identical (0+x1)+x2+… */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(range(1, 65), i -> $a[i] * $b[i])), (x, y) -> x + y)""".stripMargin

  val cosineTopKSql: String =
    s"""WITH $normedSql,
       |pairs AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
       |    ${dotSql("q.v", "e.v")} / (q.nrm * e.nrm) AS sim
       |  FROM n q JOIN n e ON q.vec_id IN $queryIdsSql AND e.vec_id <> q.vec_id)
       |SELECT q_id, rank, n_id, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
       |      FROM pairs)
       |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  // ── q24: IVF-style partition-pruned top-k (nprobe=1) ────────────────────
  /** Probes only the query's own coarse cluster: the equi-join on `label`
    * replaces the cross join, so each corpus row is compared against only
    * the queries that landed in its cluster — at 1000 clusters that is
    * ~0.1% of the brute-force work, the IVF trade (exactness within the
    * probed cluster, recall loss only across cluster boundaries). */
  def ivfTopK(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val q = e.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
              col("v").as("qv"), col("nrm").as("qn"))
    val pairs = e.join(broadcast(q),
        col("label") === col("q_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    rankTopK(pairs, 5)
  }
  val ivfTopKSql: String =
    s"""WITH $normedSql,
       |pairs AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
       |    ${dotSql("q.v", "e.v")} / (q.nrm * e.nrm) AS sim
       |  FROM n q JOIN n e ON q.vec_id IN $queryIdsSql AND e.label = q.label
       |                    AND e.vec_id <> q.vec_id)
       |SELECT q_id, rank, n_id, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
       |      FROM pairs)
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ── q81: metadata-filtered vector search (pre-filter, then exact) ───────
  /** Filtered ANN — "find the 5 nearest ENGLISH documents": top-k cosine
    * restricted to corpus vectors whose document row satisfies a metadata
    * predicate (`lang = 'en'`, joined on `vec_id = doc_id`). The design
    * point is PRE-filtering: the predicate lands on the corpus BEFORE any
    * dot product, as a semi-join standing in for the pushed-down scan
    * predicate it would be on a lake where metadata and vectors share a
    * row (post-filtering a top-k instead silently returns < k results
    * whenever the filter eats a neighborhood — the classic filtered-ANN
    * failure).
    *
    * Scale shape: the metadata side never carries vectors (doc_id +
    * pushed `lang` filter only, column-pruned at the scan), the semi-join
    * co-partitions on the id, and the query set stays the one broadcast —
    * the corpus still never shuffles its embeddings. Queries are NOT
    * filtered: probes come from outside the predicate's world, as in a
    * real retrieval API. */
  def filteredTopK(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val keys = Tables.documents(s, d)
      .filter(col("lang") === "en")
      .select(col("doc_id").as("vec_id"))
    val q = e.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
              col("nrm").as("qn"))
    val pairs = e.join(keys, Seq("vec_id"), "left_semi")
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    rankTopK(pairs, 5)
  }
  val filteredTopKSql: String =
    s"""WITH $normedSql,
       |f AS (
       |  SELECT n.vec_id AS vec_id, n.v AS v, n.nrm AS nrm
       |  FROM n JOIN documents d ON n.vec_id = d.doc_id
       |  WHERE d.lang = 'en'),
       |pairs AS (
       |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
       |    ${dotSql("q.v", "e.v")} / (q.nrm * e.nrm) AS sim
       |  FROM n q JOIN f e ON q.vec_id IN $queryIdsSql AND e.vec_id <> q.vec_id)
       |SELECT q_id, rank, n_id, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
       |      FROM pairs)
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  // ── q35: embedding-cosine near-dup via random-hyperplane LSH ────────────
  /** Fixed pseudo-random hyperplanes (Knuth-hash doubles in [-0.5, 0.5)).
    * The sketch is computed by the fused native `sign_sketch_bands` kernel
    * ([[graft.functions.Native.signSketchBands]]), which derives exactly
    * these values inline; this generator remains as the executable spec —
    * NativeSpec asserts the fused kernels match a literal-array
    * reconstruction built from it, sign for sign. */
  private[graft] def hyperplane(j: Int): Seq[Double] =
    (0 until 64).map(i =>
      (((j.toLong * 64 + i) * 2654435761L) % 1000L) / 1000.0 - 0.5)

  // private[graft]: NearDupRecallSpec reconstructs the sketch from the
  // same constants so the geometry can't silently drift from its spec
  private[graft] val SketchBits = 120
  private[graft] val NChunks    = 5
  private val ChunkBits  = SketchBits / NChunks // 5 × 24-bit chunks

  /** Near-duplicate vectors by cosine, found through a sign-bit sketch:
    * bit j = sign(v·h_j) over [[SketchBits]] fixed hyperplanes; the sketch
    * is split into [[NChunks]] disjoint [[ChunkBits]]-bit chunks
    * (pigeonhole banding); vectors sharing ANY chunk become candidates
    * (bucketed join — never all-pairs), then candidates are verified with
    * exact cosine >= 0.999.
    *
    * Geometry is the scale knob, and BOTH axes matter (r2 verdict, r5
    * sf1 ladder, r5 advice, r8 sf10 ladder):
    *  - CHUNK WIDTH bounds random collisions: NChunks/2^ChunkBits per
    *    pair, so candidates grow quadratically in corpus size and the
    *    bucket count must scale ahead of N². 8-bit chunks (256 buckets)
    *    died at sf0.01; 15-bit were fine to sf0.1 but BENCH_sf1 measured
    *    q35 at 20× the sf0.1 time on 10× the data (~30M random candidate
    *    pairs at a 22k corpus). 20-bit chunks (1M buckets) cut that 42×,
    *    then hit the same wall one decade up: the r8 sf10 spot-bench
    *    (1M-vector corpus) measured 22× on 10× the data — ~2M random
    *    collisions at 4/2^20 per pair, right on the law's prediction.
    *  - CHUNK COUNT bounds false negatives: NChunks disjoint chunks
    *    guarantee a shared chunk whenever Hamming(sketch) ≤ NChunks−1 —
    *    and the needed budget GROWS with the sketch: a genuine
    *    0.999-cosine pair flips each bit with probability
    *    arccos(0.999)/π ≈ 1.4%, i.e. ~SketchBits/70 expected flips, so
    *    widening chunks without adding one risks exactly the silent
    *    Hamming-tail drop the r5 3×20 interim shipped.
    * Current 5×24 geometry (r8): 16.8M buckets/band cuts sf10's random
    * collisions ~13×, and the 5th chunk raises the guarantee to
    * Hamming ≤ 4, covering the ~1.7 expected flips over 120 bits with
    * the same margin the 80-bit/4-chunk shape had. The fused
    * [[graft.functions.Native.signSketchBands]] kernel emits band structs
    * directly (no 63-bit Long cap), so the next decade is the same move
    * again: grow ChunkBits ahead of N², add a chunk when expected flips
    * approach the budget.
    *
    * Round 9 (sf100 ladder) found the SECOND collision regime, the one
    * geometry cannot touch: sub-threshold near-dup FAMILIES (perturbed
    * replicas here; boilerplate/template embeddings in production) sit at
    * small sketch Hamming — [[graft.tools.LshDiag]] measured the family
    * distribution centered at ~5 flips ≈ cosine 0.99, INSIDE the
    * pigeonhole band that recall requires — so every family pair is a
    * candidate at any chunk width, and candidate count grows with the
    * square of family size while true output stays linear. The fix is
    * not fewer candidates (information-theoretically impossible for a
    * sketch-based generator honoring the Hamming ≤ NChunks−1 contract)
    * but a candidate set that never MATERIALIZES: see the inline-verify
    * note in [[nearDupPairs]].
    *
    * The harness embeddings have no natural near-dups (all pairs < 0.8),
    * so every vec_id % 25 == 0 gains a SCALED twin (×1.0001, id+100000) —
    * same direction ⇒ identical sign sketch ⇒ candidate with NO LSH
    * false-negative risk, the property that makes the exact oracle safe.
    * Angular near-dups would carry the usual LSH miss probability — that
    * trade (recall vs candidate count) is tuned via bits-per-chunk. */
  def cosineNearDup(s: SparkSession, d: String): DataFrame = {
    val base = Tables.embeddings(s, d)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    nearDupPairs(base.unionByName(
      base.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          transform(col("v"), x => x * 1.0001).as("v"))))
  }

  /** Core of the sketch-bucketed near-dup scan over a `(vec_id, v)` corpus
    * frame — factored out so NearDupRecallSpec can drive the SAME operator
    * over a corpus with ORGANIC near-dup pairs (sketches differing in 1–3
    * bits), the false-negative scenario the 4-chunk geometry exists for
    * (r5 advice, medium). */
  private[graft] def nearDupPairs(corpus0: DataFrame): DataFrame = {
    val corpus = corpus0
      // coalesce: same nullability launder as the sketch below — without
      // it the verify join's sim predicate infers isnotnull(nrm) and
      // pushes a Filter that re-inlines a SECOND 64-mult dot_product per
      // row below this Project. The 0.0 arm never fires (embedding is
      // null-filtered; a null element nulls the sim numerator anyway).
      .withColumn("nrm", coalesce(sqrt(dot(col("v"), col("v"))), lit(0.0)))
    // fused native sketch→bands: ONE generator expression, so explode
    // evaluates the kernel once per row (the per-bit literal-hyperplane
    // form built a ~4000-node tree whose planning + codegen compilation
    // alone cost ~1.2 s/run, r4; the array(struct(..sketch..)×4) form
    // inlined the sketch subtree into the generator 4×, and a separate
    // nullable sketch COLUMN invited isnotnull constraint pushdown to
    // re-inline it into per-branch Filters — both PlanSpec-pinned).
    // Null semantics: a null-element vector yields a null band array and
    // explode drops the row — same observable outcome as before (its
    // verify-stage cosine was null → filtered, like the oracle's
    // null-sim drop), and base is already null-vector-filtered.
    val chunks = corpus.select(col("vec_id"), col("v"), col("nrm"),
        explode(Native.signSketchBands(col("v"), SketchBits, NChunks)).as("ch"))
      .select(col("vec_id"), col("v"), col("nrm"),
        col("ch.band").as("chunk"), col("ch.bh").as("cv"))
    // Exact verify INLINE at band-match time (r9 — the sf100 ladder's
    // second catch): the previous shape materialized the candidate-pair
    // set (distinct, then two id-joins re-attaching vectors) — payload
    // O(candidates)·|v|, and candidates are what sub-threshold near-dup
    // FAMILIES grow quadratically (LshDiag at sf1: 376k band matches
    // centered at Hamming ~5, i.e. perturbed-replica pairs INSIDE the
    // pigeonhole band no geometry can exclude — at sf100 the rerank
    // joins spilled the disk past 60 GB before failing). Here each band
    // row carries its vector ONCE — payload O(N·NChunks)·|v| — and every
    // match streams through the exact cosine filter with no pair ever
    // hitting disk; only the (linear) survivors are deduped. Output set
    // IDENTICAL: the same pairs meet, the same exact predicate decides,
    // duplicates (a pair sharing ≤NChunks bands) collapse on the
    // deterministic (a_id, b_id, sim_micro) triple — at the contracted
    // price of re-verifying a surviving pair once per shared band.
    val matches = chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cv") === col("y.cv") &&
        col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"),
        (dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")))
          .as("sim"))
      .filter(col("sim") >= 0.999)
    matches.select(col("a_id"), col("b_id"), simMicro(col("sim"))
        .as("sim_micro"))
      .distinct()
      .orderBy(col("a_id"), col("b_id"))
  }
  val cosineNearDupSql: String =
    s"""WITH base AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |corpus AS (
       |  SELECT * FROM base
       |  UNION ALL
       |  SELECT vec_id + 100000, list_transform(v, x -> x * 1.0001)
       |  FROM base WHERE vec_id % 25 = 0),
       |n AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
       |  FROM corpus),
       |pairs AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    ${dotSql("a.v", "b.v")} / (a.nrm * b.nrm) AS sim
       |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
       |SELECT a_id, b_id, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
       |FROM pairs WHERE sim >= 0.999
       |ORDER BY a_id, b_id""".stripMargin

  // ── q38: IVF with COMPUTED centroids (coarse quantizer from the data) ───
  /** Full IVF shape: train the coarse quantizer (per-cluster centroid),
    * assign each query to its nearest centroid, probe that cluster only.
    *
    * Determinism trick that makes float centroids oracle-exact: per-dim
    * components are quantized to integers (floor(x*1000+0.5)) BEFORE the
    * per-cluster sum, so the sum is order-independent (integer addition
    * commutes; float summation would depend on shuffle order), and the
    * centroid is the exact double sum/n. Assignment = argmin L2 with
    * (dist, label) tie-break; probe = cosine top-5 within the cluster.
    *
    * Scale: centroid training is one posexplode + two partial-aggregated
    * shuffles of (cluster, dim) pairs; assignment is a broadcast of the
    * tiny centroid table; the probe joins each query against one cluster
    * — the IVF pruning that replaces the full-corpus scan. */
  /** Core of the computed-centroid IVF probe over an already-normalized
    * corpus frame `(vec_id, label, v, nrm)`. `nprobe` is the recall knob:
    * each query scans its `nprobe` nearest clusters instead of one —
    * multi-probe is the standard fix for the single-probe recall cliff
    * (a query near a cluster boundary finds its cross-boundary neighbors
    * in probe 2+). Cost scales linearly: nprobe/nlist of the corpus per
    * query. IvfRecallSpec measures recall@k against [[bruteTopK]] ground
    * truth on a clustered corpus with deliberate boundary queries. */
  private[graft] def ivfCentroidProbe(e: DataFrame, nprobe: Int, k: Int)
      : DataFrame =
    ivfProbeWith(e, trainCentroids(e), nprobe, k)

  /** Coarse-quantizer training half, factored out so the amortized q86
    * can materialize it: per-cluster exact centroid over integer-quantized
    * components (the determinism trick above). One posexplode + two
    * partial-aggregated shuffles of (cluster, dim) longs; output is
    * nlist rows of (label, cv) — the entire model. */
  private[graft] def trainCentroids(e: DataFrame): DataFrame = {
    val perDim = e.select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .withColumn("qx", floor(col("x") * 1000.0 + lit(0.5)).cast("long"))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("qx")).as("sx"), count(lit(1)).as("n"))
    perDim.groupBy(col("label"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          (col("sx").cast("double") / lit(1000.0) / col("n").cast("double"))
            .as("c")))),
        s => s.getField("c")).as("cv"))
  }

  /** Assignment + probe half against a GIVEN centroid table (trained
    * in-query by q38/q59, read from the materialized warehouse index by
    * q86). */
  private[graft] def ivfProbeWith(e: DataFrame, cents: DataFrame,
                                  nprobe: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = e.filter(isQuery)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
              col("nrm").as("qn"))
    val l2 = aggregate(
      zip_with(col("qv"), col("cv"), (x, c) => (x - c) * (x - c)),
      lit(0.0), (a, x) => a + x)
    val wAssign = Window.partitionBy(col("q_id"))
      .orderBy(col("dist").asc, col("label").asc)
    val assigned = q.crossJoin(broadcast(cents))
      .withColumn("dist", l2)
      .withColumn("arank", row_number().over(wAssign))
      .filter(col("arank") <= nprobe)
      .select(col("q_id"), col("qv"), col("qn"),
              col("label").as("probe_label"))
    val pairs = e.join(broadcast(assigned),
        col("label") === col("probe_label") && col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    rankTopK(pairs, k)
  }

  def ivfCentroidTopK(s: SparkSession, d: String): DataFrame =
    ivfCentroidProbe(withNorm(Tables.embeddings(s, d)), nprobe = 1, k = 5)

  // ── q86: IVF through a MATERIALIZED centroid index — the serving path ──
  /** q38's amortized form, completing the q82 story for the ANN family:
    * the coarse quantizer is a pure function of the standing corpus, so
    * it is trained ONCE into the session warehouse (crash-safe
    * writeAndSwap, path-keyed) and every subsequent query batch pays
    * only assignment (a broadcast of nlist centroid rows) + the
    * single-cluster probe. The training pass — a posexplode over every
    * corpus vector × dimension, BY FAR the dominant cost at scale — is
    * gone from the steady state, exactly like q82's corpus-linear prefix
    * work moving into its one-time index. Same oracle as q38: reading
    * the model from parquet instead of recomputing it must not change a
    * single row. */
  def ivfIndexedTopK(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val tag = Tables.datasetTag(s, d, "embeddings") // stale-proof key
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val cents = graft.etl.Merge.materialize(s, s"$wh/graft_ivf_cents_$tag",
      trainCentroids(e))
    ivfProbeWith(e, cents, nprobe = 1, k = 5)
  }

  // ── q89: centroid drift statistic — the q86 refresh decision ────────────
  /** Mean distance-to-assigned-centroid of an incoming vector batch vs
    * the standing corpus, under a model FROZEN on the corpus — the
    * refresh-decision statistic for the materialized q86 quantizer
    * (VERDICT r10 item 1b). The split is the q42 portable-hash carve
    * (vec_id bucket < 90 = standing corpus, ≥ 90 = incoming batch) so
    * both engines see the identical sides; centroids train on the CORPUS
    * side only and land as their own warehouse artifact (the held-out
    * model a drift test needs — q86's all-corpus artifact would leak the
    * batch into its own baseline). Interpretation: batch mean tracking
    * corpus mean = the frozen quantizer still fits arriving data; batch
    * mean pulling away = embedding drift, and the refresh is an artifact
    * delete away (datasetTag re-keys on any source regeneration).
    *
    * Determinism: per-vector distance uses the same quantized-centroid +
    * sequential-fold arithmetic as q38/q86 (bit-identical cross-engine,
    * proven by those gates), floored to integer micros PER VECTOR before
    * the mean, which is integer sum-div-count — no float aggregation
    * order anywhere. Scale shape: nlist centroid rows broadcast;
    * assignment is map-side; ONE partial-agg'd two-row aggregate. The
    * corpus×dim posexplode runs only at model build, exactly like q86. */
  /** Nearest-centroid assignment with integer-micros distance: for each
    * input vector (any passthrough columns + `vec_id`, `v`), the L2
    * distance to its argmin centroid — (dist, label) tie-break, floored
    * to micros per vector, the q38/q86 determinism arithmetic. Broadcast
    * of the nlist-row model; map-side otherwise. Shared by the q89 drift
    * statistic and [[refreshIfDrifted]]. */
  private def nearestDistMicro(vecs: DataFrame, cents: DataFrame)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l2 = aggregate(
      zip_with(col("v"), col("cv"), (x, c) => (x - c) * (x - c)),
      lit(0.0), (a, x) => a + x)
    vecs.crossJoin(broadcast(cents.select(col("label").as("c_label"),
        col("cv"))))
      .withColumn("dist", l2)
      .withColumn("arank", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(col("dist").asc, col("c_label").asc)))
      .filter(col("arank") === 1)
      .withColumn("dist_micro",
        floor(col("dist") * lit(1000000.0) + lit(0.5)).cast("long"))
      .drop("arank", "dist", "cv", "c_label")
  }

  def centroidDrift(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
      .withColumn("bucket", pmod(graft.functions.Text.portableHash(
        col("vec_id").cast("string")), lit(100L)))
    val tag = Tables.datasetTag(s, d, "embeddings")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val cents = graft.etl.Merge.materialize(s,
      s"$wh/graft_ivf_cents_c90_$tag",
      trainCentroids(e.filter(col("bucket") < 90)
        .select(col("label"), col("v"))))
    nearestDistMicro(e.select(col("vec_id"), col("bucket"), col("v")), cents)
      .groupBy(when(col("bucket") >= 90, lit("batch")).otherwise(lit("corpus"))
        .as("side"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(dist_micro) div count(1)").as("mean_dist_micro"))
      .orderBy(col("side"))
  }

  /** Drift-triggered REFRESH — the ACTION half of the q89 decision,
    * closing the materialized-model lifecycle (build: q86 → drift
    * statistic: q89 → refresh: this, mirroring the q82 index's
    * append/compact pair). Computes the q89 statistic under the FROZEN
    * model at `modelPath` (building it from `corpus` if absent); when the
    * batch's mean distance-to-assigned-centroid exceeds the corpus's by
    * more than `maxDriftBp` basis points, the quantizer retrains on
    * corpus ∪ batch and REPLACES the artifact through the crash-safe
    * [[graft.etl.Merge.writeAndSwap]] — an in-flight reader keeps the old
    * generation (its plan holds the old file listing), the next read
    * picks up the new model. Returns whether a refresh happened. The
    * decision arithmetic is the integer-micros / basis-points convention,
    * so it is deterministic across runs and engines; IvfRecallSpec drives
    * both branches (an in-distribution batch refreshes nothing, a shifted
    * batch triggers and the refreshed artifact equals a from-scratch
    * train on the union, byte-for-byte through the probe).
    *
    * Scale: the decision costs one broadcast assignment over corpus ∪
    * batch and a one-row aggregate per side (the q89 shape — no shuffle
    * of vectors); the retrain is the one-time q86 build cost, paid on
    * drift EVENTS, not query traffic. */
  def refreshIfDrifted(s: SparkSession, modelPath: String, corpus: DataFrame,
                       batch: DataFrame, maxDriftBp: Long = 2000L): Boolean = {
    val cents = graft.etl.Merge.materialize(s, modelPath,
      trainCentroids(corpus.select(col("label"), col("v"))))
    def meanMicro(vecs: DataFrame): Long =
      nearestDistMicro(vecs.select(col("vec_id"), col("v")), cents)
        .agg(expr("sum(dist_micro) div count(1)")).head.getLong(0)
    val drifted =
      meanMicro(batch) * 10000L > meanMicro(corpus) * (10000L + maxDriftBp)
    if (drifted)
      graft.etl.Merge.writeAndSwap(
        trainCentroids(corpus.select(col("label"), col("v"))
          .unionByName(batch.select(col("label"), col("v")))),
        modelPath, "refresh")
    drifted
  }

  /** Oracle: corpus-side quantized centroids, full-table assignment,
    * per-side integer mean. */
  val centroidDriftSql: String =
    s"""WITH $normedSql,
       |b AS (
       |  SELECT vec_id, label, v,
       |    CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
       |  FROM n),
       |perdim AS (
       |  SELECT label, i AS pos, CAST(floor(v[i + 1] * 1000.0 + 0.5) AS BIGINT) AS qx
       |  FROM b, range(0, 64) t(i) WHERE bucket < 90),
       |cents AS (
       |  SELECT label, list(c ORDER BY pos) AS cv FROM (
       |    SELECT label, pos,
       |      CAST(sum(qx) AS DOUBLE) / 1000.0 / CAST(count(*) AS DOUBLE) AS c
       |    FROM perdim GROUP BY label, pos)
       |  GROUP BY label),
       |ass AS (
       |  SELECT vec_id, bucket, dist, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY dist ASC, label ASC) AS arank
       |  FROM (
       |    SELECT e.vec_id, e.bucket, c.label,
       |      list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |        list_transform(range(1, 65),
       |          i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))),
       |        (a, b) -> a + b) AS dist
       |    FROM b e, cents c))
       |SELECT CASE WHEN bucket >= 90 THEN 'batch' ELSE 'corpus' END AS side,
       |  CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(sum(CAST(floor(dist * 1000000.0 + 0.5) AS BIGINT)) // count(*) AS BIGINT) AS mean_dist_micro
       |FROM ass WHERE arank = 1
       |GROUP BY 1 ORDER BY side""".stripMargin

  // ── q90: SEMANTIC dedup — centroid-bucketed within-cluster cosine ───────
  /** The missing member of the dedup ladder (exact q17 → chunk q77 →
    * lexical near-dup q18/q68 → SEMANTIC), SemDeDup-style: duplicates
    * that share no n-gram — paraphrases, translations-of-boilerplate,
    * re-embedded templates — surface only in embedding space. All-pairs
    * cosine over a corpus is O(N²·d) and never runs at scale; SemDeDup's
    * move is to let a COARSE QUANTIZER bound the candidate set: assign
    * every vector to its nearest centroid, compare only within a
    * cluster. This composes two shipped components: the q86 materialized
    * centroid artifact (the SAME warehouse path — semantic dedup and ANN
    * serving share one model build) and q80's keep-the-minimal-member
    * election philosophy.
    *
    * Drop rule, declarative on purpose: vector v is dropped iff some
    * EARLIER vector u (u.vec_id < v.vec_id) in the same cluster has
    * cosine ≥ 0.95; the reported witness is the lowest-id such u. This
    * is the order-free closure of SemDeDup's greedy scan — on a chain
    * a~b, b~c, a≁c greedy keeps c (its only kept earlier neighbor a is
    * below τ) while this rule drops it (b witnesses, though b itself
    * dropped) — i.e. it dedups slightly more aggressively on chain
    * structures, the same min-label transitive stance as q63/q80, and
    * unlike the greedy scan it needs no sequential pass over the
    * cluster. The harness embeddings carry no organic high-cosine pairs
    * (measured max pairwise cosine ≈ 0.51 at sf0.01), so the corpus is
    * augmented with PLANTED semantic duplicates exactly as q35 does —
    * every 25th vector re-enters scaled by 1.0001 (direction-identical,
    * cosine ≈ 1) under id+100000 — and 0.95 sits between those and the
    * random-pair tail; the planted copies land in their original's
    * cluster (same direction ⇒ same nearest centroid) and must each be
    * dropped with their original as witness, which the oracle verifies
    * pair-exactly.
    *
    * Scale shape: nlist centroid rows broadcast → assignment is
    * map-side; the pairwise stage is an EQUI-join on (cluster, sketch
    * band) — the r11 ladder caught the bare cluster join's cliff
    * (clusters inherit the data's FIXED 10-way label, so n_c grows with
    * the corpus and Σ_c n_c² turned a 10× decade into 55× time: 2.9 s at
    * sf1 → 161 s at sf10). The fix is q35's inline-verify banding INSIDE
    * the cluster: each side fans out to its [[NChunks]] sign-sketch band
    * rows (vector + norm riding along — no candidate-pair
    * materialization, q35's r9 lesson) and only band collisions reach
    * the exact cosine, so candidate work is band-bucket-bounded instead
    * of cluster-quadratic. Measured: sf1 2.9 → 1.8 s, sf10 161 →
    * 4.0 s. The trade is RECALL AT THE BOUNDARY, stated with its
    * measured size: the ladder corpus's ScaleUp-perturbed replicas are
    * near-τ pairs by construction (cosine 0.95–0.99, sketch Hamming
    * ~4–10 over 120 bits), and 5×24-bit banding misses the
    * high-Hamming tail of them — drop rows 16762 → 10588 at sf1
    * (−37%), 201309 → 171769 at sf10 (−15%).
    * Direction-identical duplicates — the class semantic dedup actually
    * hunts (re-encodes, scaled/quantized copies; cosine ≈ 1, Hamming 0)
    * — are caught with ZERO miss risk, which is also what keeps the
    * brute-force oracle exact on gate data (organic harness pairs all
    * sit < 0.8; planted ×1.0001 copies sketch identically). The
    * recall-preserving production fix at 100 TB is not banding but
    * QUANTIZER GRANULARITY — SemDeDup's own answer: cluster count
    * scaling with the corpus (k ∝ N, hierarchically assigned), which
    * keeps within-cluster exact compare LINEAR (C·N) and which the
    * materialized-model plumbing here (datasetTag keying,
    * Merge.materialize) already supports; the fixed 10-way toy quantizer
    * is the harness's, not the operator family's. The cluster key still
    * rides the join: SemDeDup's semantics — only same-cluster pairs
    * compare — are preserved exactly, banding only PRUNES within the
    * cluster. Never a CartesianProduct (PlanSpec pins it); the witness
    * election is ONE window over the drop candidates. */
  val SemDedupTauMicro = 950000L

  def semanticDedup(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = withNorm(Tables.embeddings(s, d))
    val tag = Tables.datasetTag(s, d, "embeddings")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val cents = graft.etl.Merge.materialize(s, s"$wh/graft_ivf_cents_$tag",
      trainCentroids(e)) // q86's artifact, shared
    // corpus ∪ planted semantic duplicates (q35's convention; coalesce is
    // q35's nullability launder so the join predicate can't re-inline a
    // second dot_product below the Project)
    val base = Tables.embeddings(s, d).filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val aug = base.unionByName(
        base.filter(col("vec_id") % 25 === 0)
          .select((col("vec_id") + 100000L).as("vec_id"),
            transform(col("v"), x => x * 1.0001).as("v")))
      .withColumn("nrm", coalesce(sqrt(dot(col("v"), col("v"))), lit(0.0)))
    val l2 = aggregate(
      zip_with(col("v"), col("cv"), (x, c) => (x - c) * (x - c)),
      lit(0.0), (a, x) => a + x)
    val wA = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("label").asc)
    val assigned = aug.select(col("vec_id"), col("v"), col("nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("dist", l2)
      .withColumn("arank", row_number().over(wA))
      .filter(col("arank") === 1)
      .select(col("vec_id"), col("label").as("cluster"), col("v"), col("nrm"))
    // fan each assigned vector out to its sign-sketch band rows (vector +
    // norm riding along — q35's no-pair-materialization contract); only
    // same-cluster same-band collisions reach the exact cosine
    val chunks = assigned.select(col("vec_id"), col("cluster"), col("v"),
        col("nrm"),
        explode(Native.signSketchBands(col("v"), SketchBits, NChunks))
          .as("ch"))
      .select(col("vec_id"), col("cluster"), col("v"), col("nrm"),
        col("ch.band").as("chunk"), col("ch.bh").as("cv"))
    val pairs = chunks.as("a").join(chunks.as("b"),
        col("a.cluster") === col("b.cluster") &&
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("drop_id"),
        col("a.cluster").as("cluster"),
        col("a.vec_id").as("keep_id"),
        (dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .as("sim"))
      .filter(simMicro(col("sim")) >= lit(SemDedupTauMicro))
    // a surviving pair repeats once per shared band; row_number over the
    // deterministic (keep_id) order collapses them with the election
    val wD = Window.partitionBy(col("drop_id")).orderBy(col("keep_id").asc)
    pairs.withColumn("wrank", row_number().over(wD))
      .filter(col("wrank") === 1)
      .select(col("drop_id"), col("cluster"), col("keep_id"),
        simMicro(col("sim")).as("sim_micro"))
      .orderBy(col("drop_id"))
  }

  /** Oracle: brute-force within-cluster pairs under the identical
    * quantized-centroid assignment (VERDICT r10 item 2). */
  val semanticDedupSql: String =
    s"""WITH $normedSql,
       |perdim AS (
       |  SELECT label, i AS pos, CAST(floor(v[i + 1] * 1000.0 + 0.5) AS BIGINT) AS qx
       |  FROM n, range(0, 64) t(i)),
       |cents AS (
       |  SELECT label, list(c ORDER BY pos) AS cv FROM (
       |    SELECT label, pos,
       |      CAST(sum(qx) AS DOUBLE) / 1000.0 / CAST(count(*) AS DOUBLE) AS c
       |    FROM perdim GROUP BY label, pos)
       |  GROUP BY label),
       |corpus AS (
       |  SELECT vec_id, v FROM n
       |  UNION ALL
       |  SELECT vec_id + 100000, list_transform(v, x -> x * 1.0001)
       |  FROM n WHERE vec_id % 25 = 0),
       |m AS (
       |  SELECT vec_id, v,
       |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
       |  FROM corpus),
       |ass AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT e.vec_id, c.label AS cluster, row_number() OVER (
       |        PARTITION BY e.vec_id ORDER BY
       |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |          list_transform(range(1, 65),
       |            i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))),
       |          (a, b) -> a + b) ASC, c.label ASC) AS arank
       |    FROM m e, cents c)
       |  WHERE arank = 1),
       |pairs AS (
       |  SELECT bb.vec_id AS drop_id, aa.cluster AS cluster,
       |    aa.vec_id AS keep_id,
       |    CAST(floor(${dotSql("a.v", "b.v")} / (a.nrm * b.nrm)
       |      * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
       |  FROM ass aa JOIN ass bb ON aa.cluster = bb.cluster
       |    AND aa.vec_id < bb.vec_id
       |  JOIN m a ON a.vec_id = aa.vec_id
       |  JOIN m b ON b.vec_id = bb.vec_id)
       |SELECT drop_id, cluster, keep_id, sim_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY drop_id ORDER BY keep_id ASC) AS wrank
       |      FROM pairs WHERE sim_micro >= $SemDedupTauMicro)
       |WHERE wrank = 1 ORDER BY drop_id""".stripMargin

  // ── q59: multi-probe IVF (nprobe = 3) ───────────────────────────────────
  /** Same computed-centroid IVF, probing the query's 3 nearest clusters.
    * On the harness embeddings (labels are NOT cosine clusters — measured:
    * same-label mean cosine ≈ cross-label ≈ 0) label-IVF recall is
    * structurally nprobe/nlist, so the ≥0.95 recall gate lives in
    * IvfRecallSpec over a corpus with real cluster structure; THIS query
    * is the correctness pin — the probe set, per-cluster scan, and global
    * re-rank must match the oracle exactly. */
  def ivfMultiProbeTopK(s: SparkSession, d: String): DataFrame =
    ivfCentroidProbe(withNorm(Tables.embeddings(s, d)), nprobe = 3, k = 5)
  private def ivfCentroidSqlFor(nprobe: Int, k: Int): String =
    s"""WITH $normedSql,
       |perdim AS (
       |  SELECT label, i AS pos, CAST(floor(v[i + 1] * 1000.0 + 0.5) AS BIGINT) AS qx
       |  FROM n, range(0, 64) t(i)),
       |cents AS (
       |  SELECT label, list(c ORDER BY pos) AS cv FROM (
       |    SELECT label, pos,
       |      CAST(sum(qx) AS DOUBLE) / 1000.0 / CAST(count(*) AS DOUBLE) AS c
       |    FROM perdim GROUP BY label, pos)
       |  GROUP BY label),
       |assigned AS (
       |  SELECT q_id, label AS probe_label FROM (
       |    SELECT q.vec_id AS q_id, c.label,
       |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |          list_transform(range(1, 65),
       |            i -> (q.v[i] - c.cv[i]) * (q.v[i] - c.cv[i]))),
       |          (a, b) -> a + b) ASC, c.label ASC) AS arank
       |    FROM n q, cents c WHERE q.vec_id IN $queryIdsSql)
       |  WHERE arank <= $nprobe),
       |pairs AS (
       |  SELECT a.q_id, e.vec_id AS n_id,
       |    ${dotSql("q.v", "e.v")} / (q.nrm * e.nrm) AS sim
       |  FROM assigned a
       |  JOIN n q ON q.vec_id = a.q_id
       |  JOIN n e ON e.label = a.probe_label AND e.vec_id <> a.q_id)
       |SELECT q_id, rank, n_id, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
       |      FROM pairs)
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  val ivfCentroidTopKSql: String = ivfCentroidSqlFor(nprobe = 1, k = 5)
  val ivfMultiProbeTopKSql: String = ivfCentroidSqlFor(nprobe = 3, k = 5)

  // ── q62: LSH-bucketed ANN top-k (sign-sketch buckets + exact rerank) ────
  /** The LSH-bucketed similarity-search path, complementing IVF: corpus
    * and queries sketch into 10 disjoint 8-BIT sign chunks
    * (`sign_sketch_bands(v, 80, 10)`), a query's candidates are the rows
    * sharing ANY chunk (≈ 10/2^8 ≈ 4% of a random corpus, concentrated on
    * angular neighbors), and candidates are exactly reranked to cosine
    * top-5. No training step (vs IVF's centroid fit) and no full scan per
    * query (vs brute force) — the trade is recall tuned by chunk width:
    * NARROW 8-bit chunks here (vs q35's 20-bit) because search wants
    * moderate-cosine neighbors recalled, while near-dup wants only
    * 0.999-pairs and minimal candidates. Scale shape: the bucket join
    * ships (vec_id, chunk, cv) triples, never vectors; the rerank joins
    * fetch vectors for candidate pairs only. The oracle reconstructs the
    * sketch from the same integer hyperplane arithmetic and same fold
    * order, so buckets — and therefore the candidate SET — are
    * bit-identical cross-engine. */
  private val LshSearchBits = 80
  private val LshSearchChunks = 10
  def lshTopK(s: SparkSession, d: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, d))
    val chunks = e.select(col("vec_id"),
        explode(Native.signSketchBands(col("v"), LshSearchBits,
          LshSearchChunks)).as("ch"))
      .select(col("vec_id"), col("ch.band").as("chunk"), col("ch.bh").as("cv"))
    val cand = chunks
      .join(chunks.filter(isQuery)
        .select(col("vec_id").as("q_id"), col("chunk"), col("cv")),
        Seq("chunk", "cv"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    val pairs = cand
      .join(e.select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("q_id"))
      .join(e.select(col("vec_id").as("n_id"), col("v"), col("nrm")),
        Seq("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    rankTopK(pairs, 5)
  }
  val lshTopKSql: String = {
    // the sign of hyperplane j against v, as the oracle-exact fold:
    // h_j[i] = (((j*64 + i) * 2654435761) % 1000) / 1000 - 0.5, i 0-based
    def dotHyper(j: String): String =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |          list_transform(range(1, 65), i -> v[i] *
         |            (CAST((($j * 64 + (i - 1)) * 2654435761) % 1000 AS DOUBLE)
         |              / 1000.0 - 0.5))), (a, b) -> a + b)""".stripMargin
    s"""WITH $normedSql,
       |sk AS (
       |  SELECT vec_id, CAST(t.c AS INT) AS chunk,
       |    CAST(list_sum(list_transform(range(0, 8), p ->
       |      CASE WHEN ${dotHyper("(t.c * 8 + p)")} >= 0
       |        THEN 1 << p ELSE 0 END)) AS BIGINT) AS cv
       |  FROM n, range(0, $LshSearchChunks) t(c)),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS q_id, e.vec_id AS n_id
       |  FROM sk q JOIN sk e ON q.chunk = e.chunk AND q.cv = e.cv
       |  WHERE q.vec_id IN $queryIdsSql AND e.vec_id <> q.vec_id),
       |pairs AS (
       |  SELECT c.q_id, c.n_id,
       |    ${dotSql("q.v", "e.v")} / (q.nrm * e.nrm) AS sim
       |  FROM cand c
       |  JOIN n q ON q.vec_id = c.q_id
       |  JOIN n e ON e.vec_id = c.n_id)
       |SELECT q_id, rank, n_id, CAST(floor(sim * 1000000.0 + 0.5) AS BIGINT) AS sim_micro
       |FROM (SELECT *, row_number() OVER (
       |        PARTITION BY q_id ORDER BY sim DESC, n_id ASC) AS rank
       |      FROM pairs)
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  // ── q39: int8 embedding quantization with error-bound verification ─────
  /** Per-vector symmetric int8 quantization (scale = max|x|/127,
    * q = round-half-up(x/scale)) — the compression step before an ANN
    * index ships to serving. Integer outputs + a boolean reconstruction
    * bound make the float pipeline exactly verifiable. */
  def quantizeInt8(s: SparkSession, d: String): DataFrame = {
    // scale and qarr are staged as columns referenced MANY times — a
    // single-use alias would be CollapseProject-inlined into the
    // per-element lambdas below and array_max would re-run per element
    // (measured 7.3 s -> ~1 s at sf0.1); multi-use non-cheap aliases
    // survive collapse
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("scale",
        array_max(transform(col("v"), x => abs(x))) / 127.0)
      .withColumn("qarr",
        transform(col("v"), x => floor(x / col("scale") + 0.5).cast("long")))
      .select(col("vec_id"),
        floor(col("scale") * 1e9 + lit(0.5)).cast("long").as("scale_nano"),
        aggregate(col("qarr"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("qarr")).as("q_min"),
        array_max(col("qarr")).as("q_max"),
        forall(
          zip_with(col("v"), col("qarr"), (x, qx) =>
            abs(x - qx * col("scale")) <= col("scale") * 0.5 + lit(1e-12)),
          p => p).as("recon_ok"))
      .orderBy(col("vec_id"))
  }
  val quantizeInt8Sql: String =
    """WITH b AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |sc AS (
      |  SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |  FROM b),
      |qq AS (
      |  SELECT vec_id, v, scale,
      |    list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qarr
      |  FROM sc)
      |SELECT vec_id,
      |  CAST(floor(scale * 1000000000.0 + 0.5) AS BIGINT) AS scale_nano,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), qarr), (a, x) -> a + x) AS BIGINT) AS q_sum,
      |  CAST(list_min(qarr) AS BIGINT) AS q_min,
      |  CAST(list_max(qarr) AS BIGINT) AS q_max,
      |  list_reduce(list_prepend(TRUE,
      |    list_transform(range(1, 65),
      |      i -> abs(v[i] - qarr[i] * scale) <= scale * 0.5 + 1e-12)),
      |    (a, x) -> a AND x) AS recon_ok
      |FROM qq ORDER BY vec_id""".stripMargin

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "q23_cosine_topk"   -> (cosineTopK _),
    "q24_ivf_topk"      -> (ivfTopK _),
    "q35_cosine_neardup"-> (cosineNearDup _),
    "q38_ivf_centroids" -> (ivfCentroidTopK _),
    "q86_ivf_indexed"   -> (ivfIndexedTopK _),
    "q89_centroid_drift"-> (centroidDrift _),
    "q90_semantic_dedup"-> (semanticDedup _),
    "q39_quantize_int8" -> (quantizeInt8 _),
    "q59_ivf_multiprobe"-> (ivfMultiProbeTopK _),
    "q62_lsh_topk"      -> (lshTopK _),
    "q81_filtered_topk" -> (filteredTopK _))

  val oracles: Seq[(String, String)] = Seq(
    "q23_cosine_topk"   -> cosineTopKSql,
    "q24_ivf_topk"      -> ivfTopKSql,
    "q35_cosine_neardup"-> cosineNearDupSql,
    "q38_ivf_centroids" -> ivfCentroidTopKSql,
    "q86_ivf_indexed"   -> ivfCentroidTopKSql,
    "q89_centroid_drift"-> centroidDriftSql,
    "q90_semantic_dedup"-> semanticDedupSql,
    "q39_quantize_int8" -> quantizeInt8Sql,
    "q59_ivf_multiprobe"-> ivfMultiProbeTopKSql,
    "q62_lsh_topk"      -> lshTopKSql,
    "q81_filtered_topk" -> filteredTopKSql)
}

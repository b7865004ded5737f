package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Dsl._

/** Sketch-based near-duplicate detection over `documents` — the
  * sub-quadratic 100 TB path next to the exact verifiers (q29 content hash,
  * q36 exact n-gram Jaccard, q42 bag-of-words fingerprint).
  *
  * Both sketches are built on Dsl.h60, the md5-derived 60-bit hash shared
  * bit-for-bit with the DuckDB oracle, so even these "approximate"
  * operators are hash-compared exactly (OracleSql mirrors every constant).
  *
  * Scale posture: signatures are one grouped aggregation over the exploded
  * shingle/token stream (map-side partial aggs); candidate generation is an
  * equi-join on band/block keys — only documents sharing a bucket ever
  * meet, never an O(n²) cartesian. At 100 TB both join keys are
  * high-cardinality and uniform (md5-derived), so the shuffle partitions
  * evenly; skew would only come from degenerate corpora (one shingle
  * everywhere), which the distinct-shingle step bounds.
  */
object Dedup {

  /** MinHash parameters: K independent permutations approximated by
    * h_i(x) = (a_i·x + b_i) mod P over the h60 base hash, banded for LSH as
    * Bands × RowsPerBand = K (bands of 4 rows → collision probability
    * s^4 per band; at est-sim 0.5 a true pair survives ≥ 1 of 16 bands with
    * p ≈ 1-(1-0.0625)^16 ≈ 0.64, rising steeply toward 1 for closer pairs —
    * the classic S-curve centered near (1/16)^(1/4) ≈ 0.5). */
  val P = 2147483647L // 2^31 - 1, keeps a_i·hm + b_i < 2^38: exact in both engines
  val K = 64
  val Bands = 16
  val RowsPerBand = 4

  private[graft] def aCoef(i: Int): Long = 2L * i + 1
  private[graft] def bCoef(i: Int): Long = (1000003L * i + 12345L) % P

  /** doc_id → K-component MinHash signature via the native one-pass
    * aggregate. Input: (doc_id, hm) with hm = h60(shingle) % P. */
  private[graft] def signatures(sh: DataFrame): DataFrame =
    sh.groupBy(col("doc_id"))
      .agg(minhashSig(col("hm"),
        (0 until K).map(aCoef), (0 until K).map(bCoef), P).as("sig"))

  /** The COMPOSED signature build — explode the K hash-function indices
    * into rows (cheap generated rows; a doc's shingles never leave their
    * partition, so the partial MIN collapses map-side to docs×K rows),
    * aggregate, reassemble the signature as ONE array sorted by i. Kept as
    * the executable specification of [[signatures]]' native aggregate
    * (ExpressionSpec pins bit-equality). Earlier alternatives measured at
    * sf0.1: K wide MIN aggregates generate a method too large to JIT
    * (~15x slower); K higher-order array_min folds run interpreted (~4x
    * slower); a 64-named-column signature row was execution-equivalent but
    * cost ~12 s of driver-side planning+codegen per run — this array form
    * plans in ~1 s because the expression tree is O(1) in K. */
  private[graft] def signaturesComposed(sh: DataFrame): DataFrame = {
    val hk = sh
      .select(col("doc_id"), col("hm"), explode(sequence(lit(0), lit(K - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        (((lit(2L) * col("i") + lit(1L)) * col("hm") +
          (lit(1000003L) * col("i") + lit(12345L))) % P).as("h"))
    hk.groupBy(col("doc_id"), col("i")).agg(min(col("h")).as("m"))
      .groupBy(col("doc_id"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("m")))),
        x => x("m")).as("sig"))
  }

  /** Banded LSH keys of a (doc_id, sig) signature table: one (doc_id,
    * band_id, bk) row per band, bk = md5 over the band's signature slice.
    * Shared by q34's candidate join and the streaming incremental dedup
    * (s14), so batch and stream bucket identically by construction. */
  private[graft] def bandKeys(sig: DataFrame): DataFrame =
    sig
      .select(col("doc_id"), explode(transform(sequence(lit(0), lit(Bands - 1)),
        k => struct(k.as("band_id"),
          md5(array_join(transform(slice(col("sig"), k * RowsPerBand + 1, lit(RowsPerBand)),
            x => x.cast("string")), ",").cast("binary")).as("bk")))).as("b"))
      .select(col("doc_id"), col("b.band_id").as("band_id"), col("b.bk").as("bk"))

  /** q34: MinHash signature + banded-LSH candidate pairs with estimated
    * Jaccard ≥ 0.5 (estimate = fraction of agreeing signature components;
    * exact rational n/64, so the double compare is engine-stable). q36 is
    * the exact verifier of this operator's output. */
  def q34(spark: SparkSession, sfDir: String): DataFrame =
    minhashStages(spark, sfDir)._2
      .orderBy(col("doc_a"), col("doc_b"))

  /** The two observable stages of the q34 MinHash-LSH pipeline, exposed
    * so q99's evaluation can score each against exact ground truth:
    * `_1` = the band-collision CANDIDATE pairs (pre-verification — what
    * the equi-join emits), `_2` = the REPORTED pairs (est_sim ≥ 0.5,
    * unordered; q34 is exactly this plus its output ORDER BY). */
  private[graft] def minhashStages(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    // Raw (non-distinct) shingle stream (Text.rawShingles — shared with
    // q36, including its one-projection-per-token-array barrier): MIN is
    // duplicate-insensitive, so the signatures don't need the
    // distinct-shingle shuffle q36's exact Jaccard needs — shingles are
    // hashed map-side and the only shuffled payload is (doc_id, long).
    val sh = Text.rawShingles(spark, sfDir)
      .select(col("doc_id"), (h60(col("shingle")) % P).as("hm"))

    // Native one-pass signature build (MinHashSig TypedImperativeAggregate):
    // each shingle row updates all K permutation minima in one Array[Long]
    // buffer — one grouped aggregation with map-side partial buffers, no
    // K-row explode. Proven bit-equal to [[signaturesComposed]] in
    // ExpressionSpec; measured ~2.6x faster at sf0.1 (0.77 s vs 2.0 s warm
    // for the signature subtree, noop sink).
    // aCoef/bCoef stay below 2^27 and hm below 2^31, so every product is
    // exact in signed-64 (bCoef(i) < P for all i < K — no mod needed).
    // NOT pinned (r11): `bands` below is derived from this frame and then
    // SELF-joined, and the signature arrays join back twice more — but
    // every consumer reads it inside ONE action, where the signature
    // aggregation's exchange is canonically identical on each branch and
    // ReuseExchange evaluates it once. The r9 under-match hazard was a
    // LAZY cache observed mid-fill; there is no cache here to observe.
    val sig = signatures(sh)

    // Band keys from array slices — interpreted HOFs, but over docs×Bands
    // rows only (the signature table), never the shingle stream.
    val bands = bandKeys(sig)

    // `reported` nests this candidate join; a caller consuming both
    // stages (q99) still evaluates it once — the distinct's exchange is
    // the reuse point.
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") && col("x.bk") === col("y.bk") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    val sigArr = sig
    val nEqual = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)

    val reported = cand
      .join(sigArr.select(col("doc_id").as("doc_a"), col("sig").as("sa")), Seq("doc_a"))
      .join(sigArr.select(col("doc_id").as("doc_b"), col("sig").as("sb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (nEqual.cast("double") / lit(K.toDouble)).as("est_sim"))
      .filter(col("est_sim") >= 0.5)
    (cand, reported)
  }

  /** q99: dedup-stack evaluation — precision/recall of the MinHash-LSH
    * pipeline's two stages against EXACT ground truth, the dedup
    * analogue of q95's retrieval audit: ground truth is q36's complete
    * exact-Jaccard ≥ 0.5 pair set (complete by the PPJoin pigeonhole),
    * and each stage of q34 — band-collision candidates, then
    * est_sim-verified reported pairs — is scored as (n_pairs, n_truth,
    * tp, fn, ratio4 precision, ratio4 recall). This is the audit that
    * justifies running the sketch INSTEAD of the exact verifier at
    * 100 TB: candidate recall says what banding loses, reported
    * precision says what the estimator hallucinates, and both are
    * all-integer counts until the final ratio4.
    *
    * Scale posture: both stage frames and the truth frame are pair
    * tables (sub-quadratic by their own constructions — banding and
    * prefix filtering); the metrics are left-semi joins on (doc_a,
    * doc_b) + single-row count aggregates cross-joined as broadcasts
    * (the q74 single-row pattern — allowlisted BNLJ). Nothing here adds
    * a corpus-scale stage on top of the audited pipelines; ratios are
    * NULL-guarded for empty denominators in both engines. */
  def q99(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.Dsl.ratio4
    // One action, THREE branches (r12 — down from six): the two stage
    // frames union into a tagged pair stream scored by a single
    // truth-flag outer join + per-stage aggregate (legal because truth,
    // cand, reported are each distinct pair sets, so outer-join + count
    // of matches ≡ the former per-stage semi-join counts), plus the
    // single-row n_truth broadcast (allowlisted BNLJ). The expensive
    // pipelines below — the q36 PPJoin truth build, the band self-join —
    // still deduplicate at their exchanges by ReuseExchange, not by pins
    // (the r9 pins ran the same dedup as serial materialization jobs and
    // cost ~65% on this query, the r10 verdict's headline regression).
    // No lazy cache is involved, so the q104 mid-fill under-match cannot
    // occur. Halving the branch count halves the codegen/JIT surface —
    // the cold-start constant the r11 verdict flagged (4.6 s cold vs a
    // ~3.7 s warm floor on an unchanged plan).
    val (cand, reported) = minhashStages(spark, sfDir)
    val truth = Text.q36(spark, sfDir).select(col("doc_a"), col("doc_b"))
    val tagged = cand.select(lit("candidates").as("stage"), col("doc_a"), col("doc_b"))
      .unionByName(reported.select(lit("reported").as("stage"), col("doc_a"), col("doc_b")))
    val nt = truth.agg(count(lit(1)).as("n_truth"))
    // static stage spine: an empty stage must still report a zero row
    // (the oracle UNION ALLs both stage literals unconditionally — the
    // degenerate empty-corpus fixture relies on it)
    val spine = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row("candidates"),
        org.apache.spark.sql.Row("reported")),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("stage",
          org.apache.spark.sql.types.StringType, nullable = false))))
    spine.join(
        tagged
          .join(truth.withColumn("is_t", lit(1)), Seq("doc_a", "doc_b"), "left_outer")
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("np0"), count(col("is_t")).as("tp0")),
        Seq("stage"), "left_outer")
      .select(col("stage"), coalesce(col("np0"), lit(0L)).as("n_pairs"),
        coalesce(col("tp0"), lit(0L)).as("tp"))
      .crossJoin(broadcast(nt))
      .select(col("stage"), col("n_pairs"), col("n_truth"), col("tp"),
        (col("n_truth") - col("tp")).as("fn"),
        when(col("n_pairs") > 0, ratio4(col("tp"), col("n_pairs")))
          .otherwise(lit(null).cast("double")).as("precision4"),
        when(col("n_truth") > 0, ratio4(col("tp"), col("n_truth")))
          .otherwise(lit(null).cast("double")).as("recall4"))
      .orderBy(col("stage"))
  }

  /** Iteration cap for [[connectedComponents]]: rounds 0 until
    * [[JumpAfterRounds]] are plain one-hop (enough for contracted
    * near-dup graphs); from then on pointer jumping halves the label
    * distance-to-minimum per round on top of the hop, so the remaining
    * 16 − 4 rounds cover components of cross-partition diameter ~2^12 —
    * far beyond any near-dup cluster. A graph deeper than the cap is
    * handed to [[connectedComponentsLss]] — the O(log n) star
    * contraction — rather than ever returning unconverged labels. */
  val MaxCcIters = 16

  /** First round index that pays for the pointer-jumping self-joins —
    * shallow graphs (the production case after partition-local
    * contraction) converge in the plain rounds below this and never pay
    * the jump's overhead; deep graphs switch to log-round convergence
    * from here. */
  val JumpAfterRounds = 4

  /** Connected components of an undirected edge list (u, v) by iterative
    * min-label propagation: every node starts labeled with itself, each
    * round takes the min label over itself and its neighbors, until a
    * fixpoint. Returns (node, label) with label = the component's minimum
    * node id — a deterministic canonical representative.
    *
    * Scale posture: each round is one edge-join shuffle (join on node +
    * grouped MIN) plus one POINTER-JUMPING join on the small (node, label)
    * frame — each node also adopts its label's label, halving its distance
    * to the component minimum, so rounds scale with log(diameter) instead
    * of diameter (q81's diameter-16 cosine graph: 17 rounds + the LSS
    * fallback before, 6 rounds after; labels-only propagation is the
    * classic Pregel CC, the jump is the Shiloach-Vishkin shortcut).
    * `localCheckpoint(eager)` truncates the lineage so round k's plan
    * does not replay rounds 1..k-1 (the classic iterative-algorithm trap:
    * exponentially deep plans). Convergence is detected by the sum of
    * labels — strictly decreasing while any label changes, so equality is
    * exactly the fixpoint — which costs one cheap extra action per round.
    * The sum accumulates in DECIMAL(38,0), not LONG: labels only decrease,
    * but a signed-64 sum could wrap on a large-enough graph and a wrap
    * coincidence would fake the fixpoint one round early. 38 exact digits
    * hold 10^19 max-valued long labels — no physical graph wraps it. */
  /** Partition-local contraction in front of the iterative fixpoint: each
    * partition runs an in-memory union-find over ITS edges and emits the
    * star edges (node → partition-local component min). Connectivity is
    * exactly preserved — the union of per-partition union-find results has
    * the same components as the input — but every within-partition chain
    * collapses to depth 1, so the loop's round count drops from the
    * GRAPH's diameter to the cross-partition diameter (q81's diameter-16
    * cosine graph at sf0.1: 17 rounds + the LSS fallback → 3 rounds).
    * This is the one genuinely per-partition-imperative step in the repo:
    * union-find is O(E·α) in memory and has no declarative equivalent
    * that isn't itself an iterative shuffle. Memory is O(nodes in the
    * partition) — bounded by the same maxPartitionBytes sizing that
    * bounds every other per-partition buffer, no matter how large the
    * total graph grows. Runs on the input's existing partitioning: zero
    * extra shuffles, and any partitioning is correct (the loop merges
    * across partitions); the final labels are the component minima either
    * way, so the output is deterministic even where the partition layout
    * is not. */
  private def contractLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.select(col("u").cast("long"), col("v").cast("long")).as[(Long, Long)]
      .mapPartitions { it =>
        val parent = scala.collection.mutable.LongMap.empty[Long]
        val seen = scala.collection.mutable.LongMap.empty[Unit]
        def find(x0: Long): Long = {
          var r = x0
          while (parent.getOrElse(r, r) != r) r = parent(r)
          var x = x0
          while (parent.getOrElse(x, x) != x) { val nx = parent(x); parent(x) = r; x = nx }
          r
        }
        it.foreach { case (a, b) =>
          seen.update(a, ()); seen.update(b, ())
          val ra = find(a); val rb = find(b)
          if (ra != rb) {
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
        // every seen node emits its star edge, ROOTS INCLUDED as (r, r):
        // a node whose only edge was a self-loop would otherwise vanish
        // from the label universe (the old loop kept it as its own
        // singleton component), and the loop's node set is derived from
        // these edges.
        seen.keysIterator.map(n => (n, find(n)))
      }
      .toDF("u", "v")
  }

  /** `maxIters` defaults to the production cap; the spec overrides it to
    * force the LSS escalation path on a small graph (with pointer jumping
    * a chain would need diameter ~2^MaxCcIters to exhaust the real cap). */
  def connectedComponents(edgesIn: DataFrame, maxIters: Int = MaxCcIters): DataFrame = {
    val pairs = contractLocal(edgesIn.toDF("u", "v"))
    val edges = graft.ops.Dsl.pinIter(
      pairs.union(pairs.select(col("v"), col("u"))).toDF("u", "v"))
    var labels = graft.ops.Dsl.pinIter(
      edges.select(col("u").as("node")).distinct()
        .select(col("node"), col("node").as("label")))
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val r = df.agg(sum(col("label").cast("decimal(38,0)"))).first()
      if (r.isNullAt(0)) java.math.BigDecimal.ZERO else r.getDecimal(0)
    }
    // emptiness must be its own check: a label SUM of zero also happens on
    // non-empty graphs whose node ids sum to zero (e.g. signed ids) — and
    // checking it first skips the aggregate job on the empty path
    var done = labels.isEmpty
    var prev = if (done) java.math.BigDecimal.ZERO else labelSum(labels)
    var iter = 0
    while (!done && iter < maxIters) {
      // pointer jumping (the Shiloach-Vishkin shortcut), fused into the
      // round FROM ROUND JumpAfterRounds ON: each node first adopts its
      // LABEL's label — an INNER self-join, total because every label
      // value is itself a labeled node (the universe is closed under
      // min) — and the one-hop propagation then runs on the jumped
      // frame. The first rounds stay plain one-hop: after the
      // partition-local contraction, real near-dup graphs converge
      // within them (q57/q81 at sf0.1: 3 rounds), and the jump's two
      // extra self-joins per round would be pure overhead there; a graph
      // still unconverged past the threshold is deep, and from then on
      // its label distance halves per round on top of the hop. Labels
      // only ever decrease (label(x) ≤ x, so label(label(n)) ≤
      // label(n)), so the sum-fixpoint test below remains exact under
      // either round shape: an unchanged sum means nothing moved. Only
      // the round's final Aggregate is checkpointed — the jump subtree
      // stays inline, evaluated against the previous round's
      // materialized labels.
      val base =
        if (iter < JumpAfterRounds) labels
        else labels.as("p")
          .join(labels.select(col("node").as("jn"), col("label").as("jl")),
            col("p.label") === col("jn"))
          .select(col("p.node").as("node"), col("jl").as("label"))
      val prop = base.join(edges, col("node") === col("u"))
        .select(col("v").as("node"), col("label"))
        .union(base)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
      // (r17 A/B: fusing the round's two driver jobs — pinIter + the
      // labelSum — into persist() + sum-as-blocking-fill measured WORSE,
      // not better: q57 1.79→2.43 s, q66 1.87→2.32 s, q104 4.07→8.67 s
      // warm2; the un-truncated lineage re-analyzes and the cache scan
      // loses to the checkpoint block read. Checkpoint form kept —
      // consistent with the r10 verdict's checkpoint-vs-cache numbers.)
      // (r18 A/B: TWO hops per materialization — hop(hop(labels)) with
      // iter += 2, semantically exact since labels decrease monotonically
      // so sum(hop²(L)) = sum(L) forces the fixpoint — measured a WASH in
      // interleaved A/B/A/B runs: q57 2.60/2.71 vs 2.36/2.70 warm2 (worse),
      // q104 3.25/3.18 vs 3.14/3.08 (wash), q100 2.14/2.24 vs 2.62/2.62
      // (better). Post-contraction graphs converge in ~3 hops, so the
      // doubled round only trades one checkpoint+sum job pair for a
      // twice-deep analyzed tree; single hop kept.)
      val next = graft.ops.Dsl.pinIter(prop)
      val cur = labelSum(next)
      done = cur.compareTo(prev) == 0
      prev = cur
      labels = next
      iter += 1
    }
    // a graph deeper than the cap (a chain longer than MaxCcIters hops)
    // would exit this loop UNCONVERGED — propagation moves labels one hop
    // per round. Never return silently-wrong labels: hand the pathological
    // shape to the O(log n)-round star contraction instead.
    if (!done) connectedComponentsLss(edgesIn) else labels
  }

  /** q57: dedup cluster resolution — the step after candidate generation
    * that every real dedup pipeline needs: q34's pairwise candidates
    * (est-Jaccard ≥ 0.5) resolved into connected components, so "keep one
    * representative per cluster" becomes a filter on `doc_id = component`.
    * Output: every clustered doc with its component id (= min doc_id in
    * the cluster, a deterministic canonical representative) and the
    * cluster size; ordered by doc_id. Oracle: the same MinHash CTE block
    * q34 uses plus a recursive min-reachability CTE (OracleSql mirrors the
    * semantics, not the algorithm — DuckDB enumerates reachable labels,
    * Spark propagates them; both yield min-of-component). */
  /** Unordered q34 pair table for downstream consumers (q57/q66/q100):
    * connectedComponents doesn't care about order, so skip q34's
    * output-contract ORDER BY and its full sort of the pair table. */
  private[graft] def reportedPairs(spark: SparkSession, sfDir: String): DataFrame =
    minhashStages(spark, sfDir)._2.select(col("doc_a"), col("doc_b"))

  def q57(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    connectedComponents(reportedPairs(spark, sfDir))
      .select(col("node").as("doc_id"), col("label").as("component"))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("component"))))
      .orderBy(col("doc_id"))
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * O(log n)-round alternative to [[connectedComponents]] for graphs with
    * LONG chains (min-label propagation needs one round per hop of the
    * diameter; the star operations contract paths exponentially). Same
    * output contract: (node, label = component minimum). PropertySpec
    * asserts both algorithms against a driver-side union-find on random
    * graphs; q57 stays on min-label because near-dup clusters are shallow
    * and its per-round plan is one shuffle rather than two.
    *
    * Edge list is kept canonically oriented (u > v) and distinct between
    * rounds; each round is large-star then small-star, each ONE grouped
    * MIN + one join on the center node, localCheckpoint-truncated. */
  def connectedComponentsLss(edgesIn: DataFrame): DataFrame = {
    // canonical orientation: (u, v) with u > v, no self-loops, distinct
    var e = graft.ops.Dsl.pinIter(
      edgesIn.toDF("a", "b").filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct())

    // large-star: every center's strictly-larger neighbors attach to the
    // minimum of its closed neighborhood
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v"), col("u"))).toDF("c", "n")
      val m = sym.groupBy(col("c")).agg(least(min(col("n")), col("c")).as("m"))
      sym.join(m, "c").filter(col("n") > col("c"))
        .select(col("n").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    // small-star: every center's smaller neighbors (and the center) attach
    // to the minimum; input is already oriented so Γ⁻(u) = its v's
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      e.join(m, "u").select(col("v").as("a"), col("m").as("b"))
        .union(m.select(col("u").as("a"), col("m").as("b")))
        .filter(col("a") =!= col("b"))
        .select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
        .distinct()
    }

    var done = e.isEmpty
    var iter = 0
    // star contraction halves path lengths per round — 64 rounds covers
    // any graph that fits in storage; if the loop still hasn't converged
    // something is broken, and as the TERMINAL fallback this must fail
    // loudly rather than emit a non-star edge set as labels
    val cap = 64
    while (!done && iter < cap) {
      val next = graft.ops.Dsl.pinIter(smallStar(largeStar(e)))
      done = next.count() == e.count() && next.except(e).isEmpty
      e = next
      iter += 1
    }
    if (!done)
      throw new IllegalStateException(
        s"large-star/small-star did not converge in $cap rounds — non-star fixpoint?")
    // fixpoint is a star forest: every edge points a node at its component
    // minimum; the minima themselves label as their own component
    e.select(col("u").as("node"), col("v").as("label"))
      .union(e.select(col("v").as("node"), col("v").as("label")))
      .distinct()
  }

  /** q66: dedup materialization — the corpus-cleaning decision the whole
    * dedup stack (q34 candidates → q57 clusters) exists to produce: every
    * document with its cluster id (NULL if it near-dups nothing) and a
    * `keep` verdict — unclustered docs and each cluster's canonical
    * representative (min doc_id) are kept, the rest are the dedup loss.
    * Filtering `keep` materializes the training corpus; at 100 TB this is
    * the map-side anti-join every pipeline runs before tokenization. */
  def q66(spark: SparkSession, sfDir: String): DataFrame = {
    val comp = connectedComponents(reportedPairs(spark, sfDir))
      .select(col("node").as("doc_id"), col("label").as("component"))
    graft.tables.Tables.documents(spark, sfDir).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"), col("component"),
        (col("component").isNull || col("component") === col("doc_id")).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** SimHash parameters: 60-bit fingerprints (bits 0..59 of h60 keep every
    * shift inside exact signed-64), blocked 4 × 15 bits for candidate
    * generation — by pigeonhole any pair at Hamming distance ≤ 3 agrees on
    * at least one full block, so recall at the ≤ 3 cutoff is exactly 1 and
    * the block join is a candidate generator, not an approximation. */
  val SimBits = 60
  val SimBlocks = 4
  val BlockBits = SimBits / SimBlocks // 15
  val MaxHamming = 3

  /** doc_id → SimHash fingerprint via the native one-pass aggregate.
    * Input: (doc_id, hm) with hm = h60(token). */
  private[graft] def simhashFingerprints(tok: DataFrame): DataFrame =
    tok.groupBy(col("doc_id"))
      .agg(simhashSig(col("hm"), SimBits).as("simhash"))

  /** The COMPOSED fingerprint build — explode the 60 bit positions into
    * rows, tally ±1 per (doc, bit) in one codegen'd SUM, fold the 60
    * tallies back into the fingerprint with a second narrow SUM. Kept as
    * the executable specification of [[simhashFingerprints]]' native
    * aggregate (ExpressionSpec pins bit-equality). Earlier alternatives
    * measured: 60 wide SUM() aggregates overflow the codegen field limit;
    * a 60-term higher-order-fold expression was execution-equivalent but
    * cost seconds of driver-side expression compile per run. */
  private[graft] def simhashComposed(tok: DataFrame): DataFrame =
    tok
      .select(col("doc_id"), col("hm"),
        explode(sequence(lit(0), lit(SimBits - 1))).as("j"))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(when(expr("shiftright(hm, j) & 1") === 1L, 1L).otherwise(-1L)).as("tally"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("tally") > 0, expr("shiftleft(1L, j)")).otherwise(0L)).as("simhash"))

  /** q35: SimHash near-duplicate pairs at Hamming distance ≤ 3 over the
    * token multiset (shuffled copies hash identically; q42 is the exact
    * bag-of-words analogue). */
  def q35(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"), h60(col("token")).as("hm"))

    // Native one-pass fingerprint (SimHashSig TypedImperativeAggregate):
    // all 60 per-bit ±1 tallies update in one buffer per token row — one
    // grouped aggregation with map-side partials, no 60-row explode.
    // Proven bit-equal to [[simhashComposed]] in ExpressionSpec; measured
    // ~3.4x faster at sf0.1 (0.51 s vs 1.75 s warm for the fingerprint
    // subtree, noop sink). Exact integer sums — order-free,
    // engine-identical.
    // One row per doc, referenced three times (blocks + both pair joins).
    // Dsl.pin (blocking-fill), not lazy cache: `blocks` self-joins below —
    // the q104 cold-session under-match shape (r9 pinning sweep).
    val fp = graft.ops.Dsl.pin(simhashFingerprints(tok), parts = 8)

    val blockStructs = (0 until SimBlocks).map(b =>
      struct(lit(b).as("block_id"),
        shiftright(col("simhash"), BlockBits * b).bitwiseAND(lit((1L << BlockBits) - 1)).as("bv")))
    val blocks = fp
      .select(col("doc_id"), explode(array(blockStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.block_id").as("block_id"), col("b.bv").as("bv"))

    val cand = blocks.as("x").join(blocks.as("y"),
        col("x.block_id") === col("y.block_id") && col("x.bv") === col("y.bv") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

    cand
      .join(fp.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), Seq("doc_a"))
      .join(fp.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= MaxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q76 chunk geometry: non-overlapping (stride = len), unlike q54's
    * overlapping context windows — for occurrence COUNTING an overlap
    * would double-count the shared tokens. */
  val BoilerplateChunkLen = 16
  val BoilerplateChunkStride = 16

  /** q76: boilerplate chunk detection — chunk-level exact dedup ACROSS
    * documents: flatten the corpus into non-overlapping 16-token chunks
    * (through the native ChunkGenerator — the Generator/UDTF extension
    * point, proven equal to the built-in composition in ExpressionSpec),
    * digest each chunk, and report every digest appearing in more than one
    * document: occurrence count, spanning doc count, chunk length, doc
    * range. This is the repeated-passage signal (headers, licenses,
    * navigation text) that doc-level dedup (q29/q34) cannot see and a
    * training pipeline strips before tokenization.
    *
    * Scale posture: generate → digest is map-side (GenerateExec + codegen'd
    * md5 projection, no per-row index array materialized); the only
    * shuffle is the groupBy on the 60-bit-spread digest — uniform keys,
    * map-side partials; the >1-doc filter is a post-aggregation HAVING. */
  def q76(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        chunkGen(split(col("text"), " "), BoilerplateChunkLen, BoilerplateChunkStride)
          .as(Seq("chunk_idx", "start_tok", "n_chunk_tokens", "chunk_text")))
      .select(col("doc_id"), col("n_chunk_tokens"),
        md5(col("chunk_text").cast("binary")).as("digest"))
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("n_chunk_tokens")).as("n_chunk_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))
      .filter(col("n_occurrences") > 1 && col("n_docs") > 1)
      .select(col("digest"), col("n_occurrences"), col("n_docs"),
        col("n_chunk_tokens"), col("min_doc"), col("max_doc"))
      .orderBy(col("digest"))

  /** q136: boilerplate SCRUB — the materialization step q76's detector
    * feeds: every document rewritten with its boilerplate chunks
    * (q76's exact criterion — digest occurring >1 time across >1
    * document, at the SAME non-overlapping 16-token chunk grid) removed,
    * plus the per-doc audit counts. This is the C4/CCNet "strip repeated
    * passages before tokenization" pipeline step, the sub-document
    * analogue of q66's whole-doc dedup materialization: q76 reports WHAT
    * repeats, q136 emits the training corpus with it gone. Chunk
    * reconstruction is lossless by the grid geometry (non-overlapping,
    * tail partial included), so a doc with no flagged chunks round-trips
    * text_clean == text verbatim — the DedupSpec identity law.
    *
    * Scale posture: one chunk stream (map-side Generate + codegen md5),
    * ONE digest shuffle shared by the flag aggregate and the scrub join
    * (identical child exchange → ReuseExchange), then one doc_id shuffle
    * to reassemble — Θ(corpus) rows end to end, no pairwise stage; the
    * flagged-digest side is df-bounded by construction (each digest row
    * is one group of the same aggregate the join probes). */
  def q136(spark: SparkSession, sfDir: String): DataFrame =
    scrubOn(graft.tables.Tables.documents(spark, sfDir))

  /** q136 core on an arbitrary (doc_id, text, …) frame — the spec seam
    * for planted-fixture laws (grid-aligned shared chunks removed,
    * within-doc-only repeats kept, no-op docs round-tripped verbatim). */
  private[graft] def scrubOn(docs: DataFrame): DataFrame = {
    val chunks = docs
      .select(col("doc_id"),
        chunkGen(split(col("text"), " "), BoilerplateChunkLen, BoilerplateChunkStride)
          .as(Seq("chunk_idx", "start_tok", "n_chunk_tokens", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx"), col("n_chunk_tokens"),
        col("chunk_text"), md5(col("chunk_text").cast("binary")).as("digest"))
    val boiler = chunks.groupBy(col("digest"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_occurrences") > 1 && col("n_docs") > 1)
      .select(col("digest"), lit(1).as("is_boiler"))
    chunks.join(boiler, Seq("digest"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        count(col("is_boiler")).as("n_removed"),
        coalesce(sum(when(col("is_boiler").isNull, col("n_chunk_tokens"))),
          lit(0L)).cast("long").as("n_tokens_kept"),
        array_join(transform(
          sort_array(collect_list(when(col("is_boiler").isNull,
            struct(col("chunk_idx"), col("chunk_text"))))),
          x => x("chunk_text")), " ").as("text_clean"))
      .orderBy(col("doc_id"))
  }

  /** q97 span granularity: the minimum repeat length that counts as a
    * duplicated passage. Sliding L-grams (stride 1), unlike q76's fixed
    * chunk grid — a repeat that straddles a chunk boundary is invisible
    * to q76 but flagged here. */
  val SpanL = 5

  /** q97: repeated-span detection — the exact-substring dedup signal of
    * Lee et al., "Deduplicating Training Data Makes Language Models
    * Better" (ACL'22): any ≥[[SpanL]]-token passage occurring more than
    * once in the corpus (across documents OR repeated within one) is a
    * memorization hazard, and the pipeline wants the MAXIMAL spans to cut,
    * not raw L-gram hits. Three declarative stages:
    *   1. slide an L-token window over every document (map-side
    *      transform + explode; the shingle key is the raw space-joined
    *      token string — tokens contain no spaces and L is fixed, so key
    *      equality IS token-sequence equality, and the oracle mirrors it
    *      without any hash to agree on);
    *   2. flag positions whose shingle occurs ≥ 2 times corpus-wide: a
    *      map-side-combined groupBy(shingle) count, then a semi-join of
    *      the position stream against the qualifying keys — output is
    *      bounded by the position stream (never pairwise like q84's
    *      candidate enumeration; a df=10⁶ boilerplate shingle costs its
    *      own occurrence rows and nothing more);
    *   3. merge overlapping/adjacent flagged windows [pos, pos+L) into
    *      maximal spans per document — gaps-and-islands on one window
    *      shuffle: prev_end = max(pos+L) over rows (-∞, -1), a new island
    *      opens where pos > prev_end, island id = running sum of opens,
    *      then span = [min(pos), max(pos)+L) per island.
    * Output: per affected document, the span count, duplicated-token
    * total, and the duplicated fraction (ratio4) — the per-doc cut list
    * a dedup materialization pass consumes.
    *
    * Scale posture: stage 1 is generate-only (no shuffle); stage 2 is one
    * uniform-key shuffle (the 60-bit-spread... here raw-string-keyed —
    * partials collapse hot keys map-side) plus one equi-semi-join keyed
    * the same way (AQE skew-split applies); stage 3 shuffles once on
    * doc_id and both window passes plus the island aggregate ride that
    * single partitioning. The document table is scanned twice (occurrence
    * stream is rebuilt for the join side) — deliberately NOT cached: the
    * stream is corpus-scale, and the q91 round-7 lesson is that a
    * corpus-scale cache is a worse cost than a second codegen'd scan. */
  def q97(spark: SparkSession, sfDir: String): DataFrame =
    repeatedSpans(graft.tables.Tables.documents(spark, sfDir))

  /** q97 core on an arbitrary (doc_id, text) frame — exposed so the
    * planted-boilerplate law (LlmOpsSpec) can pin span maximality:
    * overlapping and adjacent flagged windows merge into ONE span,
    * disjoint repeats stay separate, and unique text contributes
    * nothing. */
  private[graft] def repeatedSpans(documents: DataFrame): DataFrame = {
    val L = SpanL
    def occ = {
      val arr = split(col("text"), " ")
      documents
        .select(col("doc_id"), arr.as("t"))
        .filter(size(col("t")) >= L) // sequence(0, n-L) would DESCEND for n < L
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("t")) - L),
            i => struct(i.cast("long").as("pos"),
              array_join(slice(col("t"), i + 1, lit(L)), " ").as("sh")))).as("o"))
        .select(col("doc_id"), col("o.pos").as("pos"), col("o.sh").as("sh"))
    }
    val dup = occ.groupBy(col("sh")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select(col("sh"))
    val flagged = occ.join(dup, Seq("sh"), "left_semi")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val prevEnd = max(col("pos") + L).over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val spans = flagged
      .withColumn("prev_end", prevEnd)
      .withColumn("opens", when(col("prev_end").isNull || col("pos") > col("prev_end"), 1L)
        .otherwise(0L))
      .withColumn("island", sum(col("opens"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg((max(col("pos")) + L - min(col("pos"))).as("span_tokens"))
    val nTokens = documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    spans
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_tokens")).as("dup_tokens"))
      .join(nTokens, Seq("doc_id"))
      .select(col("doc_id"), col("n_spans"), col("dup_tokens"), col("n_tokens"),
        graft.ops.Dsl.ratio4(col("dup_tokens"), col("n_tokens")).as("dup_ratio4"))
      .orderBy(col("doc_id"))
  }
}

package graft.operators

import graft.Tables
import graft.functions.VectorExprs
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search + near-dedup + multimodal operators ([NS] —
  * BASELINE.json north star; SURVEY §2.11) over `embeddings` (64-dim
  * float vectors) and `documents`.
  *
  * Scale design: exact brute-force variants are the correctness
  * baseline (and stay oracle-checkable); the LSH variants (MinHash for
  * Jaccard, random-hyperplane for cosine) are the 100 TB path — they
  * turn all-pairs O(n²) into per-bucket joins whose fan-in is bounded
  * by the band width. Dot products run as higher-order array folds
  * (zip_with + aggregate) — one codegen'd expression per pair, no
  * explode of 64 rows per vector on the Spark side.
  */
object SimOps {

  type Q = (SparkSession, String) => DataFrame

  /** Fused codegen'd dot product of double arrays (graft.functions
    * .DotProduct) — requires VectorExprs.register on the session first. */
  private def dotD(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Embeddings with the float→double cast and L2 norm done ONCE per
    * vector — pair joins then do a single 64-element fold per pair
    * instead of three (dot + two norms): ~3× less arithmetic on the
    * O(n²)-ish hot path, same bit-for-bit cosine as the oracle
    * (dot / (n1*n2), not pre-normalized components).
    *
    * ZERO-NORM GUARD: an all-zero vector (a failed-embed artifact) has
    * no direction, and its raw cosine is NaN — which Spark AND DuckDB
    * order GREATER than every number, so a single such vector would
    * pass every `cosine >= t` near-dup filter (flooding the dedup
    * cluster graph) and rank FIRST in every top-k window. Nulling the
    * norm makes every cosine against it NULL instead: filtered by any
    * threshold, ranked last by `desc` (nulls-last), and dropped from
    * argmax cell assignment — degenerate vectors fall out of
    * similarity instead of dominating it. (The generated fixture has
    * no zero vectors, so oracle parity is unaffected.) */
  private[operators] def vectorsWithNorm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    VectorExprs.register(s)
    Tables.load(s, dir, "embeddings")
      .select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("nrm2", call_function("vec_dot", $"v", $"v"))
      .withColumn("nrm", when($"nrm2" > 0.0, sqrt($"nrm2")))
      .drop("nrm2")
  }

  /** Brute-force cosine top-k: 10 probe vectors against the whole table.
    * The probe set broadcasts; candidates stream by. Ranking happens on
    * the 4-digit-rounded cosine (with id tiebreak) so the ordering is
    * engine-independent. */
  val simCosineTopk: Q = (s, dir) => {
    import s.implicits._
    val e = vectorsWithNorm(s, dir)
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("probe_id"), $"v".as("p_v"), $"nrm".as("p_nrm"))
    val cands = e.select($"vec_id".as("neighbor_id"), $"v".as("c_v"), $"nrm".as("c_nrm"))
    val pairs = cands.crossJoin(broadcast(probes))
      .filter($"probe_id" =!= $"neighbor_id")
      .select($"probe_id", $"neighbor_id",
        round(dotD($"p_v", $"c_v") / ($"p_nrm" * $"c_nrm"), 4).as("cosine"))
    // k-selection through the native TopKPerGroup (bounded per-task
    // heaps — the candidate stream never shuffles in full), then rank
    // the ≤5 survivors per probe with a tiny window. (cosine desc,
    // neighbor_id) is a total order, so ranks on the reduced set equal
    // ranks on the full set; the all-window form is the DuckDB oracle.
    val top = graft.plans.TopK.perGroup(pairs, 5, Seq("probe_id"),
      Seq(("cosine", true), ("neighbor_id", false)))
    val w = Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"neighbor_id")
    top.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 5)
      .select($"probe_id", $"rnk", $"neighbor_id", $"cosine")
      .orderBy($"probe_id", $"rnk")
  }

  /** Exact cosine top-`k` PAIRS of the 10 probe vectors — the
    * reference set for the ANN recall gates below (the candidate-
    * stream shape of [[simCosineTopk]], probes broadcast, k-selection
    * through bounded heaps). */
  private def exactProbePairs(s: SparkSession, dir: String, k: Int): DataFrame = {
    import s.implicits._
    val e = vectorsWithNorm(s, dir)
    val probes = e.filter($"vec_id" < 10)
      .select($"vec_id".as("xp"), $"v".as("p_v"), $"nrm".as("p_nrm"))
    val cands = e.select($"vec_id".as("xn"), $"v".as("c_v"), $"nrm".as("c_nrm"))
    val pairs = cands.crossJoin(broadcast(probes))
      .filter($"xp" =!= $"xn")
      .select($"xp", $"xn",
        round(dotD($"p_v", $"c_v") / ($"p_nrm" * $"c_nrm"), 4).as("xc"))
    graft.plans.TopK.perGroup(pairs, k, Seq("xp"), Seq(("xc", true), ("xn", false)))
      .select($"xp", $"xn")
  }

  /** RECALL GATE: the measured retrieval quality of an ANN result
    * against the exact twin, attached to every output row as one
    * constant column — so the driver's rows-only determinism check
    * pins not just that the ANN output is reproducible but that its
    * QUALITY is (a bucketing regression that silently tanked recall
    * would change the column and fail the cross-run compare; the
    * absolute floors are spec-asserted in Round17OpsSpec at two SFs).
    * `ann` carries one (probe, neighbor) pair per retrieved result
    * for the 10 probe vectors; recall = retrieved∩exact / |exact
    * scope| (for best-neighbor ops the scope is the probe count —
    * recall@1-in-k; for top-k ops it is the exact pair count —
    * recall@k). Laziness preserved: the recall is a one-row aggregate
    * cross-joined onto the output, never a driver-side action. */
  private def withRecall(out: DataFrame, ann: DataFrame, exact: DataFrame,
      perProbe: Boolean, colName: String): DataFrame = {
    val s = out.sparkSession
    import s.implicits._
    // ONE pass over the exact twin: numerator and denominator come from
    // a single aggregate of `exact` left-joined with the (tiny, distinct
    // by construction: row_number-filtered) ANN pair set. Branching
    // `exact` into separate hits/scope plans would execute the
    // brute-force cross-join subtree twice — DataFrame plans do not
    // dedup common subtrees. |ann ∩ exact| counted from the exact side
    // equals the semi-join count from the ann side because both sides
    // are distinct pair sets.
    val marked = exact.join(broadcast(ann.toDF("hp", "hn")),
      $"hp" === $"xp" && $"hn" === $"xn", "left_outer")
    val scope = if (perProbe) countDistinct($"xp") else count(lit(1))
    val recall = marked
      .agg(count($"hp").as("_hits"), scope.as("_scope"))
      .select(round($"_hits".cast("double") / greatest($"_scope", lit(1L)), 4)
        .as(colName))
    out.crossJoin(broadcast(recall))
  }

  /** Integer-exact random-hyperplane LSH bucket, engine-reproducible.
    *
    * The float-sign buckets of [[simAnnLsh]] can't face an oracle: two
    * engines summing 64 doubles in different orders can flip a
    * near-zero sign. Here the embedding is first quantized to integers
    * (floor(v*1000) — v*1000 is ONE IEEE op on identical doubles, so
    * bit-identical everywhere, and floor has no midpoint rule), and the
    * 8 hyperplanes are integer-valued from a fixed formula, so the dot
    * products are exact integer arithmetic: order-independent,
    * engine-independent (min observed |dot| on the corpus is 1, never
    * 0-adjacent). DuckDB reproduces the identical bucket from the same
    * formula, which is what lets a *banded* plan stay hash-checked. */
  private def intLshBucket(v: Column): Column = {
    def plane(p: Int): Column =
      array((0 until 64).map(d => lit((p * 64L + d) * 2654435761L % 101L - 50L)): _*)
    val q = transform(v, x => floor(x * 1000).cast("long"))
    (0 until 8).map { p =>
      when(aggregate(zip_with(q, plane(p), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Embedding-cosine near-dup pairs, banded by (label, LSH bucket) —
    * NOT label alone: a label's population grows linearly with the
    * corpus, so label-only banding is O(n²/k) all-pairs (the r2/r3
    * scale flag); the [[intLshBucket]] sub-band caps pair fan-in the
    * same way the minhash/simhash siblings do (measured max band 24 at
    * sf0.1 vs 200+ per label). Because the bucket is integer-exact on
    * both engines, the banded semantics — not just a superset — is
    * what the DuckDB twin checks: same bucket formula, same pairs,
    * exact-cosine rerank with threshold on the rounded value. */
  val dedupEmbeddingCosine: Q = (s, dir) => {
    import s.implicits._
    val e = vectorsWithNorm(s, dir).withColumn("bk", intLshBucket($"v"))
    val a = e.select($"vec_id".as("d1"), $"label", $"bk", $"v".as("v1"), $"nrm".as("n1"))
    val b = e.select($"vec_id".as("d2"), $"label".as("label2"), $"bk".as("bk2"),
      $"v".as("v2"), $"nrm".as("n2"))
    a.join(b, $"label" === $"label2" && $"bk" === $"bk2" && $"d1" < $"d2")
      .select($"d1", $"d2",
        round(dotD($"v1", $"v2") / ($"n1" * $"n2"), 4).as("cosine"))
      .filter($"cosine" >= 0.3)
      .orderBy($"d1", $"d2")
  }

  /** ANN via random-hyperplane LSH, L=3 hash tables (r19, up from
    * L=2): three independent 8-hyperplane families → three 8-bit sign
    * buckets per vector; candidates share a bucket in ANY table (the
    * textbook multi-table OR-merge — a true neighbor must land on the
    * wrong side of a hyperplane in ALL THREE families to be missed,
    * roughly cubing the single-table miss rate at 3× candidate
    * fan-in); exact cosine rerank keeps the best neighbor per vector.
    * This is the scale path: bucketing replaces the all-pairs cross
    * join with three shuffles on 8-bit keys — each table's join is
    * independent and strictly bucket-bounded. No oracle (bucket
    * boundaries aren't ANSI-SQL-expressible); deterministic by
    * construction — recall vs the exact twin is spec-gated per SF
    * (Round17OpsSpec). */
  val simAnnLsh: Q = (s, dir) => {
    import s.implicits._
    // r19: served from the PERSISTED bucket table ([[AnnIndex]]) — the
    // corpus is hashed once at index build (the 8-hyperplane sign
    // buckets, codegen'd lsh_bucket8/b/c), maintained O(delta) on
    // append; the query scans only the index. Values are bit-identical
    // to the inline derivation (doubles round-trip parquet exactly).
    graft.functions.VectorExprs.register(s)
    val e = AnnIndex.ensureLsh(s, dir)
      .select($"vec_id", $"v", $"nrm", $"bucket", $"bucketb", $"bucketc")
    val a = e.select($"vec_id".as("d1"), $"v".as("v1"), $"nrm".as("n1"),
      $"bucket", $"bucketb", $"bucketc")
    val b = e.select($"vec_id".as("d2"), $"v".as("v2"), $"nrm".as("n2"),
      $"bucket".as("bucket2"), $"bucketb".as("bucketb2"),
      $"bucketc".as("bucketc2"))
    // one equi-join per table; a pair agreeing in several tables yields
    // identical rows in those branches, harmless under the top-1 window
    def tbl(cond: Column) = a.join(b, cond && $"d1" =!= $"d2")
      .select($"d1", $"bucket", $"d2",
        round(dotD($"v1", $"v2") / ($"n1" * $"n2"), 4).as("cosine"))
    val pairs = tbl($"bucket" === $"bucket2")
      .unionAll(tbl($"bucketb" === $"bucketb2"))
      .unionAll(tbl($"bucketc" === $"bucketc2"))
    val w = Window.partitionBy($"d1").orderBy($"cosine".desc, $"d2")
    val best = pairs.withColumn("rnk", row_number().over(w))
      .filter($"rnk" === 1)
      .select($"d1", $"bucket", $"d2".as("best_neighbor"), $"cosine")
    withRecall(best,
      best.filter($"d1" < 10).select($"d1", $"best_neighbor"),
      exactProbePairs(s, dir, 5), perProbe = true, "recall_at_1")
      .orderBy($"d1")
  }

  /** Multi-probe LSH — the standard recall lever on [[simAnnLsh]]:
    * in EACH of the three hash tables (L=3 since r19), each probe also
    * searches the 8 buckets at Hamming distance 1 from its own (the
    * most likely homes of a near neighbor that fell on the wrong side
    * of one hyperplane). ~9× candidate fan-in per table; candidates
    * are the union over all tables, so this strictly supersets
    * [[simAnnLsh]]'s candidate set — recall dominance holds BY
    * CONSTRUCTION, and the spec asserts it. Still strictly
    * bucket-bounded (never all-pairs); at 100 TB the explode side is
    * the small probe stream, the corpus side still shuffles once per
    * table on its single bucket key. No oracle (like simAnnLsh);
    * deterministic by construction. */
  val simAnnLshMultiprobe: Q = (s, dir) => {
    import s.implicits._
    // r19: serves from the same persisted bucket table as simAnnLsh
    graft.functions.VectorExprs.register(s)
    val e = AnnIndex.ensureLsh(s, dir)
      .select($"vec_id", $"v", $"nrm", $"bucket", $"bucketb", $"bucketc")
    def hamming1(c: Column) = array((c +: (0 until 8).map(b =>
      c.bitwiseXOR(lit(1 << b)))): _*)
    def tbl(bCol: String) = {
      val probes = e.select($"vec_id".as("d1"), $"v".as("v1"), $"nrm".as("n1"),
        explode(hamming1(col(bCol))).as("pb"))
      val cands = e.select($"vec_id".as("d2"), $"v".as("v2"), $"nrm".as("n2"),
        col(bCol).as("b2"))
      probes.join(cands, $"pb" === $"b2" && $"d1" =!= $"d2")
        .select($"d1", $"d2",
          round(dotD($"v1", $"v2") / ($"n1" * $"n2"), 4).as("cosine"))
    }
    val pairs = tbl("bucket").unionAll(tbl("bucketb")).unionAll(tbl("bucketc"))
    val w = Window.partitionBy($"d1").orderBy($"cosine".desc, $"d2")
    val best = pairs.withColumn("rnk", row_number().over(w))
      .filter($"rnk" === 1)
      .select($"d1", $"d2".as("best_neighbor"), $"cosine")
    withRecall(best,
      best.filter($"d1" < 10).select($"d1", $"best_neighbor"),
      exactProbePairs(s, dir, 5), perProbe = true, "recall_at_1")
      .orderBy($"d1")
  }

  /** Max vectors the IVF coarse quantizer trains on. Small enough that
    * a single task holds the sample trivially (4096 × 64 doubles ≈
    * 2 MB), large enough that at every tested SF the sample is the
    * whole corpus (so small-SF recall is unchanged by sampling). */
  private[graft] val IvfFitCap = 4096

  /** Deterministic bounded training sample for the IVF quantizer:
    * global top-[[IvfFitCap]] rows by (md5(vec_id), vec_id) — the same
    * pure-hash membership discipline as split_train_holdout, so the
    * sample is stable across runs, engines, and partitionings, and a
    * vector never migrates in or out when unrelated data arrives.
    * Executes as sort+limit = per-partition bounded top-k heaps merged
    * at the driver (≤ cap rows), never a full-corpus sort or collect:
    * the fit input is O(cap) no matter the corpus size. The survivors
    * are re-sorted by vec_id into ONE partition so the KMeans
    * center-update reduction order — and therefore every float sum —
    * is identical run to run (bit-determinism of the trained model). */
  private[graft] def ivfTrainingSample(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    e.select($"vec_id", $"v")
      .orderBy(md5($"vec_id".cast("string").cast("binary")), $"vec_id")
      .limit(IvfFitCap)
      .coalesce(1)
      .sortWithinPartitions($"vec_id")
  }

  /** ANN via IVF (inverted-file) coarse quantization — the other
    * standard scale path next to LSH: a small fixed centroid set
    * broadcasts, every vector is indexed under its [[AnnIndex.Repl]]
    * nearest centroids (spilled assignment, r20), and probes search
    * their nprobe nearest cells. All-pairs O(n²) becomes per-cell joins
    * whose fan-in is nprobe·Repl·n/K on balanced data; on a cluster the
    * assignment is one broadcast-join pass over the corpus. Centroids are TRAINED with
    * MLlib KMeans (fixed seed, fixed iteration count) on the bounded
    * deterministic [[ivfTrainingSample]] — a single sorted training
    * partition so the center-update reduction order, and therefore
    * every float sum, is identical run to run: the output stays
    * bit-deterministic. No oracle (cell boundaries aren't
    * ANSI-expressible); deterministic by construction — see the
    * recall + determinism assertions in Round4OpsSpec. */
  val simAnnIvf: Q = (s, dir) => {
    import s.implicits._
    // r19: served from the PERSISTED IVF index ([[AnnIndex]]) — the
    // coarse quantizer trains ONCE (same bounded deterministic sample,
    // fixed-seed KMeans) and the inverted file (vec_id, cell, v, nrm)
    // is the corpus re-organized by nearest centroid, maintained
    // O(delta) on append; serving scans ONLY the index, never the raw
    // corpus. Centroids broadcast; everything below is the same
    // bit-deterministic plan over the same values, so the spec-gated
    // recall floors carry over unchanged.
    graft.functions.VectorExprs.register(s)
    val (cents, ev) = AnnIndex.ensureIvf(s, dir)
    // nprobe=6 over a SPILLED (Repl=2) inverted file (r20, up from
    // nprobe=4 × single-cell r19): each PROBE searches its six nearest
    // cells (the classic IVF recall lever), and each CORPUS vector is
    // indexed under its TWO nearest cells ([[AnnIndex.Repl]]) — the
    // boundary vectors a single-cell file loses are exactly the missed
    // neighbors, and replicating them lifted measured recall@5 from
    // 0.60/0.54 to ≥0.86 at sf0.01/0.1. A neighbor reachable through
    // both its cells yields duplicate pairs; the distinct() below
    // collapses them before ranking. Fan-in per probe is bounded at
    // nprobe·Repl·n/K candidate rows — still bucket-bounded joins on a
    // single cell key, never all-pairs; this corpus is weakly
    // clustered (synthetic near-uniform embeddings) so the honest
    // quality/scan trade sits higher than a production corpus would
    // need — at 100 TB, K grows ~√n and the same nprobe covers a
    // vanishing fraction. The probe-cell ranking is a window over
    // probes × 16 broadcast centroids — O(nprobe · K) rows per probe,
    // trivial at any corpus size.
    val pw = Window.partitionBy($"probe_id").orderBy($"pcos".desc, $"cent_id")
    val probes = ev.filter($"vec_id" < 10)
      .select($"vec_id".as("probe_id"), $"v".as("p_v"), $"nrm".as("p_nrm"))
      // the spilled file carries Repl rows per vector (identical v/nrm)
      .dropDuplicates("probe_id")
      .crossJoin(broadcast(cents))
      .select($"probe_id", $"p_v", $"p_nrm", $"cent_id",
        (dotD($"p_v", $"c_v") / ($"p_nrm" * $"c_nrm")).as("pcos"))
      .withColumn("crnk", row_number().over(pw))
      .filter($"crnk" <= 6)
      // the output's `cell` column stays the probe's OWN (rank-1) cell
      .select($"probe_id", $"p_v", $"p_nrm", $"cent_id".as("probed_cell"),
        first($"cent_id").over(pw.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)).as("cell"))
    val cands = ev.select($"vec_id".as("neighbor_id"), $"v".as("c_v"),
      $"nrm".as("c_nrm"), $"cell".as("cell2"))
    val pairs = probes.join(cands,
        $"probed_cell" === $"cell2" && $"probe_id" =!= $"neighbor_id")
      .select($"probe_id", $"cell", $"neighbor_id",
        round(dotD($"p_v", $"c_v") / ($"p_nrm" * $"c_nrm"), 4).as("cosine"))
      // a neighbor spilled into two probed cells arrives twice with
      // identical values — collapse before the rank window
      .distinct()
    val w = Window.partitionBy($"probe_id").orderBy($"cosine".desc, $"neighbor_id")
    val top = pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 5)
      .select($"probe_id", $"cell", $"rnk", $"neighbor_id", $"cosine")
    withRecall(top,
      top.select($"probe_id", $"neighbor_id"),
      exactProbePairs(s, dir, 5), perProbe = false, "recall_at_5")
      .orderBy($"probe_id", $"rnk")
  }

  /** MinHash-LSH near-dup: shingle → seeded-minhash signature → band →
    * bucket-join, the standard web-scale dedup pipeline, built natively
    * from codegen'd expressions (seeded xxhash64 + min-aggregate) rather
    * than MLlib's approxSimilarityJoin — the MLlib form explodes hash
    * tables into a row-per-table join and re-verifies with O(vocab)
    * sparse-vector distances, which measured 56 s at sf0.1 on this
    * high-collision corpus; this form runs the identical algorithm in
    * ~1 s. Blocked by language like a production pipeline. Deterministic
    * (fixed seeds); no oracle (sketch, SURVEY §0.2.3) —
    * dedup_ngram_jaccard is its exact twin. */
  val dedupMinhashLsh: Q = (s, dir) => {
    import s.implicits._
    val nHashes = 8
    val tok = Tables.load(s, dir, "documents")
      .filter($"lang" === "en")
      .select($"doc_id", $"source", explode(array_distinct(split($"text", " "))).as("tok"))
    // 8 minhash signatures: min over seeded 64-bit token hashes.
    val sigCols = (0 until nHashes).map(k => min(xxhash64(lit(k), $"tok")).as(s"mh$k"))
    val mh = tok.groupBy($"doc_id", $"source").agg(sigCols.head, sigCols.tail: _*)
    // 4 bands × 2 rows: candidates = pairs agreeing on any full band.
    // The band VALUE is the raw (mh_2b, mh_2b+1) pair, not a hash of
    // it: joining on a folded 64-bit digest would admit a pair whose
    // band signatures differ but collide in the digest — violating the
    // "agree on a full band" rule with no oracle to catch it (this op
    // is rows-only) — and the struct key costs nothing more to shuffle
    // than the digest did. Same collision-exactness discipline as the
    // hash-folded-but-rechecked dedup_ngram_jaccard keys.
    val bandCols = (0 until nHashes / 2).map(b =>
      struct(lit(b).as("band_idx"),
        struct(col(s"mh${2 * b}").as("lo"),
          col(s"mh${2 * b + 1}").as("hi")).as("band_val")))
    val bands = mh.select($"doc_id", $"source", explode(array(bandCols: _*)).as("band"))
      .select($"doc_id", $"source", $"band.band_idx", $"band.band_val")
    // candidates co-keyed on (band, source): source blocking bounds the
    // bucket fan-in the same way sharding a 100 TB corpus would.
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.source") === col("b.source") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2")).distinct()
    // Estimated Jaccard = fraction of agreeing minhashes.
    val sigArr = array((0 until nHashes).map(k => col(s"mh$k")): _*)
    val s1 = mh.select($"doc_id".as("d1"), sigArr.as("sig1"))
    val s2 = mh.select($"doc_id".as("d2"), sigArr.as("sig2"))
    cand.join(s1, "d1").join(s2, "d2")
      .select($"d1", $"d2",
        (size(filter(zip_with($"sig1", $"sig2", (x, y) => x === y), b => b))
          / lit(nHashes.toDouble)).as("est_jaccard"))
      .filter($"est_jaccard" >= 0.5)
      .orderBy($"d1", $"d2")
  }

  /** SimHash near-dup: 64-bit sign-aggregated token hash per doc,
    * banded by the top 8 bits, pairwise Hamming distance via
    * bit_count(xor). The fingerprint is the codegen'd simhash64
    * expression (functions/HashExprs.scala — formerly a per-row UDF;
    * bit-identical word hashing, HashExprsSpec pins it). Deterministic
    * (MurmurHash3 is seed-fixed); no oracle — the hash function isn't
    * expressible in the ANSI intersection. */
  val dedupSimhash: Q = (s, dir) => {
    import s.implicits._
    graft.functions.HashExprs.register(s)
    val d = Tables.load(s, dir, "documents")
      .select($"doc_id", expr("simhash64(split(text, ' '))").as("simhash"))
      .withColumn("band", shiftrightunsigned($"simhash", 56))
    val a = d.select($"doc_id".as("d1"), $"simhash".as("sh1"), $"band")
    val b = d.select($"doc_id".as("d2"), $"simhash".as("sh2"), $"band".as("band2"))
    a.join(b, $"band" === $"band2" && $"d1" < $"d2")
      .select($"d1", $"d2", bit_count($"sh1".bitwiseXOR($"sh2")).as("hamming"))
      .orderBy($"d1", $"d2")
  }

  /** Multimodal row: text + metadata + embedding joined into one
    * record. TRUE inner join — documents:embeddings is 5000:2000 at
    * sf0.1 (SURVEY §0.2.8), so no 1:1 assumption. */
  val multimodalJoin: Q = (s, dir) => {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val emb = Tables.load(s, dir, "embeddings")
    docs.join(emb, docs("doc_id") === emb("vec_id"))
      .select($"doc_id", $"lang", $"source", $"n_chars", $"label",
        size($"embedding").as("n_dims"))
      .orderBy($"doc_id")
  }

  /** Multimodal feature extraction over an opaque binary payload
    * column: byte length, content hash, and deterministic fake decode
    * dims (real decode libs aren't in the container — the Spark-side
    * plumbing is the point, per the north star). */
  val multimodalFeatures: Q = (s, dir) => {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", encode($"text", "utf-8").as("payload"), $"text", $"n_chars")
      .select($"doc_id",
        length($"payload").cast("long").as("n_bytes"),
        sha2($"text", 256).as("content_sha"),
        (lit(64) + pmod(length($"payload"), lit(64))).cast("long").as("width"),
        (lit(64) + pmod(length($"payload") * 7, lit(64))).cast("long").as("height"),
        (lit(1) + pmod(length($"payload"), lit(8))).cast("long").as("n_frames"))
      .orderBy($"doc_id")
  }

  /** REAL multimodal decode — the typed-mapPartitions plumbing shape a
    * real image/audio decoder (a libjpeg/ffmpeg binding) plugs into —
    * batched per partition, typed output schema, malformed-input
    * routing — exercised against an actual binary format end to end:
    *
    * ENCODE (pure Column work): each doc gets a raster payload in a
    * defined format — magic `0x47 0x4D` ("GM"), big-endian u16 width
    * and height, then width×height pixel bytes `p(i) = (doc_id·31 +
    * i·7) mod 256` — assembled as hex and materialized with `unhex`
    * into a true BINARY column. Docs with `doc_id ≡ 0 (mod 37)` are
    * TRUNCATED mid-header (the malformed-input path every real ingest
    * has).
    *
    * DECODE (typed mapPartitions, the batched per-partition shape a
    * libjpeg/ffmpeg binding plugs into): validate magic + exact length
    * against the header dims, then one byte loop for sum/min/max —
    * malformed payloads route to `is_valid = false` with zeroed stats
    * instead of poisoning the batch.
    *
    * The DuckDB oracle cannot parse the binary — instead it computes
    * the SAME stats arithmetically from the generating formula, so a
    * hash match PROVES the byte-level decode (header endianness, pixel
    * offsets, corruption routing) is exactly right. This is what moves
    * the op from the stub's rows-only check into the oracle gate. */
  val multimodalDecode: Q = (s, dir) => {
    import s.implicits._
    val w = (lit(8) + pmod($"doc_id", lit(9))).cast("int")
    val h = (lit(4) + pmod($"doc_id", lit(7))).cast("int")
    val hdrHex = concat(lit("474D"),
      lpad(hex(w), 4, "0"), lpad(hex(h), 4, "0"))
    val pixHex = array_join(
      transform(sequence(lit(0), w * h - 1),
        i => lpad(hex(pmod($"doc_id" * 31 + i * 7, lit(256))), 2, "0")), "")
    val payload = unhex(concat(hdrHex, pixHex))
    val ds = Tables.load(s, dir, "documents")
      .select($"doc_id",
        when(pmod($"doc_id", lit(37)) === 0, substring(payload, 1, 4))
          .otherwise(payload).as("payload"))
      .as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, bytes) =>
        def u(i: Int) = bytes(i) & 0xff
        val headerOk = bytes.length >= 6 && u(0) == 0x47 && u(1) == 0x4D
        val (w, h) =
          if (headerOk) ((u(2) << 8) | u(3), (u(4) << 8) | u(5)) else (0, 0)
        if (!headerOk || bytes.length != 6 + w * h)
          (id, false, 0L, 0L, 0L, 0L, 0L)
        else {
          var sum = 0L; var mn = 255L; var mx = 0L
          var i = 6
          while (i < bytes.length) {
            val p = u(i)
            sum += p
            if (p < mn) mn = p
            if (p > mx) mx = p
            i += 1
          }
          (id, true, w.toLong, h.toLong, sum, mn, mx)
        }
      }
    }.toDF("doc_id", "is_valid", "width", "height", "pix_sum", "pix_min", "pix_max")
      .orderBy($"doc_id")
  }

  /** Int8 embedding quantization with per-dimension corpus min/max —
    * the 4× storage-reduction step a 100 TB embedding table actually
    * ships with. Codes are exact integers (hash-checkable); the output
    * is a per-vector summary (dim count, code checksum/extrema, max
    * reconstruction error) so the check covers every code without
    * emitting a 64-wide array the driver can't compare.
    *
    * Scale shape: the stats table is one row per DIMENSION (64) — a
    * map-side-combined agg then a broadcast back onto the exploded
    * stream; no join shuffles vector rows. */
  /** Quantization core over an exploded (vec_id, dim, x) frame —
    * factored out so the degenerate-dimension guard is unit-testable. */
  private[graft] def quantizeExploded(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val stats = e.groupBy($"dim").agg(min($"x").as("mn"), max($"x").as("mx"))
    // A constant dimension (mx == mn) would make the scale 0/0 = NaN,
    // and NaN→int casting diverges between Spark (null, non-ANSI) and
    // DuckDB — so the degenerate case is pinned explicitly: q = 0,
    // err = 0 (a constant dimension reconstructs exactly).
    e.join(broadcast(stats), "dim")
      .withColumn("q", when($"mx" === $"mn", lit(0)).otherwise(
        round(($"x" - $"mn") * 255.0 / ($"mx" - $"mn"), 0).cast("int") - 128))
      .withColumn("err", when($"mx" === $"mn", lit(0.0)).otherwise(
        round(abs($"mn" + ($"q" + 128).cast("double") * ($"mx" - $"mn") / 255.0
          - $"x"), 6)))
      .groupBy($"vec_id")
      .agg(count(lit(1)).as("n_dims"),
        sum($"q").as("q_checksum"),
        min($"q").as("q_min"), max($"q").as("q_max"),
        max($"err").as("max_abs_err"))
      .orderBy($"vec_id")
  }

  val embeddingQuantize: Q = (s, dir) => {
    import s.implicits._
    quantizeExploded(Tables.load(s, dir, "embeddings")
      .select($"vec_id", posexplode($"embedding").as(Seq("pos", "xf")))
      .select($"vec_id", ($"pos" + 1).as("dim"), $"xf".cast("double").as("x")))
  }

  val queries: Map[String, Q] = Map(
    "embedding_quantize" -> embeddingQuantize,
    "sim_cosine_topk" -> simCosineTopk,
    "sim_ann_lsh" -> simAnnLsh,
    "sim_ann_lsh_multiprobe" -> simAnnLshMultiprobe,
    "sim_ann_ivf" -> simAnnIvf,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine,
    "dedup_near_minhash" -> dedupMinhashLsh,
    "dedup_simhash" -> dedupSimhash,
    "multimodal_join" -> multimodalJoin,
    "multimodal_features" -> multimodalFeatures,
    "multimodal_decode" -> multimodalDecode,
    )

  val oracle: Map[String, String] = Map(
    "embedding_quantize" -> """
      WITH e AS (
        SELECT vec_id,
               CAST(unnest(embedding) AS DOUBLE) AS x,
               generate_subscripts(embedding, 1) AS dim
        FROM embeddings),
      st AS (SELECT dim, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY dim),
      q AS (SELECT vec_id, e.dim, x, mn, mx,
                   CASE WHEN mx = mn THEN 0
                        ELSE CAST(round((x - mn) * 255.0 / (mx - mn)) AS INTEGER) - 128
                   END AS q
            FROM e JOIN st ON e.dim = st.dim),
      r AS (SELECT vec_id, q,
                   CASE WHEN mx = mn THEN 0.0
                        ELSE round(abs(mn + (q + 128) * (mx - mn) / 255.0 - x), 6)
                   END AS err
            FROM q)
      SELECT vec_id, COUNT(*) AS n_dims, CAST(SUM(q) AS BIGINT) AS q_checksum,
             CAST(MIN(q) AS INTEGER) AS q_min, CAST(MAX(q) AS INTEGER) AS q_max,
             MAX(err) AS max_abs_err
      FROM r GROUP BY vec_id ORDER BY vec_id""",
    "sim_cosine_topk" -> """
      WITH x AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                        generate_subscripts(embedding, 1) AS i FROM embeddings),
      n AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM x GROUP BY vec_id),
      d AS (SELECT a.vec_id AS p, b.vec_id AS c, SUM(a.v * b.v) AS dp
            FROM x a JOIN x b ON a.i = b.i AND a.vec_id < 10
             AND a.vec_id != b.vec_id
            GROUP BY 1, 2),
      sc AS (SELECT p AS probe_id, c AS neighbor_id,
                    ROUND(dp / (n1.nrm * n2.nrm), 4) AS cosine
             FROM d JOIN n n1 ON n1.vec_id = p JOIN n n2 ON n2.vec_id = c),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
              ORDER BY cosine DESC, neighbor_id) AS rnk FROM sc)
      SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, cosine
      FROM r WHERE rnk <= 5 ORDER BY probe_id, rnk""",
    "dedup_embedding_cosine" -> """
      WITH x AS (SELECT vec_id, label, CAST(unnest(embedding) AS DOUBLE) AS v,
                        generate_subscripts(embedding, 1) AS i FROM embeddings),
      bits AS (SELECT x.vec_id, pl.p,
                      CASE WHEN SUM(CAST(floor(x.v * 1000) AS BIGINT)
                        * ((pl.p * 64 + x.i - 1) * 2654435761 % 101 - 50)) > 0
                        THEN CAST(1 AS BIGINT) << pl.p ELSE 0 END AS bit
               FROM x CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) pl(p)
               GROUP BY x.vec_id, pl.p),
      bk AS (SELECT vec_id, CAST(SUM(bit) AS BIGINT) AS bk
             FROM bits GROUP BY vec_id),
      n AS (SELECT vec_id, sqrt(SUM(v * v)) AS nrm FROM x GROUP BY vec_id),
      d AS (SELECT a.vec_id AS d1, b.vec_id AS d2, SUM(a.v * b.v) AS dp
            FROM x a JOIN x b ON a.i = b.i AND a.label = b.label
             AND a.vec_id < b.vec_id
            GROUP BY 1, 2)
      SELECT d1, d2, ROUND(dp / (n1.nrm * n2.nrm), 4) AS cosine
      FROM d JOIN n n1 ON n1.vec_id = d1 JOIN n n2 ON n2.vec_id = d2
      JOIN bk b1 ON b1.vec_id = d1 JOIN bk b2 ON b2.vec_id = d2
      WHERE b1.bk = b2.bk AND ROUND(dp / (n1.nrm * n2.nrm), 4) >= 0.3
      ORDER BY d1, d2""",
    "multimodal_join" -> """
      SELECT doc_id, lang, source, n_chars, label,
             CAST(len(embedding) AS INT) AS n_dims
      FROM documents JOIN embeddings ON doc_id = vec_id
      ORDER BY doc_id""",
    "multimodal_features" -> """
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS content_sha,
             CAST(64 + octet_length(encode(text)) % 64 AS BIGINT) AS width,
             CAST(64 + (octet_length(encode(text)) * 7) % 64 AS BIGINT) AS height,
             CAST(1 + octet_length(encode(text)) % 8 AS BIGINT) AS n_frames
      FROM documents ORDER BY doc_id""",
    // The oracle reproduces the decoder's OUTPUT from the pixel
    // formula, never touching the binary: a hash match proves the
    // Spark side's byte-level parse (magic, BE header, offsets,
    // corruption routing) decoded the payload exactly.
    "multimodal_decode" -> """
      WITH d AS (SELECT doc_id, 8 + doc_id % 9 AS w, 4 + doc_id % 7 AS h,
                        (doc_id % 37 = 0) AS corrupt
                 FROM documents),
      px AS (SELECT doc_id, ((doc_id*31 + i*7) % 256) AS p
             FROM (SELECT doc_id, unnest(generate_series(0, w*h - 1)) AS i
                   FROM d WHERE NOT corrupt)
             JOIN d USING (doc_id)),
      agg AS (SELECT doc_id, CAST(SUM(p) AS BIGINT) AS pix_sum,
                     CAST(MIN(p) AS BIGINT) AS pix_min,
                     CAST(MAX(p) AS BIGINT) AS pix_max
              FROM px GROUP BY doc_id)
      SELECT d.doc_id, NOT d.corrupt AS is_valid,
             CAST(CASE WHEN d.corrupt THEN 0 ELSE d.w END AS BIGINT) AS width,
             CAST(CASE WHEN d.corrupt THEN 0 ELSE d.h END AS BIGINT) AS height,
             COALESCE(a.pix_sum, 0) AS pix_sum,
             COALESCE(a.pix_min, 0) AS pix_min,
             COALESCE(a.pix_max, 0) AS pix_max
      FROM d LEFT JOIN agg a ON d.doc_id = a.doc_id
      ORDER BY d.doc_id""")
}

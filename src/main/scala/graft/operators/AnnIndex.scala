package graft.operators

import graft.sources.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED ANN INDEX (r19) — the production shape the per-query
  * derivation lacked: IVF centroids + inverted lists and LSH bucket
  * tables materialized as snapshot-store tables, MAINTAINED
  * INCREMENTALLY on append, with the `sim_ann_*` queries serving by
  * JOINING the index instead of re-hashing / re-assigning the corpus
  * per invocation.
  *
  * Layout (one snapshot root per structure, under the engine's tmp
  * warehouse, keyed by corpus dir):
  *  - IVF: `<root>/centroids` — the K=16 trained centers (tiny,
  *    broadcast at serve time); `<root>/assignments` — the INVERTED
  *    FILE: (vec_id, cell, v, nrm), the corpus re-organized by its
  *    [[Repl]] nearest centroids (spilled assignment, r20), exactly
  *    FAISS's IVF replica lists as a table. Serving scans ONLY the
  *    index — the raw corpus is never touched.
  *  - LSH: `<root>/buckets` — (vec_id, bucket, bucketb, v, nrm), the
  *    two 8-bit sign buckets per vector (same codegen'd
  *    lsh_bucket8/lsh_bucket8b expressions the inline path used).
  *
  * Incrementality: centroids are FROZEN after the first build (the
  * standard IVF discipline — assignment is pointwise given fixed
  * centers, so incremental == batch BY CONSTRUCTION; re-training is an
  * offline rebuild). `appendIvf`/`appendLsh` assign ONLY the handed
  * delta (one broadcast-join pass over it, O(delta) rows moved) and
  * publish one append commit; `ensure*` self-heals by anti-joining the
  * corpus against the index and appending whatever is missing — first
  * call builds, later calls reuse, a grown corpus tops up.
  *
  * Determinism: training is the same capped hash-chosen sample +
  * fixed-seed KMeans as the inline path ([[SimOps.ivfTrainingSample]]);
  * doubles round-trip parquet exactly; so the indexed serve path is
  * BIT-IDENTICAL to the derived one and the spec-gated recall floors
  * hold unchanged. */
private[graft] object AnnIndex {

  val K = 16

  /** `ensure*` serializes per JVM: index roots are pid-scoped, so the
    * only possible racers are in-process query threads (Verify/Bench
    * run keys in parallel — sim_ann_lsh and its multiprobe twin share
    * one bucket table), and two concurrent first-builds would each
    * top-up "missing" vectors the other just committed, doubling index
    * rows. The lock makes ensure build-once; steady-state calls hold
    * it only for a metadata probe. */
  private val ensureLock = new Object

  def ivfRoot(dir: String): String = graft.Qx.tmpOut("annidx_ivf", dir)
  def lshRoot(dir: String): String = graft.Qx.tmpOut("annidx_lsh", dir)

  /** Train the coarse quantizer (fixed seed/iters on the bounded
    * deterministic sample) → (cent_id, c_v). */
  private def trainCentroids(e: DataFrame): DataFrame = {
    val s = e.sparkSession
    import s.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val model = new KMeans().setK(K).setSeed(20260812L).setMaxIter(5)
      .setFeaturesCol("fv")
      .fit(SimOps.ivfTrainingSample(e).select(array_to_vector($"v").as("fv")))
    s.createDataFrame(
        model.clusterCenters.toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i.toLong, c.toArray) })
      .toDF("cent_id", "c_v")
  }

  /** Centroids with the serve-time norm attached. */
  private def withCentNorm(cents: DataFrame): DataFrame = {
    val s = cents.sparkSession
    import s.implicits._
    graft.functions.VectorExprs.register(s)
    cents.withColumn("c_nrm", sqrt(call_function("vec_dot", $"c_v", $"c_v")))
  }

  /** Replication factor of the SPILLED assignment (r20): every corpus
    * vector is indexed under its [[Repl]] nearest centroids, not just
    * the nearest — FAISS-style replica lists / the SOAR idea (Sun et
    * al., NeurIPS 2023): a vector sitting near a cell boundary is the
    * exact vector a single-cell inverted file loses, and duplicating it
    * into its runner-up cell recovers it at 2× index size with ZERO
    * extra serve-time shuffles (the join key is still one cell id).
    * Incrementality is untouched — assignment stays pointwise given
    * frozen centers. */
  val Repl = 2

  /** Pointwise [[Repl]]-nearest-centroid assignment of `delta`
    * (broadcast centroids, native bounded-heap top-k per vec_id — no
    * full sort): (vec_id, cell, v, nrm), [[Repl]] rows per vector. */
  private def assignCells(delta: DataFrame, cents: DataFrame): DataFrame = {
    val s = delta.sparkSession
    import s.implicits._
    graft.functions.VectorExprs.register(s)
    val cn = withCentNorm(cents)
    val scored = delta.crossJoin(broadcast(cn))
      .select($"vec_id", $"cent_id",
        (call_function("vec_dot", $"v", $"c_v") / ($"nrm" * $"c_nrm")).as("ccos"))
    val cells = graft.plans.TopK.perGroup(scored, Repl,
        Seq("vec_id"), Seq(("ccos", true), ("cent_id", false)))
      .select($"vec_id", $"cent_id".as("cell"))
    delta.join(cells, "vec_id").select($"vec_id", $"cell", $"v", $"nrm")
  }

  /** Ensure the IVF index for `dir`'s embeddings exists and covers the
    * corpus; returns (centroids with norms, inverted file). First call
    * trains + builds; a later call with a grown corpus appends ONLY
    * the missing vectors; a current index is a pure metadata probe +
    * two table reads. */
  def ensureIvf(s: SparkSession, dir: String): (DataFrame, DataFrame) = ensureLock.synchronized {
    import s.implicits._
    val root = ivfRoot(dir)
    val centsRoot = s"$root/centroids"
    val asgRoot = s"$root/assignments"
    val corpus = SimOps.vectorsWithNorm(s, dir).select($"vec_id", $"v", $"nrm")
    if (Snapshots.resolve(centsRoot).isEmpty) buildCentroids(root, corpus)
    val cents = withCentNorm(Snapshots.read(s, centsRoot))
    val missing =
      if (Snapshots.resolve(asgRoot).isEmpty) corpus
      else corpus.join(Snapshots.read(s, asgRoot).select($"vec_id"),
        Seq("vec_id"), "left_anti")
    if (!missing.isEmpty) appendIvf(s, root, missing)
    (cents, Snapshots.read(s, asgRoot))
  }

  /** Train the coarse quantizer on `trainingCorpus` and commit the
    * centroid table — the index bootstrap (and the offline-rebuild
    * entry point). Frozen afterwards: assignment is pointwise given
    * fixed centers, which is exactly what makes incremental == batch. */
  def buildCentroids(root: String, trainingCorpus: DataFrame): Long =
    Snapshots.commit(s"$root/centroids")(out =>
      trainCentroids(trainingCorpus).coalesce(1).write.mode("append").parquet(out))

  /** Assign EXACTLY `delta` against the frozen centroids and publish
    * one append commit — the O(delta) maintenance hook an ingest
    * pipeline calls per batch. */
  def appendIvf(s: SparkSession, root: String, delta: DataFrame): Long = {
    val cents = withCentNorm(Snapshots.read(s, s"$root/centroids"))
    val assigned = assignCells(delta, cents)
    if (Snapshots.resolve(s"$root/assignments").isEmpty)
      Snapshots.commit(s"$root/assignments")(out =>
        assigned.write.mode("append").parquet(out))
    else
      Snapshots.commitAppend(s"$root/assignments")(out =>
        assigned.write.mode("append").parquet(out))
  }

  /** Ensure the LSH bucket table for `dir`'s embeddings (same
    * first-build / top-up discipline; no training — the hyperplanes
    * are the fixed codegen'd expressions). */
  def ensureLsh(s: SparkSession, dir: String): DataFrame = ensureLock.synchronized {
    import s.implicits._
    val root = lshRoot(dir)
    val bktRoot = s"$root/buckets"
    val corpus = SimOps.vectorsWithNorm(s, dir).select($"vec_id", $"v", $"nrm")
    val missing =
      if (Snapshots.resolve(bktRoot).isEmpty) corpus
      else corpus.join(Snapshots.read(s, bktRoot).select($"vec_id"),
        Seq("vec_id"), "left_anti")
    if (!missing.isEmpty) appendLsh(s, root, missing)
    Snapshots.read(s, bktRoot)
  }

  /** Bucket EXACTLY `delta` and publish one append commit (O(delta)). */
  def appendLsh(s: SparkSession, root: String, delta: DataFrame): Long = {
    import s.implicits._
    graft.functions.HashExprs.register(s)
    val bucketed = delta.select($"vec_id",
      expr("lsh_bucket8(v)").as("bucket"),
      expr("lsh_bucket8b(v)").as("bucketb"),
      expr("lsh_bucket8c(v)").as("bucketc"),
      $"v", $"nrm")
    if (Snapshots.resolve(s"$root/buckets").isEmpty)
      Snapshots.commit(s"$root/buckets")(out =>
        bucketed.write.mode("append").parquet(out))
    else
      Snapshots.commitAppend(s"$root/buckets")(out =>
        bucketed.write.mode("append").parquet(out))
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Round-6 additions: eval-set decontamination. */
class Round6OpsSpec extends SparkSpec {

  test("decontaminate_eval invariants: eval set shape, bounded fractions, flag consistency") {
    import spark.implicits._
    val out = TextOps.decontaminateEval(spark, sf("0.01")).collect()
    assert(out.nonEmpty)
    // ≤20 eval docs per language (the stratified holdout sample).
    val perLang = out.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perLang.values.forall(_ <= 20))
    out.foreach { r =>
      val (nGrams, nOverlap) = (r.getLong(2), r.getLong(3))
      val frac = r.getDouble(4)
      assert(nOverlap >= 0 && nOverlap <= nGrams,
        s"overlap $nOverlap outside [0, $nGrams] for doc ${r.getLong(1)}")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getBoolean(5) == (frac >= 0.5),
        s"contaminated flag inconsistent with frac $frac")
    }
    // The audit must be non-vacuous at sf0.01: the corpus plants
    // near-dups that straddle the split, so overlap exists.
    assert(out.exists(_.getLong(3) > 0), "expected at least one overlapping eval doc")
  }

  test("decontaminate_eval: every eval doc is from the holdout split") {
    import spark.implicits._
    val evalIds = TextOps.decontaminateEval(spark, sf("0.01"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val holdout = Tables.load(spark, sf("0.01"), "documents")
      .withColumn("nib", substring(md5($"doc_id".cast("string").cast("binary")), 1, 1))
      .filter($"nib" > "d")
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(evalIds.subsetOf(holdout),
      s"eval docs leaked from train split: ${(evalIds -- holdout).take(5)}")
  }

  test("pack_sequences: offsets within budget, packing consistent with a local prefix sum") {
    import spark.implicits._
    val out = TextOps.packSequences(spark, sf("0.01")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(4) >= 0 && r.getLong(4) < 2048, s"offset out of range: $r")
    }
    // Recompute the per-lang running prefix locally and check
    // seq_id/seq_offset encode exactly floor/mod of it — i.e. the
    // distributed bucket+carry path equals the sequential semantics.
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      var pfx = 0L
      rows.sortBy(_.getLong(1)).foreach { r =>
        assert(r.getLong(3) == pfx / 2048, s"seq_id mismatch at $r (expected ${pfx / 2048})")
        assert(r.getLong(4) == pfx % 2048, s"seq_offset mismatch at $r")
        pfx += r.getLong(2)
      }
    }
  }

  test("chunk_documents: windows tile each doc with 50-char overlap and cover it") {
    import spark.implicits._
    val chunks = TextOps.chunkDocuments(spark, sf("0.001")).collect()
      .groupBy(_.getLong(0))
    val lens = Tables.load(spark, sf("0.001"), "documents")
      .select($"doc_id", length($"text").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.keySet == lens.keySet)
    chunks.foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(1) == i, s"chunk_idx gap in doc $doc")
        assert(r.getLong(2) == i * 150 + 1, s"chunk_start wrong in doc $doc")
        assert(r.getLong(3) <= 200)
      }
      val last = sorted.last
      assert(last.getLong(2) + last.getLong(3) - 1 == lens(doc),
        s"doc $doc not covered to its end")
    }
  }

  test("text_unigram_logprob: surprisal bounded by corpus entropy extremes") {
    import spark.implicits._
    val out = TextOps.textUnigramLogprob(spark, sf("0.001")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (avg, mx) = (r.getDouble(2), r.getDouble(3))
      // -log2 p ranges over (0, log2 total]; avg can't exceed max.
      assert(avg > 0 && mx > 0 && avg <= mx + 1e-9, s"bounds violated: $r")
    }
  }

  test("decontaminate_eval flags a planted holdout copy of a train doc") {
    import spark.implicits._
    // Build a corpus where holdout doc X is an exact copy of train doc
    // Y's text: X's overlap fraction must be 1.0 → contaminated. The
    // production query reads from parquet, so write a doctored corpus.
    val docs = Tables.load(spark, sf("0.001"), "documents")
    val nib = substring(md5($"doc_id".cast("string").cast("binary")), 1, 1)
    val h1 = docs.filter(nib > "d").orderBy($"doc_id").limit(1)
      .select($"doc_id", $"lang").collect()(0)
    val (hold1, holdLang) = (h1.getLong(0), h1.getString(1))
    // The copied text must come from a SAME-LANGUAGE train doc — the
    // overlap check is banded by lang, as the real audit would be.
    val train1 = docs.filter(nib <= "d" && $"lang" === holdLang)
      .orderBy($"doc_id").limit(1).select($"text").collect()(0).getString(0)
    val doctored = docs.withColumn("text",
      when($"doc_id" === hold1, lit(train1)).otherwise($"text"))
    val dir = java.nio.file.Files.createTempDirectory("decontam").toString
    try {
      doctored.write.parquet(s"$dir/documents.parquet")
      val flagged = TextOps.decontaminateEval(spark, dir)
        .filter($"doc_id" === hold1).collect()
      // hold1 is the smallest-id holdout doc, but eval picks by id-hash;
      // if it made the sample it MUST be flagged at frac 1.0.
      flagged.foreach { r =>
        assert(r.getDouble(4) == 1.0 && r.getBoolean(5),
          s"planted copy not flagged: $r")
      }
      // Guarantee the assertion above wasn't vacuous for the common
      // case: at sf0.001 every holdout doc is in the ≤20-per-lang
      // sample iff its stratum is small; check it was sampled.
      val sampled = TextOps.decontaminateEval(spark, dir)
        .filter($"doc_id" === hold1).count()
      if (sampled == 0) cancel(s"doc $hold1 not in the stratified sample at this SF")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("text_repetition_filter: metric ranges, flag consistency, max_run cross-check") {
    import spark.implicits._
    val out = TextOps.textRepetitionFilter(spark, sf("0.01")).collect()
    assert(out.length == 500)
    out.foreach { r =>
      val (topw, topb, dup) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      val run = r.getInt(5)
      assert(topw > 0.0 && topw <= 1.0 && topb > 0.0 && topb <= 1.0)
      assert(dup >= 0.0 && dup < 1.0)
      assert(run >= 1, s"max_run must be >= 1 for non-empty docs: $r")
      assert(r.getBoolean(6) ==
        (topw >= 0.15 || topb >= 0.06 || dup >= 0.7 || run >= 3),
        s"repetitive flag inconsistent: $r")
    }
    // Non-vacuous gate: both classes present.
    assert(out.exists(_.getBoolean(6)) && out.exists(!_.getBoolean(6)))
    // Cross-check the aggregate-fold max_run against a plain Scala scan
    // for every doc (the fold is the one non-obvious expression here).
    val texts = Tables.load(spark, sf("0.01"), "documents")
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val toks = texts(r.getLong(0)).split(" ")
      var best = 1; var run = 1
      for (i <- 1 until toks.length) {
        run = if (toks(i) == toks(i - 1)) run + 1 else 1
        best = math.max(best, run)
      }
      assert(r.getInt(5) == best,
        s"max_run fold diverged from sequential scan for doc ${r.getLong(0)}")
    }
  }

  test("ts_anomaly_zscore: warm-up nulls, flag consistency, both classes present") {
    import spark.implicits._
    val out = graft.operators.Windows.tsAnomalyZscore(spark, sf("0.01")).collect()
    assert(out.nonEmpty)
    // First observed hour of every series has no history: mu/sd/z null.
    val firstPerType = out.groupBy(_.getString(1))
      .map { case (_, rows) => rows.minBy(_.getTimestamp(0).getTime) }
    firstPerType.foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
        s"first row of a series must be unscored: $r")
      assert(!r.getBoolean(6), "unscored rows are never anomalous")
    }
    out.foreach { r =>
      if (!r.isNullAt(5))
        assert(r.getBoolean(6) == (math.abs(r.getDouble(5)) >= 2.5),
          s"anomalous flag inconsistent with z: $r")
      else assert(!r.getBoolean(6))
    }
    assert(out.exists(_.getBoolean(6)) && out.exists(!_.getBoolean(6)),
      "threshold must split the data")
  }

  test("text_bigram_logprob: n_bigrams = n_tokens - 1; surprisal bounds") {
    import spark.implicits._
    val out = TextOps.textBigramLogprob(spark, sf("0.01")).collect()
    assert(out.length == 500)
    val nTokens = Tables.load(spark, sf("0.01"), "documents")
      .select($"doc_id", size(split($"text", " ")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { r =>
      assert(r.getLong(1) == nTokens(r.getLong(0)) - 1,
        s"bigram count must be token count - 1: $r")
      // MLE on the training corpus itself: every bigram has support, so
      // surprisal is finite and non-negative; max dominates the mean.
      assert(r.getDouble(2) >= 0.0 && r.getDouble(3) >= r.getDouble(2) - 1e-9)
    }
  }

  test("join_fuzzy_levenshtein: blocking, canonical pair order, exact distances") {
    import spark.implicits._
    val out = graft.operators.Joins.joinFuzzyLevenshtein(spark, sf("0.01")).collect()
    assert(out.nonEmpty)
    def levRef(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    out.foreach { r =>
      val (na, nb, lev) = (r.getString(0), r.getString(1), r.getInt(2))
      assert(na < nb, "pairs must be canonically ordered (no mirror dups)")
      assert(na.split(" ")(1) == nb.split(" ")(1), "blocking key must match")
      assert(lev >= 1 && lev <= 2, s"distinct names within threshold: $r")
      assert(lev == levRef(na, nb), s"levenshtein disagrees with reference DP: $r")
      assert(r.getLong(3) > 0 && r.getLong(4) > 0)
    }
  }

  test("pipeline_pretrain: gate, dedup, and split each strictly shrink the corpus") {
    import spark.implicits._
    val out = TextOps.pipelinePretrain(spark, sf("0.01")).collect()
    assert(out.nonEmpty)
    val survivors = out.map(_.getLong(2)).sum
    val total = Tables.load(spark, sf("0.01"), "documents").count()
    // Repetition gate (151 flagged at sf0.01), dedup, and the ~1/8
    // holdout cut must all bite: the surviving train set is well under
    // the corpus but far from empty.
    assert(survivors > 0 && survivors < total * 9 / 10,
      s"pipeline dropped nothing: $survivors of $total")
    out.foreach { r =>
      val (n, tok, avg) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(n > 0 && tok >= 10 * n, s"gated docs carry >=10 tokens each: $r")
      assert(math.abs(avg - tok.toDouble / n) < 1e-3)
    }
  }

  test("agg_weighted_median: matches a local exact computation") {
    import spark.implicits._
    val out = graft.operators.Aggs.aggWeightedMedian(spark, sf("0.01")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val rows = Tables.load(spark, sf("0.01"), "lineitem")
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity".cast("long"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (flag, grp) =>
      val sorted = grp.sortBy(_._2)
      val total = sorted.map(_._3).sum
      var cum = 0L
      val median = sorted.find { case (_, _, w) => cum += w; cum * 2 >= total }.get._2
      assert(out(flag) == ((total, median)),
        s"weighted median diverged for $flag: got ${out(flag)}, want ($total, $median)")
    }
  }

  test("embedding_quantize: int8 range, full coverage, bounded reconstruction error") {
    import spark.implicits._
    val out = graft.operators.SimOps.embeddingQuantize(spark, sf("0.01")).collect()
    assert(out.length == 500)
    out.foreach { r =>
      assert(r.getLong(1) == 64, s"every vector has 64 dims: $r")
      assert(r.getLong(2) >= -128L * 64 && r.getLong(2) <= 127L * 64,
        s"checksum outside the attainable code-sum range: $r")
      assert(r.getInt(3) >= -128 && r.getInt(4) <= 127,
        s"codes must stay in int8 range: $r")
      // 8-bit quantization error bound: half a step of the widest dim.
      // Steps here are (mx-mn)/255 with |x| <= ~1.5 → well under 0.01.
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) < 0.01,
        s"reconstruction error above the 8-bit step bound: $r")
    }
    // Extremes are hit: some dim of some vector sits at its min and max.
    assert(out.exists(_.getInt(3) == -128) && out.exists(_.getInt(4) == 127))
  }

  test("mix_sources: copy counts per weight class, stable ids, determinism") {
    import spark.implicits._
    val out = TextOps.mixSources(spark, sf("0.01")).collect()
    val up = Set("src1", "src6", "src11", "src16")
    val down = Set("src3", "src8", "src13", "src18")
    val perDoc = out.groupBy(_.getLong(0))
    perDoc.foreach { case (_, rows) =>
      val src = rows.head.getString(2)
      val n = rows.length
      if (up(src)) assert(n == 2 || n == 3, s"upsampled doc has $n copies")
      else if (down(src)) assert(n == 1, s"surviving downsampled doc has $n copies")
      else assert(n == 1, s"passthrough doc has $n copies")
      assert(rows.map(_.getInt(3)).sorted.toSeq == (1 to n),
        "copy numbers must be 1..n")
    }
    // Downsampling must actually drop docs (≈3/4 of the class).
    val allDown = Tables.load(spark, sf("0.01"), "documents")
      .filter($"source".isin(down.toSeq: _*)).count()
    val keptDown = perDoc.count { case (_, rows) => down(rows.head.getString(2)) }
    assert(keptDown < allDown, "downsampling dropped nothing")
    // Upsampling must produce some 3-copy docs (the fractional draw).
    assert(perDoc.exists { case (_, rows) => rows.length == 3 })
    // mix_id is unique — safe as a downstream key.
    assert(out.map(_.getLong(4)).distinct.length == out.length)
    // Pure function of the input: a second run is bit-identical.
    val again = TextOps.mixSources(spark, sf("0.01")).collect()
    assert(out.sameElements(again))
  }
}

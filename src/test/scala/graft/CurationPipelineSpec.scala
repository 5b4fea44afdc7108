package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** The full LLM-training-data curation lifecycle, end to end, on one
  * corpus — the LLM-side sibling of [[ReferencePipelineSpec]]'s index
  * lifecycle. Every stage is oracle-/spec-verified on its own; this
  * spec proves the COMPOSITION a data-curation user actually runs:
  *
  *   raw docs → quality gate → exact dedup → ExactSubstr span cut →
  *   decontaminate vs a benchmark → DSIR-select toward a target →
  *   temperature-mix sources → chunk → pack into context windows →
  *   BPE-tokenize and count the final token budget.
  *
  * Assertions pin the pipeline's conservation laws (every stage only
  * removes or re-buckets, nothing duplicates), the cross-stage
  * contracts (cut text stays canonical for downstream hashing;
  * selection only picks surviving docs), and the end artifact (every
  * packed chunk carries a positive BPE token count). */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("raw docs → filter → dedup → cut → decontaminate → select → mix → chunk → pack → tokenize") {
    val raw = spark.read.parquet(s"$sf0001/documents.parquet").cache()
    val nRaw = raw.count()

    // 1. quality gate: drop the bottom 20% by the fused text-stats score
    val quality = CorpusOps.qualityFilter(raw, pct = 0.2, exact = true).cache()
    val nQuality = quality.count()
    assert(nQuality > 0 && nQuality <= nRaw)

    // 2. exact dedup: keep each content hash's canonical (lowest) doc
    val deduped = Dedup.exactDedup(quality).where(!$"is_dup")
      .select($"doc_id", $"source", $"text").cache()
    val nDeduped = deduped.count()
    assert(nDeduped <= nQuality)
    assert(deduped.select(md5($"text")).distinct().count() == nDeduped,
      "post-dedup texts must be hash-unique")

    // 3. ExactSubstr: cut the later copy of every duplicated span ≥ 5
    // tokens; cutSpans emits (doc_id, clean_text, removed_tokens) — the
    // cleaned text becomes the pipeline's text, source rides back in
    val spans = Dedup.duplicateSpans(deduped, minTokens = 5)
    val cut = Dedup.cutSpans(deduped, spans)
      .join(deduped.select($"doc_id", $"source"), Seq("doc_id"))
      .select($"doc_id", $"source", $"clean_text".as("text"),
        $"removed_tokens")
      .cache()
    assert(cut.count() == nDeduped, "cutting rewrites text, never drops docs")
    assert(cut.where($"removed_tokens" < 0).count() == 0,
      "span cutting can only remove tokens")

    // 4. decontamination: no surviving doc shares an 8-gram with the benchmark
    val benchmark = raw.where(pmod($"doc_id", lit(50L)) === 0L)
    val verdicts = CorpusOps.decontaminate(cut, benchmark, n = 8)
    val clean = cut.join(
      verdicts.where(!$"is_contaminated").select($"doc_id"), Seq("doc_id"))
      .cache()
    assert(clean.count() <= nDeduped)

    // 5. DSIR: select toward the src0 slice from the rest of the pool
    val target = clean.where($"source" === "src0")
    val pool = clean.where($"source" =!= "src0")
    val kSel = math.min(60L, pool.count()).toInt
    val picked = Dsir.select(target, pool, k = kSel, b = 128).select($"doc_id")
    val selected = pool.join(picked, Seq("doc_id"), "left_semi")
      .unionByName(target) // the target slice rides along into training
      .cache()
    assert(selected.count() == kSel + target.count())
    assert(selected.select($"doc_id").distinct().count() == selected.count(),
      "selection must never duplicate a doc")

    // 6. temperature mixing: α=0.5 quotas over the selected corpus
    val mixed = CorpusOps.temperatureSample(selected,
      totalBudget = math.max(1L, selected.count() / 2), alpha = 0.5).cache()
    assert(mixed.count() <= selected.count() / 2 + 1)

    // 7-8. chunk into 64-token windows (stride 48), pack chunks into
    // ~512-token bins per (source, subshard)
    val chunks = CorpusOps.chunkByTokens(
      mixed.select($"doc_id", $"source", $"text"), chunkTokens = 64, strideTokens = 48)
    assert(chunks.count() >= mixed.count(), "every doc yields ≥ 1 chunk")
    val packed = CorpusOps.packByTokens(
      mixed.select($"doc_id", $"source", $"text"), budget = 512, subShards = 4)
    assert(packed.where($"bin" < 0).count() == 0)

    // 9. the final budget: BPE token counts with a table trained on the
    // clean corpus itself — every surviving doc tokenizes to ≥ 1 token
    val merges = BpeTrain.train(mixed.select($"doc_id", $"text"), numMerges = 4)
    val counts = BpeTrain.tokenCounts(mixed.select($"doc_id", $"text"), merges)
    assert(counts.count() == mixed.count())
    assert(counts.where($"n_bpe_tokens" < $"n_words").count() == 0,
      "BPE tokens can never undercut whitespace words")
    val budget = counts.select(sum($"n_bpe_tokens")).head.getLong(0)
    info(s"curated ${mixed.count()} docs → $budget BPE tokens " +
      s"(from $nRaw raw docs; ${chunks.count()} chunks)")
    assert(budget > 0)
  }
}

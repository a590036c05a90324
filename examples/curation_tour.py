"""Curation tour: the engine's training-data surface in one script.

The reference (getomni-ai/zerox) converts ONE document per call; this
engine treats the crawl as a TABLE and adds the corpus-level operators
an LLM-pretraining pipeline needs around the converter. This tour runs
a miniature end-to-end curation pass over the sf0.001 test corpus:

  1. ingest       the same crawl read back from .warc.gz (Common
                  Crawl's container) — byte-identical extraction
  2. extract      run_ocr: pages(url, html) -> documents markdown
  3. dedup        exact + MinHash-LSH near-dup, cluster-size histogram
  4. quality      Gopher ∧ C4 rules ∧ trained-NB classifier gates
  5. LM scoring   unigram + stupid-backoff bigram fluency; learned
                  BPE merges + per-doc subword budget
  6. graph        PageRank, k-core, co-citation over the link graph
  7. pack         quality-tiered shards + GPT-style wrap-around
                  sequence packing

Every step is a lazy Ray Data pipeline (streaming blocks, bounded
exchanges); .to_pandas() here only because the demo corpus is tiny.

Run:  python examples/curation_tour.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from zerox_ray import run_ocr
    from zerox_ray.pipelines.dataops import dedup_exact
    from zerox_ray.pipelines.dedup import neardup_cluster_sizes
    from zerox_ray.pipelines.graph import cocitation_counts, kcore, pagerank
    from zerox_ray.pipelines.textqual import (
        bigram_logprobs,
        gopher_rules,
        tier_shards,
    )
    from zerox_ray.testgen import pages_dir_for

    pages = pages_dir_for(SF_DIR)  # deterministic synthetic crawl table

    # 1. ingest — the identical corpus from Common Crawl's on-disk format
    from zerox_ray.sources.warc import read_warc_pages
    from zerox_ray.testgen import warc_dir_for

    warc_pages = read_warc_pages(warc_dir_for(SF_DIR))
    print(f"WARC records ingested: {warc_pages.count()}")

    # 2. extract — the flagship pages -> markdown documents pipeline
    docs = run_ocr(pages)
    print(f"extracted {docs.count()} documents")

    # 2. dedup — exact keepers + how much sits in near-dup clusters
    keepers = dedup_exact(SF_DIR)
    print(f"exact-dedup keepers: {keepers.count()}")
    print("near-dup cluster sizes:")
    print(neardup_cluster_sizes(SF_DIR).to_pandas().to_string(index=False))

    # 4. quality — rule flags (the curate capstones chain these with
    # the classifier and the CCNet tertile gates)
    g = gopher_rules(SF_DIR).to_pandas()
    print(f"gopher keep-rate: {g.keep.mean():.2%}")
    from zerox_ray.pipelines.textqual import c4_rules, classifier_trained_scores

    c4 = c4_rules(pages).to_pandas()
    print(f"C4 keep-rate: {c4.keep.mean():.2%}")
    nb = classifier_trained_scores(SF_DIR).to_pandas()
    print(f"trained-NB median score: {int(nb.score_ppm.median())} ppm")

    # 5. LM scoring — order-2 fluency; tokenizer training + budget
    b = bigram_logprobs(SF_DIR).to_pandas()
    print(f"bigram xent_micro: median {int(b.xent2_micro.median())}")
    from zerox_ray.pipelines.textqual import bpe_encode, bpe_merges

    m = bpe_merges(SF_DIR).to_pandas()
    print("learned BPE merges:", [f"{l}+{r}" for l, r in zip(m.left_sym, m.right_sym)])
    enc = bpe_encode(SF_DIR).to_pandas()
    print(f"subword budget: {int(enc.n_subwords.sum())} over {int(enc.n_words.sum())} words")

    # 6. graph — link-derived signals for ranking/curation
    pr = pagerank(pages).to_pandas().nlargest(3, "rank")
    print("top pages by PageRank:")
    print(pr.to_string(index=False))
    print(f"4-core pages after 3 peels: {kcore(pages).count()}")
    cc = cocitation_counts(pages).to_pandas()
    print(f"co-cited page pairs (>=2 shared citers): {len(cc)}")

    # 7. pack — tiered shards + wrap-around sequence packing
    shards = tier_shards(SF_DIR).to_pandas()
    sizes = shards.groupby("tier").shard_id.nunique()
    print("shards per tier:", dict(sizes))
    from zerox_ray.pipelines.dataops import packed_sequences

    seqs = packed_sequences(SF_DIR).to_pandas()
    print(f"packed {seqs.seq_id.nunique()} training sequences "
          f"({(seqs.groupby('doc_id').size() > 1).sum()} docs straddle boundaries)")

    ray.shutdown()


if __name__ == "__main__":
    main()

"""Curation tour: the engine's training-data surface in one script.

The reference (getomni-ai/zerox) converts ONE document per call; this
engine treats the crawl as a TABLE and adds the corpus-level operators
an LLM-pretraining pipeline needs around the converter. This tour runs
a miniature end-to-end curation pass over the sf0.001 test corpus:

  1. extract      run_ocr: pages(url, html) -> documents markdown
  2. dedup        exact + MinHash-LSH near-dup, cluster-size histogram
  3. quality      Gopher rules ∧ hashed classifier ∧ CCNet tertiles
  4. LM scoring   unigram + stupid-backoff bigram fluency
  5. graph        PageRank, k-core, co-citation over the link graph
  6. pack         quality-tiered token-budget training shards

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

    # 1. extract — the flagship pages -> markdown documents pipeline
    docs = run_ocr(pages)
    print(f"extracted {docs.count()} documents")

    # 2. dedup — exact keepers + how much sits in near-dup clusters
    keepers = dedup_exact(SF_DIR)
    print(f"exact-dedup keepers: {keepers.count()}")
    print("near-dup cluster sizes:")
    print(neardup_cluster_sizes(SF_DIR).to_pandas().to_string(index=False))

    # 3. quality — rule flags (the curate capstones chain these with
    # the classifier and the CCNet tertile gates)
    g = gopher_rules(SF_DIR).to_pandas()
    print(f"gopher keep-rate: {g.keep.mean():.2%}")

    # 4. LM scoring — order-2 fluency with stupid backoff
    b = bigram_logprobs(SF_DIR).to_pandas()
    print(f"bigram xent_micro: median {int(b.xent2_micro.median())}")

    # 5. graph — link-derived signals for ranking/curation
    pr = pagerank(pages).to_pandas().nlargest(3, "rank")
    print("top pages by PageRank:")
    print(pr.to_string(index=False))
    print(f"4-core pages after 3 peels: {kcore(pages).count()}")
    cc = cocitation_counts(pages).to_pandas()
    print(f"co-cited page pairs (>=2 shared citers): {len(cc)}")

    # 6. pack — quality-tiered token-budget training shards
    shards = tier_shards(SF_DIR).to_pandas()
    sizes = shards.groupby("tier").shard_id.nunique()
    print("shards per tier:", dict(sizes))

    ray.shutdown()


if __name__ == "__main__":
    main()

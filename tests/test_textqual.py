"""Tests for the webtext quality / LM-scoring family (textqual.py):
semantic invariants plus DuckDB cross-checks of the integer kernels."""

import duckdb
import numpy as np
import pandas as pd

from zerox_ray.pipelines.textqual import (
    classifier_scores,
    gopher_rules,
    inverted_index,
    perplexity_buckets,
    unigram_logprobs,
)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).df()


def _cmp(got: pd.DataFrame, exp: pd.DataFrame, keys):
    got = got.sort_values(keys).reset_index(drop=True)[sorted(got.columns)]
    exp = exp.sort_values(keys).reset_index(drop=True)[sorted(exp.columns)]
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_gopher_rules_flags_and_keep(sf_dir):
    got = gopher_rules(sf_dir).to_pandas()
    n_docs = _duck(sf_dir, "SELECT count(*) n FROM documents")["n"][0]
    assert len(got) == n_docs
    # keep is exactly the conjunction of the four flags
    conj = (
        got.flag_word_count * got.flag_word_len * got.flag_top_word * got.flag_stopwords
    )
    assert (got.keep == conj).all()
    # every flag must have both pass and fail mass on the synthetic corpus
    for c in ("flag_word_count", "flag_word_len", "flag_top_word", "flag_stopwords"):
        assert 0 < got[c].sum() < len(got), c
    # metrics cross-check vs SQL
    exp = _duck(
        sf_dir,
        """SELECT doc_id, len(string_split(text,' ')) n_words,
           1000000*(length(text) - (len(string_split(text,' ')) - 1))
             // len(string_split(text,' ')) mean_word_len_ppm
           FROM documents""",
    )
    _cmp(got[["doc_id", "n_words", "mean_word_len_ppm"]], exp, ["doc_id"])


def test_unigram_logprobs_matches_sql(sf_dir):
    got = unigram_logprobs(sf_dir).to_pandas()
    exp = _duck(
        sf_dir,
        """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text,' ')) t FROM documents),
        ctf AS (SELECT t, count(*) c FROM tok GROUP BY t),
        ic AS (SELECT t, (1000000 * (SELECT count(*) FROM tok)) // c AS ic FROM ctf)
        SELECT doc_id, any_value(lang) lang, count(*) n_words,
               CAST(sum(ic.ic) AS BIGINT) ic_sum,
               CAST(sum(ic.ic) // count(*) AS BIGINT) xent_micro
        FROM tok JOIN ic USING (t) GROUP BY doc_id""",
    )
    _cmp(got, exp, ["doc_id"])
    # rarer tokens ⇒ higher ic: every score is at least the uniform floor
    assert (got.xent_micro >= 1_000_000).all()


def test_perplexity_buckets_are_tertiles(sf_dir):
    got = perplexity_buckets(sf_dir).to_pandas()
    # per-lang bucket masses are within one histogram bin of a third
    for lang, g in got.groupby("lang"):
        frac = g.bucket.value_counts(normalize=True)
        for b in ("head", "middle", "tail"):
            assert 0.15 < frac.get(b, 0.0) < 0.55, (lang, b, frac.to_dict())
    # buckets are monotone in score within a language
    for _, g in got.groupby("lang"):
        assert g[g.bucket == "head"].xent_micro.max() <= g[
            g.bucket == "middle"
        ].xent_micro.min() + (g.xent_micro.max() // 4096 + 1)


def test_classifier_scores_deterministic_weights(sf_dir):
    got = classifier_scores(sf_dir).to_pandas()
    # replay one doc by hand
    import hashlib

    doc = _duck(sf_dir, "SELECT doc_id, text FROM documents LIMIT 1")
    toks = doc.text[0].split(" ")
    ws = sum(int(hashlib.md5(t.encode()).hexdigest()[:16], 16) % 2001 for t in toks)
    row = got[got.doc_id == doc.doc_id[0]].iloc[0]
    assert row.w_sum == ws and row.n_words == len(toks)
    assert row.label == ("keep" if ws // len(toks) >= 1000 else "drop")
    assert set(got.label) <= {"keep", "drop"}


def test_inverted_index_postings(sf_dir):
    got = inverted_index(sf_dir).to_pandas()
    exp = _duck(
        sf_dir,
        """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) t FROM documents)
        SELECT t term, count(DISTINCT doc_id) df, count(*) ctf FROM tok GROUP BY t""",
    )
    _cmp(got[["term", "df", "ctf"]], exp, ["term"])
    # postings are ascending, ≤8 ids, and each id really contains the term
    docs = _duck(sf_dir, "SELECT doc_id, text FROM documents").set_index("doc_id")
    for r in got.itertuples():
        ids = [int(x) for x in r.top_docs.split(",")]
        assert ids == sorted(ids) and len(ids) <= 8
        assert len(ids) == min(8, r.df)
        for i in ids[:2]:
            assert r.term in docs.loc[i, "text"].split(" ")


def test_inverted_index_cap_is_mergeable(sf_dir):
    # the capped partial merge must equal the global first-K regardless
    # of how doc ids are split across blocks — check against SQL
    got = inverted_index(sf_dir).to_pandas()
    exp = _duck(
        sf_dir,
        """WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) t FROM documents),
        d AS (SELECT DISTINCT t term, doc_id FROM tok),
        r AS (SELECT *, row_number() OVER (PARTITION BY term ORDER BY doc_id) rn FROM d)
        SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) top_docs
        FROM r WHERE rn <= 8 GROUP BY term""",
    )
    _cmp(got[["term", "top_docs"]], exp, ["term"])


def test_quality_curate_is_the_gate_composition(sf_dir):
    from zerox_ray.pipelines.textqual import quality_curate

    got = quality_curate(sf_dir).to_pandas()
    g = gopher_rules(sf_dir).to_pandas().set_index("doc_id")
    c = classifier_scores(sf_dir).to_pandas().set_index("doc_id")
    p = perplexity_buckets(sf_dir).to_pandas().set_index("doc_id")
    # survivors = docs passing all three gates, minus exact-dup losers
    want = set(g[g.keep == 1].index) & set(c[c.label == "keep"].index) & set(
        p[p.bucket != "tail"].index
    )
    assert set(got.doc_id) <= want
    # every gated-out survivor missing from got is a duplicate of a
    # smaller kept doc_id with identical text
    docs = _duck(sf_dir, "SELECT doc_id, text FROM documents").set_index("doc_id")
    kept = set(got.doc_id)
    for d in want - kept:
        twins = docs[docs.text == docs.loc[d, "text"]].index
        assert min(t for t in twins if t in kept or t in want) < d
    # carried columns agree with the standalone operators
    m = got.set_index("doc_id")
    assert (m.bucket == p.loc[m.index].bucket).all()
    assert (m.mean_milli == c.loc[m.index].mean_milli).all()
    assert (m.xent_micro == p.loc[m.index].xent_micro).all()


def test_bigram_counts_no_cross_doc_pairs(sf_dir):
    from zerox_ray.pipelines.textqual import bigram_counts

    got = bigram_counts(sf_dir).to_pandas()
    exp = _duck(
        sf_dir,
        """WITH w AS (SELECT string_split(text,' ') ws FROM documents),
        z AS (SELECT unnest(list_zip(ws[:-1], ws[2:])) z FROM w)
        SELECT z[1] w1, z[2] w2, count(*) n FROM z
        WHERE z[2] IS NOT NULL GROUP BY 1,2
        HAVING count(*) >= 2""",
    )
    _cmp(got, exp, ["w1", "w2"])
    assert (got.n >= 2).all()
    # total pair mass (pre-filter) equals sum(len-1): replay on a sample
    docs = _duck(sf_dir, "SELECT text FROM documents")
    from collections import Counter

    c = Counter()
    for t in docs.text:
        ws = t.split(" ")
        c.update(zip(ws[:-1], ws[1:]))
    want = {k: v for k, v in c.items() if v >= 2}
    assert dict(zip(zip(got.w1, got.w2), got.n)) == want


def test_dup_class_sizes_and_datacard(sf_dir):
    from zerox_ray.pipelines.dataops import corpus_datacard, dup_class_sizes

    sizes = dup_class_sizes(sf_dir).to_pandas()
    docs = _duck(sf_dir, "SELECT lang, source, text FROM documents")
    vc = docs.text.value_counts().value_counts()
    assert dict(zip(sizes.n_copies, sizes.n_classes)) == {
        int(k): int(v) for k, v in vc.items()
    }
    # histogram mass re-totals to the corpus size
    assert (sizes.n_copies * sizes.n_classes).sum() == len(docs)

    card = corpus_datacard(sf_dir).to_pandas()
    assert card.n_docs.sum() == len(docs)
    g = docs.groupby(["lang", "source"])
    assert dict(zip(zip(card.lang, card.source), card.n_docs)) == g.size().to_dict()
    assert dict(zip(zip(card.lang, card.source), card.n_distinct_texts)) == {
        k: v for k, v in g.text.nunique().items()
    }
    assert ((card.dup_ppm >= 0) & (card.dup_ppm < 1_000_000)).all()


def test_tier_shards_tiers_and_packing(sf_dir):
    from zerox_ray.pipelines.textqual import tier_shards

    got = tier_shards(sf_dir).to_pandas()
    p = perplexity_buckets(sf_dir).to_pandas().set_index("doc_id")
    m = got.set_index("doc_id")
    # tier IS the perplexity bucket
    assert (m.tier == p.loc[m.index].bucket).all()
    for tier, g in got.groupby("tier"):
        g = g.sort_values("doc_id")
        # shard ids are contiguous from 0 and nondecreasing in doc order
        assert g.shard_id.iloc[0] == 0
        assert (g.shard_id.diff().fillna(0) >= 0).all()
        assert set(g.shard_id) == set(range(g.shard_id.max() + 1))
        # every shard except the last carries ≥ tokens_per_shard once its
        # successor starts (exclusive-prefix packing invariant)
        tot = g.groupby("shard_id").n_tokens.sum()
        assert (tot.iloc[:-1].cumsum() >= 2_000 * (tot.index[:-1] + 1)).all()


def test_bigram_logprobs_matches_python_model(sf_dir):
    from zerox_ray.pipelines.textqual import bigram_logprobs

    got = bigram_logprobs(sf_dir).to_pandas().set_index("doc_id").sort_index()
    docs = _duck(sf_dir, "SELECT doc_id, text FROM documents ORDER BY doc_id")
    # brute-force reference model in pure python
    from collections import Counter

    c1, c2 = Counter(), Counter()
    for t in docs.text:
        ws = t.split(" ")
        c1.update(ws)
        c2.update(zip(ws[:-1], ws[1:]))
    total = sum(c1.values())
    seen_hits = back_hits = 0
    for doc_id, t in zip(docs.doc_id, docs.text):
        ws = t.split(" ")
        if len(ws) < 2:
            assert doc_id not in got.index
            continue
        s = 0
        for a, b in zip(ws[:-1], ws[1:]):
            if c2[(a, b)] >= 2:
                s += (1_000_000 * c1[a]) // c2[(a, b)]
                seen_hits += 1
            else:
                s += 2 * ((1_000_000 * total) // c1[b])
                back_hits += 1
        row = got.loc[doc_id]
        assert row.n_bigrams == len(ws) - 1
        assert row.ic2_sum == s
        assert row.xent2_micro == s // (len(ws) - 1)
    # both the seen-pair path and the backoff path must carry mass
    assert seen_hits > 0 and back_hits > 0


def test_vocab_growth_monotone_and_final_totals(sf_dir):
    from zerox_ray.pipelines.textqual import vocab_growth

    got = vocab_growth(sf_dir).to_pandas().sort_values("checkpoint")
    assert len(got) == 8
    # cumulative curves are nondecreasing; the last checkpoint covers
    # the whole corpus
    assert (got.n_tokens.diff().dropna() >= 0).all()
    assert (got.vocab_size.diff().dropna() >= 0).all()
    exp = _duck(
        sf_dir,
        """SELECT count(*) nt, count(DISTINCT t) v FROM
           (SELECT unnest(string_split(text,' ')) t FROM documents)""",
    )
    assert got.n_tokens.iloc[-1] == exp.nt[0]
    assert got.vocab_size.iloc[-1] == exp.v[0]
    assert got.n_docs.iloc[-1] == _duck(sf_dir, "SELECT count(*) c FROM documents").c[0]


def test_pmi_pairs_matches_python_replica(sf_dir):
    from collections import Counter

    from zerox_ray.pipelines.textqual import pmi_pairs

    got = pmi_pairs(sf_dir).to_pandas()
    docs = _duck(sf_dir, "SELECT text FROM documents ORDER BY doc_id")
    c1, c2 = Counter(), Counter()
    p_total = 0
    for t in docs.text:
        ws = t.split(" ")
        c1.update(ws)
        for off in (1, 2, 3):
            for a, b in zip(ws[:-off], ws[off:]):
                c2[(min(a, b), max(a, b))] += 1
                p_total += 1
    t_total = sum(c1.values())
    want = {
        k: (v, (1_000_000 * v * t_total * t_total) // (p_total * c1[k[0]] * c1[k[1]]))
        for k, v in c2.items()
        if v >= 2
    }
    got_m = {
        (a, b): (n, r)
        for a, b, n, r in zip(got.w1, got.w2, got.n, got.pmi_ratio_ppm)
    }
    assert got_m == want
    # stopword-adjacent pairs carry high counts but PMI near/below 1e6;
    # the corpus must exercise both positive and negative association
    assert (got.pmi_ratio_ppm > 1_000_000).any()
    assert (got.pmi_ratio_ppm < 1_000_000).any()


def test_ngram_novelty_matches_pure_python_replay(sf_dir):
    import duckdb

    from zerox_ray.pipelines.textqual import ngram_novelty

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    df = {}  # bigram -> set of docs
    per_doc = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        bgs = {(a, b) for a, b in zip(toks, toks[1:])}
        per_doc[doc_id] = bgs
        for bg in bgs:
            df.setdefault(bg, set()).add(doc_id)
    got = ngram_novelty(sf_dir).to_pandas().set_index("doc_id")
    assert len(got) == len(docs)
    for doc_id, bgs in per_doc.items():
        nb = len(bgs)
        novel = sum(1 for bg in bgs if len(df[bg]) == 1)
        row = got.loc[doc_id]
        assert row.n_bigrams == nb and row.n_novel == novel, doc_id
        assert row.novelty_ppm == (novel * 1_000_000) // nb if nb else 0
    # both signal directions present on the synthetic corpus
    assert (got.n_novel > 0).any() and (got.n_novel < got.n_bigrams).any()


def test_c4_rules_invariants(sf_dir):
    """Both pass and fail mass on every C4 rule; kept text reconstructs
    only surviving pages in page order; corrupt docs vanish."""
    import re

    from zerox_ray.pipelines.textqual import c4_rules
    from zerox_ray.testgen import pages_dir_for

    df = c4_rules(pages_dir_for(sf_dir)).to_pandas()
    # corrupt docs (doc_id % 101 == 13) have no SUCCESS page → absent
    assert len(df) == 495
    assert df["keep"].isin([0, 1]).all()
    assert 0 < df["keep"].sum() < len(df)  # both outcomes occur
    assert (df["kept_lines"] <= df["n_lines"]).all()
    # doc rule is exactly kept_lines >= 3
    assert ((df["kept_lines"] >= 3) == (df["keep"] == 1)).all()
    # c4_text contains no banned token and only >=5-word lines
    for txt, kl in zip(df["c4_text"], df["kept_lines"]):
        lines = txt.split("\n\n") if txt else []
        assert len(lines) == kl
        for ln in lines:
            assert "slow" not in ln
            assert len(re.findall(r"[a-z]+", ln)) >= 5


def test_c4_rules_empty_and_all_banned():
    """A corpus where every line fails still yields well-typed rows."""
    import pyarrow as pa
    import ray.data

    from zerox_ray.pipelines.textqual import c4_rules
    from zerox_ray.testgen import build_html

    payload = build_html(1, ["slow slow line here today", "tiny"], False)
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["https://x/1"]),
                "html": pa.array([payload], pa.binary()),
            }
        )
    )
    df = c4_rules(pages).to_pandas()
    assert len(df) == 1
    r = df.iloc[0]
    assert r["n_lines"] == 2 and r["kept_lines"] == 0
    assert r["keep"] == 0 and r["c4_text"] == ""


def test_classifier_train_and_infer(sf_dir):
    """Model counts tally with the raw corpus; smoothing bounds hold;
    inference reproduces a hand-computed doc score."""
    import re

    import numpy as np
    import pyarrow.parquet as pq

    from zerox_ray.functions.hashing import md5_64_array
    from zerox_ray.pipelines.textqual import (
        classifier_train,
        classifier_trained_scores,
    )

    model = classifier_train(sf_dir).to_pandas().set_index("bucket")
    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    tok = re.compile(r"[a-z]+")
    n_pos = sum(
        len(tok.findall(t)) for t, lg in zip(docs["text"], docs["lang"]) if lg == "en"
    )
    assert model["n_pos"].sum() == n_pos
    assert ((model["pos_rate_ppm"] > 0) & (model["pos_rate_ppm"] < 1_000_000)).all()
    # hand-score one doc
    scores = classifier_trained_scores(sf_dir).to_pandas().set_index("doc_id")
    row = docs.iloc[7]
    toks = tok.findall(row["text"])
    buckets = (md5_64_array([t.encode() for t in toks]) % np.uint64(4096)).astype(int)
    expect = sum(int(model.loc[b, "pos_rate_ppm"]) for b in buckets) // len(toks)
    assert int(scores.loc[row["doc_id"], "score_ppm"]) == expect
    assert scores["keep"].isin([0, 1]).all()


def test_bpe_merges_match_pure_python_reference(sf_dir):
    """Replay classic BPE (get_stats over occurrences + greedy replace)
    independently and compare all three learned merges."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    from zerox_ray.pipelines.textqual import bpe_merges

    got = bpe_merges(sf_dir).to_pandas()
    assert list(got["round"]) == [1, 2, 3]

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    words = [w for t in texts for w in re.findall(r"[a-z]+", t)]
    expand = {}
    ex = lambda s: "".join(expand.get(c, c) for c in s)  # noqa: E731
    merges = []
    for r in range(3):
        pc = Counter()
        for w in words:
            for a, b in zip(w, w[1:]):
                pc[(a, b)] += 1
        (la, rb), n = min(pc.items(), key=lambda kv: (-kv[1], ex(kv[0][0]), ex(kv[0][1])))
        merges.append((r + 1, ex(la), ex(rb), n))
        ph = chr(1 + r)
        expand[ph] = ex(la) + ex(rb)
        words = [w.replace(la + rb, ph) for w in words]
    assert [tuple(r) for r in got.itertuples(index=False)] == merges
    # later merges can compose earlier ones: expanded symbols grow
    assert max(len(s) for s in got["left_sym"]) >= 1
    assert (got["pair_count"] > 0).all()


def test_bpe_encode_compresses(sf_dir):
    """Subword counts sit strictly between merge-count bound and char
    count; every merge round can only shrink the stream."""
    import re

    import pyarrow.parquet as pq

    from zerox_ray.pipelines.textqual import bpe_encode

    df = bpe_encode(sf_dir).to_pandas().set_index("doc_id")
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    for d, t in zip(texts["doc_id"].to_pylist(), texts["text"].to_pylist()):
        words = re.findall(r"[a-z]+", t)
        n_chars = sum(len(w) for w in words)
        row = df.loc[d]
        assert row["n_words"] == len(words)
        assert row["n_words"] <= row["n_subwords"] <= n_chars
    # merges actually fired somewhere
    total_chars = sum(
        len(w) for t in texts["text"].to_pylist() for w in re.findall(r"[a-z]+", t)
    )
    assert df["n_subwords"].sum() < total_chars


class TestCorpusDrift:
    def test_matches_counter_replay(self, sf_dir):
        from collections import Counter

        import pyarrow.parquet as pq

        from zerox_ray.pipelines.textqual import corpus_drift

        got = corpus_drift(sf_dir).iloc[0]
        t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        ca, cb = Counter(), Counter()
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            (ca if did % 2 == 0 else cb).update(text.split(" "))
        na, nb = sum(ca.values()), sum(cb.values())
        vocab = set(ca) | set(cb)
        num = sum(abs(ca[w] * nb - cb[w] * na) for w in vocab)
        assert got.n_terms == len(vocab)
        assert (got.n_tokens_a, got.n_tokens_b) == (na, nb)
        assert got.tv_ppm == num * 1_000_000 // (2 * na * nb)

    def test_identical_slices_zero_drift(self, tmp_path):
        """A corpus whose halves are copies has TV exactly 0."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from zerox_ray.pipelines.textqual import corpus_drift

        texts = ["alpha beta gamma", "delta epsilon", "alpha alpha zeta"]
        rows = [(i * 2, t) for i, t in enumerate(texts)] + [
            (i * 2 + 1, t) for i, t in enumerate(texts)
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            ),
            str(tmp_path / "documents.parquet"),
        )
        got = corpus_drift(str(tmp_path)).iloc[0]
        assert got.tv_ppm == 0 and got.n_tokens_a == got.n_tokens_b

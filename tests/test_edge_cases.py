"""Regression tests for review-found edge cases."""

import numpy as np
import pandas as pd
import pytest

from zerox_ray.functions.schema import validate_llm_params
from zerox_ray.models.mock import DeterministicExtractorModel
from zerox_ray.pipelines.dataops import _quality_batch
from zerox_ray.pipelines.relational import _asof_bucket
from zerox_ray.stages.reassemble import _cached_model


def test_asof_bucket_purchases_without_views():
    g = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [7, 7],
            "ts": pd.to_datetime([1_000_000, 2_000_000], unit="us"),
            "event_type": ["purchase", "purchase"],
        }
    )
    out = _asof_bucket(g)
    assert list(out.view_ts_us) == [-1, -1]


def test_cached_model_accepts_unhashable_kwargs():
    m1 = _cached_model("deterministic", {"prior_tail_chars": 8})
    m2 = _cached_model("deterministic", {"prior_tail_chars": 8})
    assert m1 is m2  # cache hit with a plain dict key


def test_hyperplane_bander_n_bits_variants():
    from zerox_ray.pipelines.dedup import HyperplaneBander

    emb = pd.DataFrame(
        {"vec_id": [0, 1], "embedding": [np.ones(8, np.float32), -np.ones(8, np.float32)]}
    )
    for n_bits in (16, 32, 128):
        out = HyperplaneBander(dim=8, n_bits=n_bits)(emb)
        assert len(out) == 2 * (n_bits // 16)
        assert out.key.between(0, 65535).all()
    with pytest.raises(ValueError, match="multiple of 16"):
        HyperplaneBander(dim=8, n_bits=10)


def test_hash_join_salt_requires_inner(sf_dir):
    import ray.data

    from zerox_ray.pipelines.relational import hash_join

    d = ray.data.from_pandas(pd.DataFrame({"k": [1]}))
    with pytest.raises(ValueError, match="salt > 1"):
        hash_join(d, d, on="k", salt=2, how="outer")


def test_sliding_nondivisible_counts_every_window(sf_dir):
    from zerox_ray.pipelines.relational import events_sliding

    import pyarrow.parquet as pq

    got = events_sliding(sf_dir, window_hours=3, slide_hours=2).to_pandas()
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    # w=3h s=2h: an event at offset t within its slide period is covered
    # by 2 windows iff t < 1h, else 1 → total strictly between n and 2n
    assert n_events < got.n_events.sum() < 2 * n_events


def test_quality_zero_token_doc():
    import pyarrow as pa

    out = _quality_batch(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["12345 !!"], pa.string())})
    ).to_pandas()
    assert out.stop_ratio_ppm.dtype == "int64"
    assert out.stop_ratio_ppm.iloc[0] == 0 and out.avg_token_len_ppm.iloc[0] == 0


def test_validate_llm_params_bool_number_confusion():
    with pytest.raises(ValueError):
        validate_llm_params({"logprobs": 1.5}, "openai")
    with pytest.raises(ValueError):
        validate_llm_params({"temperature": True}, "openai")
    assert validate_llm_params({"logprobs": True}, "openai")["logprobs"] is True


def test_prior_tail_zero_disables_conditioning():
    m = DeterministicExtractorModel(prior_tail_chars=0)
    c = m.complete(b"<p>hello</p>", "sheet")
    assert c.tail == ""

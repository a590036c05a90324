"""Mergeable sketches: histogram quantiles + HLL distinct."""

import duckdb
import numpy as np

from zerox_ray.pipelines.sketches import (
    distinct_users_exact,
    distinct_users_hll,
    histogram_quantiles,
    price_histogram,
    price_quantiles,
)


def test_histogram_matches_exact_binning(sf_dir):
    h = price_histogram(sf_dir).to_pandas().sort_values("bin_id").reset_index(drop=True)
    o = duckdb.sql(
        f"""select cast(least(floor(l_extendedprice / (200000.0/256)), 255) as bigint) bin_id,
                   cast(count(*) as bigint) n_items
            from read_parquet('{sf_dir}/lineitem.parquet') group by 1 order by 1"""
    ).fetchdf()
    assert h.equals(o)
    assert h.n_items.sum() == duckdb.sql(
        f"select count(*) from read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]


def test_quantiles_within_bin_width(sf_dir):
    got = price_quantiles(sf_dir)
    exact = duckdb.sql(
        f"select quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) "
        f"from read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    width = 200_000.0 / 256
    for v, e in zip(got.value, exact):
        assert abs(v - e) <= width


def test_hll_close_to_exact(sf_dir):
    est = distinct_users_hll(sf_dir).n_users_estimate[0]
    ex = distinct_users_exact(sf_dir).n_users[0]
    assert abs(est - ex) / ex < 0.05


def test_hll_deterministic(sf_dir):
    a = distinct_users_hll(sf_dir).n_users_estimate[0]
    b = distinct_users_hll(sf_dir).n_users_estimate[0]
    assert a == b

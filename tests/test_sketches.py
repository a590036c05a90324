"""Mergeable sketches: histogram quantiles + HLL distinct."""

import duckdb
import numpy as np

from zerox_ray.pipelines.sketches import (
    distinct_users_exact,
    distinct_users_hll,
    grouped_distinct_hll,
    grouped_price_quantiles,
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


def test_grouped_quantiles_within_bin_width_per_group(sf_dir):
    got = grouped_price_quantiles(sf_dir).to_pandas()
    exact = duckdb.sql(
        f"""select l_returnflag, quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) qs
            from read_parquet('{sf_dir}/lineitem.parquet') group by 1"""
    ).fetchdf()
    width = 200_000.0 / 256
    assert set(got.l_returnflag) == set(exact.l_returnflag)
    for _, row in exact.iterrows():
        g = got[got.l_returnflag == row.l_returnflag].sort_values("q_ppm")
        assert list(g.q_ppm) == [500_000, 900_000, 990_000]
        for v, e in zip(g.value, row.qs):
            assert abs(v - e) <= width


def test_hll_close_to_exact(sf_dir):
    est = distinct_users_hll(sf_dir).n_users_estimate[0]
    ex = distinct_users_exact(sf_dir).n_users[0]
    assert abs(est - ex) / ex < 0.05


def test_grouped_hll_close_to_exact_per_group(sf_dir):
    got = grouped_distinct_hll(sf_dir).to_pandas()
    exact = duckdb.sql(
        f"""select event_type, count(distinct user_id) n
            from read_parquet('{sf_dir}/events.parquet') group by 1"""
    ).fetchdf()
    assert set(got.event_type) == set(exact.event_type)
    m = got.merge(exact, on="event_type")
    assert (abs(m.n_users_estimate - m.n) / m.n < 0.05).all()


def test_hll_deterministic(sf_dir):
    a = distinct_users_hll(sf_dir).n_users_estimate[0]
    b = distinct_users_hll(sf_dir).n_users_estimate[0]
    assert a == b


class TestBloomProbe:
    def test_membership_and_fill(self, sf_dir):
        from zerox_ray.pipelines.sketches import BLOOM_M, bloom_probe

        got = bloom_probe(sf_dir).to_pandas()
        assert len(got) == 200
        present = got[got.probe_id < 100]
        absent = got[got.probe_id >= 1_000_000_000]
        # ids 0..99 exist at every sf → no false negatives, ever
        assert (present.present == 1).all()
        # expected FPs ≈ 100 * (fill)^4 ≪ 1 at these fills
        fill = got.n_set_bits.iloc[0] / BLOOM_M
        assert absent.present.sum() <= max(1, int(100 * fill**4 * 20))
        assert got.n_set_bits.nunique() == 1

    def test_partials_or_merge_is_order_free(self):
        import numpy as np
        import pandas as pd

        from zerox_ray.pipelines.sketches import _bloom_partial, _or_merge

        import pyarrow as pa

        a = _bloom_partial(pa.table({"doc_id": [1, 2, 3]})).to_pandas()
        b = _bloom_partial(pa.table({"doc_id": [4, 5]})).to_pandas()
        ab = _or_merge(pd.concat([a, b]))
        ba = _or_merge(pd.concat([b, a]))
        whole = _bloom_partial(pa.table({"doc_id": [1, 2, 3, 4, 5]})).to_pandas()
        assert np.array_equal(ab, ba)
        assert np.array_equal(ab, np.frombuffer(whole["bitmap"].iloc[0], dtype=np.uint8))


class TestMisraGries:
    def test_exact_regime_matches_grouped_count(self, sf_dir):
        """distinct event types ≪ k → zero decrements → the summary IS
        the exact groupby count (what the driver oracle checks)."""
        import duckdb

        from zerox_ray.pipelines.sketches import heavy_hitters

        got = heavy_hitters(sf_dir).to_pandas().reset_index(drop=True)
        exp = duckdb.sql(
            f"""select event_type as key, cast(count(*) as bigint) est_count
                from read_parquet('{sf_dir}/events.parquet') group by 1 order by 1"""
        ).fetchdf()
        assert (got.err_bound == 0).all()
        assert got.key.tolist() == exp.key.tolist()
        assert got.est_count.tolist() == exp.est_count.tolist()

    def test_approximate_regime_bounds(self):
        """distinct ≫ k: every counter is a lower bound within err_bound,
        and true heavy hitters (count > N/(k+1)) always survive."""
        import pandas as pd

        from zerox_ray.pipelines.sketches import _mg_merge_rows, _mg_partial

        # zipf-ish synthetic stream: key i appears ~1000//(i+1) times
        keys = [f"k{i:03d}" for i in range(200) for _ in range(1000 // (i + 1))]
        df = pd.DataFrame({"event_type": pd.Series(keys, dtype="string")})
        truth = df.event_type.value_counts()
        n, k = len(df), 16
        parts = pd.concat(
            [
                _mg_partial(df.iloc[:1500], "event_type", k),
                _mg_partial(df.iloc[1500:3000], "event_type", k),
                _mg_partial(df.iloc[3000:], "event_type", k),
            ]
        )
        counts, err = _mg_merge_rows(parts, k)
        assert 0 < err <= n // (k + 1) * 3 + 3  # merge-tree error stays bounded
        for key, est in counts.items():
            t = int(truth[key])
            assert est <= t <= est + err, (key, est, t, err)
        for key, t in truth.items():  # guarantee: heavy keys survive
            if t > err:
                assert key in counts, (key, t, err)

    def test_merge_is_split_invariant_in_exact_regime(self):
        import pandas as pd

        from zerox_ray.pipelines.sketches import _mg_merge_rows, _mg_partial

        keys = pd.Series(["a"] * 5 + ["b"] * 3 + ["c"] * 2, dtype="string")
        df = pd.DataFrame({"event_type": keys})
        whole, e0 = _mg_merge_rows(_mg_partial(df, "event_type", 8), 8)
        parts = pd.concat(
            [
                _mg_partial(df.iloc[:4], "event_type", 8),
                _mg_partial(df.iloc[4:], "event_type", 8),
            ]
        )
        split, e1 = _mg_merge_rows(parts, 8)
        assert whole == split and e0 == 0 and e1 == 0


class TestCountMin:
    def test_estimate_upper_bounds_truth(self, sf_dir):
        import pyarrow.parquet as pq

        from zerox_ray.pipelines.sketches import cms_probe

        got = cms_probe(sf_dir).to_pandas().set_index("probe_id")
        e = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"]).to_pandas()
        truth = e.user_id.value_counts()
        assert (got.total_events == len(e)).all()
        for pid, row in got.iterrows():
            t = int(truth.get(pid, 0))
            assert row.est_count >= t, (pid, row.est_count, t)
        # users that actually occur must estimate > 0; the sketch is
        # tight at this load factor (≤150 keys in 1024 counters)
        present = got.loc[[i for i in got.index if truth.get(i, 0) > 0]]
        assert len(present) > 0
        assert (present.est_count > 0).all()
        truth_present = present.index.map(lambda i: int(truth.get(i, 0)))
        assert (present.est_count <= 2 * truth_present + 200).all()

    def test_partials_merge_invariant(self):
        import numpy as np
        import pandas as pd

        from zerox_ray.pipelines.sketches import _cms_merge, _cms_partial

        import pyarrow as pa

        ids = np.arange(1000, dtype=np.int64) % 37
        whole = _cms_partial(pa.table({"user_id": ids})).to_pandas()
        parts = pd.concat(
            [
                _cms_partial(pa.table({"user_id": ids[:300]})).to_pandas(),
                _cms_partial(pa.table({"user_id": ids[300:]})).to_pandas(),
            ]
        )
        assert (_cms_merge(whole) == _cms_merge(parts)).all()


class TestBloomSemiJoin:
    def test_superset_of_exact_semi_join(self, sf_dir):
        import duckdb

        from zerox_ray.pipelines.sketches import bloom_semi_join

        got = set(bloom_semi_join(sf_dir).to_pandas().c_custkey)
        exact = set(
            duckdb.sql(
                f"""select distinct c_custkey
                    from read_parquet('{sf_dir}/customer.parquet')
                    where c_custkey in (select o_custkey
                                        from read_parquet('{sf_dir}/orders.parquet'))"""
            ).df().c_custkey
        )
        assert exact <= got  # no false negatives, ever

    def test_prunes_non_buyers(self):
        """Synthetic: buyers 0..99, customers 0..1999 — the filter must
        pass all buyers and prune almost every non-buyer (8 KiB / 4-hash
        filter at 100 keys has fill ≈ 0.006, FP rate ≈ 1e-9)."""
        import numpy as np
        import pandas as pd

        from zerox_ray.pipelines.sketches import (
            _bloom_key_hash,
            _bloom_partial,
            _bloom_positions,
            _or_merge,
        )

        import pyarrow as pa

        parts = pd.concat(
            [
                _bloom_partial(pa.table({"o_custkey": np.arange(0, 50)}), "o_custkey").to_pandas(),
                _bloom_partial(pa.table({"o_custkey": np.arange(50, 100)}), "o_custkey").to_pandas(),
            ]
        )
        bitmap = _or_merge(parts)
        keys = np.arange(2000, dtype=np.int64)
        pos = _bloom_positions(_bloom_key_hash(keys))
        bits = (bitmap[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        passed = keys[bits.all(axis=1)]
        assert set(range(100)) <= set(passed)
        assert len(passed) <= 105  # ≤5 false positives out of 1900


class TestGroupedHeavyHitters:
    def test_exact_regime_matches_grouped_count(self, sf_dir):
        import duckdb

        from zerox_ray.pipelines.sketches import grouped_heavy_hitters

        got = (
            grouped_heavy_hitters(sf_dir)
            .to_pandas()
            .sort_values(["lang", "key"])
            .reset_index(drop=True)
        )
        exp = duckdb.sql(
            f"""select lang, source as key, cast(count(*) as bigint) est_count
                from read_parquet('{sf_dir}/documents.parquet')
                group by 1, 2 order by 1, 2"""
        ).fetchdf()
        assert (got.err_bound == 0).all()
        assert got.lang.tolist() == exp.lang.tolist()
        assert got.key.tolist() == exp.key.tolist()
        assert got.est_count.tolist() == exp.est_count.tolist()

    def test_approximate_regime_group_isolation(self):
        """k smaller than a group's distinct count: bounds hold per group
        and a skewed group never perturbs a small group's counters."""
        import numpy as np
        import pandas as pd

        from zerox_ray.pipelines.sketches import (
            _MG_DEFICIT_KEY,
            _mg_merge_rows,
        )
        from zerox_ray.pipelines.sketches import grouped_heavy_hitters  # noqa: F401

        # simulate two per-batch partials for group A (heavy skew) and
        # one for group B (tiny), merge group-wise like finish() does
        a1 = pd.DataFrame({"g": "A", "key": ["x", "y", _MG_DEFICIT_KEY],
                           "est_count": [100, 3, 2]})
        a2 = pd.DataFrame({"g": "A", "key": ["x", "z", _MG_DEFICIT_KEY],
                           "est_count": [50, 1, 1]})
        b1 = pd.DataFrame({"g": "B", "key": ["q", _MG_DEFICIT_KEY],
                           "est_count": [7, 0]})
        allp = pd.concat([a1, a2, b1], ignore_index=True)
        for gval, h in allp.groupby("g"):
            counts, ded = _mg_merge_rows(h, k=2)
            if gval == "B":
                assert counts == {"q": 7} and ded == 0
            else:
                # MG bound: est ≤ true ≤ est + ded (true x-count is 150)
                assert ded >= 3
                assert counts["x"] <= 150 <= counts["x"] + ded


class TestExactPriceSelect:
    def test_matches_sorted_truth(self, sf_dir):
        import numpy as np
        import pyarrow.parquet as pq

        from zerox_ray.pipelines.sketches import exact_price_select

        got = exact_price_select(sf_dir).sort_values("q_ppm").reset_index(drop=True)
        x = pq.read_table(
            f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
        )["l_extendedprice"].to_numpy(zero_copy_only=False)
        cents = np.sort(np.floor(x * 100).astype(np.int64))
        n = len(cents)
        for _, r in got.iterrows():
            k = (int(r.q_ppm) * n + 999_999) // 1_000_000
            assert int(r["rank"]) == k
            assert int(r.value_cents) == int(cents[k - 1]), int(r.q_ppm)

    def test_extreme_ranks(self, sf_dir):
        """q → min and max: the narrowing loop must handle k=1 and k=n
        (first/last bins, single-value intervals)."""
        import numpy as np
        import pyarrow.parquet as pq

        from zerox_ray.pipelines.sketches import exact_price_select

        got = exact_price_select(sf_dir, qs_ppm=(1, 1_000_000))
        x = pq.read_table(
            f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"]
        )["l_extendedprice"].to_numpy(zero_copy_only=False)
        cents = np.floor(x * 100).astype(np.int64)
        vals = dict(zip(got.q_ppm, got.value_cents))
        assert vals[1] == int(cents.min())
        assert vals[1_000_000] == int(cents.max())

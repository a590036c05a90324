"""Property tests for the engine↔DuckDB hash-parity contracts.

Every dedup/sketch oracle rests on three identities:
1. md5_64(s)  == ('0x'||substring(md5(s),1,16))::UBIGINT
2. (a*x+b) mod 2^64 (numpy uint64 wraparound) == the 32-bit-split
   HUGEINT expression the oracle SQL builders emit
3. splitmix64 (the HLL hash) == the chained xor/shift/mulmod SQL

A regression in any of them breaks every oracle silently-at-a-distance;
these tests pin them down with randomized inputs (no Ray needed).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from zerox_ray.functions.hashing import md5_64, minhash_params, minhash_signature


def _sql_mulmod64(a: str, x: str) -> str:
    import __ray_entry__ as e

    return e._sql_mulmod64(a, x)


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=64))
def test_md5_64_matches_duckdb(s):
    got = md5_64(s.encode())
    exp = duckdb.sql(
        "SELECT ('0x'||substring(md5(?),1,16))::UBIGINT", params=[s]
    ).fetchone()[0]
    assert got == exp


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=(1 << 64) - 1),
    st.integers(min_value=0, max_value=(1 << 64) - 1),
    st.integers(min_value=0, max_value=(1 << 64) - 1),
)
def test_mulmod_matches_numpy_wraparound(a, x, b):
    with np.errstate(over="ignore"):  # wraparound IS the semantics under test
        expected = int(np.uint64(a % (1 << 64)) * np.uint64(x) + np.uint64(b))
    sql = (
        f"SELECT CAST(({_sql_mulmod64(f'{a}::HUGEINT', f'{x}::HUGEINT')}"
        f" + {b}::HUGEINT) % 18446744073709551616::HUGEINT AS UBIGINT)"
    )
    assert duckdb.sql(sql).fetchone()[0] == expected


def test_minhash_signature_matches_sql_family():
    """End-to-end: numpy minhash over md5 shingle hashes equals the
    oracle's per-k min over the mulmod expression."""
    a, b = minhash_params(8)
    shingles = [f"tok{i} tok{i+1} tok{i+2}".encode() for i in range(20)]
    xs = np.array([md5_64(s) for s in shingles], dtype=np.uint64)
    sig = minhash_signature(xs, a, b)
    con = duckdb.connect()
    con.execute("CREATE TABLE xs(x HUGEINT)")
    con.executemany("INSERT INTO xs VALUES (?)", [(int(x),) for x in xs])
    for k in range(8):
        expr = _sql_mulmod64(f"{int(a[k])}::HUGEINT", "x")
        got = con.sql(
            f"SELECT CAST(min(({expr} + {int(b[k])}::HUGEINT)"
            f" % 18446744073709551616::HUGEINT) AS UBIGINT) FROM xs"
        ).fetchone()[0]
        assert got == int(sig[k]), f"hash family k={k} diverged"


def test_splitmix64_matches_hll_sql():
    """The HLL oracle's chained splitmix64 equals the engine's numpy hash."""
    import pandas as pd

    from zerox_ray.pipelines.sketches import _hll_hash

    ids = np.array([0, 1, 42, 999_983, 2**40 + 7], dtype=np.int64)
    got = _hll_hash(ids)
    import __ray_entry__ as e

    sql = e._hll_sql(p=12)
    # extract just the hash chain by running the full oracle on a tiny
    # events view and checking register/rank against the engine partial
    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT unnest(?) AS user_id", [ids.tolist()])
    regs_sql = con.sql(
        "WITH " + sql.split("WITH", 1)[1].split("hll_regs AS")[0]
        + " sel AS (SELECT register, rest FROM hll_parts)"
        + " SELECT register, rest FROM sel ORDER BY register"
    ).df()
    m = np.uint64(1 << 12)
    exp = pd.DataFrame(
        {
            "register": (got & (m - np.uint64(1))).astype(np.int64),
            "rest": (got >> np.uint64(12)).astype(np.int64),
        }
    ).sort_values("register").reset_index(drop=True)
    assert sorted(regs_sql["register"]) == sorted(exp["register"])
    assert sorted(int(r) for r in regs_sql["rest"]) == sorted(int(r) for r in exp["rest"])

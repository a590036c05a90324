"""Coarse-bucketed grouped aggregation — the engine's ONE canonical
shuffle-aggregate shape.

``Dataset.groupby(keys).aggregate(...)`` (Ray's Aggregate operator) was
measured at ~2.5-3 s of fixed overhead per query on the sandbox corpus,
independent of data size; the identical reduction expressed as ONE
explicit exchange on a coarse hash bucket + a vectorized pandas
aggregation per bucket runs in ~0.6 s (see BENCH notes). The bucketed
form is also the shape the rest of the engine already uses (dedup
candidate generation, hash_join), making the shuffle width explicit:

    partials → +bucket(hash(key) % W) → groupby(bucket)
             → map_groups(vectorized pandas groupby-agg)

W defaults to the cluster-derived shuffle width (2 reduce waves per CPU),
so each reduce task handles |keys|/W groups — bounded per-task memory at
scale, amortized per-group Python cost (one pandas call per BUCKET, not
per key).
"""

from __future__ import annotations

import zlib

import pandas as pd
import ray.data


def _bucket_of(s: pd.Series, num_buckets: int) -> pd.Series:
    """Deterministic bucket id for an int or string key column."""
    if s.dtype.kind in "iu":
        return (s.astype("int64") % num_buckets).astype("int64")
    return pd.Series(
        [zlib.crc32(str(v).encode()) % num_buckets for v in s],
        index=s.index,
        dtype="int64",
    )


def bucketed_group_agg(
    ds: ray.data.Dataset,
    keys: list[str],
    named_aggs: dict[str, tuple[str, str]],
    num_buckets: int | None = None,
    dtypes: dict[str, str] | None = None,
) -> ray.data.Dataset:
    """groupby(keys) + named aggregations via one coarse-bucket exchange.

    ``named_aggs``: output_col → (src_col, op) exactly as pandas
    ``DataFrame.groupby().agg(**named_aggs)`` takes them. Ops must be
    MERGEABLE over row partitions of a key (sum/min/max/size over
    already-partial rows) — the caller is responsible for emitting
    per-batch partials first when the op needs it (e.g. ``size`` → emit
    a count column and sum it here)."""
    if num_buckets is None:
        from zerox_ray.stages.classify import default_num_partitions

        num_buckets = default_num_partitions()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket_of(df[keys[0]], num_buckets)
        return df

    def final(g: pd.DataFrame):
        import pyarrow as pa

        out = g.groupby(list(keys), as_index=False).agg(
            **{k: pd.NamedAgg(column=c, aggfunc=op) for k, (c, op) in named_aggs.items()}
        )
        if dtypes:
            out = out.astype(dtypes)
        # emit CLEAN Arrow (no pandas schema-metadata blob): downstream
        # block concat/unify then dedups schemas by hash instead of
        # logging per-task warnings (see sources/tables.py)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    tagged = ds.map_batches(tag, batch_format="pandas")
    return tagged.groupby("__b").map_groups(final, batch_format="pandas")


def bucketed_group_map(
    ds: ray.data.Dataset,
    key: str,
    fn,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """groupby(key).map_groups(fn) via the same ONE coarse-bucket
    exchange as ``bucketed_group_agg``, for group functions that are not
    expressible as mergeable named aggs (winner marking, ranking, ...).

    ``fn`` receives a pandas DataFrame holding EVERY row of each key in
    the bucket — but many keys per call (|keys|/W), so per-group Python
    cost is amortized; ``fn`` must do its own per-key grouping/sorting
    and must NOT depend on bucket composition. The ``__b`` tag column is
    dropped before ``fn`` sees the rows."""
    if num_buckets is None:
        from zerox_ray.stages.classify import default_num_partitions

        num_buckets = default_num_partitions()

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__b"] = _bucket_of(df[key], num_buckets)
        return df

    def run(g: pd.DataFrame):
        import pyarrow as pa

        out = fn(g.drop(columns="__b"))
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    tagged = ds.map_batches(tag, batch_format="pandas")
    return tagged.groupby("__b").map_groups(run, batch_format="pandas")

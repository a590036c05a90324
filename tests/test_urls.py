"""URL canonicalization (functions/urlx.py) and canonical dedup
(pipelines/urls.py)."""

import pytest

from zerox_ray.functions.urlx import canonical_url


@pytest.mark.parametrize(
    "raw,want",
    [
        # fragments always dropped
        ("https://a.net/p#sec", "https://a.net/p"),
        ("https://a.net/p?x=1#sec", "https://a.net/p?x=1"),
        # tracking params dropped, survivors keep their order, ? dropped
        # when the query empties
        ("https://a.net/p?utm_source=f", "https://a.net/p"),
        ("https://a.net/p?b=2&utm_medium=m&a=1", "https://a.net/p?b=2&a=1"),
        ("https://a.net/p?UTM_CAMPAIGN=x&gclid=9", "https://a.net/p"),
        ("https://a.net/p?fbclid=1&id=7", "https://a.net/p?id=7"),
        # scheme + host lowercased; PATH case preserved
        ("HTTPS://A.Example.NET/Doc/5", "https://a.example.net/Doc/5"),
        # default ports stripped per scheme; others preserved
        ("http://a.net:80/p", "http://a.net/p"),
        ("https://a.net:443/p", "https://a.net/p"),
        ("https://a.net:8443/p", "https://a.net:8443/p"),
        ("http://a.net:443/p", "http://a.net:443/p"),
        # trailing slash and empty path preserved
        ("https://a.net/", "https://a.net/"),
        ("https://a.net", "https://a.net"),
        # host-only with port, no path
        ("https://A.NET:443", "https://a.net"),
        # schemeless strings pass through (minus fragment/tracking rules)
        ("not-a-url#x", "not-a-url"),
    ],
)
def test_canonical_url(raw, want):
    assert canonical_url(raw) == want


def test_url_dedup_collapses_variants(ray_session):
    import ray.data

    from zerox_ray.pipelines.urls import url_dedup

    ds = ray.data.from_items(
        [
            {"url": "https://a.net/p"},
            {"url": "https://a.net/p?utm_source=x"},
            {"url": "https://A.NET/p#frag"},
            {"url": "https://a.net/p"},  # exact dup: not a new variant
            {"url": "https://b.net/q?id=1&utm_medium=m"},
        ]
    )
    got = url_dedup(ds).to_pandas().set_index("canonical").sort_index()
    assert got.loc["https://a.net/p"].n_variants == 3
    # min raw variant wins: 'A' < 'a' bytewise
    assert got.loc["https://a.net/p"].kept_url == "https://A.NET/p#frag"
    assert got.loc["https://b.net/q?id=1"].n_variants == 1
    assert len(got) == 2


def test_url_features_gates_have_mass_and_edges():
    """Each gate fires on the right variant; hand-built edge cases."""
    import pyarrow as pa
    import ray.data

    from zerox_ray.pipelines.urls import url_features

    urls = [
        "https://h1.example.net/doc/7",                       # clean → keep
        "https://h1.example.net/doc/7?utm_source=f&utm_c=x",  # params
        "https://h1.example.net/doc/7#frag7",                 # fragment
        "https://H1.EXAMPLE.NET/doc/7",                       # case host
        "https://h1.example.net:443/doc/7",                   # port
        "https://h1.example.net/a/b/c/d/e",                   # deep path
        "https://h1.example.net/9999999999999",               # digit-heavy
        "https://h1.example.net",                             # no path
        "https://h1.example.net/doc/7?",                      # empty query
    ]
    ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
    df = url_features(ds).to_pandas().set_index("url")
    assert df.loc[urls[0], "keep"] == 1
    assert df.loc[urls[1], "n_params"] == 2 and df.loc[urls[1], "keep"] == 0
    assert df.loc[urls[2], "has_fragment"] == 1 and df.loc[urls[2], "keep"] == 0
    assert df.loc[urls[3], "host"] == "h1.example.net"
    assert df.loc[urls[4], "host"] == "h1.example.net"  # port excluded
    assert df.loc[urls[5], "path_depth"] == 5 and df.loc[urls[5], "keep"] == 0
    assert df.loc[urls[6], "digit_ppm"] > 200_000 and df.loc[urls[6], "keep"] == 0
    assert df.loc[urls[7], "path_depth"] == 0 and df.loc[urls[7], "keep"] == 1
    assert df.loc[urls[8], "n_params"] == 0 and df.loc[urls[8], "keep"] == 1

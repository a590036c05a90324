"""URL canonicalization — the normalize step every crawl dedup runs
before url-keyed joins (Common Crawl dedups on normalized URLs; the
reference accepts a URL string per call, node-zerox/src/utils/file.ts:32,
but never normalizes — corpus-level canonicalization is engine-native).

Rules (deterministic, order of application):
1. drop the fragment (``#...`` — never sent to the server);
2. lowercase the scheme and the host;
3. strip the scheme's default port (``:80`` http, ``:443`` https);
4. drop tracking query params (``utm_*`` prefixes and the common click
   ids), preserving the order of the survivors; an emptied query drops
   its ``?``.

Path case, param order and trailing slashes are preserved — they are
semantically significant on real servers; rewriting them merges
DIFFERENT resources, which is worse than missing a duplicate.
"""

from __future__ import annotations

#: exact tracking keys dropped from query strings
TRACKING_KEYS = frozenset({"fbclid", "gclid", "msclkid", "mc_cid", "mc_eid"})
#: key prefixes dropped from query strings
TRACKING_PREFIXES = ("utm_",)


def _is_tracking(key: str) -> bool:
    k = key.lower()
    return k in TRACKING_KEYS or k.startswith(TRACKING_PREFIXES)


def canonical_url(url: str) -> str:
    """Canonicalize one URL (pure function; see module rules)."""
    # 1. fragment
    frag = url.find("#")
    if frag >= 0:
        url = url[:frag]
    # split query early so host edits never touch it
    q = url.find("?")
    base, query = (url[:q], url[q + 1 :]) if q >= 0 else (url, "")
    # 2-3. scheme://host[:port] normalization
    sep = base.find("://")
    if sep >= 0:
        scheme = base[:sep].lower()
        rest = base[sep + 3 :]
        slash = rest.find("/")
        netloc, path = (rest[:slash], rest[slash:]) if slash >= 0 else (rest, "")
        netloc = netloc.lower()
        if scheme == "http" and netloc.endswith(":80"):
            netloc = netloc[:-3]
        elif scheme == "https" and netloc.endswith(":443"):
            netloc = netloc[:-4]
        base = f"{scheme}://{netloc}{path}"
    # 4. tracking params
    if query:
        kept = [
            p for p in query.split("&") if not _is_tracking(p.split("=", 1)[0])
        ]
        if kept:
            return base + "?" + "&".join(kept)
    return base


def canonicalize_list(urls: list[str]) -> list[str]:
    """Batch form (per-batch map inside map_batches; URLs are short
    strings — the loop is pure str slicing, no regex)."""
    return [canonical_url(u) for u in urls]

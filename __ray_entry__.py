"""Driver contract for the zerox_ray engine.

``entry``     — flagship OCR pipeline on sf0.001.
``queries``   — one callable per implemented operator/pipeline (SURVEY §2 +
                the training-data ops); each takes ``sf_dir``.
``oracle_sql``— DuckDB-runnable ANSI SQL over the pre-registered views
                (documents, events, embeddings, …) computing the SAME
                result. The pages input table is a deterministic pure
                function of the ``documents`` view (zerox_ray/testgen.py —
                THE PLAN in its docstring), which is what lets SQL
                recompute the expected extraction output exactly,
                including byte-identical markdown.

Ray is initialised by the driver before import; nothing here calls
ray.init/shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ray.data.aggregate import Count, Sum

from zerox_ray import ZeroxConfig, run_ocr
from zerox_ray.pipelines.dataops import (
    dedup_exact,
    events_hourly,
    lang_id,
    quality_filter,
    quality_scores,
    sample_documents,
    token_counts_bpe,
    token_stats,
    top_orders_per_priority,
    top_spenders,
)
from zerox_ray.pipelines.dedup import (
    doc_fingerprints,
    embedding_near_dup,
    minhash_dedup_docs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from zerox_ray.pipelines.extraction import extract_documents, extract_pages
from zerox_ray.pipelines.media import media_cleanup, media_features, media_thumbnails
from zerox_ray.pipelines.ocr import extracted_pages
from zerox_ray.pipelines.relational import (
    asof_purchase_view,
    events_sessions,
    events_sliding,
    orders_by_nation,
    revenue_by_priority,
)
from zerox_ray.pipelines.similarity import ann_bruteforce_topk, ann_ivf_topk
from zerox_ray.pipelines.sketches import (
    distinct_users_exact,
    distinct_users_hll,
    price_histogram,
    price_quantiles,
)
from zerox_ray.testgen import pages_dir_for, sheet_pages_dir_for

DOC_COLS = ["url", "markdown", "total_pages", "ocr_successful", "ocr_failed"]
_EXTRACT_SCHEMA = {
    "type": "object",
    "properties": {
        "first_token": {"type": "string"},
        "n_tokens": {"type": "integer"},
    },
}


def entry() -> Any:
    """Flagship pipeline: synthesize/cache the Common-Crawl-style pages
    table for sf0.001, run OCR, return the documents Dataset."""
    return run_ocr(pages_dir_for("/root/testdata/sf0.001"))


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def _q_ocr_documents(sf_dir: str):
    return run_ocr(pages_dir_for(sf_dir)).select_columns(DOC_COLS)


def _q_ocr_pages(sf_dir: str):
    return extracted_pages(pages_dir_for(sf_dir)).select_columns(
        ["url", "page_index", "content", "content_length", "status"]
    )


def _q_ocr_summary(sf_dir: str):
    return (
        extracted_pages(pages_dir_for(sf_dir))
        .groupby("status")
        .aggregate(
            Count(alias_name="n_pages"),
            Sum("content_length", alias_name="total_chars"),
        )
    )


def _q_ocr_totals(sf_dir: str):
    """Corpus-level rollup consumed as a streaming aggregate over the
    documents pipeline — no table ever materializes on the driver."""
    import pandas as pd

    docs = run_ocr(pages_dir_for(sf_dir))
    agg = docs.aggregate(
        Count(alias_name="n_docs"),
        Sum("total_pages", alias_name="total_pages"),
        Sum("ocr_successful", alias_name="ok_pages"),
        Sum("ocr_failed", alias_name="failed_pages"),
    )
    return pd.DataFrame([{k: int(v) for k, v in agg.items()}])


def _q_ocr_maintain_format(sf_dir: str):
    cfg = ZeroxConfig(maintain_format=True)
    return run_ocr(pages_dir_for(sf_dir), cfg).select_columns(["url", "markdown"])


def _q_ocr_select_pages(sf_dir: str):
    cfg = ZeroxConfig(select_pages=[1, 3])
    return extracted_pages(pages_dir_for(sf_dir), cfg).select_columns(
        ["url", "page_index", "content", "status"]
    )


def _q_extract_structured(sf_dir: str):
    cfg = ZeroxConfig(schema=_EXTRACT_SCHEMA)
    return extract_pages(pages_dir_for(sf_dir), cfg).select_columns(
        ["url", "page_index", "first_token", "n_tokens"]
    )


def _q_extract_documents(sf_dir: str):
    cfg = ZeroxConfig(schema=_EXTRACT_SCHEMA, extract_per_page=["first_token"])
    return extract_documents(pages_dir_for(sf_dir), cfg)


def _q_extract_direct(sf_dir: str):
    """extractOnly / directImageExtraction mode: the extractor consumes the
    RAW page fragments (no OCR stage at all — reference index.ts:125)."""
    cfg = ZeroxConfig(schema=_EXTRACT_SCHEMA, extract_only=True)
    return extract_pages(pages_dir_for(sf_dir), cfg).select_columns(
        ["url", "page_index", "first_token", "n_tokens"]
    )


def _q_structured_pages(sf_dir: str):
    """Spreadsheet branch: ZXSHEET payloads → sheet-as-page rows (S6/M12)."""
    return extracted_pages(sheet_pages_dir_for(sf_dir)).select_columns(
        ["url", "page_index", "content", "status"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # OCR / extraction pipelines (reference parity)
        "ocr_documents": _q_ocr_documents,
        "ocr_pages": _q_ocr_pages,
        "ocr_summary": _q_ocr_summary,
        "ocr_totals": _q_ocr_totals,
        "ocr_maintain_format": _q_ocr_maintain_format,
        "ocr_select_pages": _q_ocr_select_pages,
        "extract_structured": _q_extract_structured,
        "extract_direct": _q_extract_direct,
        "structured_pages": _q_structured_pages,
        "extract_documents": _q_extract_documents,
        # training-data ops (SQL-oracled)
        "token_stats": token_stats,
        "token_counts_bpe": token_counts_bpe,
        "top_spenders": top_spenders,
        "top_orders_per_priority": top_orders_per_priority,
        "quality_scores": quality_scores,
        "quality_filter": quality_filter,
        "dedup_exact": dedup_exact,
        "events_hourly": events_hourly,
        "ann_cosine_topk": ann_bruteforce_topk,
        "orders_by_nation": orders_by_nation,
        "revenue_by_priority": revenue_by_priority,
        "asof_purchase_view": asof_purchase_view,
        "events_sessions": events_sessions,
        "events_sliding": events_sliding,
        "price_histogram": price_histogram,
        "distinct_users_exact": distinct_users_exact,
        "lang_id": lang_id,
        "sample_documents": sample_documents,
        "doc_fingerprints": doc_fingerprints,
        # sketch outputs (hash/interpolation-based — rows-only checks)
        "price_quantiles_sketch": price_quantiles,
        "distinct_users_hll": distinct_users_hll,
        # training-data ops (deterministic, rows-only checks — not
        # SQL-expressible: iterative/hash-based algorithms)
        "dedup_minhash_lsh": minhash_lsh_pairs,
        "dedup_minhash_keepers": minhash_dedup_docs,
        "dedup_simhash": simhash_pairs,
        "dedup_simhash_signatures": simhash_signatures,
        "dedup_ngram_jaccard": ngram_jaccard_pairs,
        "dedup_embedding_cosine": embedding_near_dup,
        "ann_ivf_topk": ann_ivf_topk,
        "media_features": media_features,
        "media_thumbnails": media_thumbnails,
        "media_cleanup": media_cleanup,
    }


# --------------------------------------------------------------------------
# oracle SQL
# --------------------------------------------------------------------------

# The pages-plan CTEs — MUST mirror zerox_ray/testgen.py::plan_doc exactly.
_PAGES_CTE = """
WITH p AS (
  SELECT doc_id, text,
         'https://example.org/doc/' || doc_id AS url,
         (doc_id % 101 = 13) AS is_err,
         CASE WHEN doc_id % 101 = 13 THEN 1
              WHEN doc_id % 50 = 0 THEN 24
              ELSE 1 + (doc_id % 4) END AS np
  FROM documents
),
pg AS (
  SELECT url, np, is_err, text,
         unnest(generate_series(1, np)) AS page_index,
         CAST(ceil(CAST(length(text) AS DOUBLE) / np) AS BIGINT) AS L
  FROM p
),
pages AS (
  SELECT url, is_err, np, page_index,
         CASE WHEN is_err THEN ''
              ELSE substring(text, (page_index - 1) * L + 1, L) END AS content,
         CASE WHEN is_err THEN 'ERROR' ELSE 'SUCCESS' END AS status
  FROM pg
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "ocr_documents": _PAGES_CTE
        + """
SELECT url,
       COALESCE(string_agg(CASE WHEN is_err THEN NULL ELSE content END,
                           e'\n\n' ORDER BY page_index), '') AS markdown,
       CAST(count(*) AS BIGINT) AS total_pages,
       CAST(sum(CASE WHEN is_err THEN 0 ELSE 1 END) AS BIGINT) AS ocr_successful,
       CAST(sum(CASE WHEN is_err THEN 1 ELSE 0 END) AS BIGINT) AS ocr_failed
FROM pages GROUP BY url
""",
        "ocr_pages": _PAGES_CTE
        + """
SELECT url, CAST(page_index AS BIGINT) AS page_index, content,
       CAST(length(content) AS BIGINT) AS content_length, status
FROM pages
""",
        "ocr_summary": _PAGES_CTE
        + """
SELECT status, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(length(content)) AS BIGINT) AS total_chars
FROM pages GROUP BY status
""",
        "ocr_totals": _PAGES_CTE
        + """
SELECT CAST(count(DISTINCT url) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS total_pages,
       CAST(sum(CASE WHEN is_err THEN 0 ELSE 1 END) AS BIGINT) AS ok_pages,
       CAST(sum(CASE WHEN is_err THEN 1 ELSE 0 END) AS BIGINT) AS failed_pages
FROM pages
""",
        "ocr_maintain_format": _PAGES_CTE
        + """
, mf AS (
  SELECT url, is_err, page_index,
         CASE WHEN page_index = 1 THEN content
              ELSE '<!-- cont:' ||
                   right(lag(content) OVER (PARTITION BY url ORDER BY page_index), 16)
                   || ' -->' || e'\n' || content END AS content
  FROM pages
)
SELECT url,
       COALESCE(string_agg(CASE WHEN is_err THEN NULL ELSE content END,
                           e'\n\n' ORDER BY page_index), '') AS markdown
FROM mf GROUP BY url
""",
        "ocr_select_pages": _PAGES_CTE
        + """
SELECT url, CAST(page_index AS BIGINT) AS page_index, content, status
FROM pages WHERE page_index IN (1, 3)
""",
        "extract_structured": _PAGES_CTE
        + """
SELECT url, CAST(page_index AS BIGINT) AS page_index,
       regexp_extract(content, '[a-z]+') AS first_token,
       CAST(len(regexp_extract_all(content, '[a-z]+')) AS BIGINT) AS n_tokens
FROM pages WHERE NOT is_err
""",
        # mirrors testgen.generate_sheet_pages_table's SHEET PLAN + the
        # sheetx.sheet_to_html rendering (escape = 3 nested replaces)
        "structured_pages": """
WITH p AS (
  SELECT doc_id, text,
         'https://example.org/sheet/' || doc_id AS url,
         1 + (doc_id % 3) AS ns
  FROM documents
),
pg AS (
  SELECT url, text,
         unnest(generate_series(1, ns)) AS page_index,
         CAST(ceil(CAST(length(text) AS DOUBLE) / ns) AS BIGINT) AS L
  FROM p
)
SELECT url, CAST(page_index AS BIGINT) AS page_index,
       '<h1>Sheet' || page_index || '</h1>' || chr(10) ||
       '<table><tr><td>' ||
       replace(replace(replace(substring(text, (page_index - 1) * L + 1, L),
               '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
       '</td></tr></table>' AS content,
       'SUCCESS' AS status
FROM pg
""",
        "token_stats": """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS total_tokens,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang
""",
        "token_counts_bpe": r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
           '''(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9'']+|\s+'
       )) AS BIGINT) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_ws_tokens
FROM documents
""",
        "top_spenders": """
SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY o_custkey
ORDER BY total_cents DESC, o_custkey LIMIT 10
""",
        "top_orders_per_priority": """
SELECT o_orderpriority, o_orderkey, total_cents, CAST(rank AS BIGINT) AS rank FROM (
  SELECT o_orderpriority, o_orderkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY floor(o_totalprice * 100) DESC, o_orderkey)
             AS rank
  FROM orders
) WHERE rank <= 3
""",
        "quality_scores": r"""
WITH q AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '\b(?:the|a|and|of|to)\b')) AS BIGINT) AS n_stopwords,
         CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS n_letters
  FROM documents
)
SELECT doc_id, n_chars, n_tokens, n_stopwords,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (1000000 * n_stopwords) // n_tokens END AS BIGINT) AS stop_ratio_ppm,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (1000000 * n_letters) // n_tokens END AS BIGINT) AS avg_token_len_ppm
FROM q
""",
        "quality_filter": r"""
WITH q AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_tokens,
         CAST(CASE WHEN len(regexp_extract_all(text, '[a-z]+')) = 0 THEN 0
              ELSE (1000000 * len(regexp_extract_all(text, '\b(?:the|a|and|of|to)\b')))
                   // len(regexp_extract_all(text, '[a-z]+')) END AS BIGINT) AS stop_ratio_ppm
  FROM documents
)
SELECT doc_id, n_tokens, stop_ratio_ppm FROM q
WHERE n_tokens >= 20 AND stop_ratio_ppm <= 500000
""",
        "dedup_exact": """
SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text
""",
        "ann_cosine_topk": """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8
), s AS (
  SELECT q.qid, e.vec_id, list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q, embeddings e WHERE e.vec_id != q.qid
)
SELECT qid, vec_id AS neighbor_id, CAST(rank AS BIGINT) AS rank FROM (
  SELECT qid, vec_id,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
  FROM s
) WHERE rank <= 5
""",
        "orders_by_nation": """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "revenue_by_priority": """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
        "asof_purchase_view": """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id, ts FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id,
       CAST(COALESCE(epoch_us(max(v.ts)), -1) AS BIGINT) AS view_ts_us
FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
GROUP BY p.event_id, p.user_id
""",
        "events_sessions": """
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 8 HOURS
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM e
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
       CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
FROM s GROUP BY user_id, session_id
""",
        "events_sliding": """
SELECT user_id,
       CAST((epoch_us(ts) // 3600000000 - k) * 3600000000 AS BIGINT) AS window_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS k)
GROUP BY user_id, window_start_us
""",
        "price_histogram": """
SELECT CAST(least(floor(l_extendedprice / (200000.0 / 256)), 255) AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY bin_id
""",
        "distinct_users_exact": """
SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events
""",
        "events_hourly": """
SELECT user_id,
       CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY user_id, hour_id
""",
        # G5 merge mirror (reference index.ts:435-443, 539-552): per-page
        # first_token entries in page order + full-doc n_tokens over the
        # "\n<hr><hr>\n"-joined content, exactly the key-sorted compact
        # JSON that extraction.py::_merge_bucket emits.
        "extract_documents": _PAGES_CTE
        + r"""
, ok AS (SELECT * FROM pages WHERE NOT is_err),
agg AS (
  SELECT url,
         '{"first_token":['
         || string_agg('{"page":' || page_index || ',"value":"'
                       || regexp_extract(content, '[a-z]+') || '"}',
                       ',' ORDER BY page_index)
         || '],"n_tokens":'
         || len(regexp_extract_all(
                string_agg(content, e'\n<hr><hr>\n' ORDER BY page_index),
                '[a-z]+'))
         || '}' AS extracted
  FROM ok GROUP BY url
)
SELECT url, extracted FROM agg
UNION ALL
SELECT DISTINCT url, '{}' AS extracted FROM pages WHERE is_err
""",
        # direct extraction over RAW fragments: the fragment bytes are the
        # deterministic testgen containers — pdf pages are the bare text
        # chunk, html pages are nav + page-div(escaped chunk) + footer
        # (testgen.build_html / htmlx.split_html_pages)
        "extract_direct": """
WITH p AS (
  SELECT doc_id, text,
         'https://example.org/doc/' || doc_id AS url,
         (doc_id % 10 = 7) AS is_pdf,
         CASE WHEN doc_id % 50 = 0 THEN 24
              ELSE 1 + (doc_id % 4) END AS np
  FROM documents WHERE doc_id % 101 != 13
),
pg AS (
  SELECT url, is_pdf, text,
         unnest(generate_series(1, np)) AS page_index,
         CAST(ceil(CAST(length(text) AS DOUBLE) / np) AS BIGINT) AS L
  FROM p
),
fr AS (
  SELECT url, page_index,
         CASE WHEN is_pdf THEN substring(text, (page_index - 1) * L + 1, L)
              ELSE '<nav class="site-nav"><ul><li><a href="/">home</a></li><li><a href="/about">about us</a></li><li><a href="/contact">contact</a></li><li><a href="/login">log in</a></li></ul></nav>'
                   || chr(10) || '<div class="page" data-page="' || page_index || '"><p>'
                   || replace(replace(replace(substring(text, (page_index - 1) * L + 1, L),
                          '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
                   || '</p></div>' || chr(10)
                   || '<footer><p><a href="/terms">terms of service</a> <a href="/privacy">privacy policy</a> <a href="/sitemap">site map</a> (c) example</p></footer>'
         END AS frag
  FROM pg
)
SELECT url, CAST(page_index AS BIGINT) AS page_index,
       regexp_extract(frag, '[a-z]+') AS first_token,
       CAST(len(regexp_extract_all(frag, '[a-z]+')) AS BIGINT) AS n_tokens
FROM fr
""",
        # mirrors dataops._lang_id_batch: count per function-word profile,
        # argmax with alphabetical tie-break (CASE order = column order of
        # the sorted profile dict), 'und' when nothing matches
        "lang_id": r"""
WITH c AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '\b(?:der|die|und|das|ein|ist|zu|den|mit|nicht)\b')) AS BIGINT) AS de,
    CAST(len(regexp_extract_all(text, '\b(?:the|and|of|to|a|in|is|that|it|for)\b')) AS BIGINT) AS en,
    CAST(len(regexp_extract_all(text, '\b(?:el|de|que|y|en|un|ser|se|no|por)\b')) AS BIGINT) AS es,
    CAST(len(regexp_extract_all(text, '\b(?:le|la|et|les|des|un|est|une|dans|que)\b')) AS BIGINT) AS fr,
    CAST(len(regexp_extract_all(text, '\b(?:il|di|che|e|la|per|un|in|non|una)\b')) AS BIGINT) AS it
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(de, en, es, fr, it) = 0 THEN 'und'
            WHEN de = greatest(de, en, es, fr, it) THEN 'de'
            WHEN en = greatest(de, en, es, fr, it) THEN 'en'
            WHEN es = greatest(de, en, es, fr, it) THEN 'es'
            WHEN fr = greatest(de, en, es, fr, it) THEN 'fr'
            ELSE 'it' END AS pred_lang,
       greatest(de, en, es, fr, it) AS n_matches
FROM c
""",
        # mirrors dataops.sample_documents: md5-derived 64-bit hash of the
        # decimal doc_id string, kept when h % 1e6 < rate_ppm
        "sample_documents": """
SELECT doc_id FROM documents
WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
      % 1000000 < 100000
""",
        # mirrors hashing.rolling_fingerprint: Horner fold of md5-derived
        # 64-bit token hashes mod 2^64, emitted as the int64 bit pattern
        "doc_fingerprints": """
WITH f AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST(0 AS HUGEINT),
             list_transform(regexp_extract_all(text, '[a-z]+'),
               t -> CAST(('0x' || substring(md5(t), 1, 16))::UBIGINT AS HUGEINT))),
           (h, x) -> (h * 1000003 + x) % 18446744073709551616::HUGEINT
         ) AS fp
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN fp >= 9223372036854775808::HUGEINT
                 THEN fp - 18446744073709551616::HUGEINT
                 ELSE fp END AS BIGINT) AS fingerprint
FROM f
""",
    }

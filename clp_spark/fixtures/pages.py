"""Deterministic Common-Crawl-style `pages` fixture generator.

Schema (from BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

The `text` column is log-like content drawn from a fixed template pool that
jointly exercises every branch of the CLP tokenizer/encoder (FIXTURES.md §2):
integer vars (negative / zero / zero-padded / >int64), float vars
(trailing zeros, ≤16 digits, 17+-digit fallbacks), dict vars (hex, k=v,
UUID-ish, paths-with-digits, IPs), static text with placeholder-escape
bytes and wildcard chars, and multi-line messages. Template IDs follow a
Zipf(s≈1.2) distribution so one hot logtype dominates (skew-handling
exercise). Everything derives arithmetically from the row index, so the
table is identical regardless of Spark partitioning or cluster size.

html wraps text as escaped <pre> content; `extract_text_reference` is the
reference extractor whose output must be byte-identical per url.
"""

from __future__ import annotations

import html as _html
import math

import numpy as np
import pandas as pd

LANGS = ["en", "de", "fr", "zh", "es", "ja"]
# skewed lang weights (en-heavy, like the crawl)
LANG_CDF = np.cumsum(np.array([0.55, 0.15, 0.10, 0.10, 0.06, 0.04]))

# Template pool. {..} slots filled from the row index. Multi-line templates
# model timestamp-less continuation lines (MessageParser.cpp:83-95 spirit).
TEMPLATES = [
    # 0 — hot head of the Zipf distribution
    "2025-01-{day:02d}T{hh:02d}:{mm:02d}:{ss:02d}.{ms:03d} INFO request handled "
    "status={status} latency_ms={lat} path=/api/v1/items/{item}",
    # 1 — float vars incl. trailing zeros; negative float
    "2025-01-{day:02d} {hh:02d}:{mm:02d}:{ss:02d} metrics cpu=0.500 load {loadf} "
    "drift -{driftf} temp .5",
    # 2 — hex + uuid-ish + ip dict vars
    "E{ms:03d} conn from 10.0.{oct3}.{oct4} session deadbeef{hex4} "
    "trace {hex8}-beef-{hex4}",
    # 3 — zero-padded int (dict var), >int64 int (dict var), zero
    "job 0 retry 007 bigid 92233720368547758079999 worker={worker}",
    # 4 — path with digits, k=v alpha, backslash static text (escape case)
    "opened task_{item}.log by user={user} at C:\\logs\\archive mode rw",
    # 5 — wildcard chars in static text + int var
    "glob match *.parquet ? pattern hits={hits}",
    # 6 — multi-line message: continuation line without timestamp
    "2025-01-{day:02d}T{hh:02d}:{mm:02d}:{ss:02d} ERROR stack overflow at frame {item}\n"
    "    at module alpha_{hex4} line {lat}\n"
    "    caused by: timeout after {loadf} sec",
    # 7 — 17-digit float falls back to dict var; ≤16-digit float encodes
    "calib value 12345678901234567.8 ok 1234567890.123456 done",
    # 8 — negative int, zero float-ish, eq-prefixed numeric
    "delta {negint} baseline 0.000 threshold={lat}",
    # 9 — plain prose, no vars at all (pure-static logtype)
    "system heartbeat acknowledged by primary replica",
]

_ZIPF_S = 1.2
_W = np.array([1.0 / (k + 1) ** _ZIPF_S for k in range(len(TEMPLATES))])
TEMPLATE_CDF = np.cumsum(_W / _W.sum())

_EPOCH_2025 = 1735689600  # 2025-01-01T00:00:00Z
_MONTH_SECONDS = 30 * 24 * 3600


def _u32(i: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-row uniform u32 via a Weyl/murmur-style mix."""
    x = (i.astype(np.uint64) + np.uint64(salt * 0x9E3779B9)) * np.uint64(2654435761)
    x ^= x >> np.uint64(16)
    x *= np.uint64(2246822519)
    x ^= x >> np.uint64(13)
    return (x & np.uint64(0xFFFFFFFF)).astype(np.uint64)


def _uniform(i: np.ndarray, salt: int) -> np.ndarray:
    return _u32(i, salt).astype(np.float64) / 2**32


def generate_pages_pdf(start: int, end: int, seed: int = 42) -> pd.DataFrame:
    """Rows [start, end) of the deterministic pages table."""
    i = np.arange(start, end, dtype=np.int64)
    tmpl = np.searchsorted(TEMPLATE_CDF, _uniform(i, seed + 1), side="right")
    lang_ix = np.searchsorted(LANG_CDF, _uniform(i, seed + 2), side="right")
    lang_ix = np.minimum(lang_ix, len(LANGS) - 1)
    ts_off = (_uniform(i, seed + 3) * _MONTH_SECONDS).astype(np.int64)
    ts_ms = (_uniform(i, seed + 4) * 1000).astype(np.int64)

    day = (i % 28 + 1).astype(np.int64)
    hh = i % 24
    mm = (i * 7) % 60
    ss = (i * 13) % 60
    ms = (i * 31) % 1000
    status = np.where(i % 7 == 0, 500, np.where(i % 3 == 0, 404, 200))
    lat = (i * 37) % 10_000
    item = (i * 101) % 100_000
    oct3 = i % 256
    oct4 = (i * 3) % 256
    hits = (i * 11) % 1_000

    texts = []
    urls = []
    for k in range(len(i)):
        ii = int(i[k])
        t = TEMPLATES[int(tmpl[k])]
        txt = t.format(
            day=int(day[k]),
            hh=int(hh[k]),
            mm=int(mm[k]),
            ss=int(ss[k]),
            ms=int(ms[k]),
            status=int(status[k]),
            lat=int(lat[k]),
            item=int(item[k]),
            oct3=int(oct3[k]),
            oct4=int(oct4[k]),
            hits=int(hits[k]),
            loadf=f"{(ii % 997) / 100:.2f}",
            driftf=f"{(ii % 89) / 1000:.3f}",
            hex4=f"{(ii * 2654435761) % 0xFFFF:04x}",
            hex8=f"{(ii * 40503) % 0xFFFFFFFF:08x}",
            worker=f"w{ii % 50}node",
            user=["alice", "bob", "carol", "dave"][ii % 4],
            negint=str(-((ii % 5000) + 1)),
        )
        texts.append(txt)
        urls.append(f"https://site{ii % 97}.example/p/{(ii * 2654435761) % 0xFFFFFFFF:08x}/{ii}")

    htmls = [
        (
            "<html><head><title>page</title></head><body><pre>"
            + _html.escape(t, quote=False)
            + "</pre></body></html>"
        ).encode("utf-8")
        for t in texts
    ]
    warc_ts = pd.to_datetime((_EPOCH_2025 + ts_off) * 1000 + ts_ms, unit="ms", utc=True)
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts.tz_localize(None),
            "html": htmls,
            "text": texts,
            "lang": [LANGS[int(x)] for x in lang_ix],
        }
    )


def extract_text_reference(html_bytes: bytes) -> str:
    """Reference extractor: pull the <pre> payload back out, byte-identical.

    This is the per-url byte-parity contract from BASELINE.json input_hint.
    """
    s = html_bytes.decode("utf-8")
    a = s.index("<pre>") + len("<pre>")
    b = s.rindex("</pre>")
    return _html.unescape(s[a:b])


def generate_pages_df(spark, n: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic generation: spark.range → mapInPandas."""
    if partitions is None:
        partitions = max(8, math.ceil(n / 50_000))
    schema = "url string, warc_ts timestamp, html binary, text string, lang string"

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids from spark.range are contiguous per batch slice; generate
            # row-wise from the exact indexes so output is partition-invariant
            yield generate_pages_pdf_from_ids(ids, seed)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=schema)


def generate_pages_pdf_from_ids(ids: np.ndarray, seed: int = 42) -> pd.DataFrame:
    """Same as generate_pages_pdf but for an arbitrary index array."""
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) == 0:
        return generate_pages_pdf(0, 0, seed)
    # generate_pages_pdf is written over contiguous ranges; rebuild per-row
    parts = [generate_pages_pdf(int(x), int(x) + 1, seed) for x in ids] if len(ids) < 64 else None
    if parts is not None:
        return pd.concat(parts, ignore_index=True)
    # fast path: vectorize over the id array directly
    lo, hi = int(ids.min()), int(ids.max()) + 1
    if hi - lo == len(ids) and np.all(np.diff(ids) == 1):
        return generate_pages_pdf(lo, hi, seed)
    full = generate_pages_pdf(lo, hi, seed)
    return full.iloc[ids - lo].reset_index(drop=True)


def write_pages_table(spark, path: str, n: int, seed: int = 42) -> None:
    """Materialize the pages table as zstd parquet (Iceberg stand-in).

    On a cluster with the Iceberg runtime jar this would be
    `df.writeTo(table).partitionedBy(days("warc_ts")).createOrReplace()`;
    parquet + directory layout is the jar-free local equivalent.
    """
    df = generate_pages_df(spark, n, seed)
    df.write.mode("overwrite").parquet(path)

"""Log-search tool surface — the MCP-server analog, engine-side.

The reference ships an MCP server exposing KQL search tools to LLM
agents: `search_by_kql`, `search_by_kql_with_timestamp_range`, and
`get_nth_page` over a per-session paged result cache with a TTL, all
gated on fetching the usage instructions first
(clp-mcp-server/clp_mcp_server/server/server.py:111-166,
session_manager.py:13-160, constants.py:1-11, utils.py:31-137). This
module implements that tool surface framework-free: plain synchronous
methods returning JSON-shaped dicts (same keys, same error contract),
so any MCP/HTTP adapter can wrap them 1:1 without the engine knowing.

Spark-first differences from the reference flow:

- the reference fetches all results, then sorts and trims in Python;
  here ordering (timestamp descending, entry-text tiebreak) and the
  `max_cached` cap run INSIDE the engine as a distributed top-k
  (TakeOrderedAndProject over the federated-KQL union), so the driver
  only ever holds `max_cached` formatted strings;
- archive pruning reuses the column-metadata index (the same step the
  reference's query scheduler does against its metadata DB);
- entry text is assembled with codegen `concat`/`date_format` columns
  — no per-row Python.

Requires a UTC session timezone for the ISO-8601 timestamps
(`clp_spark.session.get_spark` sets it).
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone

from pyspark.sql import functions as F

NUM_ITEMS_PER_PAGE = 10
MAX_CACHED_RESULTS = 1000
SESSION_TTL_SECONDS = 600.0
TS_NOT_AVAILABLE = "N/A"

# Our own usage guidance (NOT the reference's prompt text): terse,
# action-first, with the grammar corners agents trip on.
INSTRUCTIONS = """\
Search CLP archives with KQL via search_by_kql (or the
_with_timestamp_range variant; timestamps are ISO-8601 UTC ending in
'Z'). Results arrive newest-first, ten per page; fetch more pages
with get_nth_page(page_index).

KQL essentials:
- field: value matches a whole token; use * / ? wildcards for
  substrings ('msg: "*timeout*"').
- Quote any value containing spaces.
- Combine with AND / OR / NOT and parentheses; compare numbers with
  < <= > >= ('latency > 250 AND svc: auth').
- 'field: (a b)' means field is a OR b; 'obj: {k: v}' nests paths;
  a bare quoted value searches every field.
- Escape literal '*', '?', '"' and '\\' in values with a backslash.
Start broad (wildcards) to discover fields, then narrow the query.
"""


def _iso_to_ms(s: str) -> int:
    """ISO-8601 UTC string ('...Z') -> epoch milliseconds."""
    if not s.endswith("Z"):
        raise ValueError(f"timestamp must be UTC ('Z' suffix): {s!r}")
    dt = datetime.fromisoformat(s[:-1]).replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


class PagedResult:
    """Formatted entries + fixed-size page slicing."""

    def __init__(self, entries: list[str], page_size: int, truncated: bool):
        self.entries = entries
        self.page_size = page_size
        self.truncated = truncated
        self.num_pages = (len(entries) + page_size - 1) // page_size

    def page(self, index: int) -> dict:
        if index < 0 or index >= self.num_pages:
            return {
                "Error": f"page_index {index} out of range "
                f"[0, {self.num_pages - 1}]"
            }
        lo = index * self.page_size
        out = {
            "items": self.entries[lo : lo + self.page_size],
            "num_total_pages": self.num_pages,
            "num_total_items": len(self.entries),
            "num_items_per_page": self.page_size,
            "has_next": index + 1 < self.num_pages,
            "has_previous": index > 0,
        }
        if self.truncated:
            out["truncated"] = True
        return out


class _Session:
    def __init__(self, expires_at: float):
        self.expires_at = expires_at
        self.instructed = False
        self.result: PagedResult | None = None


class LogToolServer:
    """Tool-call surface over a fleet of saved clp_s archives.

    `ts_col`: passthrough column carrying each event's timestamp
    (epoch-ms long or a timestamp column); entries missing it sort
    oldest and print 'N/A'. `link_cols`: passthrough columns baked
    into each entry's clp:// link so an agent can hand the exact row
    back to an operator."""

    def __init__(
        self,
        spark,
        archive_dirs: list[str],
        ts_col: str | None = None,
        link_cols: tuple = (),
        page_size: int = NUM_ITEMS_PER_PAGE,
        max_cached: int = MAX_CACHED_RESULTS,
        ttl_seconds: float = SESSION_TTL_SECONDS,
        clock=time.monotonic,
    ):
        self._spark = spark
        self._dirs = list(archive_dirs)
        self._ts_col = ts_col
        self._link_cols = tuple(link_cols)
        self._page_size = page_size
        self._max_cached = max_cached
        self._ttl = ttl_seconds
        self._clock = clock
        self._sessions: dict[str, _Session] = {}
        # {dir: (freshness_token, JsonArchive)} — a long-lived server
        # answers many queries over immutable on-disk archives; pay the
        # driver-side dictionary collects once per archive, not per call
        self._archive_cache: dict = {}

    # -- session plumbing ------------------------------------------

    def _session(self, session_id: str) -> _Session:
        now = self._clock()
        for sid in [s for s, st in self._sessions.items() if st.expires_at <= now]:
            del self._sessions[sid]
        st = self._sessions.get(session_id)
        if st is None:
            st = self._sessions[session_id] = _Session(now + self._ttl)
        else:
            st.expires_at = now + self._ttl
        return st

    # -- tools ------------------------------------------------------

    def get_instructions(self, session_id: str) -> str:
        """Must be called before any search in the session (same
        contract as the reference server)."""
        self._session(session_id).instructed = True
        return INSTRUCTIONS

    def search_by_kql(self, session_id: str, kql_query: str) -> dict:
        """Run a federated KQL search, cache newest-first formatted
        entries for the session, return the first page."""
        return self._search(session_id, kql_query, None)

    def search_by_kql_with_timestamp_range(
        self, session_id: str, kql_query: str, begin_ts: str, end_ts: str
    ) -> dict:
        """Same, constrained to [begin_ts, end_ts] inclusive —
        ISO-8601 UTC strings ending in 'Z'."""
        try:
            lo, hi = _iso_to_ms(begin_ts), _iso_to_ms(end_ts)
        except ValueError as e:
            return {"Error": str(e)}
        if hi < lo:
            return {"Error": f"end_ts {end_ts} precedes begin_ts {begin_ts}"}
        return self._search(session_id, kql_query, (lo, hi))

    def get_nth_page(self, session_id: str, page_index: int) -> dict:
        st = self._session(session_id)
        if st.result is None:
            return {"Error": "no cached query result; run a search first"}
        return st.result.page(page_index)

    # -- execution --------------------------------------------------

    def _search(self, session_id: str, kql: str, ts_range) -> dict:
        st = self._session(session_id)
        if not st.instructed:
            return {"Error": "call get_instructions first"}
        try:
            entries, truncated = self._run(kql, ts_range)
        except Exception as e:  # tool contract: errors are data
            return {"Error": str(e)}
        if not entries:
            return {"Error": "no log events match the query"}
        st.result = PagedResult(entries, self._page_size, truncated)
        return st.result.page(0)

    def _entry_df(self, arch, name: str, kql: str, ts_range):
        """Matched rows of one archive -> (sort_ms, entry) columns.
        The message is the reconstructed record; entry text is built
        with codegen string functions."""
        from clp_spark.clps.encoder import JsonArchive, reconstruct_json_df
        from clp_spark.clps.kql import kql_query as run_kql

        m = run_kql(arch, kql)
        ts = None
        if self._ts_col and self._ts_col in m.columns:
            ts = F.col(self._ts_col)
            if dict(m.dtypes)[self._ts_col] == "timestamp":
                ts = F.unix_millis(ts)
        if ts_range is not None:
            if ts is None:
                return None  # archive has no timestamps in range
            m = m.filter(ts.between(*ts_range))
        sub = JsonArchive(
            m, arch.tree, arch.schema_map, arch.logtype_dict, arch.var_dict,
            arch.node_map, arch.schema_ids,
        )
        rec = reconstruct_json_df(sub, "__msg")
        iso = (
            F.date_format(
                F.timestamp_millis(ts), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
            )
            if ts is not None
            else F.lit(None).cast("string")
        )
        link = F.concat_ws(
            "/", F.lit(f"clp://{name}"), *[F.col(c) for c in self._link_cols]
        )
        entry = F.concat(
            F.lit("timestamp: "),
            F.coalesce(iso, F.lit(TS_NOT_AVAILABLE)),
            F.lit(", message: "),
            F.col("__msg"),
            F.lit(", link: "),
            link,
        )
        sort_ms = ts if ts is not None else F.lit(None).cast("bigint")
        return rec.select(sort_ms.alias("__ms"), entry.alias("__entry"))

    def _run(self, kql: str, ts_range) -> tuple[list[str], bool]:
        from clp_spark.clps.index import (
            load_surviving_archives,
            required_paths,
        )

        searched, archs = load_surviving_archives(
            self._spark,
            self._dirs,
            required_paths(kql),
            cache=self._archive_cache,
        )
        if not searched:
            return [], False
        out = None
        for d, arch in zip(searched, archs):
            part = self._entry_df(
                arch, os.path.basename(os.path.normpath(d)), kql, ts_range
            )
            if part is None:
                continue
            out = part if out is None else out.unionByName(part)
        if out is None:
            return [], False
        # newest-first with a total-order tiebreak so pagination is
        # deterministic at any parallelism; top-k + cap inside the
        # engine (rows beyond max_cached never reach the driver)
        rows = (
            out.orderBy(
                F.col("__ms").desc_nulls_last(), F.col("__entry").asc()
            )
            .limit(self._max_cached + 1)
            .collect()
        )
        truncated = len(rows) > self._max_cached
        return [r["__entry"] for r in rows[: self._max_cached]], truncated


__all__ = [
    "INSTRUCTIONS",
    "LogToolServer",
    "MAX_CACHED_RESULTS",
    "NUM_ITEMS_PER_PAGE",
    "PagedResult",
    "SESSION_TTL_SECONDS",
]

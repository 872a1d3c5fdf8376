"""PII redaction: byte-exact vs a DuckDB RE2 oracle on the same rules."""

from __future__ import annotations

import duckdb
import pytest

from clp_spark.textops.scrub import EMAIL_RE, IPV4_RE, LONG_DIGITS_RE, redact_pii

CASES = [
    "mail me at jane.doe+spam@sub.example.co.uk today",
    "server 192.168.001.250 answered; bad 999.999.999.999 too (regex is numeric-shape, not semantic)",
    "card 4111111111111111 and id 123456789 but keep 12345678",
    "no pii here",
    "mixed: a@b.io 10.0.0.1 987654321x (x breaks \\b so digits stay)",
    "",
]


def test_redaction_matches_duckdb_oracle(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i long, text string"
    )
    got = {r["i"]: r["text"] for r in redact_pii(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(CASES):
        want = con.execute(
            """
            SELECT regexp_replace(regexp_replace(regexp_replace($1,
                $2, '<EMAIL>', 'g'),
                $3, '<IP>', 'g'),
                $4, '<NUM>', 'g')
            """,
            [t, EMAIL_RE, IPV4_RE, LONG_DIGITS_RE],
        ).fetchone()[0]
        assert got[i] == want, (i, got[i], want)


def test_rule_selection(spark):
    df = spark.createDataFrame([(0, "a@b.io 10.0.0.1")], "i long, text string")
    got = redact_pii(df, rules=("email",)).collect()[0]["text"]
    assert got == "<EMAIL> 10.0.0.1"
    with pytest.raises(ValueError):
        redact_pii(df, rules=("nope",))

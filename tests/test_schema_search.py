"""Schema/DFA search path (SchemaSearcher.{hpp,cpp}, GrepCore.hpp:150-153,
design-parsing-wildcard-queries.md): automata primitives, non-heuristic
interpretation enumeration, and e2e exactness over a schema-compressed
table."""

from __future__ import annotations

import random
import re
import string

import pytest

from clp_spark.search.automata import (
    determinize,
    dfa_intersect_nfa_nonempty,
    intersect_nonempty,
    product_nfa,
    regex_nfa,
    union_nfa,
    wildcard_nfa,
)
from clp_spark.search.schema_search import (
    Schema,
    SchemaRule,
    compile_schema_query,
    schema_compress_df,
    schema_parse_one,
    schema_search,
)
from clp_spark.search.wildcard import wildcard_match

# the design doc's motivating schema: floats, ints, then "has a digit"
DOC_SCHEMA = Schema(
    rules=[
        SchemaRule("float", r"-?\d+\.\d+", "float"),
        SchemaRule("int", r"-?\d+", "int"),
        SchemaRule("hasNumber", r"[a-zA-Z0-9_\.]*\d[a-zA-Z0-9_\.]*", "dict"),
    ]
)


class TestAutomata:
    def test_regex_nfa_agrees_with_re(self):
        from clp_spark.parse.grok import GROK_PATTERNS

        random.seed(11)
        alpha = string.ascii_letters + string.digits + " .-_:/"
        for name, pat in GROK_PATTERNS.items():
            nfa = regex_nfa(pat)
            rx = re.compile(pat)
            cands = [
                "".join(random.choice(alpha) for _ in range(random.randint(0, 10)))
                for _ in range(150)
            ] + ["123", "-4.5", "1.2.3.4", "INFO", "", "0", "a_b-c.d", "deadbeef"]
            for s in cands:
                assert nfa.accepts(s) == (rx.fullmatch(s) is not None), (name, s)

    def test_wildcard_nfa_agrees_with_wildcard_match(self):
        random.seed(13)
        for _ in range(1500):
            pat = "".join(random.choice("ab*?c") for _ in range(random.randint(0, 6)))
            s = "".join(random.choice("abc") for _ in range(random.randint(0, 6)))
            assert wildcard_nfa(pat).accepts(s) == wildcard_match(pat, s), (pat, s)

    def test_intersection_vs_bruteforce(self):
        """Product emptiness agrees with brute-force enumeration over a
        tiny alphabet (all strings up to length 5 over {a, b, 1})."""
        random.seed(17)
        pats = [r"[ab]+1", r"a[ab1]*", r"1{2,3}", r"(a|b1)+", r"ab?1*"]
        universe = [""]
        for _ in range(5):
            universe += [u + c for u in universe for c in "ab1"]
        universe = list(dict.fromkeys(universe))
        for p1 in pats:
            for p2 in pats:
                brute = any(
                    re.fullmatch(p1, s) and re.fullmatch(p2, s) for s in universe
                )
                got = intersect_nonempty(regex_nfa(p1), regex_nfa(p2))
                # brute force only covers length ≤ 5; these patterns'
                # shortest witnesses are all ≤ 5, so equality holds
                assert got == brute, (p1, p2)

    def test_complement_and_product(self):
        n_int = regex_nfa(r"-?\d+")
        compl = determinize(union_nfa([n_int])).complement()
        # "123*" can be a non-int ("123a") but "123" cannot
        assert dfa_intersect_nfa_nonempty(compl, wildcard_nfa("123*"))
        assert not dfa_intersect_nfa_nonempty(compl, wildcard_nfa("123"))
        # product: L("1*4") ∩ L(IP) nonempty via 1.2.3.4-style strings
        ip = regex_nfa(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}")
        prod = product_nfa(wildcard_nfa("1*4"), ip)
        assert prod.accepts("1.2.3.4")


class TestSchemaParse:
    def test_doc_example_classification(self):
        msg = "INFO Task task_12 assigned in 0.335 seconds after 3 tries"
        lt, vs, vt, ev = schema_parse_one(msg, DOC_SCHEMA)
        assert vs == ["task_12", "0.335", "3"]
        # dict, float, int (VT codes: 0=int,1=float,2=dict per config)
        from clp_spark.config import VT_DICT, VT_FLOAT, VT_INT

        assert vt == [VT_DICT, VT_FLOAT, VT_INT]
        assert "task_12" not in lt and "INFO" in lt and "Task" in lt

    def test_priority_first_match_wins(self):
        # "12" fullmatches both int and hasNumber; int wins (priority)
        from clp_spark.config import VT_INT

        _lt, vs, vt, _ev = schema_parse_one("x 12 y", DOC_SCHEMA)
        assert vs == ["12"] and vt == [VT_INT]


class TestSchemaCompile:
    def _kinds(self, cq, i):
        return {b.kind for b in cq.tokens[i].branches}

    def test_doc_example_interpretations(self):
        """The design doc's query '*task* took 0.3*': 'task' piece can be
        a hasNumber dict var or static; 'took' is static-only (automata
        PROVE no rule can match it); '0.3*' can be a float, the dict
        fallback, or static ("0.3-" escapes every rule) — but NEVER an
        int: the literal dot rules int out exactly."""
        cq = compile_schema_query("*task* took 0.3*", DOC_SCHEMA, substring=False)
        assert len(cq.tokens) == 3
        k0, k1, k2 = (self._kinds(cq, i) for i in range(3))
        assert k0 == {"dictvar", "logtype"}
        assert k1 == {"logtype"}          # heuristic path would say the same
        assert "enc_float" in k2 and "enc_int" not in k2

    def test_static_impossible_under_catchall_rule(self):
        """With a catch-all last rule every token is a variable, so the
        automata must prove static text IMPOSSIBLE for every query
        token — the exactness the heuristic path can't provide."""
        s = Schema(
            rules=DOC_SCHEMA.rules
            + [SchemaRule("any", r"[^ \t\r\n:,!;%]+", "dict")]
        )
        for q in ("0.3*", "*task*", "zz?q"):
            cq = compile_schema_query(q, s, substring=False)
            assert "logtype" not in self._kinds(cq, 0), q
        # and the int exclusion still holds through the catch-all
        cq = compile_schema_query("0.3*", s, substring=False)
        assert "enc_int" not in self._kinds(cq, 0)

    def test_token_outside_every_rule_is_static_only(self):
        # '-' is not in hasNumber's alphabet and "x-y" has letters →
        # no rule can ever match "*x-y*"
        cq = compile_schema_query("*x-y*", DOC_SCHEMA, substring=False)
        assert self._kinds(cq, 0) == {"logtype"}

    def test_priority_shadowing(self):
        # rule0 shadows rule1 on "cat": a "ca?" token can be rule1 only
        # via a non-"cat" completion; exact "cat" is rule0 only
        s = Schema(
            rules=[
                SchemaRule("r0", r"cat", "dict"),
                SchemaRule("r1", r"ca[a-z]", "dict"),
            ]
        )
        cq = compile_schema_query("ca?", s, substring=False)
        assert "dictvar" in self._kinds(cq, 0)
        # exact token: first-match classification
        cq2 = compile_schema_query("cat", s, substring=False)
        assert [b.kind for b in cq2.tokens[0].branches] == ["dictvar"]
        # a 4-char token can match neither rule → static only
        cq3 = compile_schema_query("catt", s, substring=False)
        assert self._kinds(cq3, 0) == {"logtype"}


@pytest.fixture(scope="module")
def schema_corpus(spark):
    msgs = []
    for i in range(400):
        msgs.append(
            (
                i,
                f"INFO Task task_{i % 37} assigned to node_{i % 11} "
                f"took {((i % 97) + 1) / 100:.2f} seconds after {i % 7} tries",
            )
        )
    for i in range(400, 450):
        msgs.append((i, "WARN scheduler queue saturated - backing off"))
    df = spark.createDataFrame(msgs, "mid long, text string")
    enc, lt, vd = schema_compress_df(df, DOC_SCHEMA, passthrough=["mid"])
    return df.toPandas(), (enc.persist(), lt.persist(), vd.persist())


class TestSchemaSearchE2E:
    @pytest.mark.parametrize(
        "query",
        [
            "*task_1* took*",
            "took 0.3*",
            "*node_7*",
            "*queue saturated*",
            "after 3 tries",
            "*task_9 assigned*0.5?*",
            "zz_no_such_token",
        ],
    )
    def test_exact_vs_bruteforce(self, spark, schema_corpus, query):
        pdf, (enc, lt, vd) = schema_corpus
        got = {
            r["mid"]
            for r in schema_search(enc, lt, vd, query, DOC_SCHEMA)
            .select("mid")
            .collect()
        }
        pat = "*" + query + "*"
        exp = {
            m for m, t in zip(pdf["mid"], pdf["text"]) if wildcard_match(pat, t)
        }
        assert got == exp, query

"""Analyzer parity properties (round-2 verdict item 10).

Every SQL oracle in __spark_entry__.py tokenizes with
``regexp_extract_all(lower(text), '[a-z0-9_]+')`` (analysis.sql_token_expr)
and filters with sql_stopword_list(); the engine tokenizes in Python
(analysis.Analyzer) inside Arrow UDF batches.  These properties pin the
two implementations together over adversarial random strings — the same
guarantee the per-query oracle hash-matches give, but exhaustive over the
string space instead of over one fixture corpus:

1. DuckDB's evaluation of sql_token_expr == Analyzer("simple").tokenize
2. DuckDB tokens + len>1 + stop-filter == Analyzer("simple").analyze
3. the vectorized UDF batch path (term_freqs_udf) == per-string
   Analyzer.term_freqs (batch/scalar parity for the build pipeline)
4. code-preset camelCase splitting: batch == scalar, and every emitted
   token survives a round-trip through the token charset
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pyfusedb_spark.analysis import (
    PRESETS,
    Analyzer,
    sql_stopword_list,
    sql_token_expr,
)
from pyfusedb_spark.functions.udfs import term_freqs_udf

# mix of token chars, case flips, digits, punctuation/noise, unicode,
# whitespace — weighted toward boundary-adjacent characters
_alphabet = st.sampled_from(
    list("abcXYZ019_ \t\n.,;:!?'\"-+()[]{}/\\<>@#$%^&*`~|=")
    + ["é", "ß", "λ", "中", " ", "\U0001f600"]
)
texts = st.text(alphabet=_alphabet, max_size=200)


def _duck_tokens(text: str) -> list[str]:
    con = duckdb.connect()
    try:
        con.execute("SELECT " + sql_token_expr("$1::VARCHAR"), [text])
        return list(con.fetchone()[0])
    finally:
        con.close()


@settings(max_examples=150, deadline=None)
@given(texts)
def test_sql_token_expr_matches_python_tokenize(text):
    assert _duck_tokens(text) == Analyzer("simple").tokenize(text)


@settings(max_examples=150, deadline=None)
@given(texts)
def test_sql_pipeline_matches_python_analyze(text):
    con = duckdb.connect()
    try:
        con.execute(
            "SELECT list_filter(" + sql_token_expr("$1::VARCHAR") + ", "
            "t -> len(t) > 1 AND t NOT IN " + sql_stopword_list() + ")",
            [text],
        )
        sql_toks = list(con.fetchone()[0])
    finally:
        con.close()
    assert sql_toks == Analyzer("simple").analyze(text)


@settings(max_examples=30, deadline=None)
@given(st.lists(texts, min_size=1, max_size=16))
def test_udf_batch_matches_scalar_analyzer(batch):
    for preset in ("simple", "english", "code"):
        fn = term_freqs_udf(preset).func
        got = fn(pd.Series(batch)).tolist()
        az = Analyzer(preset)
        expect = [az.term_freqs(t) for t in batch]
        assert [dict(g) for g in got] == expect, preset


@settings(max_examples=150, deadline=None)
@given(texts)
def test_code_preset_tokens_stay_in_charset(text):
    toks = Analyzer("code").analyze(text)
    simple_cfg = PRESETS["code"]
    for t in toks:
        assert len(t) >= simple_cfg.min_token_len
        # identifier splitting lowercases; every token re-tokenizes to
        # itself under the plain charset tokenizer (no hidden chars leak)
        assert Analyzer("simple").tokenize(t) == [t], (text, toks)

"""parse_query grammar unit tests (SURVEY.md §2.6 Q1/Q4/T4).

Reference grammar: app/SqlParser.py:8-53 — whitespace-split SELECT/
FROM/LIKE|LIKETO, 'limit' only terminates the like-term there; this
engine additionally extracts the numeric LIMIT in both the LIKE and
no-LIKE forms.
"""

from pyfusedb_spark.plans.sqlfront import parse_query


def test_like_with_limit():
    p = parse_query("SELECT a, b FROM t LIKE foo bar LIMIT 3", "t")
    assert p.fields == ["a", "b"]
    assert p.table == "t"
    assert p.like_term == "foo bar"
    assert p.limit == 3


def test_liketo_alias():
    p = parse_query("SELECT a FROM t LIKETO foo", "t")
    assert p.like_term == "foo"
    assert p.limit is None


def test_nolike_limit_honored():
    p = parse_query("SELECT doc_id FROM documents LIMIT 2", "documents")
    assert p.like_term is None
    assert p.limit == 2


def test_nolike_no_limit():
    p = parse_query("SELECT doc_id FROM documents", "documents")
    assert p.like_term is None
    assert p.limit is None


def test_bad_limit_value_ignored():
    assert parse_query("SELECT a FROM t LIMIT xyz", "t").limit is None
    assert parse_query("SELECT a FROM t LIKE q LIMIT xyz", "t").limit is None


def test_garbage_falls_back_to_default():
    p = parse_query("garbage ,,, input !!", "files")
    assert p.table == "files"
    assert p.like_term is None


def test_negative_limit_ignored():
    # a negative LIMIT must not reach DataFrame.limit() (AnalysisException)
    assert parse_query("SELECT a FROM t LIMIT -5", "t").limit is None
    assert parse_query("SELECT a FROM t LIKE q LIMIT -1", "t").limit is None


def test_limit_zero_kept():
    # LIMIT 0 is a real value (zero rows), not "no limit"
    assert parse_query("SELECT a FROM t LIMIT 0", "t").limit == 0
    assert parse_query("SELECT a FROM t LIKE q LIMIT 0", "t").limit == 0

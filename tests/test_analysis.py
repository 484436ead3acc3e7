"""Analyzer + Porter2 stemmer unit tests (SURVEY.md §5 plan item 1)."""

from pyfusedb_spark import porter2
from pyfusedb_spark.analysis import Analyzer, STOPWORD_SET


def test_porter2_golden_morphology():
    # The exact transformations the reference golden-df table depends on
    # (app/tests/final_ii.py:73-84 expectations).
    vectors = {
        "quick": "quick",
        "quickly": "quick",
        "jump": "jump",
        "jumps": "jump",
        "jumped": "jump",
        "jumping": "jump",
        "wizard": "wizard",
        "wizards": "wizard",
        "fox": "fox",
        "foxes": "fox",
        "box": "box",
        "boxes": "box",
        "boxing": "box",
        "flower": "flower",
        "flowers": "flower",
        "bloom": "bloom",
        "blooming": "bloom",
        "bloomed": "bloom",
        "running": "run",
        "run": "run",
        "dog": "dog",
        "dogs": "dog",
        "cat": "cat",
        "cats": "cat",
    }
    for w, expect in vectors.items():
        assert porter2.stem(w) == expect, (w, porter2.stem(w), expect)


def test_porter2_general_vectors():
    vectors = {
        "caresses": "caress",
        "ponies": "poni",
        "ties": "tie",
        "flies": "fli",
        "dying": "die",
        "agreed": "agre",
        "hoping": "hope",
        "hopping": "hop",
        "sky": "sky",
        "conditional": "condit",
        "rational": "ration",
        "happy": "happi",
        "relational": "relat",
        "generalization": "general",
        "playing": "play",
        "played": "play",
        "gardens": "garden",
        "zebras": "zebra",
        "a": "a",
        "be": "be",
        "42": "42",
    }
    for w, expect in vectors.items():
        assert porter2.stem(w) == expect, (w, porter2.stem(w), expect)


def test_analyzer_english_pipeline():
    az = Analyzer("english")
    # lowercase -> tokenize -> stopfilter -> stem; len>1 on both sides
    toks = az.analyze("The quick brown foxes JUMP over the lazy dogs!")
    assert toks == ["quick", "brown", "fox", "jump", "lazi", "dog"]
    # punctuation/casing noise (FIXTURES.md query 8)
    assert az.analyze("Quick-FOX!!") == ["quick", "fox"]
    # stopword-only query -> empty (FIXTURES.md query 7)
    assert az.analyze("the of and is") == []
    # repeated terms -> tf>1 (FIXTURES.md query 6)
    assert az.preprocess_query("love love love") == {"love": 3}


def test_analyzer_simple_mode_no_stem():
    az = Analyzer("simple")
    assert az.analyze("Running dogs chase!") == ["running", "dogs", "chase"]


def test_analyzer_code_mode_identifier_split():
    az = Analyzer("code")
    toks = az.analyze("def parseHTTPResponse(buf_size): return buf_size")
    assert "parse" in toks and "http" in toks and "response" in toks
    assert "buf" in toks and "size" in toks
    # code mode keeps English stopwords (they are code keywords)
    assert "return" in toks


def test_stopword_set_sane():
    assert "the" in STOPWORD_SET and "quick" not in STOPWORD_SET

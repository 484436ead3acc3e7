"""single-pass posting mode must produce an index identical (for search)
to per-bucket mode, and still commit per-bucket manifests."""

import json
import os

import numpy as np

from pyfusedb_spark.operators.build import IndexConfig, build_index
from pyfusedb_spark.operators.query import FuseIndex

from tests.test_oracle import PANGRAMS

QUERIES = ["quick fox", "jumping wizards", "flower bloom dog", "quick"]


def test_single_pass_equals_per_bucket(spark, tmp_path):
    corpus = spark.createDataFrame(
        [(i, c) for i, c in enumerate(PANGRAMS)], "doc_id long, content string"
    )
    out_a, out_b = str(tmp_path / "per_bucket"), str(tmp_path / "single_pass")
    build_index(spark, corpus, out_a, doc_id_col="doc_id",
                config=IndexConfig(n_buckets=3, shuffle_partitions=4,
                                   posting_mode="per-bucket"))
    build_index(spark, corpus, out_b, doc_id_col="doc_id",
                config=IndexConfig(n_buckets=3, shuffle_partitions=4,
                                   posting_mode="single-pass"))
    ia, ib = FuseIndex(spark, out_a), FuseIndex(spark, out_b)
    assert ia.stats["n_postings"] == ib.stats["n_postings"]
    assert ia.stats["vocabulary"] == ib.stats["vocabulary"]
    for q in QUERIES:
        ra, rb = ia.search(q, 10), ib.search(q, 10)
        assert [d for d, _ in ra] == [d for d, _ in rb]
        np.testing.assert_allclose([s for _, s in ra], [s for _, s in rb], atol=1e-12)
    # per-bucket manifests exist in single-pass mode too
    for k in range(3):
        p = os.path.join(out_b, "_manifests", f"bucket={k}.json")
        assert os.path.exists(p)
        m = json.load(open(p))
        assert m["n_postings"] > 0 and m["term_range"][0] <= m["term_range"][1]
    assert os.path.exists(os.path.join(out_b, "_manifests", "stage_postings.json"))

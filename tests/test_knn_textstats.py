"""Similarity search + text-analysis function tests (real testdata)."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from pyfusedb_spark.functions import multimodal, textstats
from pyfusedb_spark.operators import knn

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np():
    con = duckdb.connect()
    rows = con.sql(f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def _numpy_topk(ids, mat, q, k):
    cos = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -cos))[:k]
    return [(int(ids[i]), float(cos[i])) for i in order]


def test_brute_force_topk_matches_numpy(emb, emb_np):
    ids, mat = emb_np
    q = mat[0].tolist()
    got = knn.brute_force_topk(emb, q, 10).collect()
    expect = _numpy_topk(ids, mat, np.asarray(q), 10)
    assert [r["vec_id"] for r in got] == [d for d, _ in expect]
    np.testing.assert_allclose([r["cosine"] for r in got], [s for _, s in expect], atol=1e-6)
    assert got[0]["vec_id"] == 0 and got[0]["cosine"] == pytest.approx(1.0, abs=1e-6)


def test_range_search(emb, emb_np):
    ids, mat = emb_np
    q = mat[3].tolist()
    got = knn.range_search(emb, q, 0.5).collect()
    cos = (mat @ np.asarray(q)) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    expect_ids = set(ids[cos >= 0.5].tolist())
    assert {r["vec_id"] for r in got} == expect_ids


def test_knn_join_per_query(spark, emb, emb_np):
    ids, mat = emb_np
    queries = spark.createDataFrame(
        [(int(i), mat[i].tolist()) for i in range(3)], "q_id long, q_vec array<double>"
    )
    got = knn.knn_join(emb, queries, k=5).collect()
    for qi in range(3):
        rows = [r for r in got if r["q_id"] == qi]
        expect = _numpy_topk(ids, mat, mat[qi], 5)
        assert [r["vec_id"] for r in rows] == [d for d, _ in expect]


def test_lsh_ann_lift_on_real_embeddings(spark, emb, emb_np):
    """Sandbox embeddings have near-orthogonal neighbours (cos≈0.3) —
    assert the honest contract: recall beats the scanned fraction
    (lift), and the self-match is always found."""
    ids, mat = emb_np
    q = mat[7].tolist()
    brute = {d for d, _ in _numpy_topk(ids, mat, np.asarray(q), 10)}
    sigs = knn.lsh_signatures(emb, dim=len(q), n_planes=16)
    approx = {r["vec_id"] for r in knn.lsh_ann_topk(emb, q, 10, n_planes=16, max_hamming=6).collect()}
    # scanned fraction under the same prefilter
    planes = knn._hyperplanes(len(q), 16)
    qsig = int(sum((1 << i) for i in range(16) if planes[i] @ np.asarray(q) > 0))
    bits = (mat @ planes.T) > 0
    qbits = np.array([(qsig >> i) & 1 for i in range(16)], dtype=bool)
    frac = ((bits != qbits).sum(1) <= 6).mean()
    recall = len(brute & approx) / 10
    assert 7 in approx  # self-match always found
    assert recall >= 2 * frac, f"LSH lift too low: recall={recall}, scanned={frac:.3f}"


def test_lsh_ann_high_recall_on_clustered_data(spark):
    """Where LSH assumptions hold (tight clusters, cos≈0.95), recall is high."""
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((5, 32))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(400):
        c = centers[i % 5]
        v = c + 0.12 * rng.standard_normal(32)
        rows.append((i, v.tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows])
    q = rows[0][1]
    brute = {d for d, _ in _numpy_topk(ids, mat, np.asarray(q), 10)}
    approx = {r["vec_id"] for r in knn.lsh_ann_topk(emb, q, 10, n_planes=16, max_hamming=4).collect()}
    recall = len(brute & approx) / 10
    assert recall >= 0.9, f"clustered LSH recall {recall}"


def test_textstats_against_python(spark):
    texts = [
        (0, "The quick brown fox! 42 times."),
        (1, ""),
        (2, "el la de que los with some english the and of"),
        (3, "x " * 30),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            textstats.token_count("text").alias("n_tok"),
            textstats.bpe_token_count("text").alias("n_bpe"),
            textstats.langid("text").alias("lang"),
            textstats.quality_score("text").alias("q"),
            textstats.fingerprint("text").alias("fp"),
        ).collect()
    }
    import re
    assert out[0]["n_tok"] == len(re.findall(r"[a-z0-9_]+", texts[0][1].lower()))
    assert out[0]["n_bpe"] == len(re.findall(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+", texts[0][1]))
    assert out[1]["n_tok"] == 0 and out[1]["lang"] == "und" and out[1]["fp"] == 0
    assert out[0]["lang"] == "en"
    assert out[2]["lang"] == "es"  # more es markers than en
    assert 0.0 <= out[3]["q"] <= 1.0


def test_fingerprint_matches_duckdb_list_reduce(spark):
    """The SQL-oracle contract: Spark F.aggregate == DuckDB list_reduce."""
    texts = [(0, "hello world foo bar"), (1, "Mixed CASE tokens 123 underscore_id"), (2, "")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r["fp"] for r in
           df.select("doc_id", textstats.fingerprint("text").alias("fp")).collect()}
    con = duckdb.connect()
    sql = """
    SELECT doc_id, CASE WHEN len(toks)=0 THEN 0 ELSE list_reduce(
        list_prepend(0::BIGINT, list_transform(toks, t -> (length(t)*131 + ascii(t[1]))::BIGINT)),
        (acc, x) -> (acc * 31 + x) % 2147483647) END AS fp
    FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS toks
          FROM (VALUES (0,'hello world foo bar'),
                       (1,'Mixed CASE tokens 123 underscore_id'),
                       (2,'')) AS v(doc_id, text))
    """
    expect = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    assert got == expect


def test_multimodal_binary_plumbing(spark):
    docs = spark.createDataFrame(
        [(0, "hello"), (1, "binary päyload"), (2, "")], "doc_id long, text string"
    )
    binary = multimodal.attach_fake_binary(docs, "text", "doc_id")
    meta = {r["doc_id"]: r for r in multimodal.decode_image_meta(binary).collect()}
    assert meta[0]["n_bytes"] == 5 and meta[0]["magic"] == "hell".encode().hex()
    assert meta[1]["n_bytes"] == len("binary päyload".encode())
    assert meta[2]["n_bytes"] == 0
    import hashlib
    assert meta[0]["sha256"] == hashlib.sha256(b"hello").hexdigest()
    assert 320 <= meta[0]["width"] < 1920 and 240 <= meta[0]["height"] < 1140
    with pytest.raises(NotImplementedError):
        multimodal.extract_features(binary)


def test_ivf_exact_when_probing_all(spark, emb):
    """nprobe = nlist degenerates to brute force — exact same top-k."""
    from pyfusedb_spark.operators import knn

    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    cents = knn.ivf_train(emb, nlist=8, sample_n=256)
    assigned = knn.ivf_assign(emb, cents)
    got = knn.ivf_topk(assigned, cents, qv, k=10, nprobe=8).collect()
    ref = knn.brute_force_topk(emb, qv, 10).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in ref]
    assert all(abs(a["cosine"] - b["cosine"]) < 1e-9 for a, b in zip(got, ref))


def test_ivf_probe_contains_query_cell(spark, emb):
    """Pruned probing still returns k rows and finds the query vector
    itself (its own cell is always the nearest probe)."""
    from pyfusedb_spark.operators import knn

    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    cents = knn.ivf_train(emb, nlist=8, sample_n=256)
    assigned = knn.ivf_assign(emb, cents)
    got = knn.ivf_topk(assigned, cents, qv, k=5, nprobe=2).collect()
    assert len(got) == 5
    assert got[0]["vec_id"] == 3 and got[0]["cosine"] > 0.999999
    # determinism across repartitionings
    got2 = knn.ivf_topk(assigned.repartition(7), cents, qv, k=5, nprobe=2).collect()
    assert [(r["vec_id"], round(r["cosine"], 9)) for r in got] == [
        (r["vec_id"], round(r["cosine"], 9)) for r in got2
    ]


def test_grid_range_search_exact(spark, emb):
    """Grid-prefiltered range search must equal the full-scan range
    search exactly (the cell-radius prune is lossless)."""
    from pyfusedb_spark.operators import knn

    qv = [float(x) for x in emb.where("vec_id = 5").first()["embedding"]]
    for thresh in (0.2, 0.3, 0.35):
        got = knn.grid_range_search(emb, qv, thresh).collect()
        ref = knn.range_search(emb, qv, thresh).collect()
        assert [(r["vec_id"], round(r["cosine"], 9)) for r in got] == [
            (r["vec_id"], round(r["cosine"], 9)) for r in ref
        ], thresh


def test_png_header_decode_real(spark):
    """decode_image_meta parses REAL PNG IHDR dimensions (stdlib-only);
    non-PNG payloads keep the deterministic stub dims."""
    import struct

    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">II", 640, 480) + b"\x00" * 8
    # IHDR layout: 8-byte magic, 4-byte len, 4-byte 'IHDR', then w/h
    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + struct.pack(">II", 640, 480) + b"\x00" * 5
    df = spark.createDataFrame([(1, bytearray(png)), (2, bytearray(b"notpng-payload"))],
                               "doc_id long, payload binary")
    rows = {r["doc_id"]: r for r in multimodal.decode_image_meta(df).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (640, 480)
    assert rows[1]["magic"] == "89504e47"
    assert rows[2]["width"] != 640  # stub path


def test_char_histogram_features(spark):
    binary = spark.createDataFrame(
        [(0, bytearray(b"aab9")), (1, bytearray(b"!!!")), (2, bytearray(b""))],
        "doc_id long, payload binary",
    )
    out = multimodal.extract_char_histogram(binary).collect()
    got = {(r["doc_id"], r["ch"]): r["freq"] for r in out}
    assert got[(0, "a")] == pytest.approx(0.5)
    assert got[(0, "b")] == pytest.approx(0.25)
    assert got[(0, "9")] == pytest.approx(0.25)
    assert not [k for k in got if k[0] in (1, 2)]  # no countable chars -> no rows

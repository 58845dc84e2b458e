"""IVFADC artifact manager: save (table + model sidecar), load in a
model-free session, search ≡ the training session's search."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nr_rfc_dischargeobs_spark.extensions import ann_store, similarity


def _trained_parts(spark):
    emb = similarity.prepare(
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    )
    coarse = emb.filter((F.col("vec_id") >= 8) & (F.col("vec_id") < 12))
    queries = emb.filter((F.col("vec_id") >= 12) & (F.col("vec_id") < 28))
    corpus = emb.filter(F.col("vec_id") >= 28)
    coarse_rows = [
        (int(r["vec_id"]), [int(v) for v in r["q"]])
        for r in coarse.collect()
    ]
    residuals = similarity.residualize(
        similarity.ivf_assign(corpus, coarse, 1, None), coarse_rows
    )
    cb = similarity.pq_train_codebooks(residuals, k=8, m=4, dim=64, iters=1)
    return coarse, queries, corpus, coarse_rows, cb


def test_save_load_search_round_trip(spark, tmp_path):
    """The full production split: train + save in one 'session', load
    from the sidecar alone (no Python model state), search — results
    identical to searching the in-session index."""
    coarse, queries, corpus, coarse_rows, cb = _trained_parts(spark)
    ix = similarity.ivf_pq_index(
        corpus, coarse, cb, m=4, dim=64, residual=True
    ).persist()
    path = str(tmp_path / "ivfadc_index")
    handle = ann_store.save_ivfadc(ix, path, coarse_rows, cb, m=4, dim=64)
    want = sorted(map(tuple, similarity.ivfadc_topk(
        queries, ix, coarse, cb, k=3, nprobe=2
    ).collect()))
    ix.unpersist()

    # search via the handle save_ivfadc returned...
    got_handle = sorted(map(tuple, handle.search(queries, k=3, nprobe=2)
                            .collect()))
    # ...and via a cold load that reconstructs the model from disk only
    loaded = ann_store.load_ivfadc(path)
    assert loaded.m == 4 and loaded.dim == 64
    assert loaded.coarse_rows == coarse_rows
    assert loaded.centroid_rows == cb
    got_cold = sorted(map(tuple, loaded.search(queries, k=3, nprobe=2)
                          .collect()))
    assert got_handle == want
    assert got_cold == want
    # the table itself stays a plain parquet reader's artifact: the
    # sidecar must not break a direct scan, and list_id must be a
    # partition column (pruning on search)
    direct = spark.read.parquet(path)
    assert "list_id" in direct.columns
    assert direct.count() == corpus.count()


def test_save_rejects_raw_coded_index(spark, tmp_path):
    coarse, _, corpus, coarse_rows, cb = _trained_parts(spark)
    raw = similarity.ivf_pq_index(corpus, coarse, cb, m=4, dim=64)
    with pytest.raises(ValueError, match="residual=True"):
        ann_store.save_ivfadc(
            raw, str(tmp_path / "x"), coarse_rows, cb, m=4, dim=64
        )


def test_load_validation_failures(spark, tmp_path):
    coarse, _, corpus, coarse_rows, cb = _trained_parts(spark)
    ix = similarity.ivf_pq_index(
        corpus, coarse, cb, m=4, dim=64, residual=True
    )
    path = str(tmp_path / "ix")
    ann_store.save_ivfadc(ix, path, coarse_rows, cb, m=4, dim=64)

    # missing sidecar = partial/crashed save → loud, never a search
    os.remove(os.path.join(path, ann_store.MODEL_FILE))
    with pytest.raises(ValueError, match="sidecar"):
        ann_store.load_ivfadc(path)

    # corrupted version / layout / quant grid all refuse loudly
    base = {
        "format_version": ann_store._FORMAT_VERSION,
        "layout": "ivfadc_residual",
        "m": 4, "dim": 64,
        "coarse_rows": [[c, q] for c, q in coarse_rows],
        "centroid_rows": [[c, q] for c, q in cb],
        "quant": similarity.QUANT,
    }
    for field, bad, msg in (
        ("format_version", 99, "version"),
        ("layout", "ivf_raw", "layout"),
        ("quant", 10, "grid"),
    ):
        model = dict(base)
        model[field] = bad
        with open(os.path.join(path, ann_store.MODEL_FILE), "w") as fh:
            json.dump(model, fh)
        with pytest.raises(ValueError, match=msg):
            ann_store.load_ivfadc(path)

    # remote-scheme paths are a stated non-goal for the sidecar IO
    with pytest.raises(ValueError, match="local file"):
        ann_store.load_ivfadc("s3://bucket/ix")


def test_streamed_index_becomes_loadable_artifact(spark, tmp_path):
    """write_ivfadc_model turns an ivfadc_index_stream store into a
    load_ivfadc artifact: cold-load + search over the streamed
    batch_id=N/list_id=K layout equals ivfadc_topk over the same store
    with the in-session model."""
    import json as _json

    from nr_rfc_dischargeobs_spark.streaming import (
        ivfadc_index_stream,
        read_ivfadc_index,
    )

    coarse_rows = [(7, [0, 0, 0, 0])]
    cb = [(0, [0, 0, 0, 0]), (1, [100_000] * 4)]
    landing = tmp_path / "vecs"
    landing.mkdir()
    (landing / "s1.jsonl").write_text(
        "\n".join(
            _json.dumps({"vec_id": i, "embedding": [0.1 * i] * 4})
            for i in range(1, 7)
        )
        + "\n"
    )
    index_dir = str(tmp_path / "index")
    stream = spark.readStream.schema(
        "vec_id BIGINT, embedding ARRAY<FLOAT>"
    ).json(str(landing))
    q = ivfadc_index_stream(
        stream, index_dir, str(tmp_path / "ckpt"), coarse_rows, cb,
        m=2, dim=4,
    )
    q.awaitTermination(120)

    ann_store.write_ivfadc_model(index_dir, coarse_rows, cb, m=2, dim=4)
    loaded = ann_store.load_ivfadc(index_dir)
    assert loaded.m == 2 and loaded.coarse_rows == coarse_rows

    queries = similarity.prepare(
        spark.createDataFrame(
            [(100, [0.35] * 4), (101, [0.05] * 4)],
            ["vec_id", "embedding"],
        )
    )
    got = sorted(map(tuple, loaded.search(queries, k=2, nprobe=1)
                     .collect()))
    want = sorted(map(tuple, similarity.ivfadc_topk(
        queries, read_ivfadc_index(spark, index_dir),
        loaded.coarse_frame(spark), cb, k=2, nprobe=1, m=2, dim=4,
    ).collect()))
    assert got == want
    assert len({t[0] for t in got}) == 2  # both queries answered

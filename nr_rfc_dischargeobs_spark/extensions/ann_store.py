"""Persistent IVFADC index ARTIFACTS: the code table plus its model.

The search half of IVFADC needs three things the parquet rows do not
carry: the coarse centroids, the trained PQ codebook, and the (m, dim)
geometry.  Until now those lived only as Python values in the training
session — a fresh session could read a stored index table but could not
SEARCH it without retraining, which defeats the train-once / store /
search-many production split (`plans/extensions.py
sim_ivfadc_store_topk` pins the table half; this module completes it
with the model half).  FAISS serializes the model into the index file;
here the table stays parquet partitioned by ``list_id`` (partition
pruning on search, any reader can scan it) and the model rides as a
JSON sidecar ``_ivfadc_model.json`` inside the index directory — the
underscore prefix makes every parquet reader ignore it as a non-data
file, the same convention as ``_SUCCESS``.

Write order is the atomicity story: the sidecar is written AFTER the
table commit, so a crashed save leaves a directory without a model file
and :func:`load_ivfadc` fails loudly ("no model sidecar") instead of
silently searching a partial index.  The sidecar is plain JSON of plain
integers (quantized-grid model parameters), so it is engine- and
version-portable by construction.

Reference scope note: the reference system (bcgov/nr-rfc-dischargeobs)
has no ANN tier; this extends the §2.10 extension surface's IVFADC
stack the same way ``sources/store.py`` wraps the observation store.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from . import similarity

MODEL_FILE = "_ivfadc_model.json"
_FORMAT_VERSION = 1


def _local_path(path: str) -> str:
    """The sidecar is written with plain file IO, which only a local
    (or file://) path supports — object stores need the same bytes at
    ``<index>/_ivfadc_model.json`` via their own client, stated loudly
    rather than half-working."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if "://" in path:
        raise ValueError(
            f"save/load_ivfadc write the model sidecar with local file"
            f" IO; for a remote store ({path!r}) write/read the JSON at"
            f" <index>/{MODEL_FILE} with the store's client instead"
        )
    return path


@dataclass(frozen=True)
class IvfadcIndex:
    """A loaded IVFADC artifact: geometry + model, ready to search.

    ``search`` is :func:`~.similarity.ivfadc_topk` over the stored
    table — a plain partition-pruned scan (the ``_index_barrier``
    pass-through shape), with the coarse centroids rebuilt as a
    metadata-scale frame from the sidecar rows."""

    path: str
    m: int
    dim: int
    coarse_rows: list[tuple[int, list[int]]]
    centroid_rows: list[tuple[int, list[int]]]

    def frame(self, spark: SparkSession) -> DataFrame:
        """The stored code table (vec_id, list_id, code_*, sq_err, rn)."""
        return spark.read.parquet(self.path)

    def coarse_frame(self, spark: SparkSession) -> DataFrame:
        """The coarse centroids as a ``prepare``-shaped frame (k rows —
        a model parameter, never corpus-scale)."""
        return spark.createDataFrame(
            [
                (int(cid), [int(v) for v in cq], sum(int(v) ** 2 for v in cq))
                for cid, cq in self.coarse_rows
            ],
            "vec_id long, q array<bigint>, n long",
        )

    def search(
        self,
        queries: DataFrame,
        k: int = 3,
        nprobe: int = 2,
    ) -> DataFrame:
        """Residual-ADC top-k over the stored index.  ``queries`` is a
        :func:`~.similarity.prepare` frame; output is ivfadc_topk's
        (query_id, neighbor_id, rank, cosine_adc)."""
        spark = queries.sparkSession
        return similarity.ivfadc_topk(
            queries,
            self.frame(spark),
            self.coarse_frame(spark),
            self.centroid_rows,
            k=k,
            nprobe=nprobe,
            m=self.m,
            dim=self.dim,
        )


def save_ivfadc(
    index: DataFrame,
    path: str,
    coarse_rows: list[tuple[int, list[int]]],
    centroid_rows: list[tuple[int, list[int]]],
    m: int = 4,
    dim: int = 64,
) -> IvfadcIndex:
    """Write an :func:`~.similarity.ivf_pq_index(residual=True)` frame
    as a complete self-describing artifact: the code table partitioned
    by ``list_id`` (overwrite — an artifact save is a publish, not an
    append) followed by the model sidecar.  Validates the model shape
    (:func:`~.similarity._pq_check`) and the residual layout (the
    stored ``rn`` column) BEFORE writing — a raw-coded index saved here
    would search wrong, the same guard as ``ivfadc_topk``."""
    similarity._pq_check(centroid_rows, m, dim)
    if "rn" not in index.columns:
        raise ValueError(
            "save_ivfadc stores the residual (IVFADC) layout — build the"
            " index with ivf_pq_index(..., residual=True)"
        )
    _local_path(path)  # refuse remote schemes BEFORE the table write
    (
        index.write.partitionBy("list_id")
        .mode("overwrite")
        .parquet(path)
    )
    write_ivfadc_model(path, coarse_rows, centroid_rows, m=m, dim=dim)
    return IvfadcIndex(
        path=path, m=int(m), dim=int(dim),
        coarse_rows=[(int(c), [int(v) for v in q]) for c, q in coarse_rows],
        centroid_rows=[
            (int(c), [int(v) for v in q]) for c, q in centroid_rows
        ],
    )


def write_ivfadc_model(
    path: str,
    coarse_rows: list[tuple[int, list[int]]],
    centroid_rows: list[tuple[int, list[int]]],
    m: int = 4,
    dim: int = 64,
) -> None:
    """Write ONLY the model sidecar into an existing index directory —
    the streamed-index completion: :func:`~..streaming.ann.
    ivfadc_index_stream` maintains the code table under
    ``batch_id=N/list_id=K/`` but holds the model as plain Python; one
    ``write_ivfadc_model(index_dir, …)`` at deploy time makes the
    streamed store a :func:`load_ivfadc`-loadable artifact (the
    ``batch_id`` partition column rides through search harmlessly —
    ``ivfadc_topk`` selects only the columns it needs).  Same tmp +
    rename commit as :func:`save_ivfadc`, so a concurrent loader never
    reads a half-written JSON."""
    similarity._pq_check(centroid_rows, m, dim)
    local = _local_path(path)
    model = {
        "format_version": _FORMAT_VERSION,
        "layout": "ivfadc_residual",
        "m": int(m),
        "dim": int(dim),
        "coarse_rows": [
            [int(cid), [int(v) for v in cq]] for cid, cq in coarse_rows
        ],
        "centroid_rows": [
            [int(cid), [int(v) for v in cq]] for cid, cq in centroid_rows
        ],
        "quant": similarity.QUANT,
    }
    tmp = os.path.join(local, MODEL_FILE + ".part")
    with open(tmp, "w") as fh:
        json.dump(model, fh)
    os.replace(tmp, os.path.join(local, MODEL_FILE))


def load_ivfadc(path: str) -> IvfadcIndex:
    """Load the model sidecar of a saved artifact; fails loudly on a
    missing sidecar (crashed/partial save), an unknown format version,
    a non-residual layout, or a quantization grid that differs from
    this engine's (scores would be silently wrong scale otherwise)."""
    local = _local_path(path)
    sidecar = os.path.join(local, MODEL_FILE)
    if not os.path.exists(sidecar):
        raise ValueError(
            f"no model sidecar at {sidecar} — not a save_ivfadc artifact"
            " (or the save crashed before the sidecar commit)"
        )
    with open(sidecar) as fh:
        model = json.load(fh)
    if model.get("format_version") != _FORMAT_VERSION:
        raise ValueError(
            f"unknown ivfadc artifact version {model.get('format_version')!r}"
            f" (this engine reads {_FORMAT_VERSION})"
        )
    if model.get("layout") != "ivfadc_residual":
        raise ValueError(f"unknown index layout {model.get('layout')!r}")
    if model.get("quant") != similarity.QUANT:
        raise ValueError(
            f"artifact quantization grid {model.get('quant')} != engine"
            f" grid {similarity.QUANT} — re-encode, scores would not be"
            " comparable"
        )
    return IvfadcIndex(
        path=path,
        m=int(model["m"]),
        dim=int(model["dim"]),
        coarse_rows=[
            (int(cid), [int(v) for v in cq])
            for cid, cq in model["coarse_rows"]
        ],
        centroid_rows=[
            (int(cid), [int(v) for v in cq])
            for cid, cq in model["centroid_rows"]
        ],
    )

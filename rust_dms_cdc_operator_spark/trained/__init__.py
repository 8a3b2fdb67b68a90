"""Per-scale trained-artifact registry for the ANN oracles.

The correctness driver compares Spark vs DuckDB at sf0.01 with STATIC
oracle strings, so the sf0.01 centroids/codebooks stay embedded as
python constants (ivf_constants.py / pq_constants.py). Every OTHER
scale keeps its seed-42 trained artifacts here as JSON
(``ivf_<tag>.json`` / ``pq_<tag>.json``, tag = basename of the sf
dir, written by tools/gen_ivf_centroids.py / gen_pq_codebooks.py with
a target dir) — ``inventory_llm.oracle_sql_overrides(sf_dir)``
re-renders the five trained-artifact oracles from them, which is what
makes the full sweep scale-INDEPENDENT instead of pinned to sf0.01
(r6 verdict item 2). Training is deterministic (same data + seed +
rounding on any partition layout), so regenerating a file always
reproduces it bit-for-bit."""

from __future__ import annotations

import json
import os

_DIR = os.path.dirname(__file__)


def _load(kind: str, tag: str):
    path = os.path.join(_DIR, f"{kind}_{tag}.json")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def load_ivf(tag: str):
    """Trained IVF centroids for an sf tag, or None if not generated."""
    if tag == "sf0.01":
        from rust_dms_cdc_operator_spark.ivf_constants import (  # noqa: PLC0415
            _IVF_TRAINED_CENTROIDS_SF001,
        )

        return _IVF_TRAINED_CENTROIDS_SF001
    return _load("ivf", tag)


def load_pq(tag: str):
    """Trained PQ codebooks for an sf tag, or None if not generated."""
    if tag == "sf0.01":
        from rust_dms_cdc_operator_spark.pq_constants import (  # noqa: PLC0415
            _PQ_CODEBOOKS_SF001,
        )

        return _PQ_CODEBOOKS_SF001
    return _load("pq", tag)


def save(kind: str, tag: str, data) -> str:
    path = os.path.join(_DIR, f"{kind}_{tag}.json")
    with open(path, "w") as fh:
        json.dump(data, fh)
    return path


def load_bpe(tag: str):
    """Trained BPE merge list for an sf tag, or None if not generated."""
    if tag == "sf0.01":
        from rust_dms_cdc_operator_spark.bpe_constants import (  # noqa: PLC0415
            _BPE_MERGES_SF001,
        )

        return _BPE_MERGES_SF001
    loaded = _load("bpe", tag)
    return None if loaded is None else [tuple(m) for m in loaded]


def load_ivf_density(tag: str):
    """Corpus-scaled density-query centroids (registry kind 'ivfd').
    Present only for scales where the ceil(n/256) list rule exceeds
    the shared 8-list artifact; callers fall back to load_ivf."""
    return _load("ivfd", tag)

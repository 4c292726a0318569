"""Twin-run determinism harness for EVERY rows-only query (VERDICT r3
item 2): the 29 registry entries without a DuckDB oracle rest on
single-engine determinism, so that determinism must be engineered, not
incidental. Each query runs twice under deliberately different physical
plans -- different ``spark.sql.shuffle.partitions`` AND different scan
split sizes (``spark.sql.files.maxPartitionBytes``) -- and the sorted
row multisets must be identical. This generalizes the
k-means/logreg/PageRank partition-invariance tests to the whole
rows-only tier: any float-sum order dependence, partition-dependent
tie-break, or nondeterministic sample shows up as a twin mismatch.

The list is derived live from the registry (QUERIES minus ORACLES), so a
future rows-only query is covered the moment it is registered and an
oracled query never wastes a slot here.
"""

from __future__ import annotations

import math

import pytest

from dockerized_data_pipeline_spark import plans  # noqa: F401  (registers queries)
from dockerized_data_pipeline_spark.plans.registry import ORACLES, QUERIES

ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))

# two deliberately different physical configurations: shuffle fan-out
# AND input split sizing both change, so agg/join partitioning and the
# scan's partition count (hence task-to-row assignment) differ between
# the twin runs
_TWIN_CONFS = [
    {"spark.sql.shuffle.partitions": "8", "spark.sql.files.maxPartitionBytes": "134217728"},
    {"spark.sql.shuffle.partitions": "5", "spark.sql.files.maxPartitionBytes": "65536"},
]


def _canon(v):
    """Hashable canonical form: nested Rows/lists/maps/floats -> tuples.
    Floats stay EXACT (no rounding): the determinism contract is
    bit-identical output, which decimal/scaled-integer accumulation
    guarantees; NaN canonicalizes to itself so it compares equal."""
    if isinstance(v, float):
        return ("nan",) if math.isnan(v) else v
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):  # nested Row
        return _canon(v.asDict())
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def _run_sorted(spark, name: str, sf_dir: str, conf: dict) -> list:
    old = {k: spark.conf.get(k) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        rows = QUERIES[name](spark, sf_dir).collect()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    return sorted(map(_canon, (tuple(r) for r in rows)))


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_partition_invariant(spark, sf_dir, name):
    a = _run_sorted(spark, name, sf_dir, _TWIN_CONFS[0])
    b = _run_sorted(spark, name, sf_dir, _TWIN_CONFS[1])
    assert len(a) == len(b), f"{name}: row count differs across partitionings"
    if a != b:
        diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
        detail = [(a[i], b[i]) for i in diff]
        pytest.fail(f"{name}: rows differ across partitionings, e.g. {detail}")


def test_rows_only_list_matches_expected_count():
    """The rows-only tier is intentional and bounded: every entry either
    gains an oracle eventually or stays here under twin-run coverage."""
    # r8 conversions: graph_pagerank_trade (fixed-point integer replay),
    # x4_multimodal_pipeline (k-means CTE unrolling), x5_bpe_train +
    # x5_bpe_tokenize (merge fold == sentinel-wrapped REPLACE),
    # x4_feature_extract (list outputs compare fine), and the SEVEN
    # xxhash64-keyed paths (minhash pairs/incremental, simhash
    # signatures/pairs, neardup collapse, the x7 neardup capstone, CMS)
    # via the XXH64-in-SQL replay (plans/duckhash.py); the two Spark-ML
    # BRP-LSH consumers converted via frozen seed-42 model constants
    # (plans/mllsh.py); the logreg quality classifier via the
    # exactly-rounded hard-sigmoid link (IEEE-only training trajectory,
    # unrolled by plans/llm._duck_logreg_sql). What remains, each
    # justified in its query docstring: 3 engine-internal sketches
    # (HLL++/GK/DataSketches binaries carry no replayable closed form).
    assert len(ROWS_ONLY) == 3, ROWS_ONLY

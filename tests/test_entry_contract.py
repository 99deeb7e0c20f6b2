"""Driver-contract invariants for __spark_entry__: the external gate sweeps
queries() against oracle_sql() — these checks catch contract drift (missing
oracles, literal-builder fallbacks, nondeterministic twin output) without
spinning up Spark."""
from __future__ import annotations

import __spark_entry__ as entry

# Queries whose oracles embed literals recomputed by kernel twins at
# oracle_sql() call time; if a twin raises, the builder silently falls back
# to rows-only (dropping the key) — these assert the fallback did NOT fire.
LITERAL_ORACLES = {
    "q22_ann_topk": "ivf_trained",       # trained k-means centroid branch
    "q27_multimodal_features": "VALUES",  # stub-decode mean_intensity rows
    "q48_winnowing_fp": "VALUES",         # rolling-hash fingerprint rows
    "q66_pca_project": "VALUES",          # PCA eigen geometry (mean + W)
}


def test_queries_and_oracles_cover_each_other():
    q = entry.queries()
    o = entry.oracle_sql()
    assert len(q) == 50, f"driver sweeps the first 50 entries; got {len(q)}"
    assert all(callable(fn) for fn in q.values())
    # every query is value-hash gated — no rows-only fallbacks left
    assert set(o) == set(q), (
        f"oracle/query key drift: only-in-queries={sorted(set(q) - set(o))} "
        f"only-in-oracles={sorted(set(o) - set(q))}")


def test_oracle_sql_nonempty_selects():
    for name, sql in entry.oracle_sql().items():
        assert sql and "SELECT" in sql.upper(), name


def test_literal_oracle_builders_did_not_fall_back():
    o = entry.oracle_sql()
    for name, marker in LITERAL_ORACLES.items():
        assert name in o, f"{name}: literal-oracle builder fell back"
        assert marker.upper() in o[name].upper(), name


def test_oracle_sql_deterministic_across_calls():
    """The driver may call oracle_sql() in a separate process from the one
    running the queries — twin-derived literals must be bit-identical on
    every call."""
    a = entry.oracle_sql()
    b = entry.oracle_sql()
    assert a == b

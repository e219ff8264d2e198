"""Degenerate-fixture oracle sweep (VERDICT r10 item 5).

The ANSI zero-denominator class — a ratio whose denominator is zero
only on DEGENERATE data (constant series, single-row groups, empty
folds, zero-variance strata, zero-norm vectors, empty join sides) —
was found twice in r10 alone (ts_wavelet_haar's energy share,
ml_threshold_tuning's recall) and only by hand-reading. This tool
systematizes the hunt: it builds ONE star-schema fixture dir where
every such degeneracy holds at once, then runs the FULL registry
through tools/selfcheck.py against it with SPARK_GRAFT_HOSTILE=1
(Asia/Kolkata + ANSI re-poisoned before every query), so any
unguarded division / sqrt-of-negative / empty-group edge either
hard-errors (ANSI) or hash-diverges from the DuckDB oracle — loudly.

    python tools/degencheck.py [query ...]     # default: full registry

The fixture (built under /tmp, rebuilt each run — cheap):
- lineitem: 8 rows, ALL measure columns constant (quantity=1,
  discount=0, tax=0, extendedprice=100) → zero variance, min=max,
  zero discount mass; returnflag A has a SINGLE row (n=1 groups,
  n-1 = 0 denominators); orderkeys 1..8 leave k-fold folds uneven;
  one partkey/suppkey for maximal key skew; one lone distinct
  shipdate so date windows see a 7-row day and a 1-row day.
- orders: 8 rows mirroring the lineitem orderkeys, constant
  totalprice, ONE order with an orphan custkey (referential edge),
  one status with a single order, two distinct orderdates.
- events: constant-value series (zero variance / zero MAD / zero
  autocovariance), a single-row type, a duplicate-timestamp pair,
  and an all-zero-value type (zero sums and zero energy) — the
  exact shapes that zero every ts_* denominator.
- documents: two identical texts (dedup degeneracy), one EMPTY text
  and one whitespace-only text (zero token / zero char
  denominators), one lang for all rows (single stratum).
- embeddings: two identical vectors, one all-zero vector (zero norm
  — the cosine guard), one one-hot, a single-row label.
- region/nation/customer/supplier/part: copied from sf0.001 (real
  dims keep dim joins meaningful; the degeneracy lives in facts).

Exit 0 = selfcheck "all green" on the degenerate dir. Any FAIL is a
real unguarded-edge bug: fix the guard in BOTH engines' expressions
(CLAUDE.md: CASE WHEN denom > 0 / GREATEST(var, 0) both sides).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# Dim tables are copied verbatim from a real SF dir; overridable so the
# sweep (and the pytest fixture built on it) can run off-box.
SRC_SF = os.environ.get("SPARK_GRAFT_DEGEN_SRC", "/root/testdata/sf0.001")
COPY_TABLES = ["region", "nation", "customer", "supplier", "part"]

# Self-asserting operators whose oracle is a CONSTANT claim about
# data-dependent behavior — on an adversarial degenerate corpus the
# claim is legitimately false, which is the op working as designed,
# not an unguarded edge. Each entry names why; keep this list short
# and justified (the GLOBAL_WINDOW_OK discipline).
SKIP = {
    # recall floor (25%) of the md5-hyperplane LSH vs brute force:
    # on a 5-vector corpus with twins and a zero vector the bucket
    # geometry collapses and recall 0/4 < floor — a true statement
    # about degenerate data, pinned instead by the planted-cluster
    # recall tests (tests/test_planted_signals.py).
    "sim_search_lsh_recall": "constant-oracle recall-floor claim",
}


def build_fixture(out_dir: str) -> str:
    """Write the degenerate star schema into out_dir (wiped first)."""
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for t in COPY_TABLES:
        shutil.copy(
            os.path.join(SRC_SF, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )

    # lineitem: constant measures, a single-row group, skewed keys.
    flags = ["A"] + ["N"] * 2 + ["R"] * 5
    ship = pd.to_datetime(
        ["2024-03-01"] * 7 + ["2024-03-02"]  # one lone distinct day
    )
    li = pd.DataFrame(
        {
            "l_orderkey": pd.array(range(1, 9), dtype="int64"),
            "l_partkey": pd.array([1] * 8, dtype="int64"),
            "l_suppkey": pd.array([1] * 8, dtype="int64"),
            "l_linenumber": pd.array([1] * 8, dtype="int32"),
            "l_quantity": [1.0] * 8,
            "l_extendedprice": [100.0] * 8,
            "l_discount": [0.0] * 8,
            "l_tax": [0.0] * 8,
            "l_returnflag": flags,
            "l_linestatus": ["O"] * 8,
            "l_shipdate": ship,
        }
    )
    li.to_parquet(
        os.path.join(out_dir, "lineitem.parquet"), coerce_timestamps="us"
    )

    # orders: constant price, one orphan custkey, one single-order status.
    od = pd.DataFrame(
        {
            "o_orderkey": pd.array(range(1, 9), dtype="int64"),
            "o_custkey": pd.array([1, 1, 2, 2, 3, 3, 3, 999999], dtype="int64"),
            "o_orderstatus": ["F"] * 7 + ["P"],
            "o_totalprice": [100.0] * 8,
            "o_orderdate": pd.to_datetime(
                ["2024-02-01"] * 4 + ["2024-02-02"] * 4
            ),
            "o_orderpriority": ["1-URGENT"] * 8,
        }
    )
    od.to_parquet(
        os.path.join(out_dir, "orders.parquet"), coerce_timestamps="us"
    )

    # events: per-type degeneracies on a shared 2024-01 day axis.
    rows: list[tuple] = []  # (event_type, day, hour, value)
    for d in range(10):  # constant series → zero variance/MAD/autocov
        rows.append(("const", d, 0, 5.0))
    for d in range(10):  # all-zero series → zero sums, zero energy
        rows.append(("zeros", d, 0, 0.0))
    rows.append(("lone", 0, 0, 3.0))  # single-row type
    rows.append(("dupts", 2, 0, 1.0))  # duplicate timestamp pair
    rows.append(("dupts", 2, 0, 2.0))
    ev = pd.DataFrame(
        {
            "event_id": pd.array(range(len(rows)), dtype="int64"),
            "ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta([r[1] * 24 + r[2] for r in rows], unit="h"),
            "user_id": pd.array([1] * len(rows), dtype="int64"),
            "event_type": [r[0] for r in rows],
            "value": [float(r[3]) for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    ev.to_parquet(
        os.path.join(out_dir, "events.parquet"), coerce_timestamps="us"
    )

    # documents: twins, empty text, whitespace-only — one lang stratum.
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "",
        "   ",
    ]
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(range(1, 5), dtype="int64"),
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["src0", "src0", "src1", "src1"],
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    )
    docs.to_parquet(os.path.join(out_dir, "documents.parquet"))

    # embeddings: twins, a zero-norm vector, a one-hot, a lone label.
    dim = 64
    vecs = [
        [1.0] + [0.0] * (dim - 1),          # one-hot
        [0.5] * dim,                         # twin a
        [0.5] * dim,                         # twin b
        [0.0] * dim,                         # ZERO NORM — cosine guard
        [float(i % 3) for i in range(dim)],  # filler
    ]
    emb = pd.DataFrame(
        {
            "vec_id": pd.array(range(1, 6), dtype="int64"),
            "embedding": [[float(x) for x in v] for v in vecs],
            "label": pd.array([0, 0, 1, 1, 2], dtype="int32"),
        }
    )
    emb.to_parquet(os.path.join(out_dir, "embeddings.parquet"))
    return out_dir


def main(argv: list[str]) -> int:
    out_dir = os.environ.get("SPARK_GRAFT_DEGEN_DIR", "/tmp/spark_graft_degen")
    build_fixture(out_dir)
    print(f"degenerate fixture built at {out_dir}")
    names = argv[1:]
    if not names:  # full-registry run: expand so SKIP can subtract
        sys.path.insert(0, REPO)
        from agri_market_data_pipeline_spark.registry import all_queries

        names = sorted(all_queries())
    skipped = [n for n in names if n in SKIP]
    for n in skipped:
        print(f"skip  {n}: {SKIP[n]}")
    names = [n for n in names if n not in SKIP]
    env = dict(os.environ, SPARK_GRAFT_HOSTILE="1")
    cmd = [sys.executable, os.path.join(REPO, "tools", "selfcheck.py"), out_dir]
    cmd += names
    return subprocess.run(cmd, env=env).returncode


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))

"""Same-workload host calibration (no Spark): run the build's actual map
computation — translate+join+split tokenize, factorize, per-unique filter,
combined-key np.unique TF — on the real sf0.1 corpus in 1 process and in 4
processes, and report the 4-way scaling efficiency the HOST delivers for
this exact workload right now.

This bounds what any Spark run can show: the build's map stage IS this
computation, so when the box (shared VM: other tenants, memory-bandwidth
contention) delivers only e.g. 0.8 aggregate scaling for it with zero
framework overhead, no job on top can measure higher. bench_scaling.py
uses it as a quiet-window gate (--gate-host-eff) so the N->4N evidence is
collected when the host can physically exhibit it, and records the
calibration alongside the measurement.

Prints one JSON line: {"task_sec_1p": ..., "task_sec_4p": ..., "host_eff_4way": ...}
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ProcessPoolExecutor

REPO = "/root/repo"
SF_PARQUET = "/root/testdata/sf0.1/documents.parquet"


def _task(_=None) -> float:
    import numpy as np
    import pandas as _pd
    import pyarrow.parquet as pq

    sys.path.insert(0, REPO)
    from bm25_spark.functions.analyzer import _ASCII_TBL

    texts = (
        pq.read_table(SF_PARQUET, columns=["text"]).column("text").to_pylist()
        * 8
    )
    t0 = time.perf_counter()
    for _ in range(4):  # 160k docs per task
        enc = [
            (t.encode().translate(_ASCII_TBL) if t and t.isascii() else b"")
            for t in texts
        ]
        raw = b" \x01 ".join(enc).split()
        flat = np.empty(len(raw), dtype=object)
        flat[:] = raw
        codes_local, uniq = _pd.factorize(flat, sort=False)
        is_sep = flat == b"\x01"
        doc_idx_all = np.cumsum(is_sep)
        keepu = np.fromiter(
            (len(t) >= 2 for t in uniq), bool, count=len(uniq)
        )
        keep = keepu[codes_local]
        d = doc_idx_all[keep]
        g = codes_local[keep]
        v = np.int64(len(uniq))
        np.unique(d * v + g, return_counts=True)
    return time.perf_counter() - t0


def measure() -> dict:
    """Min-of-2 per level: a transient load spike during the 1-process
    measurement would otherwise INFLATE the ratio and fire a quiet-window
    gate on a busy host. Gate on task_sec_1p (absolute speed = the real
    quietness signal) as well as the ratio."""
    with ProcessPoolExecutor(1) as ex:  # warm through the pool
        list(ex.map(_task, [None]))
    t1 = min(
        max(ProcessPoolExecutor(1).map(_task, [None])) for _ in range(2)
    )
    t4 = min(
        max(ProcessPoolExecutor(4).map(_task, [None] * 4)) for _ in range(2)
    )
    return {
        "task_sec_1p": round(t1, 2),
        "task_sec_4p": round(t4, 2),
        "host_eff_4way": round(t1 / t4, 3),
    }


if __name__ == "__main__":
    print(json.dumps(measure()))

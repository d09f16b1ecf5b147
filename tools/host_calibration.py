"""Pure-CPU host calibration (no Spark): how much aggregate throughput
does this machine actually deliver at k parallel workers?

Used to justify the parallelism levels chosen for the scaling-efficiency
evidence (BENCH.md): if the host cannot deliver 4x more aggregate CPU
between the two levels, no job can show 4x scaling there.

Prints one JSON line: {"workers": {k: speedup_vs_sequential}, ...}
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ProcessPoolExecutor

N = 8_000_000


def _burn(n: int) -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(n):
        x += i * i
    return time.perf_counter() - t0


def main() -> None:
    t_seq = _burn(N)
    out = {}
    for workers in (1, 2, 4, 8, 16, 32):
        with ProcessPoolExecutor(workers) as ex:
            t0 = time.perf_counter()
            list(ex.map(_burn, [N] * workers))
            wall = time.perf_counter() - t0
        out[workers] = round(workers * t_seq / wall, 2)
    print(json.dumps({"speedup_vs_sequential": out, "unit_task_sec": round(t_seq, 3)}))


if __name__ == "__main__":
    main()

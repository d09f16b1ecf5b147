"""Memory-bound proof for the build at 10x the bench scale.

Claim under test (indexer.py partial_pack): task memory is O(chunk_postings),
NOT O(partition) — a worker flushes partial runs every ~chunk_postings
postings, so building a 10x corpus must not grow per-worker peak memory.

Method: run the same amplified-corpus build bench.py runs, at local[32]
with the DEFAULT chunk_postings, while a 1 Hz sampler records VmHWM (peak
resident set, kernel-maintained high-water mark) for every PySpark Python
worker process and for the JVM. If task memory were O(partition), the
3.2M-doc run's worker peak would be ~10x the 320k-doc run's; O(chunk)
predicts roughly flat.

Usage: python tools/build_memory_proof.py [amplify ...]  # default 64 640
Prints one JSON line per amplify level.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _vmhwm_kb(pid: int) -> int | None:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return int(line.split()[1])
    except OSError:
        return None
    return None


def _cmdline(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            return f.read().replace(b"\x00", b" ").decode(errors="replace")
    except OSError:
        return ""


def _ppid(pid: int) -> int | None:
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("PPid:"):
                    return int(line.split()[1])
    except OSError:
        return None
    return None


def _is_descendant(pid: int, root: int, cache: dict) -> bool:
    """pid is in root's process tree (ancestry walk, memoized). Restricting
    the sampler to the benchmarked child keeps a neighbor Spark job on the
    same box from contributing ITS workers' VmHWM to the proof."""
    chain = []
    cur = pid
    for _ in range(64):
        if cur in cache:
            res = cache[cur]
            break
        if cur == root:
            res = True
            break
        if cur in (0, 1, None):
            res = False
            break
        chain.append(cur)
        cur = _ppid(cur)
    else:
        res = False
    for p in chain:
        cache[p] = res
    return res


def sample_peaks(stop: threading.Event, out: dict, root_pid_box: dict) -> None:
    """Track max VmHWM over the benchmarked child's python worker
    processes (pyspark.daemon and its forked workers) and its Spark JVM,
    at ~1 Hz. Processes outside the child's tree are ignored."""
    while not stop.wait(1.0):
        root = root_pid_box.get("pid")
        if root is None:
            continue
        anc_cache: dict = {}
        for pid_s in os.listdir("/proc"):
            if not pid_s.isdigit():
                continue
            pid = int(pid_s)
            cmd = _cmdline(pid)
            if "pyspark.daemon" in cmd or "pyspark.worker" in cmd:
                kind = "python_worker"
            elif "org.apache.spark.deploy" in cmd or (
                "java" in cmd and "spark" in cmd
            ):
                kind = "jvm"
            else:
                continue
            if not _is_descendant(pid, root, anc_cache):
                continue
            hwm = _vmhwm_kb(pid)
            if hwm:
                out[kind] = max(out.get(kind, 0), hwm)


def run_level(
    amplify: int, shard_size: int | None = None, phases: str = "all"
) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS="32",
        BM25_BENCH_AMPLIFY=str(amplify),
        BM25_BENCH_PHASES=phases,
    )
    if shard_size:
        env["BM25_SHARD_SIZE"] = str(shard_size)
    peaks: dict = {}
    root_box: dict = {}
    stop = threading.Event()
    t = threading.Thread(
        target=sample_peaks, args=(stop, peaks, root_box), daemon=True
    )
    t.start()
    t0 = time.perf_counter()
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        root_box["pid"] = proc.pid
        stdout, stderr = proc.communicate(timeout=3600)
    finally:
        stop.set()
        t.join(timeout=5)
    wall = round(time.perf_counter() - t0, 1)
    lines = [l for l in stdout.strip().splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        # the failure itself is the finding at 10x scale: report the
        # diagnostics and the peaks sampled up to the crash, loudly
        sys.stderr.write(stderr[-4000:])
        raise RuntimeError(
            f"bench.py (amplify={amplify}, phases={phases}) exited "
            f"{proc.returncode} with "
            f"{'no JSON line' if not lines else 'output'}; sampled peaks "
            f"up to the failure: python_worker="
            f"{round(peaks.get('python_worker', 0) / 1024)} MB, "
            f"jvm={round(peaks.get('jvm', 0) / 1024)} MB"
        )
    bench = json.loads(lines[-1])
    return {
        "amplify": amplify,
        "shard_size": shard_size,
        "phases": phases,
        "n_docs": bench["n_docs"],
        "index_build_sec": bench["queries"]["index_build"],
        "turns_per_sec": bench["turns_per_sec"],
        "wall_sec": wall,
        "peak_python_worker_mb": round(peaks.get("python_worker", 0) / 1024),
        "peak_jvm_mb": round(peaks.get("jvm", 0) / 1024),
    }


def main() -> int:
    # Fixed shard_size across levels: the claim is memory O(shard_size +
    # chunk_postings) INDEPENDENT of corpus size — at 100 TB shard_size is
    # a constant (1M docs), so the honest scale-up test pins it. (bench.py
    # defaults shard_size to n_docs/64, which deliberately grows groups
    # with the corpus; under that sizing worker memory tracks shard_size,
    # which is the same statement.)
    shard_size = int(os.environ.get("PROOF_SHARD_SIZE", "50000"))
    phases = os.environ.get("PROOF_PHASES", "build")
    levels = [int(x) for x in sys.argv[1:]] or [64, 640]
    results = [run_level(a, shard_size, phases) for a in levels]
    for r in results:
        print(json.dumps(r), flush=True)
    if len(results) >= 2:
        # smallest vs largest corpus regardless of argv order — reversed
        # levels must not flip the ratio below the verdict threshold
        by_docs = sorted(results, key=lambda r: r["n_docs"])
        lo, hi = by_docs[0], by_docs[-1]
        ratio_docs = hi["n_docs"] / lo["n_docs"]
        ratio_mem = (
            hi["peak_python_worker_mb"] / lo["peak_python_worker_mb"]
            if lo["peak_python_worker_mb"]
            else None
        )
        print(json.dumps({
            "claim": (
                "task memory O(chunk_postings), not O(partition)"
                if phases == "build"
                else "full-suite worker peak (build + query caches)"
            ),
            "phases": phases,
            "docs_ratio": round(ratio_docs, 1),
            "worker_peak_ratio": round(ratio_mem, 2) if ratio_mem else None,
            "verdict": (
                "O(chunk) holds" if ratio_mem and ratio_mem < 2.0
                else "GREW with corpus — investigate"
            ),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

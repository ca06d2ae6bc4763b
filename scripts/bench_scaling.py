"""Scaling-efficiency evidence (north rule: N → 4N executors ≥ 0.8).

No real cluster exists in this sandbox, so per the driver instruction the
same index-build job runs at two parallelism levels — ``local[8]`` (N) and
``local[32]`` (4N) — on the same deterministic corpus, in separate JVMs
(fresh subprocess per level so executor-thread count is the only variable).
Writes the measured table to ``BENCH/BASELINE.md``.

Usage: python scripts/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cpus: int, n_docs: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        BENCH_CORPUS_DOCS=str(n_docs),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    results = {}
    for cpus in (8, 32):
        t0 = time.monotonic()
        results[cpus] = run_level(cpus, n_docs, sf_dir)
        print(f"local[{cpus}]: {json.dumps(results[cpus])} "
              f"({time.monotonic()-t0:.0f}s wall)", flush=True)

    thr8 = results[8]["docs_per_sec"]
    thr32 = results[32]["docs_per_sec"]
    eff = thr32 / (4.0 * thr8)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH/BASELINE — measured numbers\n",
        "North-rule scaling evidence: identical index-build job (deterministic",
        f"synthetic code corpus, {n_docs} docs, ~{n_docs} files × 50-2000 tokens)",
        "at two parallelism levels in separate JVMs — the sandbox stand-in for",
        "N vs 4N executors (no real cluster available; see driver instruction).\n",
        "| level | cores | build sec | docs/sec | postings | query p50 ms | query p95 ms |",
        "|---|---|---|---|---|---|---|",
    ]
    for cpus in (8, 32):
        r = results[cpus]
        lines.append(
            f"| local[{cpus}] | {cpus} | {r['queries']['index_build']} | "
            f"{r['docs_per_sec']} | {r['postings_written']} | "
            f"{r['query_p50_ms']} | {r['query_p95_ms']} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (8 → 32 cores, 4×): "
        f"throughput ratio {thr32 / thr8:.2f}× / 4 = {eff:.3f}**"
        + (" ✅ (≥ 0.8)" if eff >= 0.8 else " ❌ (< 0.8)"),
        "",
        "Raw bench JSON:",
        "```json",
        json.dumps(results[8]),
        json.dumps(results[32]),
        "```",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}; efficiency={eff:.3f}")


if __name__ == "__main__":
    main()

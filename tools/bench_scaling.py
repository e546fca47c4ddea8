"""Two-parallelism-level scaling run (the BASELINE.md acceptance evidence).

No real cluster exists in this sandbox, so the north rule's N-vs-4N
cluster criterion is evidenced by running the identical superstep job at
local[8] and local[32] (fresh JVM each) on the same input and reporting
throughput at both plus efficiency = thr_4N / (4 * thr_N).

Writes BENCH/BASELINE.md. Usage: python tools/bench_scaling.py [replicas]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_level(cpus: int, replicas: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_REPLICAS=str(replicas),
        BENCH_QUERIES="tk_superstep_scan",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError(f"no bench output at cpus={cpus}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = run_level(8, replicas)
    hi = run_level(32, replicas)
    thr_lo = lo["edges_per_sec_superstep"]
    thr_hi = hi["edges_per_sec_superstep"]
    eff = thr_hi / (4 * thr_lo)
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    ts = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    md = f"""# BENCH / BASELINE — scaling evidence ({ts})

Sandbox proxy for the north rule's two-cluster-size criterion (no real
cluster available): the identical temporal-Katz affine-scan superstep job
(distributed segment summaries + driver combine) over the same input at
two parallelism levels, fresh JVM each.

- input: event-induced edge stream from `{sf_dir}`, replicated x{replicas}
  deterministically -> {hi["superstep_edges"]:,} edges, 8 snapshot windows,
  bucketed once into seq-contiguous sorted partitions
- config: AQE on, shuffle partitions = cores, Arrow batch 128k,
  1 (beta, Exp) param; includes one untimed warm-up superstep

| parallelism | wallclock (s) | edges/sec per superstep pass |
|---|---|---|
| local[8]  (N)  | {lo["queries"]["tk_superstep_scan"]} | {thr_lo:,.0f} |
| local[32] (4N) | {hi["queries"]["tk_superstep_scan"]} | {thr_hi:,.0f} |

**Scaling efficiency: eff = thr_4N / (4 x thr_N) = {eff:.3f}**
(target >= 0.8 per BASELINE.json)

Raw JSON:

```json
{json.dumps(lo)}
{json.dumps(hi)}
```
"""
    (bench_dir / "BASELINE.md").write_text(md)
    print(md)


if __name__ == "__main__":
    main()

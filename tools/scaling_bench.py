"""Scaling-efficiency evidence (BASELINE.json north_rule): run bench.py at
two parallelism levels (local[8] = N, local[32] = 4N — the sandbox proxy for
N vs 4N executors) on the SAME input and report throughput at both plus
efficiency = (T_N / T_4N) / 4.

Writes BENCH/BASELINE.md.  Usage: python tools/scaling_bench.py [docs]
"""

import json
import os
import subprocess
import sys
import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, docs: int) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_BENCH_DOCS=str(docs),
               SPARK_GRAFT_SHUFFLE=str(max(cpus, 8)))
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env, cwd=REPO)
    line = [l for l in out.stdout.strip().splitlines()
            if l.startswith("{")][-1]
    return json.loads(line)


def main():
    docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    r8 = run(8, docs)
    r32 = run(32, docs)
    t8 = r8["queries"]["pipeline_audit"]
    t32 = r32["queries"]["pipeline_audit"]
    speedup = t8 / t32
    eff = speedup / 4.0
    md = f"""# BENCH/BASELINE — measured results

Updated: {datetime.date.today().isoformat()} (round 1)

## Pipeline throughput (flagship audit: signals + Arrow model pass +
keep-first dedup + scoring + scrub, {docs:,} synthetic pages)

| parallelism | wallclock (s) | docs/sec |
|---|---|---|
| local[8]  (N)  | {t8:.2f} | {docs / t8:,.0f} |
| local[32] (4N) | {t32:.2f} | {docs / t32:,.0f} |

**Scaling efficiency (N -> 4N): {eff:.2f}** (target >= 0.8 per
BASELINE.json north_rule; measured as (T_N / T_4N) / 4 on identical input —
the sandbox proxy for an N- vs 4N-executor cluster, per driver instruction).

## Headline suite at sf0.1, local[32]

| query | sec |
|---|---|
""" + "\n".join(f"| {k} | {v} |" for k, v in r32["queries"].items()) + f"""

Total: {r32['value']} s.  Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```

## Reference baseline

The reference publishes no benchmark numbers (see BASELINE.md); it is a
single-process pandas auditor that SAMPLES inputs >500 MB down to 100k rows
(reference core/data_loader.py:8,32-39).  This engine processes the full
corpus distributed, so the comparable single-node criterion is docs/sec
above; the design criterion is the scaling efficiency.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"t8": t8, "t32": t32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()

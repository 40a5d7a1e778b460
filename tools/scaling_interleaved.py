"""Interleaved two-cluster-size scaling protocol (round-3 upgrade of
tools/scaling_bench.py — the BENCH/BASELINE.md round-2 analysis showed
cross-window leg pairs are not comparable on this shared VM: a
physically impossible superlinear 2->4 ratio proved the windows
differed).

Protocol here: the N-core and 4N-core legs run ALTERNATELY
(A/B/A/B/A/B) as separate spark-submit invocations against the same
materialized corpus, so each adjacent (A_i, B_i) pair shares one noise
window; per-pair efficiencies are reported along with their median.
Each leg invocation does one warm-up run (JIT/codegen) + `SCALE_REPS`
timed runs and reports the min (co-tenant spikes only ever ADD time).

    python tools/scaling_interleaved.py 2 8 [n_rounds]

Emits one JSON line:
  {"pair": "2->8", "rounds": [...per-pair...], "median_efficiency": E}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _build_zip(path: str = "/tmp/upss_scaling.zip") -> str:
    with zipfile.ZipFile(path, "w") as z:
        pkg = os.path.join(REPO, "ukis_pysat_spark")
        for root, _, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return path


def run_leg(cores: int, zip_path: str, reps: int, timeout: int | None = None) -> dict:
    env = dict(os.environ, SCALE_REPS=str(reps), SCALE_WARMUPS="1")
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--conf", "spark.driver.extraJavaOptions=-XX:MaxDirectMemorySize=8g",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "scaling_bench.py"),
        str(cores),
    ]
    # a leg that exceeds ~4x its expected wall is a wedged python worker
    # (observed once: zero-CPU task hang on this sandbox) — kill + retry
    timeout = timeout or int(os.environ.get("SCALE_LEG_TIMEOUT", "1800"))
    for attempt in (1, 2):
        try:
            out = subprocess.run(
                cmd, capture_output=True, text=True, env=env, timeout=timeout
            )
        except subprocess.TimeoutExpired:
            print(f"leg {cores} attempt {attempt} timed out; retrying", file=sys.stderr)
            continue
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        print(
            f"leg {cores} attempt {attempt} no JSON:\n{out.stderr[-1500:]}",
            file=sys.stderr,
        )
    raise RuntimeError(f"leg {cores} failed twice")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else 4 * n
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    reps = int(os.environ.get("SCALE_REPS", "2"))
    zip_path = _build_zip()

    pairs = []
    for i in range(rounds):
        a = run_leg(n, zip_path, reps)
        b = run_leg(n4, zip_path, reps)
        thr_a = a["rows_per_run"] / min(a["times_sec"])
        thr_b = b["rows_per_run"] / min(b["times_sec"])
        eff = thr_b / ((n4 / n) * thr_a)
        pairs.append(
            {
                "round": i,
                f"t{n}": a["times_sec"],
                f"t{n4}": b["times_sec"],
                f"thr{n}": round(thr_a, 1),
                f"thr{n4}": round(thr_b, 1),
                "efficiency": round(eff, 3),
            }
        )
        print(json.dumps(pairs[-1]), file=sys.stderr)

    effs = sorted(p["efficiency"] for p in pairs)
    print(
        json.dumps(
            {
                "pair": f"{n}->{n4}",
                "n_images": int(os.environ.get("SCALE_N_IMAGES", "160000")),
                "rounds": pairs,
                "median_efficiency": effs[len(effs) // 2],
                "best_efficiency": effs[-1],
            }
        )
    )


if __name__ == "__main__":
    main()

"""Sweep XLA compile options on the flagship train-step bench.

Runs bench.py as a subprocess once per option set (each is a fresh backend +
full compile — 4-12 min over the remote-TPU transport) and prints a ranked
table. Options travel via BENCH_XLA_OPTS -> jit compiler_options, the only
channel that reaches the server-side compiler here (client XLA_FLAGS do not).

Usage:  python scripts/sweep_xla_flags.py [--configs baseline,vmem_64m,...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

CONFIGS: dict[str, dict[str, str]] = {
    "baseline": {},  # default_compiler_options(): latency-hiding scheduler ON
    # sanity re-check of the +6.5% LHS win recorded in parallel/mesh.py
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    # scoped-vmem budget: more room for fusion operands vs less for prefetch
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    # extra scheduler passes after memory-pressure spills
    "lhs_rerun3": {"xla_latency_hiding_scheduler_rerun": "3"},
}


def run_one(name: str, opts: dict[str, str]) -> dict:
    env = dict(os.environ, BENCH_XLA_OPTS=json.dumps(opts))
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        env=env, capture_output=True, text=True, timeout=2400,
    )
    dt = time.perf_counter() - t0
    if proc.returncode != 0:
        tail = proc.stderr.strip().splitlines()[-3:]
        return {"config": name, "error": " | ".join(tail), "wall_s": round(dt, 1)}
    rec = json.loads(proc.stdout.strip().splitlines()[-1])
    return {"config": name, "img_s": rec["value"], "wall_s": round(dt, 1), "opts": opts}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default=",".join(CONFIGS),
                   help="comma-separated subset of: " + ", ".join(CONFIGS))
    p.add_argument("--out", default="", help="optional JSON results file")
    args = p.parse_args()

    results = []
    for name in args.configs.split(","):
        name = name.strip()
        if name not in CONFIGS:
            print(f"unknown config {name!r}; skipping", file=sys.stderr)
            continue
        print(f"[sweep] {name}: {CONFIGS[name] or 'defaults'}", file=sys.stderr, flush=True)
        rec = run_one(name, CONFIGS[name])
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ranked = sorted((r for r in results if "img_s" in r),
                    key=lambda r: -r["img_s"])
    print("\n== ranked ==", file=sys.stderr)
    for r in ranked:
        print(f"  {r['config']:>12}: {r['img_s']:8.1f} img/s", file=sys.stderr)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

"""MFU / DDIM throughput sweep driver (VERDICT r2 weak #1-#2).

Runs ``bench.py`` as a subprocess over a matrix of settings — batch size,
dtype, DDIM step count, sampling batch — one at a time (the chip must be
otherwise idle: concurrent dispatch corrupts the timing), parses the JSON
line each run prints, and appends machine-readable rows to a CSV.

Usage:
    python scripts/bench_sweep.py --out demo_artifacts/round3/bench_sweep.csv \
        --train_batches 128,256,512 --ddim "200:128,200:512,50:512"
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys


def run_bench(env_overrides: dict, timeout: int = 3600) -> dict | None:
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_overrides.items()})
    proc = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                          text=True, env=env, timeout=timeout)
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    print(f"bench run failed ({env_overrides}):\n{proc.stderr[-2000:]}",
          file=sys.stderr)
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="demo_artifacts/round3/bench_sweep.csv")
    p.add_argument("--train_batches", default="128,256,512")
    p.add_argument("--dtypes", default="bfloat16")
    p.add_argument("--ddim", default="200:128,200:512,200:2048,50:512",
                   help="comma list of steps:sample_batch pairs")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--cached_variants", action="store_true",
                   help="measure each train batch both with and without "
                        "the precomputed-latent step (BENCH_CACHE_LATENTS)")
    p.add_argument("--fused", default="scan:4,scan:8",
                   help="K-step fusion variants (BENCH_FUSE) measured at the "
                        "first train batch; '' disables. unroll:K multiplies "
                        "the HLO proto ~K x — the flagship step is 7.6 MB and "
                        "the remote-compile tunnel caps at ~8 MB, so unroll "
                        "variants only work on directly-attached hosts")
    opt = p.parse_args(argv)

    rows = []

    def emit(kind, cfg, rec):
        if rec is None:
            return
        row = {"kind": kind, **cfg,
               "steps_per_s": rec.get("value"),
               **{k: v for k, v in rec.get("extra", {}).items()
                  if not isinstance(v, (list, dict))}}
        rows.append(row)
        print(json.dumps(row), flush=True)
        os.makedirs(os.path.dirname(opt.out) or ".", exist_ok=True)
        keys = sorted({k for r in rows for k in r})
        with open(opt.out, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)

    for dtype in opt.dtypes.split(","):
        for bs in [int(x) for x in opt.train_batches.split(",") if x]:
            for cached in ([1, 0] if opt.cached_variants else [1]):
                cfg = {"BENCH_BATCH": bs, "BENCH_DTYPE": dtype,
                       "BENCH_DDIM": 0, "BENCH_ITERS": opt.iters,
                       "BENCH_CACHE_LATENTS": cached}
                emit("train", {"batch": bs, "dtype": dtype,
                               "cached": cached}, run_bench(cfg))

    if opt.fused and opt.train_batches:
        bs0 = int(opt.train_batches.split(",")[0])
        for fuse in opt.fused.split(","):
            cfg = {"BENCH_BATCH": bs0, "BENCH_DTYPE": opt.dtypes.split(",")[0],
                   "BENCH_DDIM": 0, "BENCH_ITERS": opt.iters,
                   "BENCH_FUSE": fuse}
            emit("train_fused", {"batch": bs0, "fuse": fuse}, run_bench(cfg))

    for pair in opt.ddim.split(","):
        parts = pair.split(":")
        steps, sbatch = int(parts[0]), int(parts[1])
        # optional extra tokens: "bf16p" (cast weights to bf16 before the
        # scan — the HBM-roofline byte lever) or an ENCDIFF_PALLAS value
        pallas, bf16p, sampler = None, False, "ddim"
        for tok in parts[2:]:
            if tok == "bf16p":
                bf16p = True
            elif tok == "plms":
                sampler = "plms"
            else:
                pallas = tok
        cfg = {"BENCH_TRAIN": 0, "BENCH_DDIM_STEPS": steps,
               "BENCH_SAMPLE_BATCH": sbatch, "BENCH_BATCH": 128,
               "BENCH_SAMPLER": sampler, "BENCH_DDIM50": 0}
        if pallas:
            cfg["ENCDIFF_PALLAS"] = pallas
        if bf16p:
            cfg["BENCH_BF16_PARAMS"] = 1
        emit("ddim", {"ddim_steps": steps, "sample_batch": sbatch,
                      "sampler": sampler,
                      "pallas": pallas or "", "bf16p": int(bf16p)},
             run_bench(cfg))

    print(f"sweep -> {opt.out} ({len(rows)} rows)")


if __name__ == "__main__":
    main()

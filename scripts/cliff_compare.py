#!/usr/bin/env python
"""Finding-4 adjudication table: the flagship full-B-tilde PLMC's >30k
test-R2 cliff across the precision ladder (VERDICT r4 item 1).

Collates, at matched absolute iterations, the committed trajectories:
  - fp32 chip, default matmul precision, post-QR-fix
    (results/plmc_trajectory_jax_qrfix.json)
  - fp32 chip, global HIGHEST matmul precision
    (results/plmc_trajectory_jax_highest.json)
  - fp64 CPU continuation of the validated 20k state
    (results/plmc_trajectory_fp64_continuation_r5.json, falling back to
    the round-4 leg for iterations it has not reached yet)
  - torch-fp64 oracle (results/oracle_plmc_synthetic.json, 0-20k horizon)
plus each trajectory's runaway anatomy (sigma_p floor, |M|_F) where
recorded. CPU-runnable; no chip required.
"""

import json
import sys


def traj(path):
    try:
        with open(path) as f:
            d = json.load(f)
    except FileNotFoundError:
        return {}, {}
    r2 = dict((int(i), v) for i, v in d.get("r2_trajectory", []))
    diag = dict((int(i), v) for i, v in d.get("param_diag", []))
    return r2, diag


def main():
    f32, d32 = traj("results/plmc_trajectory_jax_qrfix.json")
    fhi, _ = traj("results/plmc_trajectory_jax_highest.json")
    f64, d64 = traj("results/plmc_trajectory_fp64_continuation_r5.json")
    f64_r4, d64_r4 = traj("results/plmc_trajectory_fp64_continuation.json")
    for i, v in f64_r4.items():
        f64.setdefault(i, v)
    for i, v in d64_r4.items():
        d64.setdefault(i, v)
    flo, dlo = traj("results/plmc_trajectory_jax_floor6.json")

    with open("results/oracle_plmc_synthetic.json") as f:
        oracle = json.load(f)
    orc = dict((int(i), v) for i, v in
               oracle.get("test_R2_checkpoints",
                          oracle.get("r2_trajectory", [])))

    iters = sorted(set(f32) | set(f64))
    hdr = (f"{'iter':>6} {'fp32-def':>9} {'fp32-high':>9} {'fp32-flr6':>9} "
           f"{'fp64':>9} {'oracle':>9}   {'fp64 sig_min':>12} {'fp64 M_fro':>10}")
    print(hdr)
    for i in iters:
        if i % 2000 and i not in (20500, 30500, 31500, 32500, 33500):
            continue
        def g(d, k):
            return f"{d[k]:9.4f}" if k in d else " " * 9
        s = f"{i:>6} {g(f32, i)} {g(fhi, i)} {g(flo, i)} {g(f64, i)} {g(orc, i)}"
        if i in d64:
            s += (f"   {d64[i]['sigma_p_min']:12.2e} "
                  f"{d64[i]['M_fro']:10.1f}")
        print(s)
    if f64:
        last = max(f64)
        print(f"\nfp64 last: iter {last} R2 {f64[last]:.5f}")
    if f32:
        print(f"fp32-default last: iter {max(f32)} R2 {f32[max(f32)]:.5f}")
    if flo:
        print(f"floor-exp(-6) last: iter {max(flo)} R2 {flo[max(flo)]:.5f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

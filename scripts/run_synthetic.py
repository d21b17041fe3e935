#!/usr/bin/env python
"""Synthetic parametric study — the rebuild of the reference's experiments.py
script, as a small CLI over experiments.driver.run_study.

Examples (the paper's figures, experiments.py:51-57):
  python scripts/run_synthetic.py --v-test mu_noise --n-runs 50 --mu-str 0.99   # Fig 1a
  python scripts/run_synthetic.py --v-test mu_str  --n-runs 40                  # Fig 1b/2a
  python scripts/run_synthetic.py --v-test q_noise --n-runs 50                  # Fig 2b
  python scripts/run_synthetic.py --v-test p --n-runs 50                        # Fig 3/4a/6a
  python scripts/run_synthetic.py --v-test q --n-runs 50                        # Fig 4b/6b
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--v-test", default="void",
                   help="parameter to sweep (n,p,q,q_guess,q_noise,"
                        "q_noise_guess,mu_noise,mu_str,max_scales,void)")
    p.add_argument("--v-test-2", default="void")
    p.add_argument("--n-runs", type=int, default=1)
    p.add_argument("--models", nargs="+",
                   default=["ICM", "PLMC", "oilmm", "var", "PLMC_fast"])
    p.add_argument("--n-iter", type=int, default=100000)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--lr-min", type=float, default=1e-3)
    p.add_argument("--loss-thresh", type=float, default=2.5e-6)
    p.add_argument("--patience", type=int, default=500)
    p.add_argument("--n-test", type=int, default=2500)
    p.add_argument("--block-every", type=int, default=1,
                   help="host-sync cadence for the plateau test")
    p.add_argument("--mu-str", type=float, default=None)
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--p", type=int, default=None)
    p.add_argument("--q", type=int, default=None)
    p.add_argument("--out", default=None, help="CSV output path")
    p.add_argument("--print-metrics", action="store_true")
    args = p.parse_args(argv)

    from projected_lmc_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    from projected_lmc_tpu.experiments.driver import run_study
    params = {}
    for name in ("mu_str", "n", "p", "q"):
        val = getattr(args, name)
        if val is not None:
            params[name] = val
    run_study(v_test=args.v_test, v_test_2=args.v_test_2,
              n_random_runs=args.n_runs, models_to_run=args.models,
              params=params, path=args.out, n_iter=args.n_iter, lr=args.lr,
              lr_min=args.lr_min, loss_thresh=args.loss_thresh,
              patience=args.patience, print_metrics=args.print_metrics,
              block_every=args.block_every, n_test=args.n_test)
    return 0


if __name__ == "__main__":
    sys.exit(main())

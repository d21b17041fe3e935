#!/usr/bin/env python
"""Real-data experiments — the rebuild of realdata_experiments.py as a CLI.

  python scripts/run_realdata.py ship   [--models ICM oilmm PLMC PLMC_fast]
  python scripts/run_realdata.py sarcos
  python scripts/run_realdata.py tidal
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("experiment", choices=["tidal", "ship", "sarcos", "neutro"])
    p.add_argument("--data-root", default=None,
                   help="directory holding the experiment data "
                        "(default: the mounted reference _experiments)")
    p.add_argument("--models", nargs="+",
                   default=["ICM", "oilmm", "PLMC", "PLMC_fast"])
    p.add_argument("--q", type=int, default=None, help="n_latents override")
    p.add_argument("--lik-rank", type=int, default=0)
    p.add_argument("--n-iter", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--patience", type=int, default=500)
    p.add_argument("--block-every", type=int, default=1)
    p.add_argument("--scan-steps", type=int, default=None,
                   help="optimizer steps fused per dispatch (default: 16 on "
                        "TPU, 1 on CPU — see training.default_scan_steps)")
    p.add_argument("--out", default=None)
    p.add_argument("--print-metrics", action="store_true")
    p.add_argument("--var-fit", default="warm_start",
                   choices=["warm_start", "adam"],
                   help="how to fit the variational model: closed-form "
                        "SGPR-optimal E-step (default — ELBO Adam training "
                        "collapses on real data, see "
                        "results/var_tidal_collapse.md) or plain Adam")
    args = p.parse_args(argv)

    import pandas as pd
    from projected_lmc_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    from projected_lmc_tpu.experiments.realdata import LOADERS
    from projected_lmc_tpu.experiments.driver import build_models, train_and_eval

    data = LOADERS[args.experiment](args.data_root)
    q = args.q if args.q is not None else data["q"]
    models = build_models(
        data["X"], data["Y"], q_model=q, q_noise_guess=args.lik_rank,
        models_to_run=args.models, kernel_type=data["kernel_type"],
        mean_type="zero", n_ind_points=data["n_ind_points"],
        ker_kwargs=data.get("ker_kwargs"),
        # real inputs are not in the reference's hard-coded [-1,1] QMC box —
        # scale the variational inducing-point box to the data range
        var_ind_range="data",
        oilmm_bulk=False)  # realdata_experiments.py:107 uses bulk=False for oilmm
    results, _ = train_and_eval(
        models, data["X_test"], data["Y_test"],
        n_iter=args.n_iter or data["n_iter"], lr=args.lr,
        loss_thresh=data["loss_thresh"], patience=args.patience,
        print_metrics=args.print_metrics, block_every=args.block_every,
        scan_steps=args.scan_steps, var_fit=args.var_fit)

    out = args.out or f"results/realdata_study_{args.experiment}.csv"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    pd.DataFrame.from_dict(results, orient="index").to_csv(out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

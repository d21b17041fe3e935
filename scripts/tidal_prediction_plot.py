#!/usr/bin/env python
"""Tidal prediction time-series figure (the reference's figure 7 — the
commented block at process_graphs.py:155-201): per-station tide height with
training data, the held-out test day, the model prediction, and the 2σ band.

Trains a PLMC model on the bramblemet experiment with the study settings
(spectral-mixture kernel, num_mixtures=5) and writes
results/tidal_prediction_<station>.pdf for the first two stations plus
results/preds_tidal.csv in the reference's preds-CSV shape
(Date, <station> columns, pred{i}/lower{i}/upper{i} zeroed outside the test
window — realdata_experiments.py writes the same layout).

Run:  python scripts/tidal_prediction_plot.py [--n-iter 50000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-iter", type=int, default=50000)
    # only the projected models expose .predict (mean + 2σ band); var/ICM
    # would crash here AFTER a full training run
    ap.add_argument("--model", default="PLMC",
                    choices=["PLMC", "oilmm", "PLMC_fast"])
    ap.add_argument("--out-dir", default="results")
    args = ap.parse_args(argv)

    from projected_lmc_tpu.utils.tpu import ensure_tpu
    ensure_tpu()
    import pandas as pd
    from projected_lmc_tpu.experiments.driver import build_models, train_and_eval
    from projected_lmc_tpu.experiments.realdata import load_tidal

    data = load_tidal()
    models = build_models(data["X"], data["Y"], q_model=data["q"],
                          q_noise_guess=0, models_to_run=[args.model],
                          kernel_type=data["kernel_type"], mean_type="zero",
                          ker_kwargs=data["ker_kwargs"], oilmm_bulk=False)
    results, trained = train_and_eval(
        models, data["X_test"], data["Y_test"], n_iter=args.n_iter,
        loss_thresh=data["loss_thresh"], print_metrics=True)
    model = trained[args.model]
    mean, var = model.predict(np.asarray(data["X_test"]))
    mean, sd = np.asarray(mean), np.sqrt(np.asarray(var))

    # full series re-assembled in frame order (train rows + test window);
    # the sub/sup slicing below assumes one contiguous held-out window
    test_idx = np.asarray(data["test_indices"])
    assert np.all(np.diff(test_idx) == 1), "test window must be contiguous"
    n_total = data["X"].shape[0] + test_idx.size
    p = data["Y"].shape[1]
    Y_full = np.zeros((n_total, p), np.float64)
    train_rows = np.setdiff1d(np.arange(n_total), test_idx)
    Y_full[train_rows] = np.asarray(data["Y"], np.float64)
    Y_full[test_idx] = np.asarray(data["Y_test"], np.float64)
    dates = pd.to_datetime(data["dates"][:n_total])

    # reference preds-CSV layout (pred/lower/upper zero outside the window)
    frame = {"Date": dates}
    for j, station in enumerate(data["stations"]):
        frame[station] = Y_full[:, j]
        for name, col in (("pred", mean[:, j]),
                          ("lower", mean[:, j] - 2 * sd[:, j]),
                          ("upper", mean[:, j] + 2 * sd[:, j])):
            buf = np.zeros(n_total)
            buf[test_idx] = col
            frame[f"{name}{j}"] = buf
    os.makedirs(args.out_dir, exist_ok=True)
    pd.DataFrame(frame).to_csv(os.path.join(args.out_dir, "preds_tidal.csv"),
                               index=False)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.dates as mdates
    import matplotlib.pyplot as plt

    sub = np.arange(0, test_idx[0])
    sup = np.arange(test_idx[-1] + 1, n_total)
    for j, station in enumerate(data["stations"][:2]):
        fig, ax = plt.subplots(figsize=(12, 8))
        ax.plot(dates[sub], Y_full[sub, j], color="blue")
        ax.scatter(dates[sub], Y_full[sub, j], label="training data",
                   color="blue", marker=".")
        ax.plot(dates[sup], Y_full[sup, j], color="blue")
        ax.scatter(dates[sup], Y_full[sup, j], color="blue", marker=".")
        ax.scatter(dates[test_idx], Y_full[test_idx, j], label="test data",
                   color="k", marker="x")
        ax.plot(dates[test_idx], mean[:, j], color="red", label="prediction")
        ax.fill_between(dates[test_idx], mean[:, j] - 2 * sd[:, j],
                        mean[:, j] + 2 * sd[:, j], color="red", alpha=0.2)
        ax.set_xlabel("Date")
        ax.set_ylabel("Tide height (m, detrended)")
        ax.xaxis.set_major_locator(mdates.DayLocator(interval=1))
        ax.xaxis.set_major_formatter(mdates.DateFormatter("%m-%d"))
        ax.legend()
        out = os.path.join(args.out_dir, f"tidal_prediction_{station}.pdf")
        fig.savefig(out, format="pdf")
        plt.close(fig)
        print(f"wrote {out}")
    print({k: round(float(v), 4) for k, v in results[args.model].items()
           if k in ("R2", "RMSE", "PVA", "alpha_CI")})
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Does the flagship full-B̃ PLMC's post-22k test-R² runaway survive fp64?

Context (results/plmc_trajectory_jax_qrfix.json, results/
oracle_plmc_synthetic.json): with the QR-precision fix the fp32 chip
trajectory sits ON the torch-fp64 oracle through the oracle's whole 20k
horizon (0.9798 vs 0.9801), then declines to 0.907 by 40k via a
scale-degenerate runaway (σ_p pinned at its exp(-9) floor, ‖M‖_F 23→600,
‖H‖_F decaying under weight decay) while the train MLL keeps improving
(−161 < the oracle's best −159.7). A from-scratch fp64 run of the 0→20k
leg would only repeat what the oracle already certifies; the open
question is the CONTINUATION: from the 20k state the oracle validated,
does exact-arithmetic optimization follow the same runaway (a real
descent direction of the objective — the extra-noise-DOF trade the
paper describes) or hold 0.98 (an fp32-dynamics artifact)?

Two phases, two processes (x64 is a process-global switch):

  save:      (chip, fp32) re-run seed-0 full-B̃ PLMC for --n-iter=20000
             exactly as scripts/plmc_trajectory_jax.py (same data, AdamW
             wd=1e-2, LambdaLR 1e-2→1e-3@10k, same PRNG), then pickle
             the trainable leaves + FULL optax state (Adam moments +
             step count, so the lr schedule and moments continue
             exactly).
  continue:  (CPU, x64) rebuild the model template in fp64, swap in the
             saved leaves (cast), restore the optimizer state (cast),
             and run --n-iter more steps with the same per-checkpoint
             parameter anatomy + incremental JSON as the fp32 runs —
             directly comparable to plmc_trajectory_jax_qrfix.json's
             20k→40k segment.
"""

import argparse
import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build(seed):
    from projected_lmc_tpu.experiments.driver import (DEFAULT_PARAMS,
                                                      build_models)
    from projected_lmc_tpu.experiments.synthetic import generate_synthetic
    v = dict(DEFAULT_PARAMS)
    data = generate_synthetic(
        n=v["n"], p=v["p"], q=v["q"], q_noise=v["q_noise"],
        mu_noise=v["mu_noise"], mu_str=v["mu_str"], max_scale=v["max_scale"],
        n_test=2500, seed=seed)
    model = build_models(data["X"], data["Y"], v["q"], v["p"], ["PLMC"],
                         seed=seed)["PLMC"]
    return data, model


def make_opt(ptree_paths, schedule):
    """Mirror training.fit's optimizer exactly (AdamW wd=1e-2, raw_mixture
    leaves excluded from decay — no spectral-mixture params here, but keep
    the construction identical)."""
    import optax
    decay_flags = [
        not any(str(getattr(k, "name", "")).startswith("raw_mixture")
                for k in kp)
        for kp, _ in ptree_paths]
    return optax.adamw(learning_rate=schedule, weight_decay=1e-2,
                       mask=decay_flags)


def train(model, data, n_iter, schedule, out, t_offset_iter=0,
          opt_state=None, r2_every=500, scan_steps=None, tag="",
          state_dump=None):
    """state_dump, if given, is called as state_dump(leaves, opt_state,
    abs_iter) at every in-loop snapshot — lets the caller keep a resumable
    pickle current so a killed run loses at most r2_every iterations."""
    import jax
    import optax
    from projected_lmc_tpu.mlls import projected_lmc_mll
    from projected_lmc_tpu.module import combine, partition, trainable_mask
    from projected_lmc_tpu.training import default_scan_steps

    mask = trainable_mask(model)
    params, static = partition(model, mask)
    flat_with_paths, ptreedef = jax.tree_util.tree_flatten_with_path(params)
    leaves = [v for _, v in flat_with_paths]
    tx = make_opt(flat_with_paths, schedule)
    if opt_state is None:
        opt_state = tx.init(leaves)
    scan_steps = scan_steps or default_scan_steps()

    Yt = np.asarray(data["Y_test"], np.float64)
    var_t = Yt.var(axis=0, ddof=1)
    state = dict(config=dict(n_iter=n_iter, start_iter=t_offset_iter,
                             tag=tag, dtype=str(leaves[0].dtype),
                             backend=jax.default_backend()),
                 r2_trajectory=[], param_diag=[])

    def snapshot(i):
        m = combine(jax.tree_util.tree_unflatten(ptreedef, leaves), static)
        mean, _ = m.predict(data["X_test"], observed=True)
        err2 = (Yt - np.asarray(mean, np.float64)) ** 2
        r2 = float((1.0 - err2.mean(0) / var_t).mean())
        state["r2_trajectory"].append([int(i), round(r2, 6)])
        Q, R, _ = m.lmc_coefficients.QR()
        sig = np.asarray(m.projected_noise(), np.float64)
        Qn = np.asarray(Q, np.float64)
        diag = dict(loss=round(float(projected_lmc_mll(m)), 6),
                    sigma_p_min=float(sig.min()), sigma_p_max=float(sig.max()),
                    H_fro=round(float(np.linalg.norm(np.asarray(
                        m.lmc_coefficients.H, np.float64))), 4),
                    M_fro=round(float(np.linalg.norm(
                        np.asarray(m.M, np.float64))), 4),
                    ortho_err=float(np.abs(
                        Qn.T @ Qn - np.eye(Qn.shape[1])).max()))
        state["param_diag"].append([int(i), diag])
        with open(out + ".tmp", "w") as f:
            json.dump(state, f, indent=1)
        os.replace(out + ".tmp", out)
        print(f"[{tag}] iter {i}: R2 {r2:.4f} loss {diag['loss']:.3f} "
              f"sig_min {diag['sigma_p_min']:.2e} M_fro {diag['M_fro']:.0f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        return r2

    def one_step(leaves, opt_state, key):
        key, sub = jax.random.split(key)
        def neg_loss(lvs):
            m = combine(jax.tree_util.tree_unflatten(ptreedef, lvs), static)
            return -projected_lmc_mll(m)
        loss, grads = jax.value_and_grad(neg_loss)(leaves)
        updates, opt_state = tx.update(grads, opt_state, leaves)
        leaves = optax.apply_updates(leaves, updates)
        return leaves, opt_state, key, loss

    @jax.jit
    def multi_step(leaves, opt_state, key):
        def body(carry, _):
            p, o, k = carry
            p, o, k, loss = one_step(p, o, k)
            return (p, o, k), loss
        (leaves, opt_state, key), losses = jax.lax.scan(
            body, (leaves, opt_state, key), None, length=scan_steps)
        return leaves, opt_state, key, losses

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    i = 0
    snapshot(t_offset_iter)
    last_snap = t_offset_iter
    while i < n_iter:
        leaves, opt_state, key, losses = multi_step(leaves, opt_state, key)
        i += scan_steps
        if i % r2_every < scan_steps:
            snapshot(t_offset_iter + i)
            last_snap = t_offset_iter + i
            if state_dump is not None:
                state_dump(leaves, opt_state, t_offset_iter + i)
    if last_snap != t_offset_iter + i:
        snapshot(t_offset_iter + i)
    state["final_loss"] = float(np.asarray(losses)[-1])
    state["train_time_s"] = round(time.time() - t0, 1)
    with open(out + ".tmp", "w") as f:
        json.dump(state, f, indent=1)
    os.replace(out + ".tmp", out)
    # t_offset_iter + i is the ABSOLUTE iteration actually reached (the while
    # loop overshoots to a scan_steps multiple when scan_steps ∤ n_iter) —
    # callers must label end-state pickles with it, not with n_iter.
    return leaves, opt_state, ptreedef, static, t_offset_iter + i


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("phase", choices=["save", "continue"])
    ap.add_argument("--n-iter", type=int, default=None,
                    help="default: 20000 for save, 15000 for continue")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--state", default="/tmp/plmc_state_20k.pkl")
    ap.add_argument("--save-state", default=None,
                    help="continue phase: pickle the END state here so the "
                         "fp64 leg can itself be continued later")
    ap.add_argument("--out", default=None)
    ap.add_argument("--r2-every", type=int, default=500)
    ap.add_argument("--scan-steps", type=int, default=None)
    args = ap.parse_args(argv)

    import jax
    if args.phase == "continue":
        jax.config.update("jax_enable_x64", True)
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            from jax._src import xla_bridge as _xb
            _xb._clear_backends()
            _xb.get_backend.cache_clear()
        assert jax.default_backend() == "cpu", jax.default_backend()
    elif os.environ.get("PLMC_CONT_CPU") == "1":  # plumbing tests
        jax.config.update("jax_platforms", "cpu")
        if jax.default_backend() != "cpu":
            from jax._src import xla_bridge as _xb
            _xb._clear_backends()
            _xb.get_backend.cache_clear()
    else:
        from projected_lmc_tpu.utils.tpu import ensure_tpu
        ensure_tpu()

    data, model = build(args.seed)
    from projected_lmc_tpu.training import lambda_lr_schedule
    schedule = lambda_lr_schedule(lr_max=1e-2, lr_min=1e-3)

    if args.phase == "save":
        n_iter = args.n_iter or 20000
        out = args.out or "results/plmc_continuation_fp32_leg.json"
        leaves, opt_state, _, _, iter_reached = train(
            model, data, n_iter, schedule, out,
            scan_steps=args.scan_steps, tag="fp32-save")
        with open(args.state, "wb") as f:
            pickle.dump(dict(
                leaves=[np.asarray(x) for x in jax.tree_util.tree_leaves(
                    leaves)],
                opt_state=jax.tree_util.tree_map(np.asarray, opt_state),
                n_iter=iter_reached, seed=args.seed), f)
        print(f"saved state after {iter_reached} iters -> {args.state}")
        return 0

    # continue: swap saved leaves into the fp64 template
    with open(args.state, "rb") as f:
        saved = pickle.load(f)
    start_iter = saved["n_iter"]
    n_iter = args.n_iter or 15000
    out = args.out or "results/plmc_trajectory_fp64_continuation.json"

    from projected_lmc_tpu.module import partition, trainable_mask
    mask = trainable_mask(model)
    params, static = partition(model, mask)
    flat_with_paths, ptreedef = jax.tree_util.tree_flatten_with_path(params)
    tmpl_leaves = [v for _, v in flat_with_paths]
    assert len(tmpl_leaves) == len(saved["leaves"]), \
        (len(tmpl_leaves), len(saved["leaves"]))
    cast = [np.asarray(s, np.float64) if np.issubdtype(
        np.asarray(s).dtype, np.floating) else np.asarray(s)
        for s in saved["leaves"]]
    for t, c in zip(tmpl_leaves, cast):
        assert t.shape == np.shape(c), (t.shape, np.shape(c))
    params64 = jax.tree_util.tree_unflatten(ptreedef, cast)
    from projected_lmc_tpu.module import combine
    model64 = combine(params64, static)

    tx = make_opt(flat_with_paths, schedule)
    opt_tmpl = tx.init(cast)
    flat_saved = jax.tree_util.tree_leaves(saved["opt_state"])
    flat_tmpl, opt_def = jax.tree_util.tree_flatten(opt_tmpl)
    assert len(flat_saved) == len(flat_tmpl), \
        (len(flat_saved), len(flat_tmpl))
    restored = [np.asarray(s, np.float64)
                if np.issubdtype(np.asarray(s).dtype, np.floating)
                else np.asarray(s)
                for s in flat_saved]
    opt_state = jax.tree_util.tree_unflatten(opt_def, restored)

    def dump_state(lvs, ost, abs_iter, _path=args.save_state):
        if not _path:
            return
        with open(_path + ".tmp", "wb") as f:
            pickle.dump(dict(
                leaves=[np.asarray(x)
                        for x in jax.tree_util.tree_leaves(lvs)],
                opt_state=jax.tree_util.tree_map(np.asarray, ost),
                n_iter=abs_iter, seed=args.seed), f)
        os.replace(_path + ".tmp", _path)

    leaves, opt_state, _, _, iter_reached = train(
        model64, data, n_iter, schedule, out, t_offset_iter=start_iter,
        opt_state=opt_state, r2_every=args.r2_every,
        scan_steps=args.scan_steps or 8, tag="fp64-cont",
        state_dump=dump_state)
    if args.save_state:
        # end-state pickle so a later `continue --state <this>` extends the
        # fp64 leg without redoing it (saved["n_iter"] = absolute iteration
        # actually reached, accounting for scan_steps overshoot)
        with open(args.save_state + ".tmp", "wb") as f:
            pickle.dump(dict(
                leaves=[np.asarray(x) for x in jax.tree_util.tree_leaves(
                    leaves)],
                opt_state=jax.tree_util.tree_map(np.asarray, opt_state),
                n_iter=iter_reached, seed=args.seed), f)
        os.replace(args.save_state + ".tmp", args.save_state)
        print(f"saved fp64 end state at iter {iter_reached} -> "
              f"{args.save_state}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

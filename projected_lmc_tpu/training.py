"""Jit-compiled training loop with plateau early stopping.

The reference's shared loop (experiments.py:256-284, realdata_experiments.py:168-210):
AdamW, LambdaLR linear decay lr_max→lr_min over 10k iters (then flat) or
ExponentialLR, and plateau stopping — |1 − loss/last_loss| < thresh for
``patience`` consecutive iterations ('max' criterion) or on a rolling mean
('mean' criterion). Here the whole optimizer step (model forward + MLL + grads
+ AdamW update) is ONE jit-compiled XLA program; the plateau test runs
host-side on the device-returned scalar loss, exactly mirroring the reference's
semantics while the device never stalls on Python between math ops.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .module import trainable_mask, partition, combine


def _loss_fn_takes_key(loss_fn) -> bool:
    """True if ``loss_fn``'s second positional argument is a PRNG key — it
    must literally be named ``key`` or ``rng`` (a bare arity check would
    misfire on e.g. ``projected_lmc_mll(model, with_terms)``)."""
    import inspect
    try:
        params = list(inspect.signature(loss_fn).parameters.values())
    except (TypeError, ValueError):
        return False
    positional = [p for p in params if p.kind in
                  (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)]
    return len(positional) >= 2 and positional[1].name in ("key", "rng")


def lambda_lr_schedule(lr_max: float = 1e-2, lr_min: float = 1e-3,
                       last_epoch: int = 10000):
    """LambdaLR of experiments.py:84: linear decay lr_max→lr_min over
    ``last_epoch`` iterations, then flat at lr_min."""
    def schedule(i):
        i = jnp.asarray(i, jnp.float32)
        frac = i / last_epoch * (lr_min / lr_max) + (last_epoch - i) / last_epoch
        return lr_max * jnp.where(i <= last_epoch, frac, lr_min / lr_max)
    return schedule


def exponential_schedule(lr: float, lr_min: float, n_iter: int):
    """ExponentialLR with γ = exp(log(lr_min/lr)/n_iter) (experiments.py:251)."""
    gamma = float(np.exp(np.log(lr_min / lr) / n_iter))
    def schedule(i):
        return lr * gamma ** jnp.asarray(i, jnp.float32)
    return schedule


def default_scan_steps() -> int:
    """Steps fused per dispatch: 16 on accelerators (the tunneled TPU adds
    ~25 ms host↔device roundtrip per fetch — per-iteration dispatch would
    dominate step time), 1 on CPU (tests want per-iteration losses cheap)."""
    try:
        return 1 if jax.default_backend() == "cpu" else 16
    except RuntimeError:
        return 1


def fit(model, loss_fn: Callable = None, n_iter: int = 10000, lr: float = 1e-2,
        schedule=None, loss_thresh: float = 2.5e-6, patience: int = 500,
        criterion: str = "max", weight_decay: float = 1e-2,
        print_loss: bool = False, freq_print: int = 1000,
        block_every: int = 1, scan_steps: int = None, seed: int = 0,
        checkpoint_every: int = 0, checkpoint_path: str = None,
        eval_every: int = 0, eval_fn: Callable = None):
    """Train ``model`` by maximizing ``loss_fn(model)`` (an MLL; the loop
    minimizes −MLL like the reference).

    Returns (trained_model, info) with info = dict(n_iter, train_time, losses,
    loss). AdamW with weight_decay=1e-2 matches torch.optim.AdamW defaults used
    throughout the reference.

    ``checkpoint_every`` > 0 with a ``checkpoint_path`` saves the in-training
    model every that-many iterations (and once at the end) via
    utils.checkpoint.save_model — key-path-keyed .npz, reloadable with
    ``load_model(template, path)`` (capability absent from the reference,
    SURVEY §5).

    ``loss_fn`` may take either ``(model)`` or ``(model, key)``; the two-arg
    form receives a fresh PRNG key every iteration (stochastic MLLs — the
    CG+SLQ exact-LMC path redraws its Hutchinson probes per step, as gpytorch
    redraws per evaluation).

    ``scan_steps``: steps fused into one XLA program via ``lax.scan`` — one
    host↔device dispatch per chunk instead of per iteration (essential when
    dispatch latency rivals step time). Default: :func:`default_scan_steps`
    (16 on TPU, 1 on CPU). All per-iteration losses come back as an array, so
    the plateau test sees every loss exactly as the reference's per-iteration
    check does; early stopping lands on a chunk boundary (an overshoot of
    < scan_steps iterations).

    ``block_every``: per-iteration-mode host-sync cadence (scan_steps == 1).

    ``eval_every`` > 0 with an ``eval_fn(model, i)`` records
    ``(i, eval_fn(...))`` pairs in ``info['evals']`` at (chunk-aligned)
    checkpoints — in-training trajectory capture (test metrics vs iteration)
    without restarting the optimizer.
    """
    if loss_fn is None:
        loss_fn = lambda m: m.mll()
    if schedule is None:
        schedule = lambda_lr_schedule(lr_max=lr, lr_min=lr / 10.0)
    if scan_steps is None:
        scan_steps = default_scan_steps()
    takes_key = _loss_fn_takes_key(loss_fn)

    mask = trainable_mask(model)
    params, static = partition(model, mask)
    # The optimizer works on the FLAT LEAF LIST of the trainable pytree: a
    # plain list is structure-compatible with optax masks (Module pytrees
    # classify bool attributes as static, so a model-shaped mask tree would
    # not round-trip). Iteration counter lives in the adam state so the lr
    # schedule stays exact.
    flat_with_paths, ptreedef = jax.tree_util.tree_flatten_with_path(params)
    leaves0 = [v for _, v in flat_with_paths]
    # Weight decay skips spectral-mixture raw frequencies/bandwidths: their
    # raw magnitudes equal the frequencies themselves (softplus ≈ identity at
    # e.g. 3.5e4 for the tidal M2 line), so decay·lr would drag them by
    # thousands per epoch — torch AdamW in the reference has the same flaw,
    # it is just invisible on O(1) lengthscale parameters.
    decay_flags = [
        not any(str(getattr(k, "name", "")).startswith("raw_mixture")
                for k in kp)
        for kp, _ in flat_with_paths]
    tx = optax.adamw(learning_rate=schedule, weight_decay=weight_decay,
                     mask=decay_flags)
    opt_state = tx.init(leaves0)
    key0 = jax.random.PRNGKey(seed)

    def one_step(leaves, opt_state, key, static):
        key, sub = jax.random.split(key)
        def neg_loss(lvs):
            p = jax.tree_util.tree_unflatten(ptreedef, lvs)
            m = combine(p, static)
            return -(loss_fn(m, sub) if takes_key else loss_fn(m))
        loss, grads = jax.value_and_grad(neg_loss)(leaves)
        updates, opt_state = tx.update(grads, opt_state, leaves)
        leaves = optax.apply_updates(leaves, updates)
        return leaves, opt_state, key, loss

    if scan_steps > 1:
        @jax.jit
        def multi_step(leaves, opt_state, key, static):
            def body(carry, _):
                p, o, k = carry
                p, o, k, loss = one_step(p, o, k, static)
                return (p, o, k), loss
            (leaves, opt_state, key), losses = jax.lax.scan(
                body, (leaves, opt_state, key), None, length=scan_steps)
            return leaves, opt_state, key, losses
    else:
        step = jax.jit(one_step)
    params = leaves0

    losses = []
    plateau_id = 0
    last_loss = 1e-9
    deltas = np.zeros(patience)
    effective_n_iter = n_iter
    start = time.time()

    evals = []
    next_eval = eval_every if eval_every > 0 and eval_fn is not None else None

    def maybe_checkpoint(i, final=False):
        nonlocal next_eval
        if next_eval is not None and (i >= next_eval or final) \
                and not (evals and evals[-1][0] == i):
            m = combine(jax.tree_util.tree_unflatten(ptreedef, params),
                        static)
            evals.append((i, eval_fn(m, i)))
            while next_eval <= i:
                next_eval += eval_every
        if not checkpoint_path or not (final or (
                checkpoint_every > 0 and i > 0 and i % checkpoint_every == 0)):
            return
        from .utils.checkpoint import save_model
        save_model(combine(jax.tree_util.tree_unflatten(ptreedef, params),
                           static), checkpoint_path)

    def check_plateau(i, new_loss):
        nonlocal plateau_id, last_loss
        if criterion == "max":
            if i > 0 and abs(1 - new_loss / last_loss) < loss_thresh:
                plateau_id += 1
                if plateau_id > patience:
                    return True
            else:
                plateau_id = 0
        elif criterion == "mean":
            deltas[1:] = deltas[:-1]
            deltas[0] = abs(1 - new_loss / last_loss)
            if i >= patience and deltas.mean() < loss_thresh:
                return True
        else:
            raise ValueError("Criterion not recognized")
        last_loss = new_loss
        return False

    if scan_steps > 1:
        i = 0
        key = key0
        while i < n_iter:
            params, opt_state, key, chunk_losses = multi_step(
                params, opt_state, key, static)
            stop = False
            for j, lv in enumerate(np.asarray(chunk_losses)):
                losses.append(float(lv))
                if print_loss and (i + j) % freq_print == 0:
                    print(f"iter {i + j}: loss {float(lv):.6f}")
                if check_plateau(i + j, float(lv)):
                    effective_n_iter = i + j
                    stop = True
                    break
            i += scan_steps
            maybe_checkpoint(i)
            if stop:
                break
    else:
        key = key0
        for i in range(n_iter):
            params, opt_state, key, loss = step(params, opt_state, key, static)
            maybe_checkpoint(i)
            if i % block_every == 0 or i == n_iter - 1:
                new_loss = float(loss)
                losses.append(new_loss)
                if print_loss and i % freq_print == 0:
                    print(f"iter {i}: loss {new_loss:.6f}")
                if check_plateau(i, new_loss):
                    effective_n_iter = i
                    break
    train_time = time.time() - start
    maybe_checkpoint(effective_n_iter, final=True)

    trained = combine(jax.tree_util.tree_unflatten(ptreedef, params), static)
    info = dict(n_iter=effective_n_iter, train_time=train_time,
                losses=np.asarray(losses), loss=last_loss)
    if evals:
        info["evals"] = evals
    return trained, info


def fit_ensemble(models, loss_fn: Callable = None, n_iter: int = 10000,
                 lr: float = 1e-2, schedule=None, loss_thresh: float = 2.5e-6,
                 patience: int = 500, criterion: str = "max",
                 weight_decay: float = 1e-2, scan_steps: int = None,
                 seed: int = 0, print_loss: bool = False,
                 freq_print: int = 1000, force_xla_kernels: bool = True):
    """Seed-parallel training: B same-config models as ONE vmapped jit program.

    The reference's seeded-study protocol (experiments.py:125-127 — 30–50
    independent runs per configuration) trains each seed sequentially; on a
    GPU that is the only option torch offers. On TPU the study models are
    tiny (n=500 kernels barely occupy one MXU pass), so the whole seed batch
    vectorizes: stack the B models' leaves, ``vmap`` the optimizer step, and
    train every seed in a single XLA program — per-iteration cost grows far
    slower than B, and the host↔device dispatch cost is paid once per chunk
    for the whole batch instead of per seed.

    ``models``: list of B Module instances with identical architecture
    (same treedef, same static config, same array shapes) but arbitrary
    per-seed data/initializations — exactly what
    ``experiments.driver.build_models`` with different seeds produces.

    Plateau semantics: each seed's plateau iteration (same |1−l/l'| rule as
    :func:`fit`) is recorded in ``info['n_iter']`` (shape (B,)); the batch
    stops only when EVERY seed has plateaued or at ``n_iter``. A plateaued
    seed keeps taking (by definition ~stationary) steps until the batch
    stops — its recorded n_iter is its own plateau point, matching what a
    sequential run would report.

    ``force_xla_kernels``: rewrite ``use_pallas=False`` on every kernel
    module first — Pallas grids don't batch under vmap, and at ensemble
    problem sizes the XLA kernel build is preferable regardless.

    Returns ``(trained_models, info)``: a length-B list, and info with
    ``losses`` of shape (iters, B), per-seed ``n_iter``, shared
    ``train_time``, and per-seed final ``loss``.
    """
    if loss_fn is None:
        loss_fn = lambda m: m.mll()
    if schedule is None:
        schedule = lambda_lr_schedule(lr_max=lr, lr_min=lr / 10.0)
    if scan_steps is None:
        scan_steps = default_scan_steps()
    takes_key = _loss_fn_takes_key(loss_fn)
    B = len(models)
    if B == 0:
        raise ValueError("fit_ensemble needs at least one model")
    if force_xla_kernels:
        from .module import map_static_attr
        models = [map_static_attr(m, "use_pallas", False) for m in models]

    treedef_full = jax.tree_util.tree_structure(models[0])
    for i, m in enumerate(models[1:], 1):
        if jax.tree_util.tree_structure(m) != treedef_full:
            raise ValueError(
                f"model {i} has a different architecture (treedef/static "
                "config mismatch) — fit_ensemble batches same-config models")
    mask = trainable_mask(models[0])
    parts = [partition(m, mask) for m in models]
    params0 = parts[0][0]
    flat_with_paths, ptreedef = jax.tree_util.tree_flatten_with_path(params0)
    decay_flags = [
        not any(str(getattr(k, "name", "")).startswith("raw_mixture")
                for k in kp)
        for kp, _ in flat_with_paths]

    leaves_per = [jax.tree_util.tree_leaves(p) for p, _ in parts]
    stacked = [jnp.stack([leaves_per[i][j] for i in range(B)])
               for j in range(len(leaves_per[0]))]
    static_list = [s for _, s in parts]
    static_b = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *static_list)

    tx = optax.adamw(learning_rate=schedule, weight_decay=weight_decay,
                     mask=decay_flags)
    opt_state = jax.vmap(tx.init)(stacked)
    keys = jax.random.split(jax.random.PRNGKey(seed), B)

    def one_step(leaves, opt_state, key, static):
        key, sub = jax.random.split(key)
        def neg_loss(lvs):
            p = jax.tree_util.tree_unflatten(ptreedef, lvs)
            m = combine(p, static)
            return -(loss_fn(m, sub) if takes_key else loss_fn(m))
        loss, grads = jax.value_and_grad(neg_loss)(leaves)
        updates, opt_state = tx.update(grads, opt_state, leaves)
        leaves = optax.apply_updates(leaves, updates)
        return leaves, opt_state, key, loss

    vstep = jax.vmap(one_step)

    @jax.jit
    def multi_step(leaves, opt_state, keys, static):
        def body(carry, _):
            p, o, k = carry
            p, o, k, loss = vstep(p, o, k, static)
            return (p, o, k), loss
        (leaves, opt_state, keys), losses = jax.lax.scan(
            body, (leaves, opt_state, keys), None,
            length=max(scan_steps, 1))
        return leaves, opt_state, keys, losses          # losses (S, B)

    losses = []
    plateau_id = np.zeros(B, dtype=int)
    last_loss = np.full(B, 1e-9)
    deltas = np.zeros((patience, B))
    eff_n_iter = np.full(B, n_iter, dtype=int)
    plateaued = np.zeros(B, dtype=bool)
    start = time.time()

    def check_plateau(i, new_loss):
        """Vectorized per-seed plateau test; returns True when ALL seeds
        have plateaued (the batch stop condition)."""
        nonlocal plateau_id, last_loss, plateaued
        if criterion == "max":
            flat = (i > 0) & (np.abs(1 - new_loss / last_loss) < loss_thresh)
            plateau_id = np.where(flat, plateau_id + 1, 0)
            newly = (~plateaued) & (plateau_id > patience)
        elif criterion == "mean":
            deltas[1:] = deltas[:-1]
            deltas[0] = np.abs(1 - new_loss / last_loss)
            newly = (~plateaued) & (i >= patience) \
                & (deltas.mean(axis=0) < loss_thresh)
        else:
            raise ValueError("Criterion not recognized")
        eff_n_iter[newly] = i
        plateaued |= newly
        last_loss = new_loss
        return bool(plateaued.all())

    i = 0
    while i < n_iter:
        stacked, opt_state, keys, chunk_losses = multi_step(
            stacked, opt_state, keys, static_b)
        stop = False
        for j, lv in enumerate(np.asarray(chunk_losses)):
            losses.append(lv)
            if print_loss and (i + j) % freq_print == 0:
                print(f"iter {i + j}: loss {np.array2string(lv, precision=4)}")
            if check_plateau(i + j, lv):
                stop = True
                break
        i += max(scan_steps, 1)
        if stop:
            break

    train_time = time.time() - start
    losses = np.asarray(losses)                          # (iters, B)
    trained = []
    for b in range(B):
        leaves_b = [jax.device_get(s[b]) for s in stacked]
        p = jax.tree_util.tree_unflatten(
            ptreedef, [jnp.asarray(x) for x in leaves_b])
        trained.append(combine(p, static_list[b]))
    info = dict(n_iter=eff_n_iter, train_time=train_time, losses=losses,
                loss=last_loss.copy())
    return trained, info


def fit_two_phase(model, coarse_loss_fn, fine_loss_fn, n_iter: int = 10000,
                  fine_frac: float = 0.25, lr: float = 1e-2,
                  fine_lr: float = None, **kwargs):
    """Precision-escalated training: descend with a cheap low-precision MLL,
    then refine with the full-precision one.

    Motivation (results/PERF_NOTES.md "precision floor"): bf16/int8 CG
    matvecs train as if an extra jitter of ~‖K‖·4e-3 / ~8e-3 were added to
    the likelihood — fast and accurate while the loss is descending, but
    systematically biased once the learned noise approaches that scale. The
    two-phase schedule gets the low-precision throughput for the bulk of
    training and the fp32 optimum:

        coarse = lambda m, key: m.mll(key=key, iterative=True,
                                      max_cg_iters=16, cg_tol=2e-2,
                                      matvec_bf16=True, precond_rank=256,
                                      num_probes=8)
        fine   = lambda m, key: m.mll(key=key, iterative=True,
                                      max_cg_iters=64, cg_tol=1e-4,
                                      precond_rank=256, num_probes=8)
        model, info = fit_two_phase(model, coarse, fine, n_iter=50_000)

    Phase 1 runs ``fit(model, coarse_loss_fn)`` for (1−fine_frac)·n_iter
    (or until plateau); phase 2 continues from the phase-1 parameters with
    ``fine_loss_fn`` at ``fine_lr`` (default lr/10 — the refinement starts
    near the coarse optimum) for the remaining budget. Returns
    (model, info) with concatenated losses, summed n_iter/train_time, and
    per-phase sub-infos under ``info['phases']``.
    """
    n_coarse = int(n_iter * (1.0 - fine_frac))
    n_fine = n_iter - n_coarse
    model, info1 = fit(model, coarse_loss_fn, n_iter=n_coarse, lr=lr,
                       **kwargs)
    model, info2 = fit(model, fine_loss_fn, n_iter=n_fine,
                       lr=fine_lr if fine_lr is not None else lr / 10.0,
                       **kwargs)
    info = dict(
        n_iter=info1["n_iter"] + info2["n_iter"],
        train_time=info1["train_time"] + info2["train_time"],
        losses=np.concatenate([info1["losses"], info2["losses"]]),
        loss=info2["loss"],
        phases=[info1, info2],
    )
    return model, info


def fit_svgp_minibatch(model, batch_size: int = 256, n_iter: int = 10000,
                       lr: float = 1e-2, schedule=None, weight_decay: float = 1e-2,
                       loss_thresh: float = 2.5e-6, patience: int = 500,
                       criterion: str = "max", seed: int = 0,
                       scan_steps: int = None, print_loss: bool = False,
                       freq_print: int = 1000):
    """Stochastic-variational (minibatch) training for SVGP models.

    New capability beyond the reference (which trains the variational model
    full-batch, experiments.py:256-284): per-step uniform-with-replacement
    minibatches drive ``model.elbo(x=xb, y=yb, num_data=n)`` — the standard
    SVI estimator, with the same AdamW/schedule/plateau machinery as
    :func:`fit`. The whole sample-batch-step sequence is one XLA program.
    """
    import jax
    import jax.numpy as jnp
    import optax

    X, Y = model.train_x, model.train_y
    n = X.shape[0]
    batch_size = min(batch_size, n)

    def loss_fn(m, key):
        idx = jax.random.choice(key, n, (batch_size,), replace=True)
        return m.elbo(x=X[idx], y=Y[idx], num_data=n)

    # plateau detection on a noisy SVI loss needs the rolling-mean criterion
    criterion = "mean" if criterion == "max" else criterion
    return fit(model, loss_fn, n_iter=n_iter, lr=lr, schedule=schedule,
               weight_decay=weight_decay, loss_thresh=loss_thresh,
               patience=patience, criterion=criterion, seed=seed,
               scan_steps=scan_steps, print_loss=print_loss,
               freq_print=freq_print)

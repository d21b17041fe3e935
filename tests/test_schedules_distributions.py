"""Unit tests for the LR schedules (torch-oracle parity with the reference's
LambdaLR/ExponentialLR, experiments.py:84,251) and the structured covariance
containers in distributions.py that are public API (BatchIndepCov vs its
dense interleaved equivalent)."""
import math

import numpy as np
import pytest

import projected_lmc_tpu as pl
from projected_lmc_tpu.distributions import BatchIndepCov, DenseCov
from projected_lmc_tpu.training import exponential_schedule, lambda_lr_schedule


class TestLambdaLRSchedule:
    def test_matches_torch_lambdalr(self):
        """experiments.py:84: LambdaLR(lambda i: i/le*(lr_min/lr) + (le-i)/le
        if i <= le else lr_min/lr) — compare against real torch.optim."""
        torch = pytest.importorskip("torch")
        lr_max, lr_min, le = 1e-2, 1e-3, 100
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([p], lr=lr_max)
        lam = (lambda i: i / le * (lr_min / lr_max) + (le - i) / le
               if i <= le else lr_min / lr_max)
        sched = torch.optim.lr_scheduler.LambdaLR(opt, lam)
        ours = lambda_lr_schedule(lr_max=lr_max, lr_min=lr_min, last_epoch=le)
        for i in range(0, 140, 7):
            got = float(ours(i))
            want = lr_max * lam(i)
            np.testing.assert_allclose(got, want, rtol=1e-6,
                                       err_msg=f"step {i}")
        # and the torch scheduler itself agrees at a few sampled steps
        torch_lrs = []
        for i in range(140):
            torch_lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
        for i in (0, 25, 50, 99, 100, 120, 139):
            np.testing.assert_allclose(float(ours(i)), torch_lrs[i],
                                       rtol=1e-6, err_msg=f"torch step {i}")

    def test_endpoints(self):
        s = lambda_lr_schedule(lr_max=1e-2, lr_min=1e-3, last_epoch=10000)
        np.testing.assert_allclose(float(s(0)), 1e-2, rtol=1e-6)
        np.testing.assert_allclose(float(s(10000)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(s(20000)), 1e-3, rtol=1e-6)


class TestExponentialSchedule:
    def test_matches_torch_exponentiallr(self):
        """experiments.py:251: gamma = exp(log(lr_min/lr)/n_iter)."""
        torch = pytest.importorskip("torch")
        lr, lr_min, n_iter = 5e-3, 1e-4, 200
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([p], lr=lr)
        gamma = math.exp(math.log(lr_min / lr) / n_iter)
        sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma)
        ours = exponential_schedule(lr=lr, lr_min=lr_min, n_iter=n_iter)
        for i in range(n_iter + 20):
            np.testing.assert_allclose(float(ours(i)),
                                       opt.param_groups[0]["lr"],
                                       rtol=2e-5, err_msg=f"step {i}")
            opt.step()
            sched.step()

    def test_reaches_lr_min_at_n_iter(self):
        s = exponential_schedule(lr=1e-2, lr_min=1e-3, n_iter=500)
        np.testing.assert_allclose(float(s(500)), 1e-3, rtol=1e-4)


class TestBatchIndepCov:
    def _mats(self, t=3, n=5, seed=0):
        rng = np.random.default_rng(seed)
        A = rng.standard_normal((t, n, n)).astype(np.float64)
        covs = A @ np.swapaxes(A, -1, -2) + n * np.eye(n)
        return covs

    def test_dense_diag_consistent(self):
        covs = self._mats()
        b = BatchIndepCov(covs)
        dense = np.asarray(b.dense())
        # dense() interleaves tasks fastest (gpytorch MultitaskMVN convention)
        t, n = covs.shape[0], covs.shape[-1]
        for task in range(t):
            idx = np.arange(n) * t + task
            np.testing.assert_allclose(dense[np.ix_(idx, idx)], covs[task],
                                       rtol=1e-12)
        # off-task blocks are zero (independence)
        i0 = np.arange(n) * t
        i1 = np.arange(n) * t + 1
        assert np.all(dense[np.ix_(i0, i1)] == 0)
        np.testing.assert_allclose(np.asarray(b.diag()),
                                   np.diagonal(dense).reshape(n, t),
                                   rtol=1e-12)

    def test_log_prob_matches_dense(self):
        covs = self._mats()
        t, n = covs.shape[0], covs.shape[-1]
        rng = np.random.default_rng(1)
        delta = rng.standard_normal((n, t))
        b = BatchIndepCov(covs)
        d = DenseCov(np.asarray(b.dense()), n, t)
        np.testing.assert_allclose(float(b.log_prob_centered(delta)),
                                   float(d.log_prob_centered(delta)),
                                   rtol=1e-6)

    def test_log_prob_matches_scipy(self):
        from scipy.stats import multivariate_normal
        covs = self._mats(t=2, n=4, seed=2)
        t, n = covs.shape[0], covs.shape[-1]
        rng = np.random.default_rng(3)
        delta = rng.standard_normal((n, t))
        b = BatchIndepCov(covs)
        want = sum(multivariate_normal(np.zeros(n), covs[j]).logpdf(delta[:, j])
                   for j in range(t))
        np.testing.assert_allclose(float(b.log_prob_centered(delta)), want,
                                   rtol=1e-6)

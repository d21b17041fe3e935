"""projected_lmc_tpu — TPU-native multitask Gaussian-process framework.

A from-scratch JAX/XLA rebuild of the capabilities of QWERTY6191/projected-lmc
(exact/variational/projected LMC multitask GPs) with the entire numeric stack
owned in-framework: jit-stable Cholesky ladders, Kronecker joint
diagonalization, Woodbury LMC solvers, SGPR low-rank paths, and pjit sharding
over TPU meshes.
"""

__version__ = "0.1.0"

from .module import Module, trainable_mask, partition, combine
from . import constraints
from .kernels import (Kernel, RBFKernel, MaternKernel, SplineKernel,
                      SpectralMixtureKernel, ScaleKernel, AdditiveKernel,
                      handle_covar)
from .means import ZeroMean, ConstantMean, LinearMean, PolynomialMean
from .likelihoods import GaussianLikelihood, MultitaskGaussianLikelihood, FixedTaskNoise
from .distributions import (MultivariateNormal, MultitaskMultivariateNormal,
                            KronCov, SumKronRank1Cov, BatchIndepCov, DenseCov)
from .ops import (safe_cholesky, init_lmc_coefficients, latin_hypercube, sobol)
from .models import (ExactGPModel, MultitaskGPModel, VariationalMultitaskGPModel,
                     ProjectedGPModel, LMCMixingMatrix)
from .mlls import exact_mll, projected_lmc_mll, loo_pseudo_likelihood
from .training import (fit, fit_two_phase, fit_svgp_minibatch,
                       lambda_lr_schedule, exponential_schedule)
from .metrics import compute_metrics

# reference-compatible aliases (projected_lmc.py:107, :1158)
handle_covar_ = handle_covar
ProjectedLMCmll = projected_lmc_mll
LeaveOneOutPseudoLikelihood = loo_pseudo_likelihood

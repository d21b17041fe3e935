from .cholesky import (safe_cholesky, safe_cholesky_with_jitter, solve_triangular,
                       cho_solve, logdet_from_chol, chol_inverse_diag, add_jitter,
                       symmetrize)
from .init_ops import init_lmc_coefficients, randomized_svd, latin_hypercube, sobol
from . import kron
from . import woodbury

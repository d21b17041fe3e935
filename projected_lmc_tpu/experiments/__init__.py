from .synthetic import generate_synthetic
from .driver import run_study, build_models, DEFAULT_PARAMS, DEFAULT_SWEEPS

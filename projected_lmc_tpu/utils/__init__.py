from .checkpoint import save_model, load_model
from .profiling import profile_trace, Timer
from .tpu import ensure_tpu

from .base import model_logprob
from .diagnostics import effective_sample_size, potential_scale_reduction
from .hmc import hmc
from .nuts import (
    nuts,
    nuts_slow_window_close,
    nuts_warmup_init,
    nuts_warmup_window,
    warmup_schedule,
)

__all__ = [
    "model_logprob",
    "hmc",
    "nuts",
    "nuts_warmup_init",
    "nuts_warmup_window",
    "nuts_slow_window_close",
    "warmup_schedule",
    "effective_sample_size",
    "potential_scale_reduction",
]

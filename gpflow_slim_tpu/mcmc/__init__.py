from .base import model_logprob
from .diagnostics import effective_sample_size, potential_scale_reduction
from .hmc import hmc
from .nuts import nuts

__all__ = [
    "model_logprob",
    "hmc",
    "nuts",
    "effective_sample_size",
    "potential_scale_reduction",
]

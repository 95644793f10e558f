from .model import GPModel, Model
from .gpr import GPR

__all__ = ["Model", "GPModel", "GPR"]

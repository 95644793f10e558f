from .optimize import fit, fit_lbfgs, make_step_fn

__all__ = ["fit", "fit_lbfgs", "make_step_fn"]

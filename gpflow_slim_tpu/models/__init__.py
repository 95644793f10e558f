from .model import GPModel, Model
from .gpr import GPR
from .cg_gpr import GPRCG
from .sgpr import GPRFITC, SGPR
from .svgp import SVGP
from .vgp import VGP, VGPOpperArchambeau
from .gpmc import GPMC
from .sgpmc import SGPMC
from .gplvm import GPLVM, BayesianGPLVM, pca_reduce

__all__ = [
    "Model", "GPModel", "GPR", "GPRCG", "SGPR", "GPRFITC", "SVGP", "VGP", "VGPOpperArchambeau",
    "GPMC", "SGPMC", "GPLVM", "BayesianGPLVM", "pca_reduce",
]

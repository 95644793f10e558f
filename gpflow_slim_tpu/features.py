"""Inducing features (ref:gpflowSlim/features.py).

``InducingPoints(Z)`` holds a trainable (M, D) ``Param``; ``Kuu``/``Kuf``
dispatch on feature type. ``Multiscale`` implements the Titsias-2009
multiscale RBF inducing feature.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import config, kernels
from .params import Module, Param
from .transforms import positive

__all__ = ["InducingFeature", "InducingPoints", "Multiscale", "Kuu", "Kuf",
           "inducingpoint_wrapper"]


class InducingFeature(Module):
    def __len__(self):
        raise NotImplementedError


class InducingPoints(InducingFeature):
    def __init__(self, Z, name="inducing_points"):
        Z = np.asarray(Z)
        if Z.ndim != 2:
            raise ValueError(f"Z must be rank-2 (M, D); got shape {Z.shape}")
        self.Z = Param(Z, name=f"{name}/Z")
        self._num = int(Z.shape[0])

    def __len__(self):
        return self._num

    def Kuu(self, kern, jitter=0.0):
        M = len(self)
        Zv = self.Z.value
        return kern.K(Zv) + jitter * jnp.eye(M, dtype=Zv.dtype)

    def Kuf(self, kern, Xnew):
        return kern.K(self.Z.value, Xnew)


class Multiscale(InducingPoints):
    """Multiscale inducing features for RBF kernels (Titsias/NIPS'09 lineage).

    Each inducing input Z_m carries its own scale vector; closed-form Kuu/Kuf
    exist for the RBF kernel only.
    """

    def __init__(self, Z, scales=None, name="multiscale"):
        super().__init__(Z, name=name)
        Z = np.asarray(Z)
        scales = np.ones_like(Z) if scales is None else np.asarray(scales)
        self.scales = Param(scales, transform=positive(), name=f"{name}/scales")

    @staticmethod
    def _cust_square_dist(A, B, sc):
        # Σ_d ((A[:,None,d] − B[None,:,d]) / sc)²; sc broadcasts over axis 0.
        return jnp.sum(jnp.square((A[:, None, :] - B[None, :, :]) / sc), axis=-1)

    def Kuf(self, kern, Xnew):
        if not isinstance(kern, kernels.RBF):
            raise NotImplementedError("Multiscale features require an RBF kernel")
        Xnew, _ = kern._slice(Xnew, None)
        Zmu = self.Z.value
        Zlen = self.scales.value
        idls = kern.lengthscales.value + Zlen  # (M, D)
        d = self._cust_square_dist(Xnew, Zmu, idls)  # (N, M)
        scale = jnp.prod(kern.lengthscales.value / idls, axis=-1)  # (M,)
        return (
            jnp.squeeze(kern.variance.value) * jnp.exp(-0.5 * d) * scale[None, :]
        ).T  # (M, N)

    def Kuu(self, kern, jitter=0.0):
        if not isinstance(kern, kernels.RBF):
            raise NotImplementedError("Multiscale features require an RBF kernel")
        Zmu = self.Z.value
        Zlen = self.scales.value
        idls2 = jnp.square(kern.lengthscales.value + Zlen)  # (M, D)
        sc = jnp.sqrt(
            idls2[None, :, :] + idls2[:, None, :]
            - jnp.square(kern.lengthscales.value)
        )  # (M, M, D)
        d = jnp.sum(
            jnp.square((Zmu[:, None, :] - Zmu[None, :, :]) / sc), axis=-1
        )
        K = (
            jnp.squeeze(kern.variance.value)
            * jnp.exp(-0.5 * d)
            * jnp.prod(kern.lengthscales.value / sc, axis=-1)
        )
        M = len(self)
        return K + jitter * jnp.eye(M, dtype=K.dtype)


def Kuu(feat: InducingFeature, kern, jitter=0.0):
    return feat.Kuu(kern, jitter=jitter)


def Kuf(feat: InducingFeature, kern, Xnew):
    return feat.Kuf(kern, Xnew)


def inducingpoint_wrapper(feat, Z):
    """Accept either an InducingFeature or a raw Z array (reference helper)."""
    if feat is not None and Z is not None:
        raise ValueError("Cannot pass both an InducingFeature and Z")
    if feat is None and Z is None:
        raise ValueError("You must pass either an InducingFeature or Z")
    if Z is not None:
        feat = InducingPoints(Z)
    return feat

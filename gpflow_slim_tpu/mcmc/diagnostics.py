"""MCMC diagnostics: split-R̂ and bulk effective sample size.

Standard Stan/Vehtari-et-al definitions, implemented host-side on numpy
arrays of shape (num_chains, num_samples, dim) — diagnostics are not in the
hot path.
"""

from __future__ import annotations

import numpy as np

__all__ = ["potential_scale_reduction", "effective_sample_size"]


def _split_chains(x):
    # (C, N, D) -> (2C, N//2, D)
    C, N = x.shape[:2]
    half = N // 2
    return np.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)


def potential_scale_reduction(samples) -> np.ndarray:
    """Split-R̂ per dimension; samples (C, N, D). Values ≈1 indicate mixing."""
    x = _split_chains(np.asarray(samples))
    C, N, D = x.shape
    chain_means = x.mean(axis=1)  # (C, D)
    chain_vars = x.var(axis=1, ddof=1)  # (C, D)
    W = chain_vars.mean(axis=0)
    B = N * chain_means.var(axis=0, ddof=1)
    var_hat = (N - 1) / N * W + B / N
    return np.sqrt(var_hat / W)


def _autocovariance(x):
    """Per-chain autocovariance via FFT; x (C, N)."""
    C, N = x.shape
    xc = x - x.mean(axis=1, keepdims=True)
    n_fft = int(2 ** np.ceil(np.log2(2 * N)))
    f = np.fft.rfft(xc, n=n_fft, axis=1)
    acov = np.fft.irfft(f * np.conj(f), n=n_fft, axis=1)[:, :N].real
    return acov / N


def effective_sample_size(samples) -> np.ndarray:
    """Bulk ESS per dimension (Geyer initial monotone sequence); (C, N, D)."""
    x = _split_chains(np.asarray(samples))
    C, N, D = x.shape
    out = np.zeros(D)
    for d in range(D):
        xd = x[:, :, d]
        acov = _autocovariance(xd)  # (C, N)
        chain_var = acov[:, 0] * N / (N - 1.0)
        W = chain_var.mean()
        mean_acov = acov.mean(axis=0)
        B_over_n = xd.mean(axis=1).var(ddof=1) if C > 1 else 0.0
        var_hat = W * (N - 1.0) / N + B_over_n
        if var_hat <= 0:
            out[d] = float(C * N)
            continue
        rho = 1.0 - (W - mean_acov) / var_hat  # (N,)
        # Geyer: sum consecutive pairs while positive & monotone
        tau = 1.0
        prev_pair = np.inf
        t = 1
        while t + 1 < N:
            pair = rho[t] + rho[t + 1]
            if pair < 0:
                break
            pair = min(pair, prev_pair)  # enforce monotone decrease
            tau += 2.0 * pair
            prev_pair = pair
            t += 2
        out[d] = C * N / tau
    return out

"""Checkpointing, logging, determinism, and deep-kernel joint training."""

import os

import jax
import jax.numpy as jnp
import numpy as np

import gpflow_slim_tpu as gfs
from gpflow_slim_tpu import utils
from gpflow_slim_tpu.kernels_deep import DeepKernel, mlp_warp


def test_checkpoint_roundtrip_model(tmp_path):
    rng = np.random.RandomState(0)
    X, Y = rng.randn(20, 1), rng.randn(20, 1)
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1))
    m1, _ = gfs.training.fit(m, num_steps=30, learning_rate=0.05)
    path = utils.save_checkpoint(str(tmp_path / "ckpt"), m1, step=30)
    assert path.endswith("-30")
    m2 = utils.load_checkpoint(path, m)  # template = untrained model
    assert abs(float(m1.objective()) - float(m2.objective())) < 1e-12
    assert utils.latest_checkpoint(str(tmp_path / "ckpt")) == path


def test_checkpoint_opt_state_and_rng(tmp_path):
    import optax

    rng = np.random.RandomState(0)
    X, Y = rng.randn(15, 1), rng.randn(15, 1)
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1))
    opt = optax.adam(1e-2)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    state = {"leaves": leaves, "opt": opt.init(leaves),
             "rng": jax.random.PRNGKey(3), "step": jnp.asarray(7)}
    p = utils.save_checkpoint(str(tmp_path / "train_state"), state)
    restored = utils.load_checkpoint(p, state)
    assert int(restored["step"]) == 7
    for a, b in zip(leaves, restored["leaves"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_metrics_logger_jsonl(tmp_path):
    import json

    path = str(tmp_path / "metrics.jsonl")
    with utils.MetricsLogger(path) as log:
        log.log(0, loss=1.5, acc=np.float32(0.5))
        log.log(1, loss=jnp.asarray(1.2), acc=0.6)
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["loss"] == 1.5 and rows[1]["step"] == 1


def test_determinism_check():
    rng = np.random.RandomState(0)
    X, Y = rng.randn(12, 1), rng.randn(12, 1)
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1))
    obj = jax.jit(lambda mm: mm.objective())
    assert utils.check_determinism(obj, m)


def test_deep_kernel_joint_training():
    rng = np.random.RandomState(0)
    N = 80
    X = rng.uniform(-1, 1, (N, 2))
    # target depends on a rotation of the inputs — warped kernel can learn it
    Y = np.sin(3 * (X[:, :1] + 0.5 * X[:, 1:2])) + 0.05 * rng.randn(N, 1)

    warp_fn, warp_params = mlp_warp(jax.random.PRNGKey(0), [2, 8, 1])
    kern = DeepKernel(2, gfs.kernels.RBF(1, lengthscales=0.5), warp_fn,
                      warp_params)
    m = gfs.models.GPR(X, Y, kern=kern)
    before = float(m.objective())
    m2, _ = gfs.training.fit(m, num_steps=300, learning_rate=0.02)
    after = float(m2.objective())
    assert after < before - 5.0
    # warp params actually moved (joint training through the kernel);
    # DeepKernel wraps them as Params
    w0 = np.asarray(warp_params[0]["W"])
    w1 = np.asarray(m2.kern.warp_params[0]["W"].value)
    assert np.abs(w0 - w1).max() > 1e-3
    # predictions still sane
    mu, _ = m2.predict_f(X)
    rmse = float(np.sqrt(np.mean((np.asarray(mu) - Y) ** 2)))
    assert rmse < 0.2


def test_deep_kernel_in_svgp():
    rng = np.random.RandomState(1)
    N = 60
    X = rng.uniform(-1, 1, (N, 2))
    Y = (X[:, :1] + X[:, 1:2] > 0).astype(float)
    warp_fn, warp_params = mlp_warp(jax.random.PRNGKey(1), [2, 6, 2])
    kern = DeepKernel(2, gfs.kernels.Matern32(2), warp_fn, warp_params)
    m = gfs.models.SVGP(X, Y, kern=kern,
                        likelihood=gfs.likelihoods.Bernoulli(),
                        Z=X[:10].copy())
    # at the whitened init (q_mu=0, q_sqrt=I) the ELBO is exactly
    # independent of the kernel warp — perturb q_mu to probe grad flow
    m.q_mu = gfs.params.Param(0.3 * rng.randn(10, 1), name="q_mu")
    g = jax.grad(lambda mm: mm.objective())(m)
    gW = np.asarray(g.kern.warp_params[0]["W"].unconstrained)
    assert np.isfinite(gW).all() and np.abs(gW).max() > 0


def test_training_resume_from_checkpoint_bit_identical(tmp_path):
    """Recovery story (SURVEY §5): train 40 steps straight vs train 20,
    checkpoint (params + opt state), 'restart', resume 20 — identical."""
    import optax

    from gpflow_slim_tpu import utils
    from gpflow_slim_tpu.training.optimize import make_step_fn

    rng = np.random.RandomState(0)
    X, Y = rng.randn(25, 1), rng.randn(25, 1)
    m = gfs.models.GPR(X, Y, kern=gfs.kernels.RBF(1))
    opt = optax.adam(0.05)
    step_fn, (leaves, treedef, opt_state) = make_step_fn(m, opt)
    step_jit = jax.jit(step_fn)

    # straight-through 40 steps
    l1, s1 = leaves, opt_state
    for _ in range(40):
        l1, s1, _ = step_jit(l1, s1)

    # 20 steps, checkpoint, restore into fresh state, 20 more
    l2, s2 = leaves, opt_state
    for _ in range(20):
        l2, s2, _ = step_jit(l2, s2)
    p = utils.save_checkpoint(str(tmp_path / "train"), {"l": l2, "s": s2},
                              step=20)
    restored = utils.load_checkpoint(p, {"l": leaves, "s": opt_state})
    l3, s3 = restored["l"], restored["s"]
    for _ in range(20):
        l3, s3, _ = step_jit(l3, s3)

    for a, b in zip(l1, l3):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

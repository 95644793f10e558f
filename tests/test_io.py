"""Native data loader: GFSB roundtrip, gather, prefetch pipeline, fallback."""

import jax
import numpy as np
import pytest

from gpflow_slim_tpu import io as gio


@pytest.fixture
def dataset_file(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(500, 3).astype(np.float32)
    path = str(tmp_path / "data.gfsb")
    gio.write_gfsb(path, data)
    return path, data


def test_roundtrip_and_gather_native(dataset_file):
    path, data = dataset_file
    ds = gio.BinaryDataset(path)
    assert (ds.rows, ds.cols) == (500, 3)
    idx = np.array([0, 7, 499, 3, 3])
    np.testing.assert_array_equal(ds.gather(idx), data[idx])
    ds.close()


def test_gather_fallback_matches_native(dataset_file):
    path, data = dataset_file
    ds_py = gio.BinaryDataset(path, use_native=False)
    assert not ds_py.native
    idx = np.random.RandomState(1).randint(0, 500, 64)
    np.testing.assert_array_equal(ds_py.gather(idx), data[idx])


def test_prefetch_pipeline_equivalence(dataset_file):
    path, data = dataset_file
    ds = gio.BinaryDataset(path)
    key = jax.random.PRNGKey(0)
    batches = list(ds.minibatches(key, batch_size=32, num_batches=5))
    assert len(batches) == 5
    # replay the same keys synchronously and compare
    keys = jax.random.split(key, 5)
    for t, b in enumerate(batches):
        idx = np.asarray(
            jax.random.randint(keys[t], (32,), 0, ds.rows), dtype=np.int64
        )
        np.testing.assert_array_equal(b, data[idx])
    ds.close()


def test_native_loader_compiled(dataset_file):
    path, _ = dataset_file
    ds = gio.BinaryDataset(path)
    # the environment has a C toolchain — the native path must be active
    assert ds.native, "native loader failed to build/load"
    ds.close()


def test_bad_magic_rejected(tmp_path):
    p = str(tmp_path / "junk.gfsb")
    with open(p, "wb") as f:
        f.write(b"NOPE" + b"\0" * 32)
    with pytest.raises(ValueError):
        gio.BinaryDataset(p, use_native=False)


def test_svgp_training_from_disk(dataset_file, tmp_path):
    # end-to-end: stream minibatches from disk into SVGP steps
    import jax.numpy as jnp
    import optax

    import gpflow_slim_tpu as gfs
    from gpflow_slim_tpu.parallel.dp import make_svgp_step

    rng = np.random.RandomState(2)
    X = rng.uniform(0, 1, (500, 1)).astype(np.float32)
    Y = (np.sin(8 * X) > 0).astype(np.float32)
    path = str(tmp_path / "xy.gfsb")
    gio.write_gfsb(path, np.hstack([X, Y]))

    m = gfs.models.SVGP(X, Y, kern=gfs.kernels.RBF(1, lengthscales=0.3),
                        likelihood=gfs.likelihoods.Bernoulli(),
                        Z=np.linspace(0, 1, 8)[:, None])
    before = float(m.objective())

    opt = optax.adam(0.05)
    mask = gfs.params.trainable_leaf_mask(m)
    leaves, treedef = jax.tree_util.tree_flatten(m)
    opt_state = opt.init(leaves)

    @jax.jit
    def step(leaves, opt_state, xb, yb):
        mm = jax.tree_util.tree_unflatten(treedef, leaves)
        loss, grads = jax.value_and_grad(
            lambda z: -(z.build_likelihood_batch(xb, yb) + z.log_prior())
        )(mm)
        g = [gr * t for gr, t in zip(jax.tree_util.tree_leaves(grads), mask)]
        upd, opt_state = opt.update(g, opt_state, leaves)
        upd = [u * t for u, t in zip(upd, mask)]
        return [l + u for l, u in zip(leaves, upd)], opt_state, loss

    ds = gio.BinaryDataset(path)
    for batch in ds.minibatches(jax.random.PRNGKey(0), batch_size=128,
                                num_batches=60):
        xb, yb = batch[:, :1], batch[:, 1:]
        leaves, opt_state, loss = step(leaves, opt_state, jnp.asarray(xb),
                                       jnp.asarray(yb))
    ds.close()
    m2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert float(m2.objective()) < before - 10

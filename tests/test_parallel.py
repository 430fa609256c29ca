"""Multi-chip parallelism: spatial (W-axis) sharding and s=6/7 scaling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.data.datasets import synthetic_dataset
from geniconet_tpu.data.pipeline import Batches
from geniconet_tpu.geometry import ico
from geniconet_tpu.nn.models import IcoAE
from geniconet_tpu.parallel import mesh as mesh_lib
from geniconet_tpu.train.config import Config
from geniconet_tpu.train.trainer import Trainer


def _cfg(s=4, widths=(4, 6, 8)):
    cfg = Config()
    cfg.model.name = "ico2ico"
    cfg.model.subdivisions = s
    cfg.model.widths = widths
    cfg.train.batch_size = 8
    cfg.train.log_grad_freq = 0
    return cfg


def test_spatial_sharding_train_step_matches_unsharded():
    """(data=2, spatial=4) mesh: one full train step on W-sharded inputs
    must compile, run, and reproduce the unsharded loss."""
    cfg = _cfg(s=4)
    ds = synthetic_dataset(4, 8, seed=0)

    # unsharded
    tr0 = Trainer(cfg)
    st0 = tr0.init_state(ds.inputs[:1], seed=3)
    b0 = Batches(ds, 8, shuffle=False)
    x0, y0, w0 = next(iter(b0.epoch()))
    _, m0, _, _ = tr0._jit_train_step(st0, x0, y0, w0, 0)
    loss0 = float(jax.device_get(m0["total"]))

    # sharded: batch over 'data', grid W axis over 'spatial'
    mesh = mesh_lib.make_mesh_2d(2, 4)
    sharding = mesh_lib.spatial_batch_sharding(mesh)
    tr1 = Trainer(cfg, mesh=mesh)
    st1 = tr1.init_state(ds.inputs[:1], seed=3)
    x1 = jax.device_put(ds.inputs[:8], sharding)
    y1 = jax.device_put(ds.targets[:8], mesh_lib.replicated_sharding(mesh))
    w1 = jax.device_put(np.ones(8, np.float32), mesh_lib.replicated_sharding(mesh))
    _, m1, _, _ = tr1._jit_train_step(st1, x1, y1, w1, 0)
    loss1 = float(jax.device_get(m1["total"]))
    np.testing.assert_allclose(loss0, loss1, rtol=1e-4)


@pytest.mark.parametrize("s", [6, 7])
def test_subdivision_scaling_shapes(s):
    """s=6/7 stretch: model builds, latent/output shapes follow 2^s scaling
    (shape-only via eval_shape — no FLOPs)."""
    H, W = ico.grid_shape(s)
    x = jax.ShapeDtypeStruct((2, H, W, 3), jnp.float32)
    model = IcoAE(subdivisions=s)
    vs = jax.eval_shape(
        lambda k, x: model.init(k, x), {"params": jax.random.key(0)}, x
    )
    z = jax.eval_shape(lambda v, x: model.apply(v, x, method="encode"), vs, x)
    assert z.shape == (2, 5 * 2 ** (s - 3), 2 ** (s - 2), 256)
    out = jax.eval_shape(lambda v, x: model.apply(v, x), vs, x)
    assert out.shape == (2, H, W, 3)


def test_subdivision6_train_step_runs():
    """A real (tiny-width) s=6 train step executes on the 8-device mesh."""
    cfg = _cfg(s=6, widths=(2, 3, 4))
    ds = synthetic_dataset(6, 8, seed=1)
    mesh = mesh_lib.make_mesh(8)
    tr = Trainer(cfg, mesh=mesh)
    st = tr.init_state(ds.inputs[:1])
    b = Batches(ds, 8, shuffle=False, sharding=mesh_lib.data_sharding(mesh))
    x, y, wt = next(iter(b.epoch()))
    _, m, _, _ = tr._jit_train_step(st, x, y, wt, 0)
    assert np.isfinite(float(jax.device_get(m["total"])))

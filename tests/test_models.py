"""Model shape/e2e contracts: IcoAE and IcoVAE at small subdivision + s=5."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geniconet_tpu.geometry import ico
from geniconet_tpu.nn.models import IcoAE, IcoVAE, reparameterize


def _grid(s, B=2, C=3, seed=0):
    H, W = ico.grid_shape(s)
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))


def test_ae_shapes_small():
    s = 3
    model = IcoAE(subdivisions=s, widths=(8, 12, 16))
    x = _grid(s)
    vs = model.init({"params": jax.random.key(0)}, x, train=False)
    out, _ = model.apply(vs, x, train=True, mutable=["batch_stats"])
    assert out.shape == x.shape
    assert np.asarray(jnp.abs(out)).max() <= 1.0  # tanh head
    # latent shape: (B, 5*2^(s-3), 2^(s-2), w2)
    z = model.apply(vs, x, method="encode")
    assert z.shape == (2, 5 * 2 ** (s - 3), 2 ** (s - 2), 16)
    y = model.apply(vs, z, method="decode")
    assert y.shape == x.shape


def test_vae_shapes_small():
    s = 3
    model = IcoVAE(subdivisions=s, widths=(8, 12, 16), latent_features=24)
    x = _grid(s)
    vs = model.init({"params": jax.random.key(0), "reparam": jax.random.key(1)}, x)
    (recon, mu, logvar), _ = model.apply(
        vs, x, train=True, mutable=["batch_stats"], rngs={"reparam": jax.random.key(2)}
    )
    assert recon.shape == x.shape
    assert mu.shape == (2, 5 * 2 ** (s - 3), 2 ** (s - 2), 24)
    assert logvar.shape == mu.shape
    # eval-mode encode (running BN stats) has the right shapes and is finite
    mu2, logvar2 = model.apply(vs, x, method="encode")
    assert mu2.shape == mu.shape and logvar2.shape == logvar.shape
    assert np.isfinite(np.asarray(mu2)).all()
    # decode of the eval-mode mu reconstructs the right shape through tanh
    y = model.apply(vs, mu2, method="decode")
    assert y.shape == x.shape and np.abs(np.asarray(y)).max() <= 1.0


def test_reference_config_shapes():
    """The trained s=5 configuration: input (160, 64, 3), AE latent (20, 8, 256),
    VAE latent (20, 8, 512) — reference models.py:101-127, 268-286."""
    s = 5
    x = _grid(s, B=1)
    assert x.shape == (1, 160, 64, 3)
    ae = IcoAE(subdivisions=s)
    vs = jax.eval_shape(lambda k: ae.init(k, x), {"params": jax.random.key(0)})
    z_shape = jax.eval_shape(
        lambda v: ae.apply(v, x, method="encode"), vs
    )
    assert z_shape.shape == (1, 20, 8, 256)
    vae = IcoVAE(subdivisions=s)
    vvs = jax.eval_shape(
        lambda k: vae.init(k, x), {"params": jax.random.key(0), "reparam": jax.random.key(1)}
    )
    mu_shape, _ = jax.eval_shape(lambda v: vae.apply(v, x, method="encode"), vvs)
    assert mu_shape.shape == (1, 20, 8, 512)


def test_param_counts_reference_config():
    """Parameter budget sanity for the s=5 models (≈ millions, 7-tap convs)."""
    s = 5
    x = jnp.zeros((1, *ico.grid_shape(s), 3))
    ae = IcoAE(subdivisions=s)
    vs = jax.eval_shape(lambda k: ae.init(k, x), {"params": jax.random.key(0)})
    n_ae = sum(np.prod(l.shape) for l in jax.tree.leaves(vs["params"]))
    vae = IcoVAE(subdivisions=s)
    vvs = jax.eval_shape(
        lambda k: vae.init(k, x), {"params": jax.random.key(0), "reparam": jax.random.key(1)}
    )
    n_vae = sum(np.prod(l.shape) for l in jax.tree.leaves(vvs["params"]))
    # 7-tap parameterization of the reference architecture
    assert 3_000_000 < n_ae < 8_000_000, n_ae
    assert 4_000_000 < n_vae < 12_000_000, n_vae
    assert n_vae > n_ae


def test_vae_reparameterize_stats():
    rng = jax.random.key(0)
    mu = jnp.full((4, 1000), 2.0)
    logvar = jnp.full((4, 1000), np.log(0.25))
    z = reparameterize(rng, mu, logvar)
    assert abs(float(z.mean()) - 2.0) < 0.05
    assert abs(float(z.std()) - 0.5) < 0.05


def test_ae_overfits_single_batch():
    """A few gradient steps must reduce reconstruction loss (e2e trainability)."""
    import optax

    s = 3
    model = IcoAE(subdivisions=s, widths=(8, 8, 8))
    x = _grid(s, B=4) * 0.3
    vs = model.init({"params": jax.random.key(0)}, x)
    params, bstats = vs["params"], vs["batch_stats"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bstats, opt):
        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": bstats}, x, train=True, mutable=["batch_stats"]
            )
            return jnp.mean((out - x) ** 2), upd["batch_stats"]

        (loss, new_bstats), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt = tx.update(g, opt)
        return optax.apply_updates(params, updates), new_bstats, opt, loss

    losses = []
    for _ in range(30):
        params, bstats, opt, loss = step(params, bstats, opt)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], losses

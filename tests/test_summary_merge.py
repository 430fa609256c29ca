"""Model summary table + multi-checkpoint merge."""

import jax
import jax.numpy as jnp
import numpy as np

from geniconet_tpu.geometry import ico
from geniconet_tpu.nn.models import IcoAE
from geniconet_tpu.train import checkpoint as ckpt
from geniconet_tpu.train.summary import count_params, model_graph_dot, model_summary


def test_model_summary():
    s = 3
    model = IcoAE(subdivisions=s, widths=(4, 6, 8))
    x = jnp.zeros((1, *ico.grid_shape(s), 3))
    summ = model_summary(model, x)
    assert "encoder" in summ and "decoder" in summ and "total" in summ
    assert "taps" in summ
    # total line matches actual count
    vs = model.init({"params": jax.random.key(0)}, x, train=False)
    n = count_params(vs["params"])
    assert f"{n:,}" in summ


def test_model_graph_dot():
    """Graphviz drawing surface (torchsummary draw_graph parity)."""
    s = 3
    model = IcoAE(subdivisions=s, widths=(4, 6, 8))
    x = np.zeros((1, *ico.grid_shape(s), 3), np.float32)
    dot = model_graph_dot(model, x)
    assert dot.startswith("digraph model {") and dot.rstrip().endswith("}")
    assert "IcoAE" in dot
    # module nodes + containment edges + sequential stage edges exist
    assert "down0" in dot and "up0" in dot
    assert "->" in dot and "style=dashed" in dot
    # parameter shapes annotated on leaves
    assert "taps" in dot and "(" in dot
    # balanced braces/quotes so `dot` can parse it
    assert dot.count("{") == dot.count("}")
    assert dot.count('"') % 2 == 0


def test_merge_checkpoints(tmp_path):
    """Two half-checkpoints merge into one target (loadMultiModel parity)."""
    a = {"enc": {"w": np.ones((2, 2), np.float32)}, "dec": {"w": np.zeros((3,), np.float32)}}
    pa = str(tmp_path / "a.ckpt")
    pb = str(tmp_path / "b.ckpt")
    ckpt.save_checkpoint(pa, {"params": {"enc": {"w": np.full((2, 2), 5.0, np.float32)}}})
    ckpt.save_checkpoint(pb, {"params": {"dec": {"w": np.full((3,), 7.0, np.float32)}}})
    merged, matched, total = ckpt.merge_checkpoints(a, [pa, pb])
    assert matched == 2 and total == 2
    np.testing.assert_array_equal(merged["enc"]["w"], 5.0)
    np.testing.assert_array_equal(merged["dec"]["w"], 7.0)

"""Profiling utilities: FLOPs/params (thop equivalent), throughput counter,
feature-map artifact (SURVEY.md §5 tracing row)."""

import numpy as np

from vit_cnn_tpu.utils.profiling import (Throughput, clever_format,
                                         count_params, flops, profile_model)


def test_count_params_dense():
    import jax
    import flax.linen as nn

    m = nn.Dense(7)
    v = m.init(jax.random.PRNGKey(0), np.zeros((1, 3), np.float32))
    assert count_params(v) == 3 * 7 + 7


def test_flops_matmul():
    import jax.numpy as jnp

    a = jnp.ones((64, 128), jnp.float32)
    b = jnp.ones((128, 32), jnp.float32)
    f = flops(lambda a, b: a @ b, a, b)
    # 2*M*N*K FLOPs (cost model may fold minor terms)
    assert 0.5 * 2 * 64 * 128 * 32 <= f <= 2 * 2 * 64 * 128 * 32


def test_clever_format():
    assert clever_format(2.5e9) == "2.50G"
    assert clever_format(3.2e6) == "3.20M"
    assert clever_format(999.0) == "999.00"


def test_profile_model_endnet():
    from vit_cnn_tpu.models import get_model
    import jax
    import jax.numpy as jnp

    module, spec, hp = get_model(
        "EndNet", n_classes=5, n_bands=(20, 1), ignored_labels=[0],
        dataset="Synthetic")
    key = jax.random.PRNGKey(0)
    h = jnp.zeros((2, 1, 1, 20))
    l = jnp.zeros((2, 1, 1, 1))
    v = module.init({"params": key, "dropout": key}, h, l, train=False)
    out = profile_model(module, v, h, l, train=False)
    assert out["params"] == count_params(v) > 1000
    assert out["flops"] > 0
    assert out["flops_str"].endswith(("G", "M", "K"))


def test_throughput_counter():
    import jax.numpy as jnp

    t = Throughput(n_chips=2).start()
    t.update(100, fence_on=jnp.ones(3))
    t.update(100)
    assert t.items == 200
    assert t.rate() > 0


def test_featuremap_artifact(tmp_path):
    from vit_cnn_tpu.utils.viz import ArtifactWriter

    w = ArtifactWriter(str(tmp_path))
    fm = np.random.rand(4, 16, 7, 7).astype(np.float32)   # (B, C, H, W)
    w.show_featuremap("layer0", fm)
    assert (tmp_path / "featuremap_layer0.png").exists()

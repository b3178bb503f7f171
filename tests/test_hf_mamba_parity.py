"""MambaMixer parity vs HuggingFace's implementation — the exact component
the reference delegates its flagship compute to
(ref: Mutimodality_Mamba7.py:16,313-326 builds HF MambaMixer directly)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")


def test_mamba_mixer_matches_huggingface():
    import jax.numpy as jnp

    from transformers.models.mamba.modeling_mamba import (MambaConfig,
                                                          MambaMixer)

    from vit_cnn_tpu.nn.mamba import MambaMixer as OurMixer

    hidden, inter, n, k, tsr = 32, 16, 16, 4, 2
    cfg = MambaConfig(hidden_size=hidden, state_size=n, conv_kernel=k,
                      intermediate_size=inter, time_step_rank=tsr,
                      use_conv_bias=True, use_bias=False)
    ref = MambaMixer(cfg, layer_idx=0).eval()
    sd = ref.state_dict()

    t2j = lambda t: np.asarray(t.detach().numpy())
    params = {
        "in_proj": {"kernel": t2j(sd["in_proj.weight"]).T},
        "conv1d": {"kernel": t2j(sd["conv1d.weight"]).transpose(2, 1, 0),
                   "bias": t2j(sd["conv1d.bias"])},
        "x_proj": {"kernel": t2j(sd["x_proj.weight"]).T},
        "dt_proj": {"kernel": t2j(sd["dt_proj.weight"]).T,
                    "bias": t2j(sd["dt_proj.bias"])},
        "A_log": t2j(sd["A_log"]),
        "D": t2j(sd["D"]),
        "out_proj": {"kernel": t2j(sd["out_proj.weight"]).T},
    }

    rng = np.random.RandomState(0)
    x = rng.randn(3, 11, hidden).astype("float32")
    with torch.no_grad():
        want = t2j(ref(torch.from_numpy(x)))

    ours = OurMixer(hidden_size=hidden, intermediate_size=inter,
                    state_size=n, conv_kernel=k, time_step_rank=tsr,
                    use_pallas=False)
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

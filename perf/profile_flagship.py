"""Decomposition timing of the flagship inference chunk on the real TPU.
Fences on host transfers (block_until_ready is unreliable via tunnel)."""
import os, time, sys, numpy as np, jax, jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

def bench(fn, *args, n=8, label=""):
    f = jax.jit(fn)
    out = f(*args); _ = float(jnp.sum(out))
    t0 = time.time()
    for _i in range(n):
        out = f(*args)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / n
    print("%-42s %8.2f ms" % (label, dt * 1e3), flush=True)
    return dt

B = 4096
key = jax.random.PRNGKey(0)

# 1) full flagship forward on a gathered batch (no scene gather/scatter)
from vit_cnn_tpu.models.mm_mamba import MultimodalityMamba, TokenLearner, NonLocalBlock2D
m = MultimodalityMamba(img_size=9, in_channels1=144, in_channels2=1,
                       dim_embedding=32, n_classes=15)
h9 = jax.random.normal(key, (B, 9, 9, 144))
l9 = jax.random.normal(key, (B, 9, 9, 1))
v = m.init({"params": key, "dropout": key}, h9[:2], l9[:2], train=False)
bench(lambda a, b: m.apply(v, a, b, train=False), h9, l9,
      label="full flagship fwd (B=4096)")

# 2) the two Mamba backbones
from vit_cnn_tpu.nn.mamba import DirectionalMambaBackbone, MambaMixer
bb1 = DirectionalMambaBackbone(embed_dims=144, num_layers=1,
      feedforward_channels=72, img_size=9, in_channels=144,
      path_type="81_2+8")
v1 = bb1.init({"params": key}, h9[:2], False)
bench(lambda a: bb1.apply(v1, a, False), h9, label="backbone1 (81 tok, 144ch)")

h7 = jax.random.normal(key, (B, 7, 7, 256))
bb2 = DirectionalMambaBackbone(embed_dims=256, num_layers=1,
      feedforward_channels=128, img_size=7, in_channels=256,
      path_type="49_2+8")
v2 = bb2.init({"params": key}, h7[:2], False)
bench(lambda a: bb2.apply(v2, a, False), h7, label="backbone2 (49 tok, 256ch)")

# 3) mixer alone at the widened batch (10 dirs folded)
mx = MambaMixer(144, 72)
t = jax.random.normal(key, (10 * B, 81, 144))
vm = mx.init({"params": key}, t[:2])
bench(lambda a: mx.apply(vm, a), t, label="mixer1 alone (40960, 81, 144)")

# 4) scan alone
from vit_cnn_tpu.ops.selective_scan import selective_scan_pallas, selective_scan
u = jax.random.normal(key, (10 * B, 81, 72))
dt_ = jax.nn.softplus(jax.random.normal(key, (10 * B, 81, 72)))
A = -jnp.abs(jax.random.normal(key, (72, 16)))
Bm = jax.random.normal(key, (10 * B, 81, 16))
Cm = jax.random.normal(key, (10 * B, 81, 16))
D = jnp.ones((72,))
bench(lambda *a: selective_scan_pallas(*a), u, dt_, A, Bm, Cm, D,
      label="pallas scan (40960, 81, 72) lane-major")
# assoc scan at the widened batch OOMs HBM (materializes (40960,81,72,16)
# f32 temporaries, 14.2G each — measured 2026-08-16); skipped.

# 5) depthwise causal conv alone
dw = nn.Conv(72, (4,), padding=[(3, 0)], feature_group_count=72)
vd = dw.init(key, u[:2])
bench(lambda a: dw.apply(vd, a), u, label="depthwise conv1d k4 (40960,81,72)")

# 6) gather/inverse-gather cost
from vit_cnn_tpu.ops.scan_paths import path_orderings, inverse_permutation
orders = path_orderings("81_2+8", 81)
perms = jnp.asarray(np.stack(orders))
toks = jax.random.normal(key, (B, 81, 144))
def gathers(tk):
    g = tk[:, perms].transpose(1, 0, 2, 3)
    return g.reshape(10 * B, 81, 144)
bench(gathers, toks, label="10-dir gather (4096, 81, 144)")

# 7) TokenLearner + NonLocal
tl = TokenLearner(49)
x7 = jax.random.normal(key, (B, 7, 7, 256))
vt = tl.init({"params": key}, x7[:2], False)
bench(lambda a: tl.apply(vt, a, False), x7, label="TokenLearner 49 (B,7,7,256)")
nl = NonLocalBlock2D(256)
vn = nl.init({"params": key}, x7[:2], x7[:2], x7[:2], False)
bench(lambda a: nl.apply(vn, a, a, a, False), x7, label="NonLocal (B,7,7,256)")

# 8) bf16 scan (serving config)
ub = u.astype(jnp.bfloat16)
dtb = dt_.astype(jnp.bfloat16)
Bb = Bm.astype(jnp.bfloat16)
Cb = Cm.astype(jnp.bfloat16)
bench(lambda *a: selective_scan_pallas(*a),
      ub, dtb, A, Bb, Cb, D, label="pallas scan bf16 lane-major")

# 9) scene gather + scatter alone (identity model): bounds the fullscene
#    machinery outside the network
from vit_cnn_tpu.infer.fullscene import _chunk_scatter, sliding_window_origins
H, W, BANDS, CLASSES, PATCH = 349, 1905, 144, 15, 9
rngnp = np.random.RandomState(0)
scene1 = jnp.asarray(rngnp.rand(H, W, BANDS).astype(np.float32))
scene2 = jnp.asarray(rngnp.rand(H, W, 1).astype(np.float32))
probs0 = jnp.zeros((H, W, CLASSES), jnp.float32)
origins = sliding_window_origins(H, W, PATCH, 1)
o = jnp.asarray(origins[:B]); vld = jnp.ones(B, jnp.float32)

def ident_apply(variables, p1, p2, train=False):
    return jnp.sum(p1, axis=(1, 2))[:, :CLASSES] + jnp.sum(p2, axis=(1, 2))

t0 = time.time()
pr = _chunk_scatter(probs0, scene1, scene2, o, vld, {}, patch_size=PATCH,
                    apply_fn=ident_apply)
_ = float(jnp.sum(pr))
t0 = time.time()
for _i in range(8):
    pr = _chunk_scatter(pr, scene1, scene2, o, vld, {}, patch_size=PATCH,
                        apply_fn=ident_apply)
_ = float(jnp.sum(pr))
print("%-42s %8.2f ms" % ("gather+identity+scatter (chunk 4096)",
                          (time.time() - t0) / 8 * 1e3), flush=True)

# 10) full flagship fwd in bf16 (the serving config)
from vit_cnn_tpu.nn.precision import bf16_apply
apply_bf16 = bf16_apply(m.apply)
bench(lambda a, b: apply_bf16(v, a, b, train=False), h9, l9,
      label="full flagship fwd bf16 (B=4096)")

"""Cold-start probe (VERDICT r2 #6): can a compiled TPU executable be
persisted across processes on this backend?

Two mechanisms:
  1. jax.experimental.serialize_executable: pickle the Compiled object,
     deserialize_and_load in a fresh process (bypasses compilation
     entirely if the runtime accepts it).
  2. the persistent compilation cache (known to "rarely hit cross-process"
     here — fingerprint instability; quantify it).

Usage: PYTHONPATH=/root/.axon_site:/root/repo timeout 900 python \
         perf/aot_probe.py [child_serialize|child_cache]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PKL = "/tmp/vct_aot_probe.bin"
CACHE = os.path.expanduser("~/.cache/vct_aot_probe_cache")


def small_fn():
    import jax.numpy as jnp

    def f(x, w):
        y = x
        for _ in range(8):
            y = jnp.tanh(y @ w)
        return y.sum()

    return f


def args():
    import jax.numpy as jnp

    return (jnp.ones((512, 512), jnp.bfloat16),
            jnp.ones((512, 512), jnp.bfloat16) * 0.01)


def parent():
    import jax

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    f = small_fn()
    a = args()
    t0 = time.time()
    compiled = jax.jit(f).lower(*a).compile()
    print(f"parent compile: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out = compiled(*a)
    print(f"parent run: {float(out):.3f} in {time.time() - t0:.2f}s",
          flush=True)

    try:
        from jax.experimental import serialize_executable as se

        t0 = time.time()
        payload, in_tree, out_tree = se.serialize(compiled)
        with open(PKL, "wb") as fh:
            import pickle

            pickle.dump((payload, in_tree, out_tree), fh)
        print(f"serialized {os.path.getsize(PKL)} bytes in "
              f"{time.time() - t0:.1f}s", flush=True)
    except Exception as e:
        print("serialize FAILED:", str(e)[:300], flush=True)
        return

    for mode in ("child_serialize", "child_cache", "child_cache"):
        t0 = time.time()
        r = subprocess.run([sys.executable, os.path.abspath(__file__), mode],
                           capture_output=True, text=True)
        tail = (r.stdout.strip().splitlines() or ["<no stdout>"])[-1]
        print(f"{mode}: {tail} (wall {time.time() - t0:.1f}s, "
              f"rc {r.returncode})", flush=True)
        if r.returncode:
            print(r.stderr[-500:], flush=True)


def child_serialize():
    import pickle

    import jax
    from jax.experimental import serialize_executable as se

    t0 = time.time()
    with open(PKL, "rb") as fh:
        payload, in_tree, out_tree = pickle.load(fh)
    compiled = se.deserialize_and_load(payload, in_tree, out_tree)
    t_load = time.time() - t0
    a = args()
    t0 = time.time()
    out = compiled(*a)
    v = float(out)
    print(f"deserialized+ran: {v:.3f} load {t_load:.1f}s "
          f"run {time.time() - t0:.2f}s")


def child_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    os.makedirs(CACHE, exist_ok=True)
    f = small_fn()
    a = args()
    t0 = time.time()
    compiled = jax.jit(f).lower(*a).compile()
    t_c = time.time() - t0
    n = len(os.listdir(CACHE))
    print(f"cache-path compile {t_c:.1f}s ({n} cache entries)")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "parent"
    {"parent": parent, "child_serialize": child_serialize,
     "child_cache": child_cache}[mode]()

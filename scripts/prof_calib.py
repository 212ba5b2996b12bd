"""MXU calibration: matmul TFLOP/s across shapes, chained fori_loop."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

ITERS = int(os.environ.get("PROF_ITERS", "20"))

def timeit(fn, label, flops):
    t0 = time.time(); np.asarray(jax.jit(fn)()); c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time(); np.asarray(jax.jit(fn)()); ts.append(time.time() - t0)
    per = min(ts) / ITERS * 1000
    print(f"{label}: {per:.3f} ms/iter → {flops/per*1e-9:.1f} TFLOP/s (compile {c:.1f}s)", flush=True)

def chain(M, K, N, dtype=jnp.bfloat16):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, K)) * 0.05, dtype)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(K, N)) * 0.05, dtype)
    def run():
        def body(i, xx):
            y = jnp.dot(xx, w, preferred_element_type=jnp.float32).astype(dtype)
            # rotate y back to [M, K] shape via slice (keeps chain, no big reduce)
            return xx * 0.5 + y[:, :K] * 0.01 if N >= K else xx * 0.5 + jnp.pad(y, ((0,0),(0,K-N))) * 0.01
        return jax.lax.fori_loop(0, ITERS, body, x).sum()
    timeit(run, f"[{M},{K}]x[{K},{N}] {dtype.__name__}", 2*M*K*N)

if __name__ == "__main__":
    print(f"backend={jax.default_backend()} iters={ITERS}", flush=True)
    chain(4096, 4096, 4096)
    chain(368, 2560, 9728)
    chain(512, 2560, 9728)
    chain(368, 2560, 9728, jnp.float32)

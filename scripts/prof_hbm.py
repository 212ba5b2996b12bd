"""HBM bandwidth + loop-overhead calibration."""
import os, sys, time
import numpy as np
import jax, jax.numpy as jnp

def timeit(fn, label, bytes_per_iter, iters):
    f = jax.jit(fn)
    t0 = time.time(); np.asarray(f()); c = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time(); np.asarray(f()); ts.append(time.time() - t0)
    per = min(ts) / iters * 1000
    print(f"{label}: {per:.3f} ms/iter → {bytes_per_iter/per*1e-6:.0f} GB/s (compile {c:.1f}s)", flush=True)

if __name__ == "__main__":
    print(f"backend={jax.default_backend()}", flush=True)
    # 2 GB int8 array, sum-reduce per iteration (read-only stream)
    N = 2 * 1024 * 1024 * 1024
    x = jnp.ones((N // 1024, 1024), jnp.int8)
    IT = 10
    def stream():
        def body(i, acc):
            return acc + jnp.sum(x, dtype=jnp.int32)[None].astype(jnp.float32)
        return jax.lax.fori_loop(0, IT, body, jnp.zeros((1,), jnp.float32))
    timeit(stream, f"int8 stream-sum {N>>20} MiB", N, IT)

    # empty-ish loop overhead: tiny elementwise per iteration
    y = jnp.ones((8, 128), jnp.float32)
    IT2 = 200
    def tiny():
        return jax.lax.fori_loop(0, IT2, lambda i, a: a * 1.0000001 + 0.5, y).sum()
    f = jax.jit(tiny)
    np.asarray(f())
    ts = []
    for _ in range(3):
        t0 = time.time(); np.asarray(f()); ts.append(time.time() - t0)
    print(f"tiny-loop: {min(ts)/IT2*1e6:.1f} us/iter", flush=True)

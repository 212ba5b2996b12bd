"""Delivered-peak calibration probe for the attached chip.

Round-5 recalibration question (BASELINE.md): every "×-off-ideal" claim
assumes the v5e spec rates (197 TFLOP/s bf16, 394 int8, 819 GB/s HBM), but
all round-5 microbenchmarks sit at ~2× "ideal" while being insensitive to
precision/tiling/masking — consistent with the tunneled chip delivering a
fraction of spec. This measures what the chip actually delivers:

- chained 4096^3 matmuls (each dot consumes the previous result, so XLA
  cannot hoist loop-invariant work) in bf16, int8 (iteration-XORed operand),
  and f32;
- an in-jit scan that re-reads a 2 GiB int8 buffer R times with a per-step
  XOR (defeats any relay-level result caching).

Axon sync gotcha (see bench.py header): `block_until_ready` does NOT
synchronize through the tunnel — every timed section ends in a scalar host
fetch. Timing model: one fused jitted program per measurement, two calls
(warm compile, then timed), wall time includes one ~30 ms tunnel RTT which
is amortized over 32 matmuls / 8 buffer passes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N, REPS = 4096, 32


def chain_bf16(y, b):
    def body(y, _):
        y = jax.lax.dot_general(y, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * (1.0 / 64.0)).astype(jnp.bfloat16), None
    y, _ = jax.lax.scan(body, y, None, length=REPS)
    return y[0, 0].astype(jnp.float32)


def chain_f32(y, b):
    def body(y, _):
        y = jax.lax.dot_general(y, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y * (1.0 / 64.0), None
    y, _ = jax.lax.scan(body, y, None, length=REPS)
    return y[0, 0]


def chain_i8(a, b):
    def body(s, i):
        ai = a ^ i.astype(jnp.int8)  # iteration-dependent: forbids hoisting
        d = jax.lax.dot_general(ai, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return s + d[0, 0], None
    s, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(REPS), length=REPS)
    return s


def timed(f, *args, work, unit, name):
    f = jax.jit(f)
    float(np.asarray(f(*args)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(f(*args)))
    dt = time.perf_counter() - t0
    rate = work / dt / 1e12 if unit == "TFLOP/s" else work / dt / 1e9
    print(f"{name:20s}: {dt * 1e3:8.1f} ms  {rate:7.1f} {unit}", flush=True)
    return rate


def main():
    print(f"peak_probe backend={jax.default_backend()} "
          f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    a16 = jax.random.normal(key, (N, N), jnp.bfloat16)
    b16 = jax.random.normal(jax.random.PRNGKey(1), (N, N), jnp.bfloat16)
    ai8 = jax.random.randint(key, (N, N), -127, 127, jnp.int8)
    bi8 = jax.random.randint(jax.random.PRNGKey(2), (N, N), -127, 127, jnp.int8)
    F = 2 * N**3 * REPS
    timed(chain_bf16, a16, b16, work=F, unit="TFLOP/s", name="bf16 chained dot")
    timed(chain_i8, ai8, bi8, work=F, unit="TFLOP/s", name="int8 dot (dep)")
    timed(chain_f32, a16.astype(jnp.float32), b16.astype(jnp.float32),
          work=F, unit="TFLOP/s", name="f32 chained dot")

    M, R = 2 * 1024**3, 8
    x = jnp.zeros((M // 4096, 4096), jnp.int8)

    def red(x):
        def body(s, i):
            return s + jnp.sum((x ^ i.astype(jnp.int8)).astype(jnp.int32)), None
        s, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(R))
        return s

    timed(red, x, work=M * R, unit="GB/s", name=f"int8 read 2GiB x{R}")


if __name__ == "__main__":
    main()

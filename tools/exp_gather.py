#!/usr/bin/env python
"""Gather strategy shootout for the MSM scan: the per-step 3-array row
gather costs ~40% of the bucket accumulation. Variants:

  A per-step gather of 3 separate (N,16) arrays inside the scan (current)
  B per-step gather of ONE packed (N,48) array (x|y|infmask in one row)
  C one-shot pre-gather of ALL rows (scan consumes contiguous xs slices)
  D one-shot pre-gather, packed array

Chained inside one jit per variant; 32 windows worth of rows.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

LOG_N = int(os.environ.get("PROF_LOG_N", "14"))
N = 1 << LOG_N
W = 32
LANES = min(32768, N)
ROWS = W * N
STEPS = ROWS // LANES
print(f"backend={jax.default_backend()} n=2^{LOG_N} lanes={LANES} steps={STEPS}", flush=True)


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    dt = time.time() - t0
    print(f"{name:46s} {dt*1e3:9.1f} ms  {dt/ROWS*1e9:7.1f} ns/row", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    qx = jnp.asarray(rng.randint(0, 1 << 16, size=(N, 16)).astype(np.uint32))
    qy = jnp.asarray(rng.randint(0, 1 << 16, size=(N, 16)).astype(np.uint32))
    qinf = jnp.asarray(np.zeros((N, 16), np.uint32))
    packed = jnp.concatenate([qx, qy, qinf], axis=1)  # (N, 48)
    src = jnp.asarray(rng.randint(0, N, size=(STEPS, LANES)).astype(np.int32))

    which = sys.argv[1:] or ["A", "B", "C", "D"]

    if "A" in which:

        def scanA(qx, qy, qinf, src):
            def step(acc, s):
                px, py, pinf = qx[s], qy[s], qinf[s]
                return acc + px + py + pinf, None

            out, _ = jax.lax.scan(step, jnp.zeros((LANES, 16), jnp.uint32), src)
            return out

        timed("A per-step gather 3x(N,16)", jax.jit(scanA), qx, qy, qinf, src)

    if "B" in which:

        def scanB(packed, src):
            def step(acc, s):
                row = packed[s]  # (LANES, 48)
                return acc + row[:, :16] + row[:, 16:32] + row[:, 32:], None

            out, _ = jax.lax.scan(step, jnp.zeros((LANES, 16), jnp.uint32), src)
            return out

        timed("B per-step gather packed (N,48)", jax.jit(scanB), packed, src)

    if "C" in which:

        def scanC(qx, qy, qinf, src):
            flat = src.reshape(-1)
            gx = qx[flat].reshape(STEPS, LANES, 16)
            gy = qy[flat].reshape(STEPS, LANES, 16)
            gi = qinf[flat].reshape(STEPS, LANES, 16)

            def step(acc, xs):
                px, py, pinf = xs
                return acc + px + py + pinf, None

            out, _ = jax.lax.scan(step, jnp.zeros((LANES, 16), jnp.uint32), (gx, gy, gi))
            return out

        timed("C one-shot gather 3x(N,16)", jax.jit(scanC), qx, qy, qinf, src)

    if "D" in which:

        def scanD(packed, src):
            flat = src.reshape(-1)
            g = packed[flat].reshape(STEPS, LANES, 48)

            def step(acc, row):
                return acc + row[:, :16] + row[:, 16:32] + row[:, 32:], None

            out, _ = jax.lax.scan(step, jnp.zeros((LANES, 16), jnp.uint32), g)
            return out

        timed("D one-shot gather packed (N,48)", jax.jit(scanD), packed, src)

    if "E" in which or not sys.argv[1:]:
        # E: gather only, no scan at all — the one-shot gather's raw cost
        def gonly(packed, src):
            return packed[src.reshape(-1)].sum(dtype=jnp.uint32)

        timed("E one-shot gather alone (sum-reduced)", jax.jit(gonly), packed, src)


if __name__ == "__main__":
    main()

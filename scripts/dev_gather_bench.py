"""Microbenchmark gather formulations for the LSD corridor sampling.

Measures wall time of N random-element lookups from a 480x640 map under
several TPU lowerings to pick the primitive for the hot sampler.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 480, 640
N = 393216  # 3 taps x 1024 anchors x 128 samples


def timeit(fn, *args, n=20):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((H, W)), jnp.bfloat16)
    imgf = img.astype(jnp.float32)
    idx = jnp.asarray(rng.integers(0, H * W, size=N), jnp.int32)

    @jax.jit
    def flat_gather(img, idx):
        return img.reshape(-1)[idx]

    @jax.jit
    def flat_gather_f32(imgf, idx):
        return imgf.reshape(-1)[idx]

    @jax.jit
    def row128_onehot(img, idx):
        m = img.reshape(-1, 128)  # [2400, 128]
        rows = m[idx // 128]      # [N, 128] row gather
        lane = idx % 128
        oh = (jax.lax.broadcasted_iota(jnp.int32, (N, 128), 1) == lane[:, None])
        return jnp.sum(jnp.where(oh, rows, 0).astype(jnp.float32), axis=1)

    @jax.jit
    def row8_gather(img, idx):
        m = img.reshape(-1, 8)
        rows = m[idx // 8]
        lane = idx % 8
        oh = (jax.lax.broadcasted_iota(jnp.int32, (N, 8), 1) == lane[:, None])
        return jnp.sum(jnp.where(oh, rows, 0).astype(jnp.float32), axis=1)

    @jax.jit
    def two_stage(img, idx):
        # gather image rows by y then select x by take_along_axis
        y = idx // W
        x = idx % W
        rows = img[y]  # [N, 640]
        return jnp.take_along_axis(rows, x[:, None], axis=1)[:, 0]

    @jax.jit
    def sorted_gather(img, idx):
        order = jnp.argsort(idx)
        v = img.reshape(-1)[idx[order]]
        inv = jnp.argsort(order)
        return v[inv]

    @jax.jit
    def shaped_gather(img, idx):
        # keep [3, 1024, 128] shape (as in the real corridor) instead of flat
        i3 = idx.reshape(3, 1024, 128)
        return img.reshape(-1)[i3]

    for name, fn, a in [
        ("flat 1-D gather bf16", flat_gather, (img, idx)),
        ("flat 1-D gather f32", flat_gather_f32, (imgf, idx)),
        ("row-gather [2400,128] + onehot", row128_onehot, (img, idx)),
        ("row-gather [38400,8] + onehot", row8_gather, (img, idx)),
        ("two-stage row + take_along", two_stage, (img, idx)),
        ("sorted gather", sorted_gather, (img, idx)),
        ("shaped [3,1024,128] gather", shaped_gather, (img, idx)),
    ]:
        try:
            ms = timeit(fn, *a)
            print(f"{name:35s} {ms:8.3f} ms  ({N/ms/1e3:8.1f} Melem/s)")
        except Exception as e:  # noqa
            print(f"{name:35s} FAILED: {str(e)[:80]}")


if __name__ == "__main__":
    main()

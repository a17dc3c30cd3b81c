"""Micro-bench: direct vs subpixel formulations of the final RGB conv.

Times the rendering network's top-resolution 7x7 32->3 conv (the round-4
profile's worst op, docs/PROFILE_r4.md) in the training configuration:
bf16 activations, f32 params cast to bf16, forward and forward+backward,
at batch 8 x 256x256. Picks the space-to-depth factor for FinalBlock.

Usage: python tools/bench_final_conv.py [--batch 8] [--px 256] [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from playablevideogeneration_tpu.ops.subpixel_conv import subpixel_conv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--px", type=int, default=256)
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    b, px, cin, k = args.batch, args.px, args.cin, args.k
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(b, px, px, cin), jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, k, cin, 3) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.randn(b, px, px, 3), jnp.bfloat16)

    def direct(w, x):
        return lax.conv_general_dilated(
            x, w.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def make_sub(f):
        def fn(w, x):
            return subpixel_conv(x, w.astype(jnp.bfloat16), f)
        return fn

    variants = [("direct", direct)] + [
        (f"subpix_f{f}", make_sub(f)) for f in (2, 4, 8)]

    gflop = 2.0 * b * px * px * k * k * cin * 3 / 1e9

    def timeit(fn, *a):
        fn(*a)[0].block_until_ready() if isinstance(fn(*a), tuple) else \
            jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters

    print(f"# {b}x{px}x{px}x{cin} -> 3ch, k={k}, bf16; "
          f"direct-conv cost {gflop:.2f} GFLOP")
    for name, fn in variants:
        fwd = jax.jit(fn)
        ref = jax.block_until_ready(direct(w, x))
        got = jax.block_until_ready(fwd(w, x))
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))

        def loss(w, x, fn=fn):
            return jnp.sum((fn(w, x) * ct).astype(jnp.float32))
        fb = jax.jit(jax.grad(loss, argnums=(0, 1)))
        t_f = timeit(fwd, w, x)
        t_b = timeit(lambda w, x: fb(w, x), w, x)
        print(f"{name:>10}: fwd {t_f*1e3:7.3f} ms ({gflop/t_f/1e3:6.1f} "
              f"eff-TF/s)   fwd+bwd-grads {t_b*1e3:7.3f} ms   "
              f"max|err| {err:.3e}")


if __name__ == "__main__":
    main()

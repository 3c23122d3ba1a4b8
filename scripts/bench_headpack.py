"""Sepformer head-packed attention measurement (ROADMAP item 5).

dh = 32 contracts every QK^T dot over 32 lanes (≤ 25 % of an MXU tile's
K depth).  The head-packing idea: lay G heads' queries/keys block-diagonally
on the lane axis — head j occupies rows [j·T, (j+1)·T) and lanes
[32j, 32(j+1)) — so ONE [G·T, 32G] @ [32G, G·T] dot computes all G heads'
logits (off-diagonal blocks are exactly zero: disjoint lane support).  The
useful-output ratio is 1/G, but the contraction runs at full (G·32)-lane
depth, and G dots collapse into one (fewer serial dispatches if the pass is
latency-bound rather than throughput-bound).

This bench isolates the QK^T stage at Sepformer-base intra shapes
([B·S = 126, T = 250 → 256, E = 256, h = 8]) in three forms:

  unpacked — one batched einsum over [BH, T, 32] (what XLA fuses today)
  packed2  — 2 heads per 64-lane half (the ROADMAP formulation), G = 2
  packed4  — 4 heads per 128-lane tile (full K depth), G = 4

Packing-construction cost is measured separately (`+build` rows) so the
verdict separates "the dot shape can't win" from "the packing overhead
eats the win".

    python scripts/bench_headpack.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

B = 126  # B·S of sepformer_base intra at batch 2 × 2 s
T = 256  # chunk K=250 padded to the lane quantum
H = 8
DH = 32
ITERS = 200


def pack_blockdiag(x, G):
    """[B, H, T, DH] → [B, H//G, G·T, G·DH] block-diagonal lanes."""
    Bb, Hh, Tt, Dd = x.shape
    grp = x.reshape(Bb, Hh // G, G, Tt, Dd)
    out = jnp.zeros((Bb, Hh // G, G, Tt, G * Dd), x.dtype)
    for j in range(G):
        out = out.at[:, :, j, :, j * Dd : (j + 1) * Dd].set(grp[:, :, j])
    return out.reshape(Bb, Hh // G, G * Tt, G * Dd)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, H, T, DH)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, T, DH)).astype(np.float32)).astype(jnp.bfloat16)

    def unpacked(q_, k_):
        return jnp.einsum(
            "bhqd,bhkd->bhqk", q_, k_, preferred_element_type=jnp.float32
        )

    def packed(G):
        def f(q_, k_):
            qp = pack_blockdiag(q_, G)
            kp = pack_blockdiag(k_, G)
            return jnp.einsum(
                "bgqd,bgkd->bgqk", qp, kp, preferred_element_type=jnp.float32
            )
        return f

    def packed_prebuilt(G):
        # packing cost excluded: measures the dot shape alone
        def f(qp, kp):
            return jnp.einsum(
                "bgqd,bgkd->bgqk", qp, kp, preferred_element_type=jnp.float32
            )
        return f

    cases = [
        ("unpacked", unpacked, (q, k)),
        ("packed2+build", packed(2), (q, k)),
        ("packed4+build", packed(4), (q, k)),
        ("packed2 dot-only", packed_prebuilt(2),
         (pack_blockdiag(q, 2), pack_blockdiag(k, 2))),
        ("packed4 dot-only", packed_prebuilt(4),
         (pack_blockdiag(q, 4), pack_blockdiag(k, 4))),
    ]
    for name, fn, args in cases:
        @jax.jit
        def loop(a, b):
            def body(i, acc):
                aa = a * (1.0 + 1e-6 * i.astype(a.dtype))
                return acc + fn(aa, b).sum()

            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

        try:
            float(loop(*args))
            t0 = time.perf_counter()
            float(loop(*args))
            dt = time.perf_counter() - t0
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        us = dt / ITERS * 1e6
        print(f"{name}: {us:.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()

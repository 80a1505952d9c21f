"""Bloom chain formulations at 736p (trace: 6.5 ms/frame, 65 XLA ops).

The CoD 13-tap 5x5 stencil is the sum of TWO separable kernels:
  even taps = 0.5 * outer([.25,.5,.25], [.25,.5,.25])  (on the even grid)
  odd taps  = 0.5 * outer([.5,.5],[.5,.5])             (on the odd grid)
so the stride-2 downsample = dense 1-d shifts+FMAs along each axis + a split
strided slice — no grouped convolution (depthwise conv hits a slow TPU path).

Variants must be numerically identical formulations of the same filter (modulo
fp reassociation) — they are candidates for ops/bloom.py, gated by golden SSIM.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from androidrenderer_tpu.ops import bloom as bloom_ops

H, W = 736, 1280
rng = np.random.default_rng(0)
IMG = jnp.asarray(rng.uniform(0, 4, (H, W, 3)), jnp.float32)


def variant_current(img):
    return bloom_ops.bloom_chain(img)


def _shift_rows(a, d):
    """a[i - d] with ZERO fill (matches the conv's SAME zero padding)."""
    if d == 0:
        return a
    z = jnp.zeros_like(a[:abs(d)])
    if d > 0:
        return jnp.concatenate([z, a[:-d]], axis=0)
    return jnp.concatenate([a[-d:], z], axis=0)


def _shift_cols(a, d):
    if d == 0:
        return a
    z = jnp.zeros_like(a[:, :abs(d)])
    if d > 0:
        return jnp.concatenate([z, a[:, :-d]], axis=1)
    return jnp.concatenate([a[:, -d:], z], axis=1)


def _half(a):
    return a[::2][:, ::2]


def _axis_se_so(a, axis):
    """1-d stride-2 factors along ``axis`` matching XLA SAME alignment:
    out(i) = sum_t f(t) a(2i + t - pad_lo), pad_lo = 1 (even n) / 2 (odd n).
    se = [.25,.5,.25] lands on the ODD parity plane for even n, EVEN for odd n;
    so = [.5,.5] on the other plane. All math runs at HALF length."""
    n = a.shape[axis]
    out = -(-n // 2)
    sl = lambda s, e, st=2: jax.lax.slice_in_dim(a, s, e, st, axis=axis)
    sh = _shift_rows if axis == 0 else _shift_cols
    if n % 2 == 0:
        ep = sl(0, n)      # a(2i)
        op = sl(1, n)      # a(2i+1)
        # taps (pad_lo=1): se at a(2i-1),a(2i+1),a(2i+3) = op(-1..+1);
        # so at a(2i),a(2i+2) = ep(0,+1)
        se = 0.25 * sh(op, 1) + 0.5 * op + 0.25 * sh(op, -1)
        so = 0.5 * ep + 0.5 * sh(ep, -1)
    else:
        ep = sl(0, n)      # size out
        op = sl(1, n)      # size out-1 -> zero-pad to out
        pad = [(0, 0)] * a.ndim
        pad[axis] = (0, 1)
        op = jnp.pad(op, pad)
        # taps (pad_lo=2): se at a(2i-2),a(2i),a(2i+2) = ep(-1..+1);
        # so at a(2i-1),a(2i+1) = op(-1, 0)
        se = 0.25 * sh(ep, 1) + 0.5 * ep + 0.25 * sh(ep, -1)
        so = 0.5 * sh(op, 1) + 0.5 * op
    return se, so


def _down_dense(img):
    """Stride-2 13-tap via parity-grid decomposition: the 5x5 stencil is
    0.5 * se_r (x) se_c + 0.5 * so_r (x) so_c (zero at mixed parities), so the
    downsample = two separable passes over half-size parity planes."""
    c_se, c_so = _axis_se_so(img, 1)
    r_se, _ = _axis_se_so(c_se, 0)
    _, r_so = _axis_se_so(c_so, 0)
    return 0.5 * r_se + 0.5 * r_so


def _tent_dense(img):
    h = 0.25 * _shift_cols(img, 1) + 0.5 * img + 0.25 * _shift_cols(img, -1)
    return 0.25 * _shift_rows(h, 1) + 0.5 * h + 0.25 * _shift_rows(h, -1)


def variant_dense(img):
    mips = [img]
    cur = img
    for _ in range(6):
        cur = _down_dense(cur)
        mips.append(cur)
    acc = mips[-1]
    for level in range(5, -1, -1):
        t = mips[level]
        up = jax.image.resize(acc, (t.shape[0], t.shape[1], 3), method="linear")
        acc = _tent_dense(up) + t
    return acc - img


def variant_dense_conv(img):
    """Down chain via a FULL (5,5,3,3) conv (off-diagonal zeros) — tests
    whether the non-grouped conv path is faster than feature_group_count=3."""
    k5 = np.zeros((5, 5, 3, 3), np.float32)
    for c in range(3):
        k5[:, :, c, c] = bloom_ops._DOWN_KERNEL
    k3 = np.zeros((3, 3, 3, 3), np.float32)
    for c in range(3):
        k3[:, :, c, c] = bloom_ops._TENT_KERNEL
    k5 = jnp.asarray(k5)
    k3 = jnp.asarray(k3)

    def conv(x, k, s):
        return jax.lax.conv_general_dilated(
            x[None], k, (s, s), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    mips = [img]
    cur = img
    for _ in range(6):
        cur = conv(cur, k5, 2)
        mips.append(cur)
    acc = mips[-1]
    for level in range(5, -1, -1):
        t = mips[level]
        up = jax.image.resize(acc, (t.shape[0], t.shape[1], 3), method="linear")
        acc = conv(up, k3, 1) + t
    return acc - img


def bench(name, fn, chain=10):
    @jax.jit
    def chained(seed):
        s = seed
        for _ in range(chain):
            out = fn(IMG + s * 1e-30)
            s = out[0, 0, 0]
        return s

    t0 = time.perf_counter()
    np.asarray(chained(jnp.float32(0.0)))
    c = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(jnp.float32(0.0)))
        ts.append((time.perf_counter() - t0) * 1e3 / chain)
    print(f"{name:14s} {min(ts):7.3f} ms/call (compile {c:.0f}s)")


if __name__ == "__main__":
    # Numerical check vs the conv formulation first (CPU or TPU).
    ref = np.asarray(variant_current(IMG))
    for name in ["dense", "dense_conv"]:
        out = np.asarray(globals()[f"variant_{name}"](IMG))
        err = np.max(np.abs(out - ref)) / max(1e-9, np.max(np.abs(ref)))
        print(f"# {name}: max rel err vs current = {err:.2e}")
    for name in sys.argv[1:] or ["current", "dense", "dense_conv"]:
        bench(name, globals()[f"variant_{name}"])

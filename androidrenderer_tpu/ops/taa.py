"""TAA + motion vectors — the vendor-upscaler replacement.

The reference delegates AA/upscaling to FSR3/DLSS/XeSS vendor blobs behind an
IUpscaler interface with Halton jitter (upscaling/upscaler.hpp:13-32) and renders
motion vectors by reprojection (motion_vectors_phase.cpp:14-103). Those blobs cannot
run on TPU; this module is the IUpscaler-shaped native implementation: reprojection
motion vectors from the visibility buffer's world positions, bilinear history fetch,
3x3 neighborhood clamp (variance-free min/max), and exponential blend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def motion_vectors(
    world_position: jnp.ndarray,  # (H, W, 3)
    valid: jnp.ndarray,  # (H, W) bool
    last_view_proj: jnp.ndarray,  # (4, 4) previous frame, unjittered
    unjittered_view_proj: jnp.ndarray,  # (4, 4) current frame, unjittered
) -> jnp.ndarray:
    """(H, W, 2) uv-space motion: uv_prev = uv_curr - mv (motion_vectors.frag)."""
    h, w, _ = world_position.shape

    def project_uv(m):
        clip = world_position @ m[:3, :3].T + m[:3, 3]
        wc = world_position @ m[3, :3].T + m[3, 3]
        ndc = clip[..., :2] / jnp.where(wc[..., None] == 0.0, 1.0, wc[..., None])
        return jnp.stack(
            [ndc[..., 0] * 0.5 + 0.5, 0.5 - ndc[..., 1] * 0.5], axis=-1
        )

    uv_now = project_uv(unjittered_view_proj)
    uv_prev = project_uv(last_view_proj)
    mv = uv_now - uv_prev
    return jnp.where(valid[..., None], mv, 0.0)


def _encode_r11g11b10(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) f32 HDR -> (...,) i32 packed R11G11B10 float (round-to-nearest).

    The 11/10-bit floats are f16 with the mantissa truncated to 6/5 bits
    (same 5-bit exponent), so encode/decode are f16 bitcasts + shifts. Packing
    the TAA/RTGI history fetch operand 4x smaller moves its 2M-row gather from
    the 48-byte-row class (~47 ms) to the 16-byte class (~12 ms): LARGE-table
    gathers scale with row bytes (tools/microbench_taa4.py), unlike the
    262k-row resolve table where width is free. R11G11B10 history is also what
    GPU engines use for TAA accumulation."""
    h = jnp.clip(rgb, 0.0, 64512.0).astype(jnp.float16)
    bits = jax.lax.bitcast_convert_type(h, jnp.uint16).astype(jnp.uint32)
    r = ((bits[..., 0] + 8) >> 4) & 0x7FF
    g = ((bits[..., 1] + 8) >> 4) & 0x7FF
    b = ((bits[..., 2] + 16) >> 5) & 0x3FF
    return (r | (g << 11) | (b << 22)).astype(jnp.int32)


def _decode_r11g11b10(packed: jnp.ndarray) -> jnp.ndarray:
    """(...,) i32 packed R11G11B10 -> (..., 3) f32."""
    u = packed.astype(jnp.uint32)

    def f(x):
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.uint16), jnp.float16
        ).astype(jnp.float32)

    r = f((u & 0x7FF) << 4)
    g = f(((u >> 11) & 0x7FF) << 4)
    b = f(((u >> 22) & 0x3FF) << 5)
    return jnp.stack([r, g, b], axis=-1)


def _bilinear_sample_packed(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample (H, W, 3) f32 at (..., 2) uv through an R11G11B10 row.

    Same tap-packed single-gather scheme as ``_bilinear_sample``, but the four
    RGB taps ride a (H*W, 4) i32 row — 16 bytes instead of 48, which is the
    difference between ~12 and ~47 ms for a screen-sized history gather (row
    BYTES bound for 2M-row operands; tools/microbench_taa4.py)."""
    h, w, _ = img.shape
    enc = _encode_r11g11b10(img)  # (H, W) i32
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    right = jnp.concatenate([enc[:, 1:], enc[:, -1:]], axis=1)
    down = jnp.concatenate([enc[1:], enc[-1:]], axis=0)
    down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
    packed = jnp.stack([enc, right, down, down_right], axis=-1)  # (H, W, 4)
    taps = packed.reshape(h * w, 4)[y0i * w + x0i]
    c00 = _decode_r11g11b10(taps[..., 0])
    c01 = _decode_r11g11b10(taps[..., 1])
    c10 = _decode_r11g11b10(taps[..., 2])
    c11 = _decode_r11g11b10(taps[..., 3])
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def _enc_l11(y: jnp.ndarray) -> jnp.ndarray:
    """(...,) f32 nonneg -> (...,) i32 11-bit float (R11 of R11G11B10)."""
    h = jnp.clip(y, 0.0, 64512.0).astype(jnp.float16)
    bits = jax.lax.bitcast_convert_type(h, jnp.uint16).astype(jnp.uint32)
    return (((bits + 8) >> 4) & 0x7FF).astype(jnp.int32)


def _dec_l11(l: jnp.ndarray) -> jnp.ndarray:
    u = (l.astype(jnp.uint32) & 0x7FF) << 4
    return jax.lax.bitcast_convert_type(
        u.astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)


def _bilinear_sample_packed8(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample (H, W, 3) HDR at (..., 2) uv through an 8-BYTE row.

    Halves ``_bilinear_sample_packed``'s 16-byte row: LARGE-operand gather
    cost scales with row bytes on this TPU (tools/microbench_taa4.py /
    microbench_taa5.py), and the history fetch is the TAAU resolve's
    dominant cost. Layout (2 i32 per 2x2 footprint):

      - 4 x 11-bit luma (Y = (r + 2g + b)/4 as the R11 float format) — full
        per-tap luminance detail, same precision class as R11G11B10.
      - one SHARED chroma pair for the footprint (10+10 bit): the SELF
        tap's (Co, Cg) ratios — 4:2:0-style chroma subsampling. Zero-motion
        steady state (jitter cancelled) lands on pixel centers and
        reconstructs exactly; while moving, chroma lags by <= 1 px, bounded
        by the neighborhood clamp.

      w0 = L0 | L1<<11 | (L2 & 0x3FF)<<22
      w1 = (L2>>10) | L3<<1 | co10<<12 | cg10<<22

    YCoCg'-style transform (Y nonneg for nonneg rgb):
      Y = (r + 2g + b)/4, Co = r - b (in [-4Y, 4Y]), Cg = g - (r + b)/2
      (in [-2Y, 2Y]); stored as ratios co = Co/(4Y), cg = Cg/(2Y) in [-1, 1].
      Inverse: r = Y + (Co - Cg')/2, g = Y + Cg'/2, b = Y - (Co + Cg')/2
      with Co = 4Y*co, Cg' = 2Y*cg."""
    h, w, _ = img.shape
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.25 * r + 0.5 * g + 0.25 * b
    safe = jnp.maximum(y, 1e-8)
    co = jnp.clip((r - b) / (4.0 * safe), -1.0, 1.0)
    cg = jnp.clip((g - 0.5 * (r + b)) / (2.0 * safe), -1.0, 1.0)
    l11 = _enc_l11(y)

    def taps4(a):
        right = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
        down = jnp.concatenate([a[1:], a[-1:]], axis=0)
        dr = jnp.concatenate([right[1:], right[-1:]], axis=0)
        return a, right, down, dr

    l0, l1, l2, l3 = taps4(l11)
    # Chroma = the SELF tap's (co, cg), not a footprint mean: with jitter
    # cancelled and zero motion the fetch lands ON pixel centers (fx = fy =
    # 0), so the steady state reconstructs self-luma + self-chroma EXACTLY —
    # no iterative chroma bleed at colored edges. A footprint-averaged
    # chroma desaturates edges a little MORE each frame (the polluted value
    # stays inside the clamp box); self-chroma errs only while actually
    # moving (<= 1 px chroma lag), where TAA blurs anyway.
    co10 = jnp.round((co * 0.5 + 0.5) * 1023.0).astype(jnp.int32)
    cg10 = jnp.round((cg * 0.5 + 0.5) * 1023.0).astype(jnp.int32)
    w0 = l0 | (l1 << 11) | ((l2 & 0x3FF) << 22)
    w1 = (l2 >> 10) | (l3 << 1) | (co10 << 12) | (cg10 << 22)
    packed = jnp.stack([w0, w1], axis=-1).reshape(h * w, 2)

    # Snap fetch coordinates to 1/256 px: (i + 0.5)/w * w - 0.5 lands at
    # i +- ~1e-4 in f32, and a NEGATIVE eps would floor to i-1 with fx ~ 1 —
    # harmless for the luma bilinear but the row's shared chroma would come
    # from the left/top neighbor forever at rest. 1/256-px motion
    # quantization is far below perceptible reprojection error.
    x = jnp.round(jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0) * 256.0) / 256.0
    yy = jnp.round(jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0) * 256.0) / 256.0
    x0 = jnp.floor(x)
    yf0 = jnp.floor(yy)
    fx = (x - x0)[..., None]
    fy = (yy - yf0)[..., None]
    idx = yf0.astype(jnp.int32) * w + x0.astype(jnp.int32)
    rows = packed[idx]  # (..., 2) i32
    u0 = rows[..., 0]
    u1 = rows[..., 1]
    lum = [
        _dec_l11(u0),
        _dec_l11(u0 >> 11),
        _dec_l11(((u0 >> 22) & 0x3FF) | ((u1 & 1) << 10)),
        _dec_l11(u1 >> 1),
    ]
    co_d = (((u1 >> 12) & 0x3FF).astype(jnp.float32) / 1023.0) * 2.0 - 1.0
    cg_d = (((u1 >> 22) & 0x3FF).astype(jnp.float32) / 1023.0) * 2.0 - 1.0
    top = lum[0] + (lum[1] - lum[0]) * fx[..., 0]
    bot = lum[2] + (lum[3] - lum[2]) * fx[..., 0]
    y_s = top + (bot - top) * fy[..., 0]
    co_s = 4.0 * y_s * co_d
    cg_s = 2.0 * y_s * cg_d
    out = jnp.stack(
        [
            y_s + 0.5 * (co_s - cg_s),
            y_s + 0.5 * cg_s,
            y_s - 0.5 * (co_s + cg_s),
        ],
        axis=-1,
    )
    return jnp.maximum(out, 0.0)


def _bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) at (H, W, 2) uv (clamped).

    Tap-packed: the 2x2 footprint is packed into one row (shifted copies, dense
    ~free ops) so the fetch is ONE flat gather — separate corner gathers cost
    ~17-45 ms each at screen size on this TPU (docs/ROADMAP.md)."""
    h, w, ch = img.shape
    x = jnp.clip(uv[..., 0] * w - 0.5, 0.0, w - 1.0)
    y = jnp.clip(uv[..., 1] * h - 0.5, 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    # x0 <= w-1 by the clamp above; the packed row at the last column/row
    # duplicates the edge texel, preserving clamp-to-edge semantics.
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    right = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
    down = jnp.concatenate([img[1:], img[-1:]], axis=0)
    down_right = jnp.concatenate([right[1:], right[-1:]], axis=0)
    packed = jnp.concatenate([img, right, down, down_right], axis=-1)
    taps = packed.reshape(h * w, 4 * ch)[y0i * w + x0i]
    c00 = taps[..., 0 * ch : 1 * ch]
    c01 = taps[..., 1 * ch : 2 * ch]
    c10 = taps[..., 2 * ch : 3 * ch]
    c11 = taps[..., 3 * ch : 4 * ch]
    top = c00 + (c01 - c00) * fx
    bot = c10 + (c11 - c10) * fx
    return top + (bot - top) * fy


def _neighborhood_minmax(img: jnp.ndarray):
    """3x3 min/max per pixel via shifted pads (clamp box for history rectification)."""
    p = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    h, w, _ = img.shape
    mn = img
    mx = img
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            s = p[dy : dy + h, dx : dx + w]
            mn = jnp.minimum(mn, s)
            mx = jnp.maximum(mx, s)
    return mn, mx


def taa_resolve(
    current: jnp.ndarray,  # (H, W, 3) this frame's lit scene (jittered render)
    history: jnp.ndarray,  # (H_full, W, 3) accumulated history (FULL frame)
    history_valid: jnp.ndarray,  # () bool
    mv: jnp.ndarray,  # (H, W, 2) uv motion
    blend: float = 0.1,
    row_offset=0,  # band rendering: first screen row of `current`
    current_halo: jnp.ndarray | None = None,  # (H+2, W, 3) edge-halo'd current
    pack8: bool = False,  # 8-byte history rows (measured-negative default; see config)
):
    """(resolved, new_history) — exponential accumulation with neighborhood clamp.

    Band mode (parallel/mesh.py): ``current`` is one band, ``history`` is the
    all_gathered full frame (reprojection reads cross-band rows), ``current_halo``
    supplies the 3x3 clamp's neighbor rows, and uv coordinates are global."""
    h, w, _ = current.shape
    h_full = history.shape[0]
    px = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    py = (jnp.arange(h, dtype=jnp.float32) + 0.5 + row_offset) / h_full
    uv = jnp.stack(
        [jnp.broadcast_to(px[None, :], (h, w)), jnp.broadcast_to(py[:, None], (h, w))],
        axis=-1,
    )
    prev_uv = uv - mv
    # Packed history fetch (history itself stays f32 in the temporal state;
    # quantization happens per-fetch and the neighborhood clamp below bounds
    # it — the visual contract of GPU TAA's R11G11B10 accumulators). pack8
    # halves the row to 8 bytes (large-operand gathers are byte-bound).
    sample = _bilinear_sample_packed8 if pack8 else _bilinear_sample_packed
    hist = sample(history, prev_uv)
    if current_halo is not None:
        mn, mx = _neighborhood_minmax(current_halo)
        mn, mx = mn[1:-1], mx[1:-1]
    else:
        mn, mx = _neighborhood_minmax(current)
    hist = jnp.clip(hist, mn, mx)
    # Off-screen reprojection falls back to current.
    on_screen = (
        (prev_uv[..., 0] >= 0.0)
        & (prev_uv[..., 0] <= 1.0)
        & (prev_uv[..., 1] >= 0.0)
        & (prev_uv[..., 1] <= 1.0)
    )[..., None]
    alpha = jnp.where(history_valid, jnp.float32(blend), jnp.float32(1.0))
    alpha = jnp.where(on_screen, alpha, 1.0)
    resolved = hist + (current - hist) * alpha
    return resolved, resolved


def taau_resolve(
    current: jnp.ndarray,  # (rh, rw, 3) this frame's lit scene (jittered render)
    history: jnp.ndarray,  # (oh_full, ow, 3) OUTPUT-res accumulation (full frame)
    history_valid: jnp.ndarray,  # () bool
    mv: jnp.ndarray,  # (rh, rw, 2) uv motion (resolution-free uv space)
    jitter: jnp.ndarray,  # (2,) current-frame jitter in render pixels
    out_h: int,
    out_w: int,
    blend: float = 0.1,
    row_offset=0,  # band rendering: first RENDER row of `current`
    current_halo: jnp.ndarray | None = None,  # (rh+2, rw, 3) for band clamps
    # Tuned on the synthetic convergence fixture (tests/test_taau.py):
    # converged RMSE 0.010 vs 0.079 for single-frame bilinear upscaling.
    conf_sigma: float = 10.0,  # subpixel-confidence falloff (render px^-2)
    alpha_floor: float = 0.02,  # min fraction of blend for far samples
    clamp_pad: float = 0.5,  # clamp-box inflation as a fraction of its size
    pack8: bool = False,  # 8-byte history rows (measured-negative default; see config)
):
    """(resolved (oh, ow, 3), new_history) — temporal UPSCALING resolve.

    The reference's default frame is FSR3 in Quality mode — it renders at
    output/1.5 per axis and temporally upscales (scene_renderer.cpp:28
    cvar_anti_aliasing default FSR3; fsr3.cpp:18 quality default; :186
    set_render_resolution(optimal)). The vendor blob cannot run on TPU; this
    is the TPU-native equivalent (FSR/TAAU-lite):

    - Current, motion, and the 3x3 clamp box resample render->output through
      ``jax.image.scale_and_translate`` with the frame's jitter cancelled —
      a FIXED scale+translate, so XLA lowers it to dense separable work
      instead of a screen-sized random gather.
    - The history fetch is the one true gather, R11G11B10-packed (16-byte
      rows — ~12 ms at 2M rows; see _bilinear_sample_packed).
    - New samples are confidence-weighted by their subpixel distance to the
      output pixel (jitter phases sweep the quad, so static scenes converge
      to the supersampled image like FSR's accumulation).

    Sharded rendering does NOT call this per band: render/frame.py gathers
    lit+mv and runs the resolve replicated on the full frame (the bloom
    precedent — a band-local scale_and_translate is not bit-identical to the
    full-frame op), then slices output bands. ``row_offset``/``current_halo``
    remain for band callers that accept the reassociation."""
    rh, rw, _ = current.shape
    oh_full = history.shape[0]

    sx = out_w / rw
    # Per-axis ratios come from the actual resolutions (FSR contract: optimal
    # render res is ceil(output / 1.5) per axis, so sx and sy can differ by a
    # rounding texel). Band mode: bands split render and output grids by the
    # same count, so the full-frame ratio equals the band ratio oh / rh.
    oh = out_h  # output rows produced here (band rows in band mode)
    sy = oh / rh

    # Jitter cancellation (camera.py projection_matrix): +jx shifts content
    # -jx pixels, +jy shifts +jy (y flips through NDC), so the render-space
    # sample position for output coord o is (o+.5)/s-.5 + (-jx, +jy) —
    # scale_and_translate's translation t = -d * s.
    jx = jitter[0]
    jy = jitter[1]
    tx = jx * sx
    ty = -jy * sy

    # Replicated (or band-halo) padding on every side: the jitter-cancelled
    # resample's kernel reads up to 3 px outside the render grid (lanczos3
    # radius) and scale_and_translate fills out-of-bounds with ZEROS — an
    # unpadded call leaves black fringes on jittered edges.
    K = 3
    if current_halo is not None:
        cur_p = current_halo  # (rh+2, rw, 3) real cross-band rows
    else:
        cur_p = jnp.concatenate([current[:1], current, current[-1:]], axis=0)
    mn_p, mx_p = _neighborhood_minmax(cur_p)
    mv_p = jnp.concatenate([mv[:1], mv, mv[-1:]], axis=0)
    stacked = jnp.concatenate([cur_p, mn_p, mx_p, mv_p], axis=-1)
    ep = K - 1  # rows/cols beyond the first replicated/halo ring
    stacked = jnp.concatenate(
        [jnp.repeat(stacked[:1], ep, axis=0), stacked,
         jnp.repeat(stacked[-1:], ep, axis=0)], axis=0
    )
    stacked = jnp.concatenate(
        [jnp.repeat(stacked[:, :1], K, axis=1), stacked,
         jnp.repeat(stacked[:, -1:], K, axis=1)], axis=1
    )  # (rh+2K, rw+2K, 11)
    scale = jnp.stack([jnp.float32(sy), jnp.float32(sx)])
    trans = jnp.stack([ty - K * sy, tx - K * sx])  # padded coords: t' = t - K*s
    # Current resamples through lanczos3 — the windowed-sinc reconstruction is
    # ~4x closer to ground truth than the tent kernel on detail near render
    # Nyquist (measured on the synthetic convergence fixture), which is what
    # temporal upscaling exists to recover. The clamp box and motion resample
    # LINEAR (a ringing min/max box would mis-clamp history).
    # bf16 resample for current + clamp box (measured 5.1 -> 3.8 ms lanczos,
    # tools/microbench_taau.py): ~0.4% quantization on values the clamp_pad/ring
    # inflation dwarfs, and the temporal accumulation averages out. Motion stays
    # f32 — an mv quantized at 2^-8 relative misplaces the history fetch by up
    # to ~0.5 output px, which the convergence fixture catches.
    cur_up = jax.image.scale_and_translate(
        stacked[..., 0:3].astype(jnp.bfloat16), (oh, out_w, 3), (0, 1),
        scale, trans, method="lanczos3", antialias=False,
    ).astype(jnp.float32)
    box = jax.image.scale_and_translate(
        stacked[..., 3:9].astype(jnp.bfloat16), (oh, out_w, 6), (0, 1),
        scale, trans, method="linear", antialias=False,
    ).astype(jnp.float32)
    mv_up = jax.image.scale_and_translate(
        stacked[..., 9:11], (oh, out_w, 2), (0, 1), scale, trans,
        method="linear", antialias=False,
    )
    mn_up = box[..., 0:3]
    mx_up = box[..., 3:6]
    # Lanczos overshoot control: ring suppression against the local box
    # (FSR's deringing analog) — inflate mildly so legitimate sharpness survives.
    ring = 0.25 * (mx_up - mn_up)
    cur_up = jnp.clip(cur_up, mn_up - ring, mx_up + ring)

    px = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    py = (jnp.arange(oh, dtype=jnp.float32) + 0.5 + row_offset * sy) / oh_full
    uv = jnp.stack(
        [jnp.broadcast_to(px[None, :], (oh, out_w)),
         jnp.broadcast_to(py[:, None], (oh, out_w))],
        axis=-1,
    )
    prev_uv = uv - mv_up
    hist = (_bilinear_sample_packed8 if pack8 else _bilinear_sample_packed)(
        history, prev_uv
    )
    pad = clamp_pad * (mx_up - mn_up)
    hist = jnp.clip(hist, mn_up - pad, mx_up + pad)

    # Subpixel confidence: distance (render px) from this output pixel's
    # jitter-cancelled sample position to the nearest render sample center.
    ox = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / sx - 0.5 - jx
    oy = (jnp.arange(oh, dtype=jnp.float32) + 0.5) / sy - 0.5 + jy
    dx = ox - jnp.round(ox)
    dy = oy - jnp.round(oy)
    d2 = dx[None, :] ** 2 + dy[:, None] ** 2
    w_new = jnp.exp(-conf_sigma * d2)[..., None]

    on_screen = (
        (prev_uv[..., 0] >= 0.0)
        & (prev_uv[..., 0] <= 1.0)
        & (prev_uv[..., 1] >= 0.0)
        & (prev_uv[..., 1] <= 1.0)
    )[..., None]
    alpha = jnp.where(
        history_valid,
        jnp.float32(blend) * (alpha_floor + (1.0 - alpha_floor) * w_new),
        jnp.float32(1.0),
    )
    alpha = jnp.where(on_screen, alpha, 1.0)
    resolved = hist + (cur_up - hist) * alpha
    return resolved, resolved


def upscale_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Render-res -> output-res (scene_upsample.frag bilinear contract)."""
    if img.shape[0] == out_h and img.shape[1] == out_w:
        return img
    return jax.image.resize(img, (out_h, out_w, img.shape[-1]), method="linear")

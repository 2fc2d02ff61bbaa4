"""Pyramidal Lucas-Kanade feature tracking in JAX.

Replaces the reference's OpenCV ``calcOpticalFlowPyrLK`` usage
(TrackPlane::perform_matching, TrackPlane.cpp:1299-1357): 21×21 window,
pyramid levels, iterative LK with bidirectional (forward-backward) validation.
All per-feature work is vmapped; image-level work (pyramids, gradients) is
convolution — both map well onto the TPU.

Images are float32 [H, W] in [0, 1].
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KltOptions(NamedTuple):
    levels: int = 4
    window: int = 10          # half-window (patch = (2w+1)²)
    iters: int = 15
    min_eig: float = 1e-4     # G conditioning gate
    # Outlier gates. The reference keeps LK permissive (OpenCV status only)
    # and rejects outliers downstream with RANSAC (TrackPlane.cpp:1299-1357);
    # over-tight photometric/FB gates here kill ~60% of genuinely good tracks
    # per frame (surfaces change appearance with depth/viewpoint), which
    # destroys the long tracks plane clustering needs.
    fb_thresh: float = 1.5    # forward-backward px gate (at level 0)
    max_err: float = 0.20     # mean abs photometric residual gate
    # fb_check=False runs forward-only LK — the reference's own dataflow
    # (one calcOpticalFlowPyrLK call, TrackPlane.cpp:1329; outliers go to the
    # downstream RANSAC). Halves the tracker's sequential device chain.
    fb_check: bool = True
    # Patch sampler. 'slice': per-feature dynamic_slice gathers (exact, the
    # CPU-friendly form). 'mm': bilinear interpolation as two one-hot matmuls
    # per sample — S_y[N,P,H] @ img @ S_x[N,P,W]ᵀ with the bilinear weights
    # folded into the selector matrices — which moves the whole patch
    # extraction onto the MXU. On the TPU the vmapped dynamic_slice lowers to
    # serialized gathers (latency-bound); the matmul form is dense batched
    # GEMM the systolic array eats. 'mm_bf16': same with bf16 operands and
    # f32 accumulation (images live in [0,1]; quantization ~0.2% intensity,
    # well under the tracking noise floor) for 2x MXU rate and half the HBM.
    sampler: str = "slice"


def _gauss_kernel(dtype):
    k = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0], dtype)
    k = k / jnp.sum(k)
    return k


def pyr_down(img):
    """5-tap Gaussian blur + 2x decimation (cv::pyrDown equivalent).

    Separable shift-and-add form: 1-channel convolutions (vmapped 1-D
    convolve / conv_general_dilated) lower terribly on the TPU — the MXU
    wants many channels and tiny-channel convs fall to latency-bound code
    (measured: the B=32 pyramid+prepare stage dominated the fused step at
    ~1.9 s standalone). Static shifted slices + FMAs are pure VPU work that
    XLA fuses with neighbors. The kernel is symmetric, so this is exactly
    the previous convolve (up to FP summation order)."""
    k = _gauss_kernel(img.dtype)
    pad = 2
    x = jnp.pad(img, ((pad, pad), (pad, pad)), mode="edge")
    x = (k[0] * x[:, :-4] + k[1] * x[:, 1:-3] + k[2] * x[:, 2:-2]
         + k[3] * x[:, 3:-1] + k[4] * x[:, 4:])                    # rows
    x = (k[0] * x[:-4] + k[1] * x[1:-3] + k[2] * x[2:-2]
         + k[3] * x[3:-1] + k[4] * x[4:])                          # cols
    return x[::2, ::2]


def build_pyramid(img, levels: int):
    """Returns a list of [H/2^l, W/2^l] images."""
    pyr = [img]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def _scharr_gradients(img):
    """3×3 Scharr x/y gradients (normalized)."""
    kx = jnp.asarray([[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]], img.dtype) / 32.0
    ky = kx.T
    x = jnp.pad(img, ((1, 1), (1, 1)), mode="edge")
    gx = jax.lax.conv_general_dilated(
        x[None, None], kx[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    gy = jax.lax.conv_general_dilated(
        x[None, None], ky[None, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0, 0]
    return gx, gy


def _pad_edge(img, w: int):
    """Edge-replicate pad by w+1 so any patch slice below stays in bounds."""
    p = w + 1
    return jnp.pad(img, ((p, p), (p, p)), mode="edge")


def _bilinear_patch(padded, center_xy, w: int):
    """[2w+1, 2w+1] bilinear patch at fractional center from a _pad_edge image.

    One contiguous dynamic_slice of the (2w+2)² support + 4 shifted blends,
    instead of per-pixel 4-point gathers: a vmapped dynamic_slice lowers to a
    single windowed gather (contiguous rows), which is the difference between
    memory-bound and latency-bound on both CPU and the TPU vector unit. The
    bilinear weights are constant across the patch because the offsets are
    integers, so the blend is 4 vector FMAs.
    """
    x, y = center_xy[0], center_xy[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(padded.dtype)
    fy = (y - y0).astype(padded.dtype)
    Hp, Wp = padded.shape
    sz = 2 * w + 2
    # Original pixel (r, c) lives at padded[r + w + 1, c + w + 1]; the patch
    # support starts at original (y0 - w, x0 - w) → padded (y0 + 1, x0 + 1).
    # The clip replicates the edge for centers up to 1 px outside the image
    # (beyond that the patch saturates at the border block — such tracks are
    # dead on arrival at the in_bounds/fb gates anyway).
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, Wp - sz)
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, Hp - sz)
    raw = jax.lax.dynamic_slice(padded, (yi, xi), (sz, sz))
    a = raw[:-1, :-1]
    b = raw[:-1, 1:]
    c = raw[1:, :-1]
    d = raw[1:, 1:]
    return a * (1 - fx) * (1 - fy) + b * fx * (1 - fy) + c * (1 - fx) * fy + d * fx * fy


def _bilinear_selectors(padded_shape, centers, w: int, dtype):
    """One-hot bilinear selector matrices for a batch of patch centers.

    Returns (Sy [N, P, Hp], Sx [N, P, Wp]) with P = 2w+1 such that
    ``einsum('nph,hw,nqw->npq', Sy, padded, Sx)`` equals the per-feature
    ``_bilinear_patch`` output exactly (same corner clipping): each selector
    row carries the two bilinear taps ((1-f) at i, f at i+1), so the
    interpolation itself rides the MXU contraction.
    """
    Hp, Wp = padded_shape
    P = 2 * w + 1
    x, y = centers[:, 0], centers[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(dtype)[:, None, None]
    fy = (y - y0).astype(dtype)[:, None, None]
    yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, Hp - (P + 1))
    xi = jnp.clip(x0.astype(jnp.int32) + 1, 0, Wp - (P + 1))
    rows = yi[:, None] + jnp.arange(P, dtype=jnp.int32)[None]      # [N, P]
    cols = xi[:, None] + jnp.arange(P, dtype=jnp.int32)[None]
    ih = jnp.arange(Hp, dtype=jnp.int32)[None, None]
    iw = jnp.arange(Wp, dtype=jnp.int32)[None, None]
    r3 = rows[..., None]
    c3 = cols[..., None]
    one = jnp.asarray(1.0, dtype)
    Sy = jnp.where(ih == r3, one - fy, 0.0) + jnp.where(ih == r3 + 1, fy, 0.0)
    Sx = jnp.where(iw == c3, one - fx, 0.0) + jnp.where(iw == c3 + 1, fx, 0.0)
    return Sy.astype(dtype), Sx.astype(dtype)


def _sample_batch(padded_stack, centers, w: int, dtype, rows_by_gather=False):
    """Bilinear patches for N centers from C stacked padded images via MXU
    contractions. padded_stack [C, Hp, Wp]; centers [N, 2]; returns
    [C, N, P, P] float32.

    The sampler's precision is explicit (never the global matmul-precision
    flag): f32 operands contract exactly (HIGHEST), bf16 operands take the
    native single MXU pass — the global 'highest' default would silently run
    the f32 selector GEMMs as 6-pass bf16x3², ~6x the FLOPs for interpolation
    that tolerates bf16 outright.

    rows_by_gather=True replaces the row-selection GEMM (which multiplies the
    one-hot selector against the WHOLE image — dense FLOPs, 97% zeros) with a
    row gather + 2-tap vertical blend, keeping only the cheap x-selection
    GEMM. Which wins on the TPU depends on gather throughput vs MXU rate;
    both are exposed for A/B (sampler='rowmm*').
    """
    C, Hp, Wp = padded_stack.shape
    P = 2 * w + 1
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    imgs = padded_stack.astype(dtype)
    if rows_by_gather:
        x, y = centers[:, 0], centers[:, 1]
        y0 = jnp.floor(y)
        fy = (y - y0).astype(jnp.float32)[None, :, None, None]
        yi = jnp.clip(y0.astype(jnp.int32) + 1, 0, Hp - (P + 1))
        ridx = yi[:, None] + jnp.arange(P + 1, dtype=jnp.int32)[None]  # [N,P+1]
        rows = imgs[:, ridx].astype(jnp.float32)        # [C, N, P+1, Wp]
        rowsel = (rows[:, :, :P] * (1.0 - fy) + rows[:, :, 1:] * fy)
        _, Sx = _bilinear_selectors((Hp, Wp), centers, w, dtype)
        # [C,N,P,Wp] x [N,P',Wp] -> [N,C,P,P'] (batch N leads the output).
        patches = jax.lax.dot_general(
            rowsel.astype(dtype), Sx, (((3,), (2,)), ((1,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)
        return jnp.transpose(patches, (1, 0, 2, 3))
    Sy, Sx = _bilinear_selectors((Hp, Wp), centers, w, dtype)
    # [N,P,Hp] x [C,Hp,Wp] -> [N,P,C,Wp]: one dot_general, f32 accumulation.
    rowsel = jax.lax.dot_general(
        Sy, imgs, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    # [N,P,C,Wp] x [N,P',Wp] -> contract Wp with N batched: [N,C,P,P'].
    patches = jax.lax.dot_general(
        rowsel.astype(dtype), Sx, (((3,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=prec)  # [N, P, C, P']
    return jnp.transpose(patches, (2, 0, 1, 3))


def _track_level_batch(img0, gx0, gy0, img1, pts0, guess,
                       opts: KltOptions, dtype, rows_by_gather=False):
    """Batched-matmul form of _track_level: all N features at once, patch
    sampling on the MXU (see KltOptions.sampler). Same semantics: flat
    patches keep the incoming guess; divergent steps halt iteration."""
    w = opts.window
    tpl = _sample_batch(jnp.stack([img0, gx0, gy0]), pts0, w, dtype,
                        rows_by_gather)
    t_patch, gx_p, gy_p = tpl[0], tpl[1], tpl[2]            # [N, P, P] f32
    gxx = jnp.sum(gx_p * gx_p, axis=(1, 2))
    gxy = jnp.sum(gx_p * gy_p, axis=(1, 2))
    gyy = jnp.sum(gy_p * gy_p, axis=(1, 2))
    det = gxx * gyy - gxy * gxy
    min_eig = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy**2))
    n_px = (2 * w + 1) ** 2
    ok = min_eig / n_px > opts.min_eig
    det_s = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    max_step2 = float(2 * w + 1) ** 2
    img1s = img1[None]

    def body(carry, _):
        flow, active = carry
        cur = _sample_batch(img1s, pts0 + flow, w, dtype, rows_by_gather)[0]
        di = cur - t_patch
        bx = jnp.sum(di * gx_p, axis=(1, 2))
        by = jnp.sum(di * gy_p, axis=(1, 2))
        dx = (gyy * bx - gxy * by) / det_s
        dy = (-gxy * bx + gxx * by) / det_s
        delta = jnp.stack([dx, dy], axis=1)                 # [N, 2]
        step_ok = (jnp.all(jnp.isfinite(delta), axis=1)
                   & (jnp.sum(delta * delta, axis=1) <= max_step2))
        upd = active & step_ok
        return (jnp.where(upd[:, None], flow - delta, flow), upd), None

    (flow, _), _ = jax.lax.scan(body, (guess, ok), None, length=opts.iters)
    final = _sample_batch(img1s, pts0 + flow, w, dtype, rows_by_gather)[0]
    err = jnp.mean(jnp.abs(final - t_patch), axis=(1, 2))
    return flow, ok, err


def _track_level(img0, gx0, gy0, img1, pt0, guess, opts: KltOptions):
    """Track one feature at one pyramid level. Returns (flow, ok, err).

    OpenCV-matching failure semantics (the earlier stricter variant killed
    ~50% of FRESH detections on their first track, capping co-planar support
    below plane_init_min_feat — measured, not hypothetical):

    * a patch below the min-eig conditioning gate at THIS level keeps the
      incoming flow guess instead of iterating on garbage (coarse pyramid
      levels are legitimately flat under band-limited texture; cv::
      calcOpticalFlowPyrLK only rejects the feature when level 0 fails);
    * a divergent Newton step (non-finite, or larger than the patch window —
      the near-singular-det explosion) halts iteration at this level rather
      than launching the track tens of pixels away, which previously turned
      one flat level into an unrecoverable forward-backward failure.
    """
    w = opts.window

    t_patch = _bilinear_patch(img0, pt0, w)
    gx_p = _bilinear_patch(gx0, pt0, w)
    gy_p = _bilinear_patch(gy0, pt0, w)
    gxx = jnp.sum(gx_p * gx_p)
    gxy = jnp.sum(gx_p * gy_p)
    gyy = jnp.sum(gy_p * gy_p)
    det = gxx * gyy - gxy * gxy
    min_eig = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy**2))
    n_px = (2 * w + 1) ** 2
    ok = min_eig / n_px > opts.min_eig
    det_s = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    max_step = jnp.asarray(float(2 * w + 1), pt0.dtype)

    def body(carry, _):
        flow, active = carry
        cur = _bilinear_patch(img1, pt0 + flow, w)
        di = cur - t_patch
        bx = jnp.sum(di * gx_p)
        by = jnp.sum(di * gy_p)
        dx = (gyy * bx - gxy * by) / det_s
        dy = (-gxy * bx + gxx * by) / det_s
        delta = jnp.stack([dx, dy])
        step_ok = jnp.all(jnp.isfinite(delta)) & (jnp.sum(delta * delta) <= max_step * max_step)
        upd = active & step_ok
        return (jnp.where(upd, flow - delta, flow), upd), None

    (flow, _), _ = jax.lax.scan(body, (guess, ok), None, length=opts.iters)
    final = _bilinear_patch(img1, pt0 + flow, w)
    err = jnp.mean(jnp.abs(final - t_patch))
    return flow, ok, err


class PreparedPyramid(NamedTuple):
    """Edge-padded pyramid + Scharr gradients, computed once per frame.

    A frame's preparation is reused as the template side of the NEXT frame's
    track call (the pipeline caches it), halving the per-frame convolution
    and padding work versus re-deriving both sides inside track().
    """

    imgs: tuple    # raw per-level images (level 0 = full res)
    padded: tuple  # edge-padded per-level images
    grads: tuple   # per-level (gx_padded, gy_padded)


@functools.partial(jax.jit, static_argnames=("window",))
def prepare_pyramid(pyr, window: int) -> PreparedPyramid:
    """Pad + differentiate a pyramid for track(): pure convolutions, so the
    per-feature patch sampler stays a bare dynamic_slice."""
    pyr = tuple(pyr)
    padded = tuple(_pad_edge(img, window) for img in pyr)
    grads = tuple(tuple(_pad_edge(g, window) for g in _scharr_gradients(img))
                  for img in pyr)
    return PreparedPyramid(pyr, padded, grads)


@functools.partial(jax.jit, static_argnames=("opts",))
def track(pyr0, pyr1, pts0, mask, opts: KltOptions, init_flow=None):
    """Track points pts0 [N, 2] (x, y pixels) from pyramid 0 to pyramid 1.

    pyr0/pyr1: PreparedPyramid (preferred — cache the previous frame's), or
    plain tuples of per-level images (prepared internally).
    Returns (pts1 [N, 2], ok [N]) with forward-backward validation.

    init_flow [N, 2]: optional per-feature flow prediction (e.g. the
    gyro-induced rotation flow). LK's convergence basin is roughly the patch
    window at each pyramid level; when inter-frame motion exceeds it AND the
    scene texture is too fine to survive coarse pyramid levels, a prior is
    the difference between tracking and sliding onto lookalike texture.
    """
    w = opts.window
    prep0 = pyr0 if isinstance(pyr0, PreparedPyramid) else prepare_pyramid(pyr0, w)
    prep1 = pyr1 if isinstance(pyr1, PreparedPyramid) else prepare_pyramid(pyr1, w)
    levels = len(prep0.imgs)
    grads0, grads1 = prep0.grads, prep1.grads
    pyr0p, pyr1p = prep0.padded, prep1.padded
    if init_flow is None:
        init_flow = jnp.zeros_like(pts0)

    mm_dtype = jnp.bfloat16 if opts.sampler.endswith("_bf16") else jnp.float32
    mm_rows = opts.sampler.startswith("rowmm")

    def run(pyra, gradsa, pyrb, pts_from, m, flow0):
        if opts.sampler != "slice":
            # Whole feature batch at once; patch sampling on the MXU.
            flow = flow0
            okl = jnp.ones(pts_from.shape[0], bool)
            err = jnp.zeros(pts_from.shape[0], pts_from.dtype)
            for lvl in range(levels - 1, -1, -1):
                scale = 2.0**lvl
                gx0, gy0 = gradsa[lvl]
                f_l, ok_l, err = _track_level_batch(
                    pyra[lvl], gx0, gy0, pyrb[lvl], pts_from / scale,
                    flow / scale, opts, mm_dtype, mm_rows)
                flow = f_l * scale
                okl = ok_l
            return pts_from + flow, okl, err

        def one(pt0, f0):
            flow = f0
            okl = jnp.asarray(True)
            err = jnp.asarray(0.0, pt0.dtype)
            for lvl in range(levels - 1, -1, -1):
                scale = 2.0**lvl
                gx0, gy0 = gradsa[lvl]
                f_l, ok_l, err = _track_level(pyra[lvl], gx0, gy0, pyrb[lvl], pt0 / scale, flow / scale, opts)
                flow = f_l * scale
                # Validity gates on the FINEST level's conditioning only
                # (cv::calcOpticalFlowPyrLK semantics): flat coarse levels
                # merely skip refinement inside _track_level.
                okl = ok_l
            return pt0 + flow, okl, err

        return jax.vmap(one)(pts_from, flow0)

    p1, ok_f, err_f = run(pyr0p, grads0, pyr1p, pts0, mask, init_flow)
    H, W = prep0.imgs[0].shape
    in_bounds = (p1[:, 0] >= 1) & (p1[:, 0] < W - 1) & (p1[:, 1] >= 1) & (p1[:, 1] < H - 1)
    ok = mask & ok_f & (err_f < opts.max_err) & in_bounds
    if opts.fb_check:
        p_back, ok_b, _ = run(pyr1p, grads1, pyr0p, p1, mask, -init_flow)
        fb = jnp.linalg.norm(p_back - pts0, axis=1)
        ok = ok & ok_b & (fb < opts.fb_thresh)
    return p1, ok

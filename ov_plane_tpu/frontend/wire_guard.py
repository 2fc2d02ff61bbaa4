"""Wire-dtype / patch-sampler safety guard (VERDICT r3 #5).

The fused vision path has two quantized fast modes:

* ``u8`` image wire — 4x less host→device transfer (the dominant cost through
  a remote tunnel; ~1 ms over local PCIe);
* ``mm_bf16`` KLT patch sampler — bilinear patch gathers as bf16 one-hot
  GEMMs on the MXU (~4.6 ms vs 21 ms f32 at 32 streams on the v5e).

Round-3 measurement (BASELINE.md) showed dim low-gradient synthetic imagery
*diverging* under these modes, so the driver default stayed f32/'mm' and the
bench opted in by hand — safe-by-scene-selection, not safe-by-construction.

Round-4 measurement closed the mechanism: **the dim scene diverges under
8-bit quantization itself, wherever it happens**. Pre-quantizing the SOURCE
frames to the u8 lattice (what any real camera does) and running the exact
f32/'mm' path produces the same divergence (final error 1.99 vs 2.00) — the
scene's tracking signal lives below one 8-bit quantization step, so it cannot
be observed through a real 8-bit camera at all. The u8 wire adds exactly
nothing once the source is 8-bit, and bf16 patch rounding (≤ 2^-8 relative)
is at/below the source's own quantization floor (measured on the 8-bit dim
scene: mm_bf16 final error 1.56 vs f32/mm's 1.99 — not the failure mode).

Hence the guard is *exact*, not heuristic:

    quantized modes  ⟺  the source image is already 8-bit-representable.

Real data (EuRoC PNGs, camera drivers, bag Image msgs — the reference ingests
8-bit mono, TrackPlane.cpp:463) passes bit-exactly and gets the fast modes
automatically; synthetic float imagery with sub-quantum signal keeps the
exact f32/'mm' path. No threshold to tune, nothing scene-class-dependent.
"""

from __future__ import annotations

import numpy as np

# Tolerance on |img*255 - round(img*255)|: u8-derived floats round-trip to
# ~1e-7 (one f32 rounding of k/255); anything real stays far below 1e-3.
U8_LATTICE_TOL = 1e-3


def u8_representable(img, tol: float = U8_LATTICE_TOL) -> bool:
    """True iff every pixel of ``img`` (float in [0,1] or uint8) lies on the
    8-bit lattice k/255 — i.e. u8 quantization of this image is LOSSLESS."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return True
    x = img.astype(np.float32, copy=False) * np.float32(255.0)
    if x.size == 0:
        return True
    if float(x.min()) < -tol or float(x.max()) > 255.0 + tol:
        return False
    return float(np.abs(x - np.rint(x)).max()) <= tol


def resolve_wire_and_sampler(img, wire_req: str, sampler_req: str):
    """Resolve 'auto' wire/sampler requests against the first image (batch:
    [B, H, W] — ALL streams must pass for the batch to take a quantized mode;
    one compiled program serves the whole batch).

    Returns (wire, sampler, info_dict). Non-'auto' requests pass through
    unchanged (explicit user/env choice wins — including explicitly unsafe
    ones, which is what the round-3 measurements needed).
    """
    need = (wire_req == "auto") or (sampler_req == "auto")
    lossless = u8_representable(img) if need else None
    wire = wire_req if wire_req != "auto" else ("u8" if lossless else "f32")
    sampler = sampler_req if sampler_req != "auto" else ("mm_bf16" if lossless else "mm")
    info = {
        "u8_lossless": lossless,
        "wire": wire,
        "sampler": sampler,
        "reason": (
            None if not need else
            "source on the 8-bit lattice: u8 wire is bit-lossless; bf16 patch "
            "rounding is below the source's own quantization floor" if lossless else
            "float source with sub-8-bit signal: quantized modes would destroy "
            "information the exact path preserves (and no 8-bit camera could "
            "capture) — staying f32/'mm'"),
    }
    return wire, sampler, info

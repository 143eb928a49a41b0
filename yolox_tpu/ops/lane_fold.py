"""Lane folding: run small-channel conv stages lane-dense on TPU.

TPU tiled layouts pad the minor (lane) dimension of every tensor to 128.
The early CSPDarknet stages have C = 12..64 channels at the largest
spatial sizes, so their activations physically move 2-10x their logical
bytes through HBM — measured to dominate the train step's traffic
(docs/train_step_performance.md). The reference never faces this: CUDA
NCHW tensors have no lane quantization (semantics owner
`/root/reference/yolox/models/network_blocks.py`, `darknet.py`).

The fix is a *representation* change, not an approximation: fold the
width axis into channels,

    folded[b, h, u, c*k + j] = logical[b, h, k*u + j, c]   ("channel-major")

so a stage with C channels runs at k*C >= 128 lanes and every tensor is
lane-dense. Convolutions act on the folded representation exactly, with a
block-structured kernel derived from the logical kernel:

    logical w_in = s*w_out + dx - pad, w_out = k_out*u' + j',
    w_in = k_in*v + j2  =>  v = sigma*u' + g,
    sigma = s*k_out/k_in (must be a positive integer),
    t = s*j' + dx - pad, g = floor(t/k_in), j2 = t - g*k_in

i.e. a folded conv with stride sigma and a small folded kernel width
(the set of distinct g). Zero blocks in the folded kernel cost extra MXU
FLOPs (k x for a k-fold) but the step is HBM-bound with ~50% MXU
headroom; measured on a v5e the folded fwd+bwd of the dark2/dark3-shaped
blocks is 1.6-1.8x faster end to end.

Fold factors halve across stride-2 downsamples (channels double), so
sigma == 1 along the whole backbone chain and k*C stays constant. The
fold never changes parameter shapes or the state-dict layout — kernels
are scattered into folded form inside the forward (autodiff carries
gradients back through the scatter exactly).

Depthwise convs are NOT folded to grouped convs: a
`feature_group_count=C` conv whose groups each span k_in folded slots
makes XLA's TPU conv lowering explode at scale (a nano b256 serving
graph exceeded a 10-minute compile budget). Instead `fold_conv_dw_taps`
evaluates the depthwise conv directly in the folded representation as
kh*kw slot-shifted elementwise multiply-adds: in the 5-D view
(B, H, Wf, C, k_in), every tap (dy, dx) reads a strided slice of the
slot axis (with spill into the neighbouring folded column at the block
boundary) and multiplies by the per-channel tap weight. All taps fuse
into one elementwise pass over lane-dense tensors — no conv op at all,
fast to compile, exact, and the VPU work is proportional to the logical
(not padded) element count.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def fold(x, k: int):
    """(B, H, W, C) -> (B, H, W/k, C*k), channel-major slots."""
    if k == 1:
        return x
    b, h, w, c = x.shape
    assert w % k == 0, (w, k)
    x = x.reshape(b, h, w // k, k, c)
    return jnp.transpose(x, (0, 1, 2, 4, 3)).reshape(b, h, w // k, c * k)


def unfold(x, k: int):
    """(B, H, Wf, C*k) -> (B, H, Wf*k, C): inverse of `fold`."""
    if k == 1:
        return x
    b, h, wf, ck = x.shape
    c = ck // k
    x = x.reshape(b, h, wf, c, k)
    return jnp.transpose(x, (0, 1, 2, 4, 3)).reshape(b, h, wf * k, c)


def _tap_table(kw: int, stride: int, pad: int, k_in: int, k_out: int):
    sigma, rem = divmod(stride * k_out, k_in)
    assert rem == 0 and sigma >= 1, (
        f"invalid fold chain: stride={stride} k_in={k_in} k_out={k_out}")
    taps = []
    for jp in range(k_out):
        for dx in range(kw):
            t = stride * jp + dx - pad
            g = t // k_in
            taps.append((jp, dx, g, t - g * k_in))
    g_min = min(g for _, _, g, _ in taps)
    g_max = max(g for _, _, g, _ in taps)
    return taps, g_min, g_max, sigma


def fold_kernel(w, stride: int, pad: int, k_in: int, k_out: int):
    """Logical HWIO kernel (kh, kw, Ci, Co) -> folded
    (kh, kwf, Ci*k_in, Co*k_out); returns (w_f, pad_left, g_max, sigma)."""
    kh, kw, ci, co = w.shape
    taps, g_min, g_max, sigma = _tap_table(kw, stride, pad, k_in, k_out)
    wf = jnp.zeros((kh, g_max - g_min + 1, ci * k_in, co * k_out), w.dtype)
    for jp, dx, g, j2 in taps:
        wf = wf.at[:, g - g_min, j2::k_in, jp::k_out].set(w[:, dx])
    return wf, -g_min, g_max, sigma


def fold_kernel_dw(w, stride: int, pad: int, k_in: int, k_out: int):
    """Depthwise logical kernel (kh, kw, 1, C) -> folded grouped kernel
    (kh, kwf, k_in, C*k_out) for feature_group_count=C."""
    kh, kw, one, c = w.shape
    assert one == 1
    taps, g_min, g_max, sigma = _tap_table(kw, stride, pad, k_in, k_out)
    wf = jnp.zeros((kh, g_max - g_min + 1, k_in, c * k_out), w.dtype)
    for jp, dx, g, j2 in taps:
        wf = wf.at[:, g - g_min, j2, jp::k_out].set(w[:, dx, 0])
    return wf, -g_min, g_max, sigma


def fold_conv_dw_taps(x, w, stride: int, pad: Tuple[int, int],
                      k_in: int, k_out: int):
    """Depthwise conv on a channel-major folded input, evaluated as
    kh*kw slot-shifted elementwise multiply-adds (no grouped conv).

    `x`: (B, H, Wf, C*k_in); `w`: logical depthwise kernel (kh, kw, 1, C);
    `pad`: logical (pad_h, pad_w). Requires sigma = stride*k_out/k_in == 1
    (true for every depthwise conv in the backbone: in-stage convs are
    stride 1 with k_out == k_in, downsamples are stride 2 with
    k_out == k_in/2). Exactly equivalent to unfold -> dw conv -> fold.
    """
    kh, kw, one, c = w.shape
    assert one == 1
    ph, pw = pad
    assert stride * k_out == k_in, (stride, k_in, k_out)
    b, h, wf, cik = x.shape
    assert cik == c * k_in, (cik, c, k_in)
    w_log = wf * k_in
    w_out_log = (w_log + 2 * pw - kw) // stride + 1
    assert w_out_log % k_out == 0, (w_out_log, k_out)
    wf_out = w_out_log // k_out
    # sigma == 1 keeps the folded width; taps only ever spill one folded
    # column left/right (|t| <= stride*(k_out-1) + kw - 1 - pw < 2*k_in
    # for the 3x3/5x5 kernels used here).
    assert wf_out == wf, (wf_out, wf)
    h_out = (h + 2 * ph - kh) // stride + 1

    x5 = x.reshape(b, h, wf, c, k_in)
    x5 = jnp.pad(x5, ((0, 0), (ph, ph), (1, 1), (0, 0), (0, 0)))
    out = None
    for dy in range(kh):
        xr = jax.lax.slice_in_dim(
            x5, dy, dy + stride * (h_out - 1) + 1, stride, axis=1)
        for dx in range(kw):
            # source slot of output slot j': t = stride*j' + dx - pw,
            # read from folded column u + floor(t/k_in), slot t mod k_in.
            pieces = []
            j = 0
            while j < k_out:
                t = stride * j + dx - pw
                g = t // k_in
                # last j' (exclusive) still reading from column offset g
                j_end = min(k_out,
                            -(-((g + 1) * k_in - (dx - pw)) // stride))
                count = j_end - j
                j2 = t - g * k_in
                assert 0 <= g + 1 <= 2 and 0 <= j2 < k_in, (g, j2)
                piece = jax.lax.slice(
                    xr,
                    (0, 0, 1 + g, 0, j2),
                    (b, h_out, 1 + g + wf, c,
                     j2 + stride * (count - 1) + 1),
                    (1, 1, 1, 1, stride))
                pieces.append(piece)
                j = j_end
            gathered = (jnp.concatenate(pieces, axis=-1)
                        if len(pieces) > 1 else pieces[0])
            term = gathered * w[dy, dx, 0][:, None].astype(x.dtype)
            out = term if out is None else out + term
    return out.reshape(b, h_out, wf, c * k_out)


def fold_conv(x, w, stride: int, pad: Tuple[int, int], k_in: int,
              k_out: int, groups: int = 1):
    """Conv on a channel-major folded input; returns the folded output.

    `x`: (B, H, Wf, Ci*k_in); `w`: the LOGICAL kernel (kh, kw, Ci/groups
    -- with groups either 1 or Ci (depthwise) -- , Co); `pad`: logical
    (pad_h, pad_w). Exactly equivalent to unfold -> conv2d -> fold.
    """
    kh, kw = w.shape[0], w.shape[1]
    ph, pw = pad
    b, h, wf_in, cik = x.shape
    w_log = wf_in * k_in
    w_out_log = (w_log + 2 * pw - kw) // stride + 1
    assert w_out_log % k_out == 0, (w_out_log, k_out)
    wf_out = w_out_log // k_out

    if groups == 1:
        wfk, pl, g_max, sigma = fold_kernel(w, stride, pw, k_in, k_out)
        fg = 1
    else:
        ci = cik // k_in
        assert groups == ci, "folded conv supports groups in {1, Ci}"
        if stride * k_out == k_in:
            # the common depthwise case (sigma == 1): tap evaluation,
            # no grouped conv (see module docstring — compile scaling)
            return fold_conv_dw_taps(x, w, stride, pad, k_in, k_out)
        wfk, pl, g_max, sigma = fold_kernel_dw(w, stride, pw, k_in, k_out)
        fg = ci
    pr = sigma * (wf_out - 1) + g_max - (wf_in - 1)
    return jax.lax.conv_general_dilated(
        x, wfk.astype(x.dtype), (stride, sigma),
        ((ph, ph), (pl, pr)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fg)


def stage_folds(base_channels: int, target: int = 256, cap: int = 16):
    """Fold factors (stem, dark2..dark5) for a CSPDarknet whose stage
    channels are base*{1,2,4,8,16}: the stem fold is the smallest power
    of two reaching `target` lanes; folds halve at each downsample so
    k*C is constant and every folded stride is 1.

    A k-fold costs k x the folded conv's MXU FLOPs, so folding pays only
    where HBM bytes, not FLOPs, set the wall time: it is enabled for the
    train step (Ctx.lane_fold via apply_train) and left off for the
    compute-bound serving path (measured: train 470 -> 547 img/s at
    target=256; serving 3404 -> 2561 with the same folds). target=256
    beats both the minimal lane-dense 128 (526 img/s — the step stays
    bandwidth-bound and the deeper fold trims per-row tile overhead) and
    512 (320 img/s — an 8x stem fold tips the early stages into being
    MXU-bound)."""
    k = 1
    while k < cap and k * base_channels < target:
        k *= 2
    folds = []
    for _ in range(5):
        folds.append(k)
        k = max(1, k // 2)
    return tuple(folds)  # (stem, dark2, dark3, dark4, dark5)

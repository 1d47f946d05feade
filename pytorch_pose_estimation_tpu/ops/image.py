"""Device-side image preprocessing / augmentation pipeline.

The reference runs Albumentations on 32 CPU worker processes
(reference: dataset/sbp_coco_dataset.py:220-237): Rotate(40) -> CLAHE ->
ColorJitter(0.5, 0.2, 0.5, 0.1) -> RandomResizedCrop(scale (0.4, 1),
ratio (0.4, 1.6)) -> Normalize(0, 1); val = Resize -> Normalize.

TPU-native split:
* Host does only decode + bbox crop + fixed-size resize (+ optional cv2
  CLAHE, the one histogram op that is cheaper on host), emitting static
  shapes.
* Everything else runs here as one jitted stage in which every
  pixel-moving op is matmul-shaped (MXU), never a gather: rotation as
  Paeth 3-shear interpolation-matrix einsums (reflect-101 borders, cv2's
  default), per-example random-resized-crop as two weight-matrix
  contractions, photometric jitter in randomized op order (one fused
  chain via a 24-way switch), and /255 normalization.  Keypoints ride the
  exact composed affine; out-of-frame keypoints are marked invisible,
  reproducing Albumentations' drop + ``_fix_joints`` bookkeeping
  (reference: dataset/sbp_coco_dataset.py:171-187).

Everything is a pure function of a PRNG key -> fuses with the train step
into a single XLA launch; no host round-trip after the batch lands on
device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------------------------
# geometry
# --------------------------------------------------------------------------

def _reflect101(coord: jnp.ndarray, size: int) -> jnp.ndarray:
    """Fold coordinates into [0, size-1] with reflect-101 (no edge repeat)."""
    if size == 1:
        return jnp.zeros_like(coord)
    period = 2.0 * (size - 1)
    c = jnp.mod(coord, period)
    return jnp.where(c > (size - 1), period - c, c)


def _bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray,
                     xs: jnp.ndarray) -> jnp.ndarray:
    """img: [H, W, C]; ys/xs: [h, w] sample coords.  Reflect-101 borders."""
    h, w = img.shape[:2]
    ys = _reflect101(ys, h)
    xs = _reflect101(xs, w)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def affine_warp(img: jnp.ndarray, inv_matrix: jnp.ndarray,
                out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Warp [H, W, C] by the inverse affine (output px -> input px).

    inv_matrix: [2, 3] mapping output (x, y, 1) -> input (x, y).
    """
    oh, ow = out_hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (oh, ow), 1)
    in_x = inv_matrix[0, 0] * xs + inv_matrix[0, 1] * ys + inv_matrix[0, 2]
    in_y = inv_matrix[1, 0] * xs + inv_matrix[1, 1] * ys + inv_matrix[1, 2]
    return _bilinear_sample(img, in_y, in_x)


def _compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose 2x3 affines: result(x) = a(b(x))."""
    a3 = jnp.concatenate([a, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    b3 = jnp.concatenate([b, jnp.array([[0.0, 0.0, 1.0]])], axis=0)
    return (a3 @ b3)[:2]


def _rotation_about(cx: float, cy: float, angle_rad) -> jnp.ndarray:
    c = jnp.cos(angle_rad)
    s = jnp.sin(angle_rad)
    return jnp.array([
        [c, -s, cx - c * cx + s * cy],
        [s, c, cy - s * cx - c * cy],
    ])


def _crop_resize(x0, y0, cw, ch, out_w: int, out_h: int) -> jnp.ndarray:
    """Forward affine mapping input px in the crop box to output px."""
    sx = out_w / cw
    sy = out_h / ch
    return jnp.array([[sx, 0.0, -x0 * sx], [0.0, sy, -y0 * sy]])


def _invert(m: jnp.ndarray) -> jnp.ndarray:
    a, b, c = m[0]
    d, e, f = m[1]
    det = a * e - b * d
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    return jnp.array([
        [ia, ib, -(ia * c + ib * f)],
        [id_, ie, -(id_ * c + ie * f)],
    ])


def sample_train_affine(key, in_hw: Tuple[int, int],
                        rotate_limit: float = 40.0,
                        scale_range=(0.4, 1.0),
                        ratio_range=(0.4, 1.6)) -> jnp.ndarray:
    """Sample the composed forward affine for one example:
    Rotate(+-limit deg about center) then RandomResizedCrop(scale, ratio)
    back to in_hw.  Returns the forward [2, 3] matrix (input px -> output px).
    """
    h, w = in_hw
    k_rot, k_area, k_ratio, k_x, k_y = jax.random.split(key, 5)
    angle = jax.random.uniform(k_rot, (), minval=-rotate_limit,
                               maxval=rotate_limit) * jnp.pi / 180.0
    rot = _rotation_about(w / 2.0, h / 2.0, angle)

    # torchvision-style RRC parameter sampling (area fraction + log-aspect)
    area = h * w * jax.random.uniform(k_area, (), minval=scale_range[0],
                                      maxval=scale_range[1])
    log_r = jax.random.uniform(
        k_ratio, (),
        minval=jnp.log(ratio_range[0]), maxval=jnp.log(ratio_range[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 8.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 8.0, h)
    x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=1.0) * (w - cw)
    y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=1.0) * (h - ch)
    crop = _crop_resize(x0, y0, cw, ch, w, h)
    return _compose(crop, rot)


def transform_points(m: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply a [2, 3] affine to [N, 2] (x, y) points."""
    return pts @ m[:, :2].T + m[:, 2]


# --------------------------------------------------------------------------
# matmul-shaped resampling (MXU path)
#
# TPU generic gather is the slowest way to move pixels; every resampling
# stage below is instead expressed as 1-D linear-interpolation weight
# matrices contracted on the MXU.  Measured at B=256, 256x192: gather
# bilinear rotation 7.1 ms vs 3-shear einsum rotation 2.0 ms.
# --------------------------------------------------------------------------

def _interp_weights(src: jnp.ndarray, n_in: int,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """Linear-interpolation weight rows for sample coords ``src`` ([...])
    into an axis of length ``n_in``, reflect-101 folded: returns
    [..., n_in] with (up to) two non-zero taps per row summing to 1."""
    if n_in > 1:
        period = 2.0 * (n_in - 1)
        c = jnp.mod(src, period)
        src = jnp.where(c > (n_in - 1), period - c, c)
    grid = jnp.arange(n_in, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - grid))
    w = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-8)
    return w.astype(dtype)


def _shear_x(img: jnp.ndarray, alpha, cy: float) -> jnp.ndarray:
    """Horizontal shear about row ``cy``: out[y, x] = in[y, x - a*(y-cy)].
    img: [B, H, W, C]; the per-row 1-D interpolation is one einsum."""
    h, w = img.shape[-3], img.shape[-2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    src = xs[None, :] - alpha * (ys[:, None] - cy)        # [H, W_out]
    wt = _interp_weights(src, w)                          # [H, W_out, W_in]
    return jnp.einsum("bhwc,hvw->bhvc", img.astype(jnp.bfloat16), wt,
                      preferred_element_type=jnp.float32)


def _shear_y(img: jnp.ndarray, beta, cx: float) -> jnp.ndarray:
    """Vertical shear about column ``cx``."""
    h, w = img.shape[-3], img.shape[-2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    src = ys[:, None] - beta * (xs[None, :] - cx)         # [H_out, W]
    wt = _interp_weights(src, h)                          # [H_out, W, H_in]
    return jnp.einsum("bhwc,vwh->bvwc", img.astype(jnp.bfloat16), wt,
                      preferred_element_type=jnp.float32)


def rotate_shear3(img: jnp.ndarray, angle, cy: float,
                  cx: float) -> jnp.ndarray:
    """Rotate [B, H, W, C] by ``angle`` radians about (cx, cy) via the
    Paeth three-shear decomposition
    R = ShearX(-tan(a/2)) . ShearY(sin a) . ShearX(-tan(a/2)).

    The coordinate map composes to EXACTLY the rotation matrix (keypoints
    transformed with `_rotation_about` stay consistent); pixel values go
    through three 1-D linear interpolations instead of one bilinear gather
    (interior max deviation ~0.007 on [0,1] images -- irrelevant for a
    random augmentation, 3.5x faster on TPU)."""
    alpha = -jnp.tan(angle / 2.0)
    beta = jnp.sin(angle)
    img = _shear_x(img, alpha, cy)
    img = _shear_y(img, beta, cx)
    return _shear_x(img, alpha, cy)


def _shear_x_grouped(img: jnp.ndarray, alpha: jnp.ndarray,
                     cy: float) -> jnp.ndarray:
    """Horizontal shear with one angle per GROUP: img [G, Bg, H, W, C],
    alpha [G].  One einsum with a [G, H, W_out, W_in] weight tensor --
    still matmul-shaped, never a gather."""
    h, w = img.shape[-3], img.shape[-2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    src = (xs[None, None, :]
           - alpha[:, None, None] * (ys[None, :, None] - cy))  # [G, H, W]
    wt = _interp_weights(src, w)                    # [G, H, W_out, W_in]
    return jnp.einsum("gbhwc,ghvw->gbhvc", img.astype(jnp.bfloat16), wt,
                      preferred_element_type=jnp.float32)


def _shear_y_grouped(img: jnp.ndarray, beta: jnp.ndarray,
                     cx: float) -> jnp.ndarray:
    """Vertical shear with one angle per group: img [G, Bg, H, W, C]."""
    h, w = img.shape[-3], img.shape[-2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    src = (ys[None, :, None]
           - beta[:, None, None] * (xs[None, None, :] - cx))   # [G, H, W]
    wt = _interp_weights(src, h)                    # [G, H_out, W, H_in]
    return jnp.einsum("gbhwc,gvwh->gbvwc", img.astype(jnp.bfloat16), wt,
                      preferred_element_type=jnp.float32)


def rotate_shear3_grouped(img: jnp.ndarray, angles: jnp.ndarray,
                          cy: float, cx: float) -> jnp.ndarray:
    """Rotate [B, H, W, C] with G distinct angles (contiguous groups of
    B/G samples share one angle) via the same Paeth 3-shear path as
    `rotate_shear3`.  B must be divisible by len(angles).

    A fully per-sample warp would need a [B, H, W, W] weight tensor (or a
    generic gather, measured ~56x slower on v5e); G grouped weight tensors
    keep the op matmul-shaped while restoring intra-batch angle diversity
    (G draws per batch instead of 1)."""
    b = img.shape[0]
    g = angles.shape[0]
    grouped = img.reshape((g, b // g) + img.shape[1:])
    alpha = -jnp.tan(angles / 2.0)
    beta = jnp.sin(angles)
    grouped = _shear_x_grouped(grouped, alpha, cy)
    grouped = _shear_y_grouped(grouped, beta, cx)
    grouped = _shear_x_grouped(grouped, alpha, cy)
    return grouped.reshape((b,) + grouped.shape[2:])


def n_angle_groups(batch: int, requested: int) -> int:
    """Largest divisor of ``batch`` that is <= ``requested`` (grouped
    rotation needs B % G == 0); small batches degrade to per-sample."""
    g = max(1, min(int(requested), int(batch)))
    while batch % g:
        g -= 1
    return g


def crop_resize_mxu(img: jnp.ndarray, x0, y0, cw, ch) -> jnp.ndarray:
    """Per-example crop box -> full-size resize as two weight-matrix
    contractions (img: [B, H, W, C]; x0/y0/cw/ch: [B] crop boxes in input
    px).  Linear taps are exact here because RRC always magnifies
    (crop <= image, output = input size).  Half-pixel-center convention
    matches jax.image.scale_and_translate; the keypoint map stays
    new = (pt - origin) * out/crop as in the reference."""
    h, w = img.shape[-3], img.shape[-2]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    # output px u samples input at origin + (u + .5)/scale - .5
    src_y = y0[:, None] + (ys[None, :] + 0.5) * (ch[:, None] / h) - 0.5
    src_x = x0[:, None] + (xs[None, :] + 0.5) * (cw[:, None] / w) - 0.5
    wy = _interp_weights(src_y, h)                        # [B, H_out, H_in]
    wx = _interp_weights(src_x, w)                        # [B, W_out, W_in]
    out = jnp.einsum("bhwc,bvh->bvwc", img.astype(jnp.bfloat16), wy,
                     preferred_element_type=jnp.float32)
    return jnp.einsum("bvwc,buw->bvuc", out.astype(jnp.bfloat16), wx,
                      preferred_element_type=jnp.float32)


# --------------------------------------------------------------------------
# photometric
# --------------------------------------------------------------------------

def _rgb_to_hsv(rgb: jnp.ndarray):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    d = maxc - minc
    s = jnp.where(maxc > 0, d / jnp.maximum(maxc, 1e-8), 0.0)
    d_safe = jnp.maximum(d, 1e-8)
    rc = (maxc - r) / d_safe
    gc = (maxc - g) / d_safe
    bc = (maxc - b) / d_safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = jnp.where(d > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, q, p, p, q])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, q, v])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(key, img: jnp.ndarray, brightness: float = 0.5,
                 contrast: float = 0.2, saturation: float = 0.5,
                 hue: float = 0.1) -> jnp.ndarray:
    """torchvision-style ColorJitter on [H, W, 3] in [0, 1]: factors drawn
    uniformly, ops applied in random order (reference transform:
    dataset/sbp_coco_dataset.py:222-227)."""
    k_b, k_c, k_s, k_h, k_perm = jax.random.split(key, 5)
    fb = jax.random.uniform(k_b, (), minval=1 - brightness,
                            maxval=1 + brightness)
    fc = jax.random.uniform(k_c, (), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(k_s, (), minval=1 - saturation,
                            maxval=1 + saturation)
    fh = jax.random.uniform(k_h, (), minval=-hue, maxval=hue)

    def op_brightness(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def op_contrast(x):
        mean = jnp.mean(0.299 * x[..., 0] + 0.587 * x[..., 1]
                        + 0.114 * x[..., 2])
        return jnp.clip((x - mean) * fc + mean, 0.0, 1.0)

    def op_saturation(x):
        gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])[..., None]
        return jnp.clip((x - gray) * fs + gray, 0.0, 1.0)

    def op_hue(x):
        h, s, v = _rgb_to_hsv(x)
        return jnp.clip(_hsv_to_rgb((h + fh) % 1.0, s, v), 0.0, 1.0)

    perm = jax.random.permutation(k_perm, 4)

    def body(i, x):
        return jax.lax.switch(perm[i], [op_brightness, op_contrast,
                                        op_saturation, op_hue], x)

    return jax.lax.fori_loop(0, 4, body, img)


def color_jitter_batch(key, imgs: jnp.ndarray, brightness: float = 0.5,
                       contrast: float = 0.2, saturation: float = 0.5,
                       hue: float = 0.1,
                       apply_prob: float = 1.0) -> jnp.ndarray:
    """ColorJitter over a batch [B, H, W, 3]: per-EXAMPLE factors, one
    BATCH-shared op order, per-example Bernoulli(``apply_prob``) apply
    mask (Albumentations wraps ColorJitter in p=0.5 per sample --
    reference: dataset/sbp_coco_dataset.py:222-227; non-applied samples
    come back bit-identical, not via near-identity factors).

    Under vmap the per-example `color_jitter`'s lax.switch lowers to a
    select over ALL four branches -- 16 full-image passes per step, with
    the HSV round-trip always paid.  Sharing the op order (like the
    rotation angle: unchanged distribution across steps, only intra-batch
    diversity reduced) runs each op exactly once, vectorized over the
    batch.

    The order is dispatched as ONE 24-way lax.switch over the full
    permutations rather than a fori_loop of 4-way switches: a switch
    inside a loop compiles to a while+conditional that XLA cannot fuse
    across (measured 10.5 ms/step at B=256); a top-level switch executes
    exactly one fully-fused 4-op chain (~1 ms)."""
    import itertools

    b = imgs.shape[0]
    k_b, k_c, k_s, k_h, k_perm, k_apply = jax.random.split(key, 6)
    shape = (b, 1, 1, 1)
    fb = jax.random.uniform(k_b, shape, minval=1 - brightness,
                            maxval=1 + brightness)
    fc = jax.random.uniform(k_c, shape, minval=1 - contrast,
                            maxval=1 + contrast)
    fs = jax.random.uniform(k_s, shape, minval=1 - saturation,
                            maxval=1 + saturation)
    fh = jax.random.uniform(k_h, (b, 1, 1), minval=-hue, maxval=hue)
    # keep the image dtype (bf16 path): an fp32 factor would promote the
    # whole chain back to fp32 and double the HBM traffic
    fb, fc, fs, fh = (f.astype(imgs.dtype) for f in (fb, fc, fs, fh))

    def gray(x):
        return (0.299 * x[..., 0] + 0.587 * x[..., 1]
                + 0.114 * x[..., 2])[..., None]

    def op_brightness(x):
        return jnp.clip(x * fb, 0.0, 1.0)

    def op_contrast(x):
        mean = jnp.mean(gray(x), axis=(1, 2, 3), keepdims=True,
                        dtype=jnp.float32).astype(x.dtype)
        return jnp.clip((x - mean) * fc + mean, 0.0, 1.0)

    def op_saturation(x):
        g = gray(x)
        return jnp.clip((x - g) * fs + g, 0.0, 1.0)

    def op_hue(x):
        h, s, v = _rgb_to_hsv(x)
        return jnp.clip(_hsv_to_rgb((h + fh) % 1.0, s, v), 0.0, 1.0)

    ops = [op_brightness, op_contrast, op_saturation, op_hue]

    def chain(order):
        def apply(x):
            for i in order:
                x = ops[i](x)
            return x
        return apply

    branches = [chain(o) for o in itertools.permutations(range(4))]
    idx = jax.random.randint(k_perm, (), 0, len(branches))
    out = jax.lax.switch(idx, branches, imgs)
    if apply_prob < 1.0:
        apply = jax.random.uniform(k_apply, (b, 1, 1, 1)) < apply_prob
        out = jnp.where(apply, out, imgs)
    return out


# --------------------------------------------------------------------------
# CLAHE (device variant)
# --------------------------------------------------------------------------

def clahe_luma(img: jnp.ndarray, clip_limit, tiles: int = 8) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization on [H, W, 3] in
    [0, 1], applied to the YCbCr luma channel.

    The host path (data/sbp_dataset.py::apply_clahe) runs cv2's CLAHE on the
    LAB L channel, exactly like Albumentations; this device variant uses
    luma instead of L (the LAB transform is not worth reproducing bit-wise
    for a random augmentation) and cv2's clip/redistribute/interpolate
    scheme: per-tile 256-bin histograms, clip at
    ``clip_limit * tile_area / 256`` with even redistribution, per-tile CDF
    LUTs, bilinear interpolation between the 4 neighboring tile LUTs.

    Measured divergence from the Albumentations LAB-L pipeline on rendered
    person crops at clip in {1, 2.5, 4}: mean |err| 0.004-0.008, max |err|
    <= 0.115 in [0, 1] pixel units -- bounds pinned by
    tests/test_clahe_golden.py::test_device_clahe_divergence_bound.

    H and W must be divisible by ``tiles``.
    """
    h, w, _ = img.shape
    th, tw = h // tiles, w // tiles
    tile_area = th * tw
    bins = 256

    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    y8 = jnp.clip(jnp.round(y * 255.0), 0, 255).astype(jnp.int32)

    # per-tile histograms via one-hot reduction: [T, T, P] x bins
    tiles_y = y8.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)
    tiles_y = tiles_y.reshape(tiles, tiles, tile_area)
    bin_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, bins), 3)
    hist = jnp.sum(tiles_y[..., None] == bin_ids, axis=2)  # [T, T, 256]

    limit = jnp.maximum(1.0, clip_limit * tile_area / bins)
    clipped = jnp.minimum(hist.astype(jnp.float32), limit)
    excess = jnp.sum(hist.astype(jnp.float32) - clipped, axis=-1,
                     keepdims=True)
    clipped = clipped + excess / bins
    cdf = jnp.cumsum(clipped, axis=-1)
    lut = jnp.round(cdf * ((bins - 1.0) / tile_area))  # [T, T, 256]

    # bilinear interpolation between tile LUTs, tile centers at (i+0.5)*th
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fy = jnp.clip(ys / th - 0.5, 0.0, tiles - 1.0)
    fx = jnp.clip(xs / tw - 0.5, 0.0, tiles - 1.0)
    y0 = jnp.floor(fy).astype(jnp.int32)
    x0 = jnp.floor(fx).astype(jnp.int32)
    wy = fy - y0
    wx = fx - x0
    y1 = jnp.minimum(y0 + 1, tiles - 1)
    x1 = jnp.minimum(x0 + 1, tiles - 1)

    # one scalar LUT lookup per pixel per corner: a flat [H, W] gather.
    # (Gathering the whole 256-entry LUT row per pixel -- lut[ty, tx] --
    # materializes an [H, W, 256] buffer, ~13 GB over a 256-batch vmap.)
    flat_lut = lut.reshape(-1)                # [T*T*256]

    def _sample(ty, tx):
        return jnp.take(flat_lut, (ty * tiles + tx) * bins + y8)  # [H, W]

    v = (_sample(y0, x0) * (1 - wy) * (1 - wx)
         + _sample(y0, x1) * (1 - wy) * wx
         + _sample(y1, x0) * wy * (1 - wx)
         + _sample(y1, x1) * wy * wx) / 255.0

    scale = v / jnp.maximum(y, 1e-6)
    out = jnp.clip(img * scale[..., None], 0.0, 1.0)
    return jnp.where(y[..., None] > 1e-6, out, img)


def clahe_luma_batch(key, imgs: jnp.ndarray, apply_prob: float,
                     clip_range: Tuple[float, float] = (1.0, 4.0),
                     tiles: int = 8, chunk: int = 32) -> jnp.ndarray:
    """Per-example CLAHE over [B, H, W, 3] with Albumentations semantics:
    Bernoulli(``apply_prob``) apply mask and a uniform clip-limit draw per
    sample (reference train transform wraps ``A.CLAHE()`` at p=0.5,
    dataset/sbp_coco_dataset.py:220-232).

    The batch is processed in vmapped slices under a ``lax.map``:
    per-sample CLAHE's tile-histogram temporaries (a one-hot
    [pixels, 256] comparison per sample) are the one augmentation stage
    whose peak memory scales badly with a full-batch vmap (a 256-batch
    vmap at 256x192 OOMed a 16 GB chip; a 32-batch vmap at 512x512 under
    the SPM epoch scan crashed the TPU worker outright).  The slice size
    is therefore PIXEL-budgeted, not batch-count-budgeted: ``chunk``
    samples at 256x192 is the known-good working set, and the slice
    shrinks proportionally as per-image resolution grows (512x512 ->
    slices of 4), so peak temporary memory stays constant across input
    sizes.  The sequential-over-slices schedule keeps each slice fully
    vectorized on the VPU."""
    b, h, w = imgs.shape[0], imgs.shape[1], imgs.shape[2]
    keys = jax.random.split(key, b)

    def _one(kk, im):
        k_do, k_clip = jax.random.split(kk)
        clip = jax.random.uniform(k_clip, (), minval=clip_range[0],
                                  maxval=clip_range[1])
        do = jax.random.uniform(k_do, ()) < apply_prob
        out = clahe_luma(im, clip, tiles)
        return jnp.where(do, out, im)

    pixel_budget = int(chunk) * 256 * 192
    eff = max(1, min(int(chunk), pixel_budget // (h * w)))
    if b <= eff:
        return jax.vmap(_one)(keys, imgs)
    # lax.map needs equal slices: pad the batch up to a multiple of the
    # budgeted slice size and trim after.  (The previous largest-divisor
    # fallback could silently collapse to eff=1 -- fully sequential --
    # whenever b had no divisor <= the budget, e.g. a prime batch at high
    # resolution.)  Padded rows recompute row 0 under fresh keys; they are
    # discarded, so only ceil(b/eff)*eff - b samples of throwaway work.
    b_pad = -(-b // eff) * eff
    if b_pad > b:
        imgs = jnp.concatenate(
            [imgs, jnp.broadcast_to(imgs[:1],
                                    (b_pad - b,) + imgs.shape[1:])], 0)
        keys = jnp.concatenate(
            [keys, jnp.broadcast_to(keys[:1],
                                    (b_pad - b,) + keys.shape[1:])], 0)
    imgs_c = imgs.reshape((b_pad // eff, eff) + imgs.shape[1:])
    keys_c = keys.reshape((b_pad // eff, eff) + keys.shape[1:])
    out = jax.lax.map(lambda a: jax.vmap(_one)(a[0], a[1]),
                      (keys_c, imgs_c))
    return out.reshape((b_pad,) + imgs.shape[1:])[:b]


# --------------------------------------------------------------------------
# full pipelines
# --------------------------------------------------------------------------

def _sample_crop(key, h: int, w: int, scale_range, ratio_range):
    """RRC crop box (x0, y0, cw, ch) with torchvision-style sampling."""
    k_area, k_ratio, k_x, k_y = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k_area, (), minval=scale_range[0],
                                      maxval=scale_range[1])
    log_r = jax.random.uniform(
        k_ratio, (),
        minval=jnp.log(ratio_range[0]), maxval=jnp.log(ratio_range[1]))
    aspect = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * aspect), 8.0, w)
    ch = jnp.clip(jnp.sqrt(area / aspect), 8.0, h)
    x0 = jax.random.uniform(k_x, ()) * (w - cw)
    y0 = jax.random.uniform(k_y, ()) * (h - ch)
    return x0, y0, cw, ch


@functools.partial(jax.jit,
                   static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13))
def augment_batch(key, images_u8, joints, vis, out_hw: Tuple[int, int],
                  rotate_limit: float = 40.0,
                  scale_range: Tuple[float, float] = (0.4, 1.0),
                  ratio_range: Tuple[float, float] = (0.4, 1.6),
                  jitter_params: Tuple[float, float, float, float] =
                  (0.5, 0.2, 0.5, 0.1),
                  clahe_prob: float = 0.0,
                  out_dtype=jnp.float32,
                  rotate_prob: float = 0.5,
                  jitter_prob: float = 0.5,
                  angle_groups: int = 16):
    """Train-time batch augmentation in the reference's op order:
    Rotate(p=0.5) -> [device CLAHE(p), opt-in] -> ColorJitter(p=0.5) ->
    RandomResizedCrop(p=1) (reference train transform,
    dataset/sbp_coco_dataset.py:220-232; Albumentations' per-sample
    default p=0.5 applies to Rotate / CLAHE / ColorJitter, RRC is p=1).

    images_u8: [B, H, W, 3] uint8; joints: [B, K, 2] in input px;
    vis: [B, K].  Returns (images [0,1] in ``out_dtype``, joints, vis).
    Pass the model's compute dtype (bf16) as ``out_dtype``: the color
    jitter then runs at half the HBM traffic and the image never takes an
    fp32->bf16 conversion pass in front of the first conv.

    TPU notes -- every pixel-moving stage is matmul-shaped (MXU), never a
    gather:
    * rotation: G = ``n_angle_groups(B, angle_groups)`` distinct angles
      per batch, contiguous groups of B/G samples sharing one grouped
      3-shear einsum (`rotate_shear3_grouped`; a fully per-sample warp
      matrix would force a generic dynamic gather measured ~56x slower
      on v5e, but per-sample ANGLES stay shear-shaped: G=B just runs the
      grouped einsums at group size 1).  Measured fused-train-step cost
      at batch 256 (``python bench.py angles``): G=8 110.2 ms, G=16
      109.4 ms (default: the free knee), G=32 +7%, G=256 (per-sample,
      the reference's A.Rotate semantics) +51%.  On top of the G angle
      draws, each SAMPLE independently
      applies or skips the rotation (Bernoulli p=0.5, one select against
      the unrotated buffer); keypoints ride the exact per-sample
      effective rotation matrix (angle or 0);
    * random-resized-crop: fully per-example, two interpolation-matrix
      contractions (`crop_resize_mxu`);
    * color jitter: per-example factors + per-example p=0.5 apply mask,
      batch-shared op ORDER (`color_jitter_batch` -- a vmapped
      lax.switch would run all four ops' branches per slot, 16
      full-image passes instead of 4).
    Crop/scale/aspect and all photometric factors remain per-example.
    """
    b = images_u8.shape[0]
    h, w = out_hw
    k_rot, k_rapply, k_crop, k_col, k_cl = jax.random.split(key, 5)
    imgs = images_u8.astype(jnp.float32) / 255.0

    # grouped per-sample rotation angles, per-sample apply probability
    g = n_angle_groups(b, angle_groups)
    angles = jax.random.uniform(k_rot, (g,), minval=-rotate_limit,
                                maxval=rotate_limit) * jnp.pi / 180.0
    angle_per = jnp.repeat(angles, b // g)                      # [B]
    if rotate_prob >= 1.0:
        apply_rot = jnp.ones((b,), bool)
    else:
        apply_rot = jax.random.uniform(k_rapply, (b,)) < rotate_prob
    eff_angle = jnp.where(apply_rot, angle_per, 0.0)
    rotated = rotate_shear3_grouped(imgs, angles, h / 2.0, w / 2.0)
    imgs = jnp.where(apply_rot[:, None, None, None], rotated, imgs)
    rots = jax.vmap(lambda a: _rotation_about(w / 2.0, h / 2.0, a))(
        eff_angle)                                              # [B, 2, 3]
    joints = jax.vmap(transform_points)(rots, joints)

    # optional device CLAHE (per-example, opt-in; reference position:
    # after Rotate, before ColorJitter)
    if clahe_prob > 0:
        imgs = clahe_luma_batch(k_cl, imgs, clahe_prob)

    # color jitter BEFORE the crop, as in the reference transform list
    # (contrast then blends against the pre-crop image mean)
    imgs = color_jitter_batch(k_col, imgs.astype(out_dtype),
                              *jitter_params, apply_prob=jitter_prob)

    # per-example random-resized-crop via weight-matrix contractions
    keys_crop = jax.random.split(k_crop, b)
    x0, y0, cw, ch = jax.vmap(
        lambda kk: _sample_crop(kk, h, w, scale_range, ratio_range)
    )(keys_crop)
    # final clip to [0, 1]: bf16-rounded interpolation weights can sum to
    # slightly >1 per row, and with the jitter (and its clip) now ahead of
    # the crop nothing downstream would bound the overshoot
    imgs = jnp.clip(crop_resize_mxu(imgs, x0, y0, cw, ch), 0.0,
                    1.0).astype(out_dtype)
    sx = (w / cw)[:, None]
    sy = (h / ch)[:, None]
    new_pts = jnp.stack([(joints[..., 0] - x0[:, None]) * sx,
                         (joints[..., 1] - y0[:, None]) * sy], axis=-1)
    inside = (new_pts[..., 0] >= 0) & (new_pts[..., 0] < w) & \
             (new_pts[..., 1] >= 0) & (new_pts[..., 1] < h)
    new_vis = vis * inside.astype(vis.dtype)
    return imgs, new_pts, new_vis


@jax.jit
def normalize_batch(images_u8):
    """Val-time preprocessing: just Normalize(0, 1) == /255
    (reference: dataset/sbp_coco_dataset.py:234-237)."""
    return images_u8.astype(jnp.float32) / 255.0

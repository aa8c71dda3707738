"""In-jit geometric warp primitives with cv2/scipy sampling conventions.

Building blocks for the HBM-resident samplers (data/device_data.py): the
host augmentation chains (data/augment2d.py, data/ac3ac4.py::_augs_mix)
warp with cv2.remap / cv2.warpAffine / cv2.resize and smooth noise with
scipy.ndimage.gaussian_filter; these functions reproduce those sampling
conventions on device with static shapes so the whole chain can run inside
the train jit. Deterministic parts (given identical parameters) are
exactness-tested against cv2 in tests/test_device_warp.py; random
parameter draws live in the samplers, not here.

Conventions reproduced:
- scipy gaussian_filter: truncate=4.0, radius=int(truncate*sigma+0.5),
  'reflect' boundary (= np 'symmetric': edge repeated).
- cv2.remap BORDER_REFLECT: index i<0 -> -i-1, i>=n -> 2n-1-i (edge
  repeated), applied to the integer neighbor indices.
- cv2.warpAffine(M): dst(x,y) = src(M_inv @ (x,y,1)); INTER_LINEAR for
  images, INTER_NEAREST (round) for labels; BORDER_CONSTANT fill.
- cv2.resize: src = (dst + 0.5)/f - 0.5, clamped to the valid range.
"""

from __future__ import annotations

import numpy as np


def gaussian_kernel1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur2d(x, sigma: float, truncate: float = 4.0):
    """Separable gaussian blur of a (H, W) f32 map, scipy 'reflect'
    boundary (np 'symmetric')."""
    import jax.numpy as jnp

    k = jnp.asarray(gaussian_kernel1d(sigma, truncate))
    r = (k.shape[0] - 1) // 2
    xp = jnp.pad(x, ((r, r), (0, 0)), mode="symmetric")
    x = _conv1d_axis(xp, k, axis=0, out_len=x.shape[0])
    xp = jnp.pad(x, ((0, 0), (r, r)), mode="symmetric")
    return _conv1d_axis(xp, k, axis=1, out_len=x.shape[1])


def _conv1d_axis(xp, k, axis: int, out_len: int):
    """Valid 1-D correlation of padded xp with k along axis (k symmetric, so
    correlation == convolution)."""
    import jax.numpy as jnp

    taps = k.shape[0]
    slabs = []
    for i in range(taps):
        idx = [slice(None)] * xp.ndim
        idx[axis] = slice(i, i + out_len)
        slabs.append(xp[tuple(idx)])
    return jnp.einsum("t,t...->...", k, jnp.stack(slabs))


def reflect_index(i, n: int):
    """cv2 BORDER_REFLECT (edge repeated) for integer indices, one fold:
    i<0 -> -i-1; i>=n -> 2n-1-i; then clamp (fields here never exceed one
    fold)."""
    import jax.numpy as jnp

    i = jnp.where(i < 0, -i - 1, i)
    i = jnp.where(i >= n, 2 * n - 1 - i, i)
    return jnp.clip(i, 0, n - 1)


def reflect101_index(i, n: int):
    """np.pad mode='reflect' (edge NOT repeated): i<0 -> -i; i>=n -> 2n-2-i."""
    import jax.numpy as jnp

    i = jnp.where(i < 0, -i, i)
    i = jnp.where(i >= n, 2 * n - 2 - i, i)
    return jnp.clip(i, 0, n - 1)


def _gather2d(img, yi, xi):
    """img (H, W) or (H, W, C); yi/xi int32 (h, w) index maps."""
    import jax.numpy as jnp

    H, W = img.shape[0], img.shape[1]
    flat = img.reshape((H * W,) + img.shape[2:])
    return jnp.take(flat, yi * W + xi, axis=0)


def remap_bilinear(img, mx, my, border: str = "reflect"):
    """cv2.remap(INTER_LINEAR) parity: sample img at float coords
    (my, mx) (each (h, w)). border: 'reflect' (BORDER_REFLECT) or
    'constant' (zero fill outside)."""
    import jax.numpy as jnp

    H, W = img.shape[0], img.shape[1]
    x0 = jnp.floor(mx).astype(jnp.int32)
    y0 = jnp.floor(my).astype(jnp.int32)
    fx = mx - x0.astype(jnp.float32)
    fy = my - y0.astype(jnp.float32)

    if border == "reflect":
        xi0, xi1 = reflect_index(x0, W), reflect_index(x0 + 1, W)
        yi0, yi1 = reflect_index(y0, H), reflect_index(y0 + 1, H)
        vx0 = vx1 = vy0 = vy1 = None
    else:
        # cv2 BORDER_CONSTANT(0): each out-of-bounds TAP contributes 0 —
        # gather clamped, zero the tap's weight
        vx0 = ((x0 >= 0) & (x0 < W)).astype(img.dtype)
        vx1 = ((x0 + 1 >= 0) & (x0 + 1 < W)).astype(img.dtype)
        vy0 = ((y0 >= 0) & (y0 < H)).astype(img.dtype)
        vy1 = ((y0 + 1 >= 0) & (y0 + 1 < H)).astype(img.dtype)
        xi0, xi1 = jnp.clip(x0, 0, W - 1), jnp.clip(x0 + 1, 0, W - 1)
        yi0, yi1 = jnp.clip(y0, 0, H - 1), jnp.clip(y0 + 1, 0, H - 1)

    v00 = _gather2d(img, yi0, xi0)
    v01 = _gather2d(img, yi0, xi1)
    v10 = _gather2d(img, yi1, xi0)
    v11 = _gather2d(img, yi1, xi1)
    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    if border == "constant":
        w00 = w00 * vy0 * vx0
        w01 = w01 * vy0 * vx1
        w10 = w10 * vy1 * vx0
        w11 = w11 * vy1 * vx1
    if img.ndim == 3:
        w00, w01, w10, w11 = (w[..., None] for w in (w00, w01, w10, w11))
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def remap_nearest(img, mx, my, border: str = "reflect"):
    """cv2.remap(INTER_NEAREST) parity: round to nearest source pixel."""
    import jax.numpy as jnp

    H, W = img.shape[0], img.shape[1]
    xi = jnp.floor(mx + 0.5).astype(jnp.int32)
    yi = jnp.floor(my + 0.5).astype(jnp.int32)
    if border == "reflect":
        xr, yr = reflect_index(xi, W), reflect_index(yi, H)
    else:
        xr, yr = jnp.clip(xi, 0, W - 1), jnp.clip(yi, 0, H - 1)
    out = _gather2d(img, yr, xr)
    if border == "constant":
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        if img.ndim == 3:
            inside = inside[..., None]
        out = jnp.where(inside, out, jnp.zeros_like(out))
    return out


def rotation_coords(angle_deg, h: int, w: int, center=None):
    """Sampling coordinates (mx, my) reproducing
    cv2.warpAffine(cv2.getRotationMatrix2D(center, angle, 1)): dst pixel
    (y, x) samples src at M_inv @ (x, y, 1). getRotationMatrix2D uses
    alpha=cos, beta=sin of the CCW angle; the inverse of a pure rotation
    about a center is the rotation by -angle about the same center."""
    import jax.numpy as jnp

    if center is None:
        # data/augment2d.random_rotate passes (h/2, w/2) as (x, y) center
        center = (h / 2.0, w / 2.0)
    cx, cy = center
    a = -angle_deg * jnp.pi / 180.0  # inverse rotation
    ca, sa = jnp.cos(a), jnp.sin(a)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # cv2 rotation is measured CCW with y down; matrix [ca, sa; -sa, ca]
    mx = ca * (xx - cx) + sa * (yy - cy) + cx
    my = -sa * (xx - cx) + ca * (yy - cy) + cy
    return mx, my


def rescale_coords(f, h: int, w: int, out_h: int, out_w: int):
    """Coordinates reproducing cv2.resize(fx=f) -> center_crop_pad(out):
    resized size n' = round(n*f); dst (out) index y maps to resized index
    y + o (crop, f>1) or y - p (pad, f<1, np reflect101 fold); then
    src = (idx + 0.5)/f - 0.5, clamped (cv2.resize border behavior).

    f is a traced scalar; n' is computed with jnp.round so the whole map
    stays jittable. Returns (mx, my) plus nothing else — the caller samples
    with remap_bilinear/nearest using border='reflect' irrelevant (coords
    are in-range after the fold+clamp)."""
    import jax.numpy as jnp

    def axis_coords(n: int, out_n: int):
        npr = jnp.round(n * f)  # resized length, traced scalar f32
        d = jnp.arange(out_n, dtype=jnp.float32)
        # crop: o = (npr-out)//2 (floor of positive); pad: -( (out-npr)//2 )
        off = jnp.where(npr >= out_n, jnp.floor((npr - out_n) / 2.0),
                        -jnp.floor((out_n - npr) / 2.0))
        idx = d + off
        # reflect101 fold into [0, npr-1] (np.pad mode='reflect')
        idx = jnp.where(idx < 0, -idx, idx)
        idx = jnp.where(idx > npr - 1, 2 * (npr - 1) - idx, idx)
        src = jnp.clip((idx + 0.5) / f - 0.5, 0.0, n - 1.0)
        return src

    sy = axis_coords(h, out_h)
    sx = axis_coords(w, out_w)
    my = jnp.broadcast_to(sy[:, None], (out_h, out_w))
    mx = jnp.broadcast_to(sx[None, :], (out_h, out_w))
    return mx, my


def elastic_field(key, h: int, w: int, alpha: float = 16.0,
                  sigma: float = 4.0):
    """(dx, dy) displacement maps: gaussian_filter(U(-1,1), sigma) * alpha
    — the reference's literal expression (scripts_bbbc039v1/augmentation/
    warp.py:46-47; host twin augment2d.elastic_field_np)."""
    import jax

    kx, ky = jax.random.split(key)
    ux = jax.random.uniform(kx, (h, w)) * 2 - 1
    uy = jax.random.uniform(ky, (h, w)) * 2 - 1
    dx = gaussian_blur2d(ux, sigma) * alpha
    dy = gaussian_blur2d(uy, sigma) * alpha
    return dx, dy


def elastic_coords(dx, dy):
    import jax.numpy as jnp

    h, w = dx.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return xx + dx, yy + dy

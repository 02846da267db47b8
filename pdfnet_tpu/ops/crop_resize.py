"""crop_and_resize: TF-style bilinear box crop with a custom VJP.

Capability-parity replacement for the reference's only native extension
(lib/utils/roi_align/src/crop_and_resize*.cpp/.cu — dead code there, live
capability here).  Forward samples each output pixel bilinearly inside a
normalized box; backward scatters gradients to the four source taps, matching
CropAndResizeBackpropImageKernel semantics.  Pure XLA gathers — no Pallas
needed, the op is bandwidth-trivial.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def crop_and_resize(image, boxes, box_ind, crop_h, crop_w,
                    extrapolation_value=0.0):
    """Crop boxes out of images and bilinearly resize to (crop_h, crop_w).

    Args:
      image: (B, H, W, C).
      boxes: (N, 4) normalized [y1, x1, y2, x2].
      box_ind: (N,) int batch index per box.

    Returns: (N, crop_h, crop_w, C).
    """
    return _forward(image, boxes, box_ind, crop_h, crop_w, extrapolation_value)[0]


def _sample_coords(boxes, crop_h, crop_w, H, W):
    y1, x1, y2, x2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    if crop_h > 1:
        hs = (y2 - y1) * (H - 1) / (crop_h - 1)
        ys = y1[:, None] * (H - 1) + hs[:, None] * jnp.arange(crop_h)
    else:
        ys = 0.5 * (y1 + y2)[:, None] * (H - 1) * jnp.ones((1, crop_h))
    if crop_w > 1:
        ws = (x2 - x1) * (W - 1) / (crop_w - 1)
        xs = x1[:, None] * (W - 1) + ws[:, None] * jnp.arange(crop_w)
    else:
        xs = 0.5 * (x1 + x2)[:, None] * (W - 1) * jnp.ones((1, crop_w))
    return ys, xs


def _forward(image, boxes, box_ind, crop_h, crop_w, extrapolation_value):
    B, H, W, C = image.shape
    ys, xs = _sample_coords(boxes, crop_h, crop_w, H, W)     # (N,ch),(N,cw)
    in_y = (ys >= 0) & (ys <= H - 1)
    in_x = (xs >= 0) & (xs <= W - 1)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, W - 1)
    fy = (ys - y0)[:, :, None, None]                          # (N,ch,1,1)
    fx = (xs - x0)[:, None, :, None]                          # (N,1,cw,1)

    img = image[box_ind]                                      # (N,H,W,C)

    def gat(yi, xi):
        g = jnp.take_along_axis(img, yi[:, :, None, None].repeat(W, 2), axis=1)
        return jnp.take_along_axis(g, xi[:, None, :, None], axis=2)

    top = gat(y0, x0) * (1 - fx) + gat(y0, x1i) * fx
    bot = gat(y1i, x0) * (1 - fx) + gat(y1i, x1i) * fx
    out = top * (1 - fy) + bot * fy
    valid = (in_y[:, :, None] & in_x[:, None, :])[..., None]
    out = jnp.where(valid, out, extrapolation_value)
    return out, (image.shape, boxes, box_ind, valid)


def _fwd(image, boxes, box_ind, crop_h, crop_w, extrapolation_value):
    out, res = _forward(image, boxes, box_ind, crop_h, crop_w,
                        extrapolation_value)
    return out, res


def _bwd(crop_h, crop_w, extrapolation_value, res, g):
    img_shape, boxes, box_ind, valid = res
    B, H, W, C = img_shape
    ys, xs = _sample_coords(boxes, crop_h, crop_w, H, W)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    x1i = jnp.clip(x0 + 1, 0, W - 1)
    fy = (ys - y0)[:, :, None, None]
    fx = (xs - x0)[:, None, :, None]
    g = jnp.where(valid, g, 0.0)

    grad = jnp.zeros(img_shape, g.dtype)
    N = boxes.shape[0]
    bi = box_ind[:, None, None]
    yy0 = y0[:, :, None];  yy1 = y1i[:, :, None]
    xx0 = x0[:, None, :];  xx1 = x1i[:, None, :]
    bcast = jnp.broadcast_to
    shp = (N, crop_h, crop_w)
    for (yi, xi, w) in [
        (yy0, xx0, (1 - fy) * (1 - fx)),
        (yy0, xx1, (1 - fy) * fx),
        (yy1, xx0, fy * (1 - fx)),
        (yy1, xx1, fy * fx),
    ]:
        grad = grad.at[bcast(bi, shp), bcast(yi, shp), bcast(xi, shp)].add(g * w)
    return grad, None, None


crop_and_resize.defvjp(_fwd, _bwd)

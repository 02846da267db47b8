"""Attention modules for the dual-hand mesh decoder.

References: self_attn.py:36-86 (SelfAttn), inter_attn.py:38-125 (cross-hand
attention with shared projections), img_attn.py:38-113 (image-grid
cross-attention, constructed-but-unused in the reference forward; available
here behind ``Config.use_img_attn``).

Token counts are tiny (<= 252 verts + 36 grid tokens), so attention is plain
batched einsum — no flash/blockwise machinery needed; XLA keeps everything
resident in VMEM.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdfnet_tpu.models.layers import MLPResBlock

Dtype = Any


def _split_heads(x, n_heads):
    B, V, D = x.shape
    return x.reshape(B, V, n_heads, D // n_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    B, H, V, D = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, V, H * D)


class SelfAttn(nn.Module):
    f_dim: int
    n_heads: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        d_q = self.f_dim // self.n_heads
        h = nn.LayerNorm(epsilon=1e-6, name="ln")(x)
        q = _split_heads(nn.Dense(self.n_heads * d_q, dtype=self.dtype, name="wq")(h), self.n_heads)
        k = _split_heads(nn.Dense(self.n_heads * d_q, dtype=self.dtype, name="wk")(h), self.n_heads)
        v = _split_heads(nn.Dense(self.n_heads * d_q, dtype=self.dtype, name="wv")(h), self.n_heads)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d_q ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", attn, v))
        out = nn.Dense(self.f_dim, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        x = x + out
        return MLPResBlock(self.f_dim, self.dropout, self.dtype, name="ff")(x, train)


class InterAttn(nn.Module):
    """Self-attention per hand, then bidirectional cross-hand attention.

    The q/k/v/out projections are shared between the two directions, as in
    the reference.
    """

    f_dim: int
    n_heads: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    stack_hands: bool = False

    @staticmethod
    def _stacked_pair(ml, mr, xl, xr):
        """Run two same-structure (different-weight) per-hand modules as one
        vmapped apply over a stacked hand axis.  Eval-only (no dropout rng);
        the dummy calls materialize the params and XLA drops their results."""
        _ = ml(xl[:1], False)
        _ = mr(xr[:1], False)
        stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                               ml.variables["params"], mr.variables["params"])
        tmpl = ml.clone(parent=None)
        ys = jax.vmap(lambda p, x: tmpl.apply({"params": p}, x, False))(
            stacked, jnp.stack([xl, xr]))
        return ys[0], ys[1]

    @nn.compact
    def __call__(self, Lf, Rf, train: bool):
        sl = SelfAttn(self.f_dim, self.n_heads, self.dropout, self.dtype,
                      name="self_L")
        sr = SelfAttn(self.f_dim, self.n_heads, self.dropout, self.dtype,
                      name="self_R")
        fuse = not train and self.stack_hands
        if fuse:
            Lf, Rf = self._stacked_pair(sl, sr, Lf, Rf)
        else:
            Lf = sl(Lf, train)
            Rf = sr(Rf, train)

        d_q = self.f_dim // self.n_heads
        wq = nn.Dense(self.n_heads * d_q, dtype=self.dtype, name="wq")
        wk = nn.Dense(self.n_heads * d_q, dtype=self.dtype, name="wk")
        wv = nn.Dense(self.n_heads * d_q, dtype=self.dtype, name="wv")
        fc = nn.Dense(self.f_dim, dtype=self.dtype, name="fc")
        drop_attn = nn.Dropout(self.dropout, deterministic=not train)
        drop_out = nn.Dropout(self.dropout, deterministic=not train)

        L2 = nn.LayerNorm(epsilon=1e-6, name="ln_L")(Lf)
        R2 = nn.LayerNorm(epsilon=1e-6, name="ln_R")(Rf)
        if fuse:
            # shared projections: one Dense over both hands (batch-concat)
            B = L2.shape[0]
            X2 = jnp.concatenate([L2, R2], axis=0)
            Q, K, V = (_split_heads(w(X2), self.n_heads) for w in (wq, wk, wv))
            (Lq, Rq), (Lk, Rk), (Lv, Rv) = ((t[:B], t[B:]) for t in (Q, K, V))
        else:
            Lq, Lk, Lv = (_split_heads(w(L2), self.n_heads)
                          for w in (wq, wk, wv))
            Rq, Rk, Rv = (_split_heads(w(R2), self.n_heads)
                          for w in (wq, wk, wv))

        def cross(q, k, v):
            a = jnp.einsum("bhqd,bhkd->bhqk", q, k) / (d_q ** 0.5)
            a = drop_attn(jax.nn.softmax(a, axis=-1))
            return drop_out(fc(_merge_heads(jnp.einsum("bhqk,bhkd->bhqd", a, v))))

        # L queries attend R keys/values; the value stream name follows the
        # reference: feat_R2L flows into the left hand.
        feat_R2L = cross(Lq, Rk, Rv)
        feat_L2R = cross(Rq, Lk, Lv)
        fl = MLPResBlock(self.f_dim, self.dropout, self.dtype, name="ffL")
        fr = MLPResBlock(self.f_dim, self.dropout, self.dtype, name="ffR")
        if fuse:
            return self._stacked_pair(fl, fr, Lf + feat_R2L, Rf + feat_L2R)
        return fl(Lf + feat_R2L, train), fr(Rf + feat_L2R, train)


class ImgAttn(nn.Module):
    """Patchify an image feature map into grid tokens; verts attend them."""

    img_size: int
    img_f_dim: int
    grid_size: int
    grid_f_dim: int
    verts_f_dim: int
    n_heads: int = 4
    dropout: float = 0.01
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_nhwc, verts_f, train: bool):
        patch = self.img_size // self.grid_size
        grid = nn.Conv(self.grid_f_dim, (patch, patch),
                       strides=(patch, patch), dtype=self.dtype,
                       name="proj")(img_nhwc)
        grid = nn.relu(grid).reshape(img_nhwc.shape[0], -1, self.grid_f_dim)
        pos = self.param("pos_emb", nn.initializers.normal(0.02),
                         (self.grid_size * self.grid_size, self.grid_f_dim))
        grid = grid + pos[None]
        grid = SelfAttn(self.grid_f_dim, self.n_heads, self.dropout,
                        self.dtype, name="grid_attn")(grid, train)
        grid = nn.Dense(self.verts_f_dim, dtype=self.dtype, name="fc")(grid)
        V = verts_f.shape[1]
        x = jnp.concatenate([verts_f, grid], axis=1)
        x = SelfAttn(self.verts_f_dim, self.n_heads, self.dropout,
                     self.dtype, name="joint_attn")(x, train)
        return x[:, :V]

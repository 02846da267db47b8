"""Dual-hand GCN mesh decoder.

References: intaghand_decoder.py:75-242 (decoder), model_attn/gcn.py
(Chebyshev GCN res-blocks), model_attn/DualGraph.py (per-level dual-hand
layer).  Produces root-relative 778-vertex meshes for both hands plus
weak-perspective params and a 3-vector absolute-root code per hand.

The graph pyramid (63 -> 126 -> 252 verts) lives in small dense Laplacians;
each Chebyshev conv is two tiny MXU matmuls.  The mesh path runs float32
(mm-level accuracy budget).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pdfnet_tpu import assets
from pdfnet_tpu.models.attention import ImgAttn, InterAttn
from pdfnet_tpu.ops.chebconv import cheb_basis
from pdfnet_tpu.ops.geometry import orthographic_project
from pdfnet_tpu.ops.resize import upsample2x_nearest

Dtype = Any


def graph_avg_pool(x: jax.Array, p: int) -> jax.Array:
    """(B, V, F) -> (B, V/p, F) contiguous-group average pooling."""
    if p <= 1:
        return x
    B, V, F = x.shape
    return x.reshape(B, V // p, p, F).mean(axis=2)


class GCNResBlock(nn.Module):
    """Chebyshev conv res-block.

    Matches the live reference dataflow (gcn.py:100-108): the first
    LayerNorm+relu is computed-then-discarded in the reference, so it is
    omitted here entirely; the block is
      cheb(x) -> relu(LN) -> cheb -> dropout, plus Dense shortcut, -> LN.
    """

    out_dim: int
    graph_L: np.ndarray          # static (V, V) dense Laplacian
    graph_k: int = 2
    dropout: float = 0.05
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, L=None):
        if L is None:
            L = jnp.asarray(self.graph_L)
        y = cheb_basis(x, L, self.graph_k)
        y = nn.Dense(self.out_dim, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(nn.LayerNorm(epsilon=1e-6, name="norm2")(y))
        y = cheb_basis(y, L, self.graph_k)
        y = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        sc = nn.Dense(self.out_dim, dtype=self.dtype, name="shortcut")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm3")(y + sc)


class GraphLayer(nn.Module):
    out_dim: int
    graph_L: np.ndarray
    graph_k: int = 2
    num_blocks: int = 4
    dropout: float = 0.05
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, L=None):
        for i in range(self.num_blocks):
            x = GCNResBlock(self.out_dim, self.graph_L, self.graph_k,
                            self.dropout, self.dtype,
                            name=f"block{i}")(x, train, L)
            if i != self.num_blocks - 1:
                x = nn.relu(x)
        return x


class DualGraphLayer(nn.Module):
    """One pyramid level: pos-emb -> per-hand GCN -> (optional img attn)
    -> cross-hand attention."""

    in_dim: int
    out_dim: int
    graph_L_left: np.ndarray
    graph_L_right: np.ndarray
    graph_k: int = 2
    num_blocks: int = 4
    img_size: int = 12
    img_f_dim: int = 256
    grid_size: int = 6
    grid_f_dim: int = 256
    n_heads: int = 4
    dropout: float = 0.05
    use_img_attn: bool = False
    stack_hands: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, Lf, Rf, img_f, train: bool):
        V = self.graph_L_left.shape[0]
        pos = nn.Embed(V, self.in_dim, name="pos_emb")(jnp.arange(V))
        Lf = Lf + pos[None]
        Rf = Rf + pos[None]
        gl = GraphLayer(self.out_dim, self.graph_L_left, self.graph_k,
                        self.num_blocks, self.dropout, self.dtype,
                        name="graph_left")
        gr = GraphLayer(self.out_dim, self.graph_L_right, self.graph_k,
                        self.num_blocks, self.dropout, self.dtype,
                        name="graph_right")
        if not train and self.stack_hands:
            # Eval fast path: the two hands' GraphLayers share structure but
            # not weights, so stack their parameter trees on a leading hand
            # axis and vmap ONE apply over it — every Dense/cheb matmul in
            # the 2x4 res-block chain becomes a single batched op (the
            # ~halved op count matters: these are tiny HBM-bound tensors).
            # Identical math; training keeps per-hand modules (dropout rng).
            _ = gl(Lf[:1], False)          # materialize params; XLA drops
            _ = gr(Rf[:1], False)          # the unused results
            stacked = jax.tree.map(lambda a, b: jnp.stack([a, b]),
                                   gl.variables["params"],
                                   gr.variables["params"])
            Ls = jnp.stack([jnp.asarray(self.graph_L_left, jnp.float32),
                            jnp.asarray(self.graph_L_right, jnp.float32)])
            tmpl = gl.clone(parent=None)
            ys = jax.vmap(lambda p, L, x: tmpl.apply({"params": p}, x,
                                                     False, L))(
                stacked, Ls, jnp.stack([Lf, Rf]))
            Lf, Rf = ys[0], ys[1]
        else:
            Lf = gl(Lf, train)
            Rf = gr(Rf, train)
        if self.use_img_attn:
            Lf = ImgAttn(self.img_size, self.img_f_dim, self.grid_size,
                         self.grid_f_dim, self.out_dim, self.n_heads,
                         self.dropout, self.dtype,
                         name="img_ex_left")(img_f, Lf, train)
            Rf = ImgAttn(self.img_size, self.img_f_dim, self.grid_size,
                         self.grid_f_dim, self.out_dim, self.n_heads,
                         self.dropout, self.dtype,
                         name="img_ex_right")(img_f, Rf, train)
        return InterAttn(self.out_dim, self.n_heads, self.dropout,
                         self.dtype, stack_hands=self.stack_hands,
                         name="inter_attn")(Lf, Rf, train)


class MeshDecoder(nn.Module):
    """Global hand features + image pyramid -> dual 778-vert meshes."""

    global_feature_dim: int = 1024
    gcn_in_dim: Sequence[int] = (512, 256, 128)
    gcn_out_dim: Sequence[int] = (256, 128, 64)
    img_f_dims: Sequence[int] = (256, 256, 256)
    grid_f_dims: Sequence[int] = (256, 128, 64)
    img_sizes: Sequence[int] = (12, 24, 48)
    grid_sizes: Sequence[int] = (6, 6, 6)
    graph_k: int = 2
    num_blocks: int = 4
    n_heads: int = 4
    dropout: float = 0.05
    use_img_attn: bool = False
    stack_hands: bool = True
    img_size_px: int = 384
    dtype: Dtype = jnp.float32

    def setup(self):
        gl = assets.load_graph("left")
        gr = assets.load_graph("right")
        extras = assets.load_mesh_extras()
        self._lap_left = gl.laplacians[:3]        # 63, 126, 252 verts
        self._lap_right = gr.laplacians[:3]
        self._perm = {"left": gl.graph_perm, "right": gr.graph_perm}
        self._perm_rev = {"left": gl.graph_perm_reverse[:778],
                          "right": gr.graph_perm_reverse[:778]}
        self._dense_coor = extras["dense_coor"]   # (778, 3)
        self._upsample = extras["upsample"]       # (778, 252)
        self.v_in = self._lap_left[0].shape[0]    # 63
        self.v_out = self._lap_left[2].shape[0]   # 252
        self.v_all = 1008

        self.gf_left = nn.Dense(self.gcn_in_dim[0] - 3, name="gf_left")
        self.gf_left_ln = nn.LayerNorm(epsilon=1e-6, name="gf_left_ln")
        self.gf_right = nn.Dense(self.gcn_in_dim[0] - 3, name="gf_right")
        self.gf_right_ln = nn.LayerNorm(epsilon=1e-6, name="gf_right_ln")

        self.layers = [
            DualGraphLayer(
                in_dim=self.gcn_in_dim[i], out_dim=self.gcn_out_dim[i],
                graph_L_left=self._lap_left[i], graph_L_right=self._lap_right[i],
                graph_k=self.graph_k, num_blocks=self.num_blocks,
                img_size=self.img_sizes[i], img_f_dim=self.img_f_dims[i],
                grid_size=self.grid_sizes[i], grid_f_dim=self.grid_f_dims[i],
                n_heads=self.n_heads, dropout=self.dropout,
                use_img_attn=self.use_img_attn,
                stack_hands=self.stack_hands, dtype=self.dtype,
                name=f"level{i}")
            for i in range(3)
        ]

        up_init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
            self._upsample.T, dtype)
        self.unsample = nn.Dense(778, use_bias=False, kernel_init=up_init,
                                 name="unsample")
        self.coord_head = nn.Dense(3, name="coord_head")
        self.avg_head = nn.Dense(1, name="avg_head")
        self.params_head = nn.Dense(3, name="params_head")
        self.root_head = nn.Dense(3, name="root_head")

    def hand_pe(self, bs: int) -> Tuple[jax.Array, jax.Array]:
        """Vertex positional code: dense mesh colors pooled to 63 verts."""
        dc = jnp.asarray(self._dense_coor) * 2.0 - 1.0           # (778, 3)
        pel = graph_avg_pool(
            jnp.tile(dc[self._perm["left"]][None], (bs, 1, 1)), 1008 // self.v_in)
        per = graph_avg_pool(
            jnp.tile(dc[self._perm["right"]][None], (bs, 1, 1)), 1008 // self.v_in)
        return pel, per

    def vert_to_gcn(self, x: jax.Array, side: str) -> jax.Array:
        """MANO-order (B, 778, F) -> padded graph order (B, 1008, F).

        graph_perm duplicates a real vertex for every fake coarsening node
        (all indices < 778), so the conversion is a plain gather.
        """
        return x[:, self._perm[side]]

    def gcn_to_vert(self, x: jax.Array, side: str) -> jax.Array:
        """Padded graph order (B, 1008, F) -> MANO order (B, 778, F)."""
        return x[:, self._perm_rev[side]]

    def __call__(self, gf_left, gf_right, fmaps, train: bool):
        bs = gf_left.shape[0]
        pel, per = self.hand_pe(bs)
        Lf = jnp.concatenate(
            [jnp.tile(self.gf_left_ln(self.gf_left(gf_left))[:, None],
                      (1, self.v_in, 1)), pel], axis=-1)
        Rf = jnp.concatenate(
            [jnp.tile(self.gf_right_ln(self.gf_right(gf_right))[:, None],
                      (1, self.v_in, 1)), per], axis=-1)

        for i, layer in enumerate(self.layers):
            Lf, Rf = layer(Lf, Rf, fmaps[i], train)
            if i != 2:
                Lf = upsample2x_nearest(Lf, axis=1)
                Rf = upsample2x_nearest(Rf, axis=1)

        # Heads on the 252-vert 64-d features.
        def hand_params(f):
            pooled = self.avg_head(f.transpose(0, 2, 1))[..., 0]   # (B, 64)
            p = self.params_head(pooled)
            r = self.root_head(pooled)
            return p[:, 0], p[:, 1:], r                             # scale, t2d, root

        scale_l, t2d_l, root_l = hand_params(Lf)
        scale_r, t2d_r, root_r = hand_params(Rf)
        verts_gcn = {"left": self.coord_head(Lf), "right": self.coord_head(Rf)}
        scale = {"left": scale_l, "right": scale_r}
        trans2d = {"left": t2d_l, "right": t2d_r}

        result = {"verts3d": {}, "verts2d": {}}
        verts2d_gcn = {}
        other: Dict[str, Any] = {"verts3d_MANO_list": {"left": [], "right": []},
                                 "verts2d_MANO_list": {"left": [], "right": []}}
        for side in ("left", "right"):
            verts2d_gcn[side] = orthographic_project(
                scale[side], trans2d[side], verts_gcn[side], self.img_size_px)
            v778 = self.unsample(verts_gcn[side].transpose(0, 2, 1)).transpose(0, 2, 1)
            result["verts3d"][side] = v778
            result["verts2d"][side] = orthographic_project(
                scale[side], trans2d[side], v778, self.img_size_px)
            for key, v in (("verts3d_MANO_list", verts_gcn[side]),
                           ("verts2d_MANO_list", verts2d_gcn[side])):
                up = upsample2x_nearest(upsample2x_nearest(v, 1), 1)  # 252->1008
                other[key][side].append(self.gcn_to_vert(up, side))

        params = {"scale": scale, "trans2d": trans2d,
                  "root": {"left": root_l, "right": root_r}}
        hand_dicts = [{"verts3d": verts_gcn, "verts2d": verts2d_gcn}]
        return result, params, hand_dicts, other

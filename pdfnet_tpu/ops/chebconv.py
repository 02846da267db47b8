"""Chebyshev spectral graph convolution.

Reference: graph_conv_cheby (lib/models/networks/model_attn/gcn.py:34-69).
The graph Laplacians are small dense matrices (63..252 vertices), so the
recursion x_k = 2 L x_{k-1} - x_{k-2} is a couple of MXU matmuls; the final
feature mix is one (B*V, F*K) x (F*K, Fout) matmul.

Basis layout: features are stacked as (..., F, K) flattened with K fastest —
identical to the reference's view(B*V, Fin*K) — so converted reference
weights load unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def cheb_basis(x: jax.Array, L: jax.Array, K: int) -> jax.Array:
    """Chebyshev basis of a vertex-feature tensor.

    Args:
      x: (B, V, F) vertex features.
      L: (V, V) dense rescaled graph Laplacian.
      K: Chebyshev order (>= 1).

    Returns:
      (B, V, F*K) with the K basis terms interleaved fastest.
    """
    terms = [x]
    if K > 1:
        x1 = jnp.einsum("vw,bwf->bvf", L, x, precision=_HI)
        terms.append(x1)
        x0 = x
        for _ in range(2, K):
            x2 = 2.0 * jnp.einsum("vw,bwf->bvf", L, x1, precision=_HI) - x0
            terms.append(x2)
            x0, x1 = x1, x2
    stacked = jnp.stack(terms, axis=-1)           # (B, V, F, K)
    B, V, F = x.shape
    return stacked.reshape(B, V, F * K)


def cheb_conv(x: jax.Array, L: jax.Array, weight: jax.Array,
              bias: jax.Array | None, K: int) -> jax.Array:
    """Full Chebyshev conv: basis + linear mix.

    weight: (F*K, Fout) (input-major, K fastest within input).
    """
    y = jnp.einsum("bvk,ko->bvo", cheb_basis(x, L, K), weight, precision=_HI)
    if bias is not None:
        y = y + bias
    return y

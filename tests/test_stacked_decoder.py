"""Hand-stacked eval decoder (Config.stacked_decoder).

At eval the two hands' GraphLayer / SelfAttn / MLPResBlock pairs (same
structure, different weights) are stacked on a leading hand axis and run as
ONE vmapped apply, and the InterAttn shared q/k/v/out projections run on the
batch-concat of both hands.  These tests assert the fast path is bit-exact
against the per-hand module path on the same variables, and that init
through either branch creates the identical parameter tree.

Reference semantics under test: the dual-hand GCN decoder
(/root/reference/lib/models/networks/intaghand_decoder.py:75-242) with
inter_attn (model_attn/inter_attn.py:38-125).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdfnet_tpu.models.gcn_decoder import MeshDecoder


@pytest.fixture(scope="module")
def decoder_io():
    rng = np.random.RandomState(0)
    B = 2
    gfl = jnp.asarray(rng.randn(B, 1024).astype(np.float32))
    gfr = jnp.asarray(rng.randn(B, 1024).astype(np.float32))
    fmaps = [jnp.asarray(rng.randn(B, s, s, 256).astype(np.float32))
             for s in (12, 24, 48)]
    return gfl, gfr, fmaps


def test_stacked_decoder_bit_exact(decoder_io):
    gfl, gfr, fmaps = decoder_io
    kw = dict(num_blocks=2, dropout=0.0)
    m0 = MeshDecoder(stack_hands=False, **kw)
    m1 = MeshDecoder(stack_hands=True, **kw)
    v = m0.init({"params": jax.random.PRNGKey(0)}, gfl, gfr, fmaps, False)
    r0 = m0.apply(v, gfl, gfr, fmaps, False)
    r1 = m1.apply(v, gfl, gfr, fmaps, False)
    flat0 = jax.tree.leaves((r0[0], r0[1]))
    flat1 = jax.tree.leaves((r1[0], r1[1]))
    for a, b in zip(flat0, flat1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stacked_decoder_param_tree_identical(decoder_io):
    gfl, gfr, fmaps = decoder_io
    kw = dict(num_blocks=2, dropout=0.0)
    v0 = MeshDecoder(stack_hands=False, **kw).init(
        {"params": jax.random.PRNGKey(0)}, gfl, gfr, fmaps, False)
    v1 = MeshDecoder(stack_hands=True, **kw).init(
        {"params": jax.random.PRNGKey(0)}, gfl, gfr, fmaps, False)
    assert (jax.tree.map(lambda a: a.shape, v0)
            == jax.tree.map(lambda a: a.shape, v1))

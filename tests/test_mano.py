"""Parity tests: JAX MANO layer vs recorded reference (torch) outputs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdfnet_tpu import assets
from pdfnet_tpu.mano import layer as mano

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def golden():
    return np.load(os.path.join(GOLDENS, "mano.npz"))


@pytest.mark.parametrize("side", ["left", "right"])
def test_mano_forward_axis(golden, side):
    consts = mano.load_mano_consts(side)
    fwd = jax.jit(lambda r, p, s, t: mano.mano_forward(
        consts, r, p, s, trans=t, center_idx=None))
    v, j = fwd(golden[f"{side}_root"], golden[f"{side}_pose"],
               golden[f"{side}_shape"], golden[f"{side}_trans"])
    # hand scale is ~0.1 units (decimeters of meters); 1e-6 ~ sub-micrometer
    np.testing.assert_allclose(np.asarray(v), golden[f"{side}_verts"], atol=2e-6)
    np.testing.assert_allclose(np.asarray(j), golden[f"{side}_joints"], atol=2e-6)


@pytest.mark.parametrize("side", ["left", "right"])
def test_mano_forward_pca(golden, side):
    consts = mano.load_mano_consts(side)
    fwd = jax.jit(lambda r, p, s, t, sc: mano.mano_forward(
        consts, r, p, s, trans=t, scale=sc, center_idx=9, use_pca=True))
    v, j = fwd(golden[f"{side}_rootmat"], golden[f"{side}_pca"],
               golden[f"{side}_shape"], golden[f"{side}_trans"],
               golden[f"{side}_scale"])
    np.testing.assert_allclose(np.asarray(v), golden[f"{side}_verts_pca"], atol=5e-6)
    np.testing.assert_allclose(np.asarray(j), golden[f"{side}_joints_pca"], atol=5e-6)


def test_rodrigues_orthonormal():
    rng = np.random.RandomState(0)
    axis = rng.uniform(-2, 2, (16, 3)).astype(np.float32)
    R = np.asarray(mano.rodrigues(jnp.asarray(axis)))
    eye = np.eye(3)
    for i in range(16):
        np.testing.assert_allclose(R[i] @ R[i].T, eye, atol=1e-5)
        assert np.linalg.det(R[i]) == pytest.approx(1.0, abs=1e-5)


def test_full_regressor_matches_joints():
    """full_regressor @ verts must reproduce fingertip + reordered joints."""
    for side in ("left", "right"):
        reg = assets.full_regressor(side)
        assert reg.shape == (21, 778)
        # Row sums of a joint regressor are 1.
        np.testing.assert_allclose(reg.sum(1), np.ones(21), atol=1e-4)


def test_grad_flows():
    consts = mano.load_mano_consts("right")

    def loss(pose):
        v, j = mano.mano_forward(
            consts, jnp.zeros((1, 3)), pose, jnp.zeros((1, 10)))
        return jnp.sum(v ** 2) + jnp.sum(j ** 2)

    g = jax.grad(loss)(jnp.full((1, 45), 0.1))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0

"""Per-term torch parity for the origforward MANO-theta branch.

Replays the recorded reference CtdetLoss.origforward evaluation
(tools/record_origforward.py -> .parity_fixtures/origforward.npz) through
pdfnet_tpu.train.mano_branch.origforward_loss and pins every loss_stats
term on both sides of the epoch-20 alpha gate.  Mirrors
test_train_parity.py::test_loss_terms_match_torch_step0 for the alternate
branch (reference simplified.py:657-1048).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

FIXTURE = os.path.join(
    os.environ.get("PDFNET_PARITY_DIR",
                   os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), ".parity_fixtures")),
    "origforward.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE),
    reason="origforward torch fixture missing "
           "(python tools/record_origforward.py)")

TERMS = ("hm_loss", "norm_loss", "reproj_loss_all", "bone_direc_loss",
         "joints_loss", "root_loss", "abs_joints_loss", "verts_loss",
         "abs_verts_loss", "loss")


@pytest.fixture(scope="module")
def fx():
    with np.load(FIXTURE) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.parametrize("epoch", [0, 25])
def test_origforward_terms_match_torch(fx, epoch):
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.train.mano_branch import (load_mano_branch_consts,
                                              origforward_loss)

    cfg = Config()
    consts = load_mano_branch_consts()
    batch = {
        "hm": jnp.asarray(fx["in_hm"].transpose(0, 2, 3, 1)),   # NCHW->NHWC
        "ind": jnp.asarray(fx["in_ind"]),
        "valid": jnp.asarray(fx["in_valid"]),
        "K_new": jnp.asarray(fx["in_K_new"]),
        "lms_left_gt": jnp.asarray(fx["in_lms_left_gt"]),
        "lms_right_gt": jnp.asarray(fx["in_lms_right_gt"]),
        "joints_left_gt": jnp.asarray(fx["in_joints_left_gt"]),
        "joints_right_gt": jnp.asarray(fx["in_joints_right_gt"]),
        "verts_left_gt": jnp.asarray(fx["in_verts_left_gt"]),
        "verts_right_gt": jnp.asarray(fx["in_verts_right_gt"]),
    }
    hm_logits = jnp.asarray(fx["in_hm_logits"].transpose(0, 2, 3, 1))
    loss_vec, stats = origforward_loss(
        cfg, consts, jnp.asarray(fx["in_theta_l"]),
        jnp.asarray(fx["in_theta_r"]), hm_logits, batch,
        jnp.asarray(epoch))

    np.testing.assert_allclose(
        np.asarray(loss_vec), fx[f"ep{epoch}_loss_vec"], rtol=2e-5,
        err_msg="per-sample total loss")
    for term in TERMS:
        key = f"ep{epoch}_{term}"
        assert key in fx, f"fixture missing {key}"
        got = float(stats[term])
        want = float(fx[key])
        # MANO f32 forward parity is <=5e-6 relative; the x1000 metric terms
        # keep that relative scale
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6,
                                   err_msg=term)


def test_origforward_alpha_gate(fx):
    """The only epoch-dependent weight is abs_verts x0.01 after epoch 20
    (simplified.py:990,1036): every term is epoch-invariant and the totals
    differ by ~that weighted term (the fixture totals are torch f32 sums
    near 3.5e6, so quantization is ~0.25/sample — compare loosely)."""
    for term in TERMS:
        if term != "loss":
            np.testing.assert_allclose(fx[f"ep0_{term}"], fx[f"ep25_{term}"],
                                       rtol=1e-7, err_msg=term)
    d = fx["ep25_loss_vec"].mean() - fx["ep0_loss_vec"].mean()
    expect = 1.0 * float(fx["ep25_abs_verts_loss"]) * 0.01   # reproj_weight=1
    assert abs(d - expect) < 1.0, (d, expect)

"""Golden-value tests for the loss library.

Each loss is verified against independently computed values (closed-form
hand computations and, where semantics come from torch, small inline torch
reference computations on CPU).  Mirrors the reference's executable smoke
blocks (SURVEY.md §4) but as a real test suite.
"""
import jax
import numpy as np
import jax.numpy as jnp
import pytest

from playablevideogeneration_tpu.training import losses

# TPU transcendentals (log/exp/softmax) run at slightly lower precision than
# CPU; golden values are checked at platform-appropriate tolerance.
RTOL = 1e-6 if jax.default_backend() == "cpu" else 2e-4


def test_states_loss_is_mse():
    a = jnp.asarray(np.arange(12, dtype=np.float32).reshape(2, 3, 2))
    b = a + 2.0
    assert np.isclose(float(losses.states_loss(a, b)), 4.0)


def test_hidden_states_loss_trims_first():
    gt = jnp.ones((2, 3, 4, 4, 2))
    rec = jnp.concatenate([jnp.full((2, 1, 4, 4, 2), 100.0),
                           jnp.ones((2, 3, 4, 4, 2)) * 2.0], axis=1)
    # The 100s in the first (extra) element must be trimmed away.
    assert np.isclose(float(losses.hidden_states_loss(gt, rec)), 1.0)


def test_observations_loss_right_aligns_and_uses_current_frame():
    B, T, H, W = 1, 3, 8, 8
    obs = np.zeros((B, T, H, W, 6), np.float32)
    obs[..., :3] = 1.0  # current frame channels
    obs[..., 3:] = 55.0  # stacked history must be ignored
    rec = np.zeros((B, T - 1, H, W, 3), np.float32)
    # Right-aligned: compares obs[:, 1:] vs rec -> |1 - 0| = 1
    value = float(losses.observations_loss(jnp.asarray(obs), jnp.asarray(rec)))
    assert np.isclose(value, 1.0)


def test_observations_loss_resizes_gt():
    B, T = 1, 2
    obs = np.ones((B, T, 8, 8, 3), np.float32)
    rec = np.ones((B, T, 4, 4, 3), np.float32) * 0.5
    value = float(losses.observations_loss(jnp.asarray(obs), jnp.asarray(rec)))
    assert np.isclose(value, 0.5, atol=1e-6)


def test_kl_gaussian_standard_normal_is_zero():
    # KL(N(0,1) || N(0,1)) == 0
    params = jnp.stack([jnp.zeros((5, 3)), jnp.ones((5, 3))], axis=1)
    assert np.isclose(float(losses.kl_gaussian_divergence(params)), 0.0, atol=1e-6)


def test_kl_gaussian_closed_form():
    # KL(N(mu, var) || N(0,1)) = 0.5 * (mu^2 + var - log var - 1), per dim
    mu, var = 1.5, 0.7
    params = jnp.asarray([[[mu], [var]]])
    expected = 0.5 * (mu**2 + var - np.log(var) - 1.0)
    assert np.isclose(float(losses.kl_gaussian_divergence(params)), expected, rtol=1e-4)


def test_kl_general_gaussian_matches_reference_formula():
    # Mirrors the reference's __main__ check (losses.py:716-725): variances
    # are clamped at eps=0.05.
    dist = jnp.asarray([[[1.0, 1.0], [1.0, 0.005]]])
    ref = jnp.asarray([[[1.0, 1.0], [1.0, 0.05]]])
    d = 2
    # manual: dims (mean=1,var=1 vs mean=1,var=1) -> 0 ; (1, 0.005->0.05 clamp
    # but log uses unclamped) vs (1, 0.05)
    lv, rlv = np.log(0.005), np.log(0.05)
    v, rv = 0.05, 0.05
    kl_dim2 = rlv - lv - 1 + v / rv + 0.0
    expected = 0.5 * kl_dim2
    assert np.isclose(float(losses.kl_general_gaussian_divergence(dist, ref)),
                      expected, rtol=max(RTOL, 1e-5))


def test_entropy_uniform():
    logits = jnp.zeros((4, 3))
    assert np.isclose(float(losses.entropy_logits(logits)), np.log(3), rtol=RTOL)
    probs = jnp.full((4, 3), 1.0 / 3.0)
    assert np.isclose(float(losses.entropy_probabilities(probs)), np.log(3), rtol=RTOL)


def test_entropy_probabilities_one_hot_is_finite_zero():
    # One-hot samples (one-hot / GT action samplers) must not produce NaN.
    probs = jnp.asarray(np.eye(4, dtype=np.float32))
    value = float(losses.entropy_probabilities(probs))
    assert np.isfinite(value)
    assert np.isclose(value, 0.0, atol=1e-6)


def test_kl_categorical_batchmean():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 3, 4)).astype(np.float32)
    b = rng.normal(size=(2, 3, 4)).astype(np.float32)
    import torch
    import torch.nn.functional as F

    ta, tb = torch.tensor(a).reshape(-1, 4), torch.tensor(b).reshape(-1, 4)
    expected = F.kl_div(F.log_softmax(ta, dim=1), F.softmax(tb, dim=1),
                        reduction="batchmean").item()
    got = float(losses.kl_divergence_categorical(jnp.asarray(a), jnp.asarray(b)))
    assert np.isclose(got, expected, rtol=max(RTOL, 1e-5))


def test_joint_probability_matrix_properties():
    rng = np.random.default_rng(1)
    d1 = jnp.asarray(rng.dirichlet(np.ones(3), size=10).astype(np.float32))
    d2 = jnp.asarray(rng.dirichlet(np.ones(3), size=10).astype(np.float32))
    joint = losses.joint_probability_matrix(d1, d2)
    assert np.isclose(float(joint.sum()), 1.0, rtol=1e-6)
    assert np.allclose(np.asarray(joint), np.asarray(joint).T, rtol=1e-6)


def test_mutual_information_independent_uniform_is_zero():
    d = jnp.full((100, 4), 0.25)
    assert np.isclose(float(losses.mutual_information_loss(d, d)), 0.0, atol=1e-5)


def test_mutual_information_identical_onehot_is_log_k():
    # Perfectly correlated uniform marginals: MI = log K, loss = -log K
    eye = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (5, 1)))
    value = float(losses.mutual_information_loss(eye, eye))
    assert np.isclose(value, -np.log(4), rtol=1e-4)


def test_smooth_mi_state_update():
    d = jnp.full((10, 3), 1.0 / 3.0)
    m0 = losses.init_mi_matrix(3)
    loss, m1 = losses.smooth_mutual_information_loss(d, d, m0, alpha=0.2)
    current = losses.joint_probability_matrix(d, d)
    expected = np.asarray(m0) * 0.8 + np.asarray(current) * 0.2
    assert np.allclose(np.asarray(m1), expected, rtol=1e-6)


def test_motion_weight_mask_shapes_and_first_element():
    obs = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 8, 8, 6)),
                      dtype=jnp.float32)
    rec = jnp.asarray(np.random.default_rng(3).normal(size=(2, 3, 8, 8, 3)),
                      dtype=jnp.float32)
    mask = losses.motion_weight_mask(obs, rec, weight_bias=0.5)
    assert mask.shape == (2, 4, 8, 8, 1)
    assert np.allclose(np.asarray(mask[:, 0]), 1.0)


def test_sequence_loss_right_aligned():
    gt = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 4, 2))
    rec = gt[:, 1:] + 1.0

    def l1(a, b):
        return jnp.mean(jnp.abs(a - b))

    avg, terms = losses.sequence_loss(l1, gt, rec)
    assert terms.shape == (4,)
    assert float(terms[0]) == 0.0
    assert np.allclose(np.asarray(terms[1:]), 1.0)
    assert np.isclose(float(avg), 1.0)


def test_perceptual_loss_batched_gt_is_equivalent():
    """`batched_gt=True` (one concat VGG invocation) must equal the
    two-invocation path in BOTH value and gradient — it is a pure
    execution-layout choice (tpu.vgg_batched_gt)."""
    from playablevideogeneration_tpu.models import vgg as vgg_lib

    rng = np.random.RandomState(11)
    obs = jnp.asarray(rng.randn(2, 4, 32, 32, 3), jnp.float32)
    rec = jnp.asarray(rng.randn(2, 3, 32, 32, 3), jnp.float32)
    vgg_variables = vgg_lib.random_vgg_variables(jax.random.PRNGKey(5))

    import functools

    # VGG params ride as an ARGUMENT: closure-capturing them would inline
    # them as MLIR constants (slow lowering, uncacheable program).
    @functools.partial(jax.jit, static_argnums=2)
    def vg(vgg_vars, r, batched):
        vgg_apply = vgg_lib.make_vgg_apply(vgg_vars)
        return jax.value_and_grad(
            lambda r_: losses.perceptual_loss(vgg_apply, obs, r_,
                                              batched_gt=batched)[0])(r)

    v0, g0 = vg(vgg_variables, rec, False)
    v1, g1 = vg(vgg_variables, rec, True)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-4, atol=1e-6)

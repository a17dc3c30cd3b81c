"""Model-level tests: shapes, teacher-forcing semantics, samplers, centroids."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from playablevideogeneration_tpu.models import centroids as centroid_ops
from playablevideogeneration_tpu.models.gumbel import gumbel_softmax_sample


B, T, H, W = 2, 4, 32, 32


def _random_batch(seed=0):
    rng = np.random.default_rng(seed)
    obs = jnp.asarray(rng.normal(size=(B, T, H, W, 6)).astype(np.float32)) * 0.1
    acts = jnp.asarray(rng.integers(0, 3, size=(B, T)).astype(np.int32))
    return obs, acts


def test_full_forward_shapes(tiny_model, tiny_variables):
    obs, acts = _random_batch()
    # jit (here and below): eager Flax apply pays per-op dispatch on this
    # 1-core host (~30 s/test); one jitted program hits the persistent
    # compile cache across runs.  Values are identical.
    out, _ = jax.jit(lambda v, o, a: tiny_model.apply(
        v, o, a, 2, train=True, gumbel_temperature=0.9,
        mutable=["batch_stats", "model_state"],
        rngs={"sample": jax.random.PRNGKey(2)}))(tiny_variables, obs, acts)
    assert out.reconstructed_observations.shape == (B, T - 1, H, W, 3)
    assert [r.shape for r in out.multiresolution_reconstructed_observations] == [
        (B, T - 1, H, W, 3), (B, T - 1, H // 2, W // 2, 3), (B, T - 1, H // 4, W // 4, 3)]
    assert out.reconstructed_states.shape == (B, T, 4, 4, 8)
    assert out.states.shape == (B, T, 4, 4, 8)
    assert out.hidden_states.shape == (B, T - 1, 4, 4, 8)
    assert out.selected_actions.shape == (B, T - 1)
    assert out.action_logits.shape == (B, T - 1, 3)
    assert out.action_samples.shape == (B, T - 1, 3)
    assert out.attention.shape == (B, T, 4, 4, 1)
    assert out.reconstructed_attention.shape == (B, T - 1, 4, 4, 1)
    assert out.action_directions_distribution.shape == (B, T - 1, 2, 2)
    assert out.action_states_distribution.shape == (B, T, 2, 2)
    assert out.action_variations.shape == (B, T - 1, 2)
    # Frames bounded by tanh
    assert float(jnp.max(jnp.abs(out.reconstructed_observations))) <= 1.0


def test_teacher_forcing_reuses_gt_states(tiny_model, tiny_variables):
    """With gt_init = k, reconstructed_states[:, :k] must be exactly the
    ground-truth states (reference model.py:241-243 semantics)."""
    obs, acts = _random_batch(1)
    out = jax.jit(lambda v, o, a: tiny_model.apply(
        v, o, a, 3, train=False, gumbel_temperature=0.4,
        rngs={"sample": jax.random.PRNGKey(5)}))(tiny_variables, obs, acts)
    np.testing.assert_allclose(np.asarray(out.reconstructed_states[:, :3]),
                               np.asarray(out.states[:, :3]), rtol=1e-6)
    # Beyond gt_init the states come from re-encoding generated frames and
    # must differ.
    diff = np.abs(np.asarray(out.reconstructed_states[:, 3])
                  - np.asarray(out.states[:, 3])).max()
    assert diff > 1e-5


def test_gt_init_is_dynamic_no_retrace(tiny_model, tiny_variables):
    """gt_init is a traced scalar: annealing must not retrace."""
    obs, acts = _random_batch(2)
    traces = {"n": 0}

    def fn(variables, obs, acts, gt_init, temp, rng):
        traces["n"] += 1
        return tiny_model.apply(variables, obs, acts, gt_init, train=False,
                                gumbel_temperature=temp,
                                rngs={"sample": rng}).reconstructed_observations

    jitted = jax.jit(fn)
    for gt_init, temp in ((1, 1.0), (2, 0.8), (3, 0.6)):
        jitted(tiny_variables, obs, acts, jnp.asarray(gt_init),
               jnp.asarray(temp), jax.random.PRNGKey(gt_init))
    assert traces["n"] == 1


def test_pretraining_shapes(tiny_model, tiny_variables):
    obs, acts = _random_batch(3)
    out, _ = jax.jit(lambda v, o, a: tiny_model.apply(
        v, o, a, 1, pretraining=True, train=True,
        gumbel_temperature=1.0, mutable=["batch_stats", "model_state"],
        rngs={"sample": jax.random.PRNGKey(7)}))(tiny_variables, obs, acts)
    assert out.reconstructed_observations.shape == (B, T, H, W, 3)
    assert out.reconstructed_hidden_states.shape == (B, T, 4, 4, 8)
    assert out.hidden_states.shape == (B, T - 1, 4, 4, 8)
    assert out.reconstructed_states.shape == (B, T, 4, 4, 8)


def test_compute_stacked_observations(tiny_model, tiny_variables):
    """Frame stacking repeats the first frame at the sequence start
    (reference model.py:470-486)."""
    frames = jnp.arange(B * T * 2 * 2 * 3, dtype=jnp.float32).reshape(B, T, 2, 2, 3)
    stacked = tiny_model.apply(tiny_variables, frames,
                               method="compute_stacked_observations")
    assert stacked.shape == (B, T, 2, 2, 6)
    # position 0: [frame0, frame0]
    np.testing.assert_array_equal(np.asarray(stacked[:, 0, ..., :3]),
                                  np.asarray(frames[:, 0]))
    np.testing.assert_array_equal(np.asarray(stacked[:, 0, ..., 3:]),
                                  np.asarray(frames[:, 0]))
    # position t>0: [frame_t, frame_{t-1}]
    np.testing.assert_array_equal(np.asarray(stacked[:, 2, ..., :3]),
                                  np.asarray(frames[:, 2]))
    np.testing.assert_array_equal(np.asarray(stacked[:, 2, ..., 3:]),
                                  np.asarray(frames[:, 1]))


def test_action_sampler_plumbing(tiny_model, tiny_variables):
    """One-hot and ground-truth samplers produce one-hot action samples."""
    from playablevideogeneration_tpu.evaluation.action_sampler import (
        make_ground_truth_action_sampler, one_hot_action_sampler)

    obs, acts = _random_batch(4)
    out = jax.jit(lambda v, o, a: tiny_model.apply(
        v, o, a, 1, train=False, gumbel_temperature=0.4,
        action_sampler=one_hot_action_sampler,
        rngs={"sample": jax.random.PRNGKey(11)}))(tiny_variables, obs, acts)
    samples = np.asarray(out.action_samples)
    assert np.allclose(samples.sum(-1), 1.0)
    assert np.allclose(np.sort(samples, axis=-1)[..., :-1], 0.0)

    mapping = {0: 2, 1: 0, 2: 1}
    sampler = make_ground_truth_action_sampler(mapping)
    out2 = jax.jit(lambda v, o, a: tiny_model.apply(
        v, o, a, 1, train=False, gumbel_temperature=0.4,
        action_sampler=sampler,
        rngs={"sample": jax.random.PRNGKey(12)}))(tiny_variables, obs, acts)
    sel = np.asarray(out2.selected_actions)
    expected = np.vectorize(mapping.get)(np.asarray(acts[:, :-1]))
    np.testing.assert_array_equal(sel, expected)


def test_zero_variation_sampler(tiny_model, tiny_variables):
    from playablevideogeneration_tpu.evaluation.action_sampler import (
        zero_action_variation_sampler)

    obs, acts = _random_batch(5)
    out = jax.jit(lambda v, o, a: tiny_model.apply(
        v, o, a, 1, train=False, gumbel_temperature=0.4,
        variation_sampler=zero_action_variation_sampler,
        rngs={"sample": jax.random.PRNGKey(13)}))(tiny_variables, obs, acts)
    assert np.allclose(np.asarray(out.action_variations), 0.0)


def test_play_step_matches_window_semantics(tiny_model, tiny_variables):
    obs, _ = _random_batch(6)
    carry = tiny_model.apply(tiny_variables, 1, method="init_play")
    window = obs[:1, 0]
    carry, frame, next_obs = jax.jit(
        lambda v, c, w, a, var: tiny_model.apply(v, c, w, a, var,
                                                 method="play_step"))(
        tiny_variables, carry, window, jnp.asarray([[1.0, 0.0, 0.0]]),
        jnp.zeros((1, 2)))
    # Window slides: newest frame first, oldest 3 channels dropped.
    np.testing.assert_array_equal(np.asarray(next_obs[..., :3]), np.asarray(frame))
    np.testing.assert_array_equal(np.asarray(next_obs[..., 3:]),
                                  np.asarray(window[..., :3]))


def test_gumbel_sample_distribution():
    """Sampling frequencies approximate the underlying categorical
    (reference gumbel_softmax.py:75-81 smoke check)."""
    probs = np.array([0.1, 0.4, 0.3, 0.2], np.float32)
    log_probs = jnp.log(jnp.tile(jnp.asarray(probs), (20000, 1)))
    samples = gumbel_softmax_sample(jax.random.PRNGKey(0), log_probs,
                                    jnp.asarray(0.1))
    freq = np.asarray(samples.argmax(-1))
    counts = np.bincount(freq, minlength=4) / len(freq)
    assert np.allclose(counts, probs, atol=0.03)


def test_centroid_estimator_reference_values():
    """Reproduces the reference's hand-built smoke test
    (centroid_estimator.py:98-157): alpha=1 with hard assignments recovers
    the cluster means; 0.5/0.5 assignments give p - mean(centroids) = p."""
    points_priors = jnp.asarray(
        [[[1.0, 1, 1], [1, 1, 1]]] * 3 + [[[-1.0, -1, -1], [1, 1, 1]]] * 3)
    assign_hard = jnp.asarray([[1.0, 0]] * 3 + [[0.0, 1]] * 3)
    centroids = jnp.zeros((2, 3))
    new = centroid_ops.update_centroids(centroids, points_priors, assign_hard, 1.0)
    np.testing.assert_allclose(np.asarray(new), [[1, 1, 1], [-1, -1, -1]], rtol=1e-6)

    points = jnp.asarray([[1.0, 1, 1]] * 3 + [[-1.0, -1, -1]] * 3)
    assign_soft = jnp.full((6, 2), 0.5)
    variations = centroid_ops.compute_variations(points, assign_soft, new)
    np.testing.assert_allclose(np.asarray(variations), np.asarray(points), atol=1e-6)


def test_centroid_variations_formula():
    rng = np.random.default_rng(0)
    points = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
    assign = jnp.asarray(rng.dirichlet(np.ones(4), size=5).astype(np.float32))
    cents = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    got = centroid_ops.compute_variations(points, assign, cents)
    expected = (np.asarray(assign)[:, :, None]
                * (np.asarray(points)[:, None, :] - np.asarray(cents)[None])).sum(1)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


@pytest.mark.slow  # ~30 s of grad-graph compile on this host
def test_pretraining_detach_blocks_dynamics_gradients(tiny_model, tiny_variables):
    """pretraining_detach stops the dynamics->representation gradient path
    (reference model.py:425-431) and is rejected by the full forward
    (reference model.py:354)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import pytest

    detached = dataclasses.replace(tiny_model, pretraining_detach=True)
    obs = jnp.ones((2, 4, 32, 32, 6)) * 0.1
    acts = jnp.zeros((2, 4), jnp.int32)

    def hidden_grad(model):
        def loss(params):
            variables = dict(tiny_variables, params=params)
            out = model.apply(variables, obs, acts, 1, pretraining=True,
                              train=False, rngs={"sample": jax.random.PRNGKey(0)})
            return jnp.sum(out.hidden_states ** 2)

        return jax.grad(loss)(tiny_variables["params"])

    g_plain = hidden_grad(tiny_model)
    g_detached = hidden_grad(detached)
    # The representation gradients must change when the dynamics state path
    # is detached (the action-sample path remains).
    diff = jax.tree_util.tree_reduce(
        lambda acc, t: acc + float(jnp.abs(t).sum()),
        jax.tree.map(lambda a, b: a - b,
                     g_plain["representation_network"],
                     g_detached["representation_network"]), 0.0)
    assert diff > 0.0

    with pytest.raises(NotImplementedError):
        detached.apply(tiny_variables, obs, acts, 1, pretraining=False,
                       train=False, rngs={"sample": jax.random.PRNGKey(0)})


@pytest.mark.slow  # ~30 s of grad-graph compile on this host
def test_remat_matches_plain_forward_and_grads(tiny_model, tiny_variables):
    """jax.checkpoint over the time scan must not change the math."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    remat_model = dataclasses.replace(tiny_model, remat=True)
    obs = jnp.asarray(np.random.default_rng(0)
                      .normal(size=(2, 4, 32, 32, 6)).astype(np.float32) * 0.1)
    acts = jnp.zeros((2, 4), jnp.int32)

    def loss(model, params):
        variables = dict(tiny_variables, params=params)
        out = model.apply(variables, obs, acts, 1, pretraining=False,
                          train=False, rngs={"sample": jax.random.PRNGKey(3)})
        return jnp.mean(out.reconstructed_observations ** 2)

    v_plain, g_plain = jax.value_and_grad(
        lambda p: loss(tiny_model, p))(tiny_variables["params"])
    v_remat, g_remat = jax.value_and_grad(
        lambda p: loss(remat_model, p))(tiny_variables["params"])
    np.testing.assert_allclose(float(v_plain), float(v_remat), rtol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_plain),
            jax.tree_util.tree_leaves_with_path(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.slow  # grad-graph compile heavy, like the remat test above
def test_selective_remat_policy_matches_plain_grads(tiny_model, tiny_variables):
    """The selective checkpoint policy ('dots': save conv/matmul outputs
    inside the scan step, recompute only elementwise chains) must be a
    pure scheduling change — identical forward value and gradients."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    policy_model = dataclasses.replace(tiny_model, remat=True,
                                       remat_policy="dots")
    obs = jnp.asarray(np.random.default_rng(1)
                      .normal(size=(2, 4, 32, 32, 6)).astype(np.float32) * 0.1)
    acts = jnp.zeros((2, 4), jnp.int32)

    def loss(model, params):
        variables = dict(tiny_variables, params=params)
        out = model.apply(variables, obs, acts, 1, pretraining=False,
                          train=False, rngs={"sample": jax.random.PRNGKey(3)})
        return jnp.mean(out.reconstructed_observations ** 2)

    v_plain, g_plain = jax.value_and_grad(
        lambda p: loss(tiny_model, p))(tiny_variables["params"])
    v_policy, g_policy = jax.value_and_grad(
        lambda p: loss(policy_model, p))(tiny_variables["params"])
    np.testing.assert_allclose(float(v_plain), float(v_policy), rtol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_plain),
            jax.tree_util.tree_leaves_with_path(g_policy)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))


def test_resolve_remat_policy_names():
    import jax

    from playablevideogeneration_tpu.models.caddy import resolve_remat_policy

    assert resolve_remat_policy(None) is None
    assert resolve_remat_policy("full") is None
    assert resolve_remat_policy("dots") is jax.checkpoint_policies.dots_saveable
    assert callable(resolve_remat_policy("names:a,b"))
    with pytest.raises(ValueError, match="Unknown tpu.remat_policy"):
        resolve_remat_policy("bogus")


def test_names_remat_policy_matches_full_remat_gradients(tiny_model, tiny_variables):
    """`tpu.remat_policy='names:convout32+convout64'` (save the tagged
    low-resolution conv outputs, layers.tag_activation) is an execution-
    schedule choice: loss value and gradients must equal full remat."""
    from playablevideogeneration_tpu.models.caddy import (
        Caddy, resolve_remat_policy)

    obs, acts = _random_batch(9)

    def make_loss(policy):
        model = Caddy(
            actions_count=3, action_space_dimension=2, state_features=8,
            state_resolution=(4, 4), hidden_state_size=8,
            observation_stacking=2, remat=True, remat_policy=policy)

        def loss(params, variables):
            out = model.apply(
                dict(variables, params=params), obs, acts, 2, train=False,
                gumbel_temperature=0.9, rngs={"sample": jax.random.PRNGKey(3)})
            return jnp.mean(jnp.abs(out.reconstructed_observations))

        return loss

    # The policy string parses (both separators) and is a real policy.
    assert resolve_remat_policy("names:convout32+convout64") is not None
    assert resolve_remat_policy("names:convout32,convout64") is not None

    params = tiny_variables["params"]
    v_full, g_full = jax.jit(jax.value_and_grad(make_loss(None)))(
        params, tiny_variables)
    v_sel, g_sel = jax.jit(jax.value_and_grad(
        make_loss("names:convout32+convout64")))(params, tiny_variables)
    np.testing.assert_allclose(np.asarray(v_sel), np.asarray(v_full),
                               rtol=1e-6, atol=1e-7)
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_full),
            jax.tree_util.tree_leaves_with_path(g_sel)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(p)}")

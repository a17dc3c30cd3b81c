"""Numerical parity against the actual reference implementation.

Builds the reference PyTorch CADDY model (CPU) with a tiny config, converts
its randomly-initialized weights through
`utils/reference_checkpoint.convert_reference_state_dict`, and asserts the
flax model reproduces the reference forward pass — encoder states and
attention, action logits, the full autoregressive rollout at several
teacher-forcing schedules, and the multi-resolution reconstructions.

This is the strongest possible parity check without downloadable
checkpoints: with a real released .pth.tar the same converter yields
reference-equivalent weights.  Skipped when the reference repo is not
mounted.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = [
    pytest.mark.skipif(not os.path.isdir(REFERENCE),
                       reason="reference repo not available"),
    # Runs the actual reference torch model side-by-side: slow tier.
    pytest.mark.slow,
]

B, T, H, W = 2, 4, 32, 32
STACKING = 2


@pytest.fixture(scope="module", params=["main", "reduced"])
def reference_setup(request):
    import torch

    sys.path.insert(0, REFERENCE)
    import importlib

    variant = request.param
    ref_module = importlib.import_module(f"model.{variant}_model.model")
    for mod_name in ("model.main_model.action_network",
                     "model.reduced_model.action_network"):
        action_module = importlib.import_module(mod_name)

        # The reference hard-codes .cuda() in its noise/sampling helpers
        # (model.py:496, action_network.py:45); run them on CPU.  The noise
        # is never consumed by the dynamics net (conv_dynamics_network.py:30).
        def cpu_sample(self, mean, variance):
            noise = torch.randn(mean.size(), dtype=torch.float32)
            return noise * torch.sqrt(variance) + mean

        action_module.ActionNetwork.sample = cpu_sample
    main_module = importlib.import_module("model.main_model.model")
    main_module.Model.generate_noise = lambda self, batch_size: torch.zeros(
        (batch_size, self.random_noise_size))

    from playablevideogeneration_tpu.data.synthetic import make_synthetic_config

    # Both reference variants hard-code state_features=64 (64+1 attention
    # split); the main rendering widths 128/64/32 demand hidden 128
    # (rendering_network.py:30-41), the reduced 64/32/16 demand hidden 64.
    hidden = 128 if variant == "main" else 64
    cfg = make_synthetic_config(
        data_root="/x", output_root="/y", height=H, width=W, actions_count=3,
        observation_stacking=STACKING, hidden_state_size=hidden,
        state_features=64)
    cfg["model"]["architecture"] = f"model.{variant}_model.model"
    # Optional key our Configuration.check_config would default; the
    # reference reads it directly (model.py:188).
    cfg["model"]["action_network"]["use_variations"] = True

    torch.manual_seed(0)
    ref_model = ref_module.Model(cfg)
    ref_model.eval()
    return ref_model, cfg


@pytest.fixture(scope="module")
def converted(reference_setup):
    ref_model, cfg = reference_setup
    from playablevideogeneration_tpu.utils.reference_checkpoint import (
        convert_reference_state_dict,
    )

    state = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    return convert_reference_state_dict(state)


@pytest.fixture(scope="module")
def our_model(reference_setup):
    from playablevideogeneration_tpu.config import registry

    registry._register_defaults()
    _, cfg = reference_setup
    return registry.resolve("model", cfg["model"]["architecture"])(cfg)


def test_converted_tree_is_congruent_with_init(reference_setup, converted,
                                               our_model):
    """Every converted leaf must land on an existing init-tree leaf with the
    same shape — no silent drops or extras."""
    import jax
    import jax.numpy as jnp

    from playablevideogeneration_tpu.models.caddy import init_model_variables

    obs = jnp.zeros((B, T, H, W, 3 * STACKING))
    acts = jnp.zeros((B, T), jnp.int32)
    template = init_model_variables(our_model, jax.random.PRNGKey(0), obs, acts)

    for collection in ("params", "batch_stats", "model_state"):
        want = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_leaves_with_path(template[collection])}
        got = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
               jax.tree_util.tree_leaves_with_path(converted[collection])}
        assert got == want, (
            f"{collection}: missing={sorted(set(want) - set(got))[:5]} "
            f"extra={sorted(set(got) - set(want))[:5]}")


_JITTED_FORWARD = {}


def _forward_pair(reference_setup, converted, our_model, gt_init: int):
    import torch

    import jax
    import jax.numpy as jnp

    from playablevideogeneration_tpu.evaluation.action_sampler import (
        zero_action_variation_sampler,
    )

    ref_model, cfg = reference_setup

    # Fully deterministic sampler pair: one-hot of the GROUND TRUTH action
    # (the GroundTruthActionSampler protocol with an identity mapping,
    # reference action_sampler.py:37-84) + zero variations.  The argmax
    # one-hot sampler would depend on the logits, which pass through the
    # REPARAMETERIZED direction sampling (action_network.py:36-48,113-115)
    # and therefore cannot match across frameworks' RNGs.
    def torch_gt_sampler(log_probabilities, ground_truth):
        return torch.nn.functional.one_hot(
            ground_truth.long(), log_probabilities.size(1)).float()

    def torch_zero_variation_sampler(sampled_action_directions, action_samples):
        return sampled_action_directions * 0.0

    from playablevideogeneration_tpu.evaluation.action_sampler import (
        make_ground_truth_action_sampler,
    )

    jax_gt_sampler = make_ground_truth_action_sampler({i: i for i in range(3)})

    rng = np.random.default_rng(7)
    obs = rng.uniform(-1, 1, (B, T, 3 * STACKING, H, W)).astype(np.float32)
    actions = rng.integers(0, 3, (B, T)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref_model(
            (torch.tensor(obs), torch.tensor(actions),
             torch.zeros((B, T)), torch.zeros((B, T))),
            ground_truth_observations_init=gt_init,
            gumbel_temperature=0.4,
            action_sampler=torch_gt_sampler,
            action_variation_sampler=torch_zero_variation_sampler)

    obs_jax = jnp.asarray(np.transpose(obs, (0, 1, 3, 4, 2)))
    # gt_init rides as a TRACED scalar (the framework's annealing design):
    # one compiled program serves every teacher-forcing schedule.
    key = id(our_model)
    if key not in _JITTED_FORWARD:
        def fwd(variables, obs, actions, gt_init, rng):
            return our_model.apply(
                variables, obs, actions, gt_init, train=False,
                gumbel_temperature=jnp.asarray(0.4),
                action_sampler=jax_gt_sampler,
                variation_sampler=zero_action_variation_sampler,
                rngs={"sample": rng})

        _JITTED_FORWARD[key] = jax.jit(fwd)
    our_out = _JITTED_FORWARD[key](
        converted, obs_jax, jnp.asarray(actions.astype(np.int32)),
        jnp.asarray(gt_init, jnp.int32), jax.random.PRNGKey(1))
    return ref_out, our_out


def _nhwc(torch_tensor):
    """(B, T, C, H, W) torch tensor -> (B, T, H, W, C) numpy."""
    return np.transpose(torch_tensor.numpy(), (0, 1, 3, 4, 2))


@pytest.mark.parametrize("gt_init", [1, 2, T - 1])
def test_full_forward_parity(reference_setup, converted, our_model, gt_init):
    ref_out, our_out = _forward_pair(reference_setup, converted, our_model,
                                     gt_init)
    (ref_recon, ref_multires, ref_recon_states, ref_states, ref_hidden,
     ref_selected, ref_logits, ref_samples, ref_attention,
     ref_recon_attention, ref_dirs_dist, ref_sampled_dirs,
     ref_states_dist, *_rest) = ref_out

    tol = dict(rtol=1e-3, atol=2e-4)
    # Encoder parity.
    np.testing.assert_allclose(np.asarray(our_out.states), _nhwc(ref_states),
                               **tol)
    np.testing.assert_allclose(np.asarray(our_out.attention),
                               _nhwc(ref_attention), **tol)
    # Action-network DISTRIBUTION heads (deterministic; the logits pass
    # through reparameterized direction samples and are checked separately).
    np.testing.assert_allclose(np.asarray(our_out.action_directions_distribution),
                               ref_dirs_dist.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(our_out.action_states_distribution),
                               ref_states_dist.numpy(), **tol)
    # GT-sampled actions are identical one-hots on both sides.
    np.testing.assert_array_equal(np.asarray(our_out.selected_actions),
                                  ref_selected.numpy())
    np.testing.assert_allclose(np.asarray(our_out.action_samples),
                               ref_samples.numpy(), **tol)
    # Full autoregressive rollout parity: dynamics, rendering, re-encoding
    # and the teacher-forcing schedule.
    np.testing.assert_allclose(np.asarray(our_out.hidden_states),
                               _nhwc(ref_hidden), **tol)
    np.testing.assert_allclose(np.asarray(our_out.reconstructed_states),
                               _nhwc(ref_recon_states), **tol)
    np.testing.assert_allclose(np.asarray(our_out.reconstructed_attention),
                               _nhwc(ref_recon_attention), **tol)
    assert len(our_out.multiresolution_reconstructed_observations) == \
        len(ref_multires)
    for ours, theirs in zip(our_out.multiresolution_reconstructed_observations,
                            ref_multires):
        np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), **tol)
    np.testing.assert_allclose(np.asarray(our_out.reconstructed_observations),
                               _nhwc(ref_recon), **tol)

    # Logit head parity: final_fc applied to the REFERENCE's sampled
    # directions must reproduce the reference logits with the converted
    # kernel (covers the classifier mapping without matching RNGs).
    kernel = np.asarray(converted["params"]["action_network_0"]["final_fc"]["kernel"])
    bias = np.asarray(converted["params"]["action_network_0"]["final_fc"]["bias"])
    want = ref_logits.numpy()
    got = ref_sampled_dirs.numpy() @ kernel + bias
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_load_reference_checkpoint_file(reference_setup, converted, tmp_path):
    """torch.save'd {'model': state_dict} .pth.tar (the reference trainer's
    on-disk format, trainer.py:80-100) loads and converts identically."""
    import torch

    import jax

    from playablevideogeneration_tpu.utils.reference_checkpoint import (
        load_reference_checkpoint,
    )

    ref_model, _ = reference_setup
    path = str(tmp_path / "latest.pth.tar")
    torch.save({"model": ref_model.state_dict(), "optimizer": {},
                "lr_scheduler": {}, "step": 12345}, path)
    loaded = load_reference_checkpoint(path)
    for collection in ("params", "batch_stats", "model_state"):
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(converted[collection]),
                jax.tree_util.tree_leaves_with_path(loaded[collection])):
            assert str(pa) == str(pb)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_play_session_runs_on_reference_weights(reference_setup, converted,
                                                our_model):
    """The interactive play path works directly on imported reference
    weights (the migration story for released checkpoints)."""
    import jax
    import jax.numpy as jnp

    from playablevideogeneration_tpu.inference.play_session import PlaySession

    variables = jax.tree.map(jnp.asarray, converted)
    session = PlaySession(our_model, variables)
    observation = np.random.default_rng(3).uniform(
        -1, 1, (H, W, 3 * STACKING)).astype(np.float32)
    session.start(observation)
    frame = session.generate_next(1)
    assert frame.shape == (H, W, 3)
    assert np.all(np.isfinite(frame))
    frames = session.rollout(np.asarray([0, 1, 2]))
    assert frames.shape == (3, H, W, 3) and frames.dtype == np.uint8


def test_pretraining_forward_parity(reference_setup, converted, our_model):
    """Pretraining-phase parity: state->hidden projection decoding, the
    dynamics scan over GT states, and the re-encoding of decoded frames
    (reference model.py:290-468)."""
    import torch

    import jax
    import jax.numpy as jnp

    from playablevideogeneration_tpu.evaluation.action_sampler import (
        make_ground_truth_action_sampler,
        zero_action_variation_sampler,
    )

    ref_model, _ = reference_setup

    def torch_gt_sampler(log_probabilities, ground_truth):
        return torch.nn.functional.one_hot(
            ground_truth.long(), log_probabilities.size(1)).float()

    rng = np.random.default_rng(9)
    obs = rng.uniform(-1, 1, (B, T, 3 * STACKING, H, W)).astype(np.float32)
    actions = rng.integers(0, 3, (B, T)).astype(np.int64)

    with torch.no_grad():
        ref_out = ref_model(
            (torch.tensor(obs), torch.tensor(actions),
             torch.zeros((B, T)), torch.zeros((B, T))),
            pretraining=True, gumbel_temperature=0.4,
            action_sampler=torch_gt_sampler,
            action_variation_sampler=lambda dirs, samples: dirs * 0.0)
    (ref_recon, ref_multires, ref_recon_states, ref_states,
     ref_recon_hidden, ref_hidden, _selected, _logits, ref_samples,
     ref_attention, *_rest) = ref_out

    our_out = our_model.apply(
        converted, jnp.asarray(np.transpose(obs, (0, 1, 3, 4, 2))),
        jnp.asarray(actions.astype(np.int32)), 1, pretraining=True,
        train=False, gumbel_temperature=jnp.asarray(0.4),
        action_sampler=make_ground_truth_action_sampler({i: i for i in range(3)}),
        variation_sampler=zero_action_variation_sampler,
        rngs={"sample": jax.random.PRNGKey(2)})

    tol = dict(rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(our_out.states), _nhwc(ref_states), **tol)
    np.testing.assert_allclose(np.asarray(our_out.attention),
                               _nhwc(ref_attention), **tol)
    np.testing.assert_allclose(np.asarray(our_out.action_samples),
                               ref_samples.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(our_out.reconstructed_hidden_states),
                               _nhwc(ref_recon_hidden), **tol)
    np.testing.assert_allclose(np.asarray(our_out.hidden_states),
                               _nhwc(ref_hidden), **tol)
    np.testing.assert_allclose(np.asarray(our_out.reconstructed_observations),
                               _nhwc(ref_recon), **tol)
    for ours, theirs in zip(our_out.multiresolution_reconstructed_observations,
                            ref_multires):
        np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), **tol)
    np.testing.assert_allclose(np.asarray(our_out.reconstructed_states),
                               _nhwc(ref_recon_states), **tol)


def test_interactive_inference_parity(reference_setup, converted, our_model):
    """Per-frame interactive generation parity: start_inference +
    generate_next / generate_next_interpolation (reference model.py:561-655)
    vs the jitted play session."""
    import torch

    import jax.numpy as jnp

    from playablevideogeneration_tpu.inference.play_session import PlaySession

    ref_model, _ = reference_setup
    # The inference helpers hard-code .cuda() on fresh tensors
    # (model.py:554,586-592,639); make it a no-op on this CPU-only host.
    original_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        rng = np.random.default_rng(5)
        observation = rng.uniform(-1, 1, (3 * STACKING, H, W)).astype(np.float32)

        ref_model.start_inference()
        ref_obs = torch.tensor(observation)
        ref_frames = []
        for action in (0, 2, 1):
            with torch.no_grad():
                frame, ref_obs = ref_model.generate_next(ref_obs, action,
                                                         noise=False)
            ref_frames.append(frame.numpy())
        with torch.no_grad():
            interp_frame, _ = ref_model.generate_next_interpolation(
                ref_obs, 0, 2, 0.3)

        import jax

        session = PlaySession(our_model, jax.tree.map(jnp.asarray, converted))
        session.start(np.transpose(observation, (1, 2, 0)))
        for action, want in zip((0, 2, 1), ref_frames):
            got = session.generate_next(action)
            np.testing.assert_allclose(got, np.transpose(want, (1, 2, 0)),
                                       rtol=1e-3, atol=2e-4)
        got_interp = session.generate_next_interpolation(0, 2, 0.3)
        np.testing.assert_allclose(got_interp,
                                   np.transpose(interp_frame.numpy(), (1, 2, 0)),
                                   rtol=1e-3, atol=2e-4)
    finally:
        torch.Tensor.cuda = original_cuda

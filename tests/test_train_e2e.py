"""End-to-end training smoke test on the synthetic moving-square dataset.

Exercises config -> registry -> datasets -> trainer (pretraining + full
phases) -> checkpoint save/load -> evaluator, mirroring the reference's
train.py pipeline (SURVEY.md §3.1) on tiny shapes.
"""
import os

import numpy as np
import pytest

from playablevideogeneration_tpu.data.synthetic import (
    build_synthetic_dataset,
    make_synthetic_config,
)


@pytest.fixture(scope="module")
def synthetic_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    data_root = str(root / "data")
    build_synthetic_dataset(data_root, videos_per_split=2, length=12,
                            height=32, width=32, actions_count=3)
    config = make_synthetic_config(
        data_root=data_root, output_root=str(root / "out"),
        height=32, width=32, actions_count=3, batch_size=2,
        observations_count=4, observation_stacking=1,
        hidden_state_size=8, state_features=8,
        pretraining_steps=1, max_steps=3)
    config["training"]["batching"]["observations_count_start"] = 4
    config["evaluation"]["batching"]["observations_count"] = 4
    config["evaluation"]["batching"]["batch_size"] = 2
    # Exercise the wandb.watch-equivalent device-side gradient histograms.
    config["tpu"] = {"grad_histograms": True}
    from playablevideogeneration_tpu.config.configuration import Configuration

    c = Configuration(config=config)
    c.check_config()
    c.create_directory_structure()
    return c.get_config()


@pytest.mark.slow
def test_train_checkpoint_eval_cycle(synthetic_run):
    from playablevideogeneration_tpu.cli.train import train

    trainer = train(synthetic_run, max_steps=3)
    assert trainer.global_step == 3
    # latest checkpoint written
    latest = os.path.join(synthetic_run["logging"]["save_root_directory"], "latest")
    assert os.path.isdir(latest)

    # Resuming restores the step and parameters.
    from playablevideogeneration_tpu.cli.train import build_run
    from playablevideogeneration_tpu.data.video_dataset import collate

    model, datasets, trainer2, evaluators, logger = build_run(synthetic_run)
    trainer2.init_state(collate([datasets["train"][0]]))
    trainer2.load_checkpoint()
    assert trainer2.global_step == 3
    p1 = np.asarray(next(iter(
        trainer.state.params["representation_network"]["conv1"].values())))
    p2 = np.asarray(next(iter(
        trainer2.state.params["representation_network"]["conv1"].values())))
    np.testing.assert_allclose(p1, p2, rtol=1e-6)

    # In-training evaluation produces finite metrics + the action mapping.
    metrics = evaluators["validation"].evaluate(
        trainer2.state.variables(), step=3, save_images=True)
    assert all(np.isfinite(v) for v in metrics.values())
    mapping = evaluators["validation"].get_best_action_mappings()
    assert set(mapping.keys()) <= {0, 1, 2}

    # Full sampler protocol of cli/train.py (reference train.py:99-106):
    # Gumbel (None) -> one-hot -> GT-mapped must each recompile against the
    # new sampler and produce distinct, finite metrics (guards the stale
    # jit-cache regression).
    from playablevideogeneration_tpu.evaluation.action_sampler import (
        make_ground_truth_action_sampler,
        one_hot_action_sampler,
    )

    variables = trainer2.state.variables()
    evaluator = evaluators["validation"]
    default_programs = dict(evaluator._jitted)  # Gumbel pass already compiled
    evaluator.set_action_sampler(one_hot_action_sampler, label="one_hot")
    metrics_onehot = evaluator.evaluate(variables, step=3, save_images=False)
    assert all(np.isfinite(v) for v in metrics_onehot.values())
    evaluator.set_action_sampler(make_ground_truth_action_sampler(mapping),
                                 label="gt_actions")
    metrics_gt = evaluator.evaluate(variables, step=3, save_images=False)
    assert all(np.isfinite(v) for v in metrics_gt.values())

    # One-hot samples have zero entropy; Gumbel soft samples do not.
    # Each pass logs under its label so wandb keeps all three at one step.
    assert metrics_onehot["validation/one_hot/samples_entropy"] < 1e-5
    assert metrics["validation/samples_entropy"] > 1e-3
    # GT-mapped sampling feeds GT actions through the Hungarian mapping, so
    # the re-matched accuracy is exact by construction.
    assert metrics_gt["validation/gt_actions/actions_accuracy"] > 0.999

    # Sampler swaps must NOT discard compiled programs: swapping back to
    # the Gumbel sampler reuses its cached jit object (the old
    # clear-on-swap forced three full recompiles per evaluation round).
    evaluator.set_action_sampler(None)
    for key, program in default_programs.items():
        assert evaluator._jitted.get(key) is program


@pytest.mark.slow  # init_state traces the full model (~60 s here)
def test_abstract_state_matches_init_state(synthetic_run):
    """trainer.abstract_state must mirror init_state's pytree exactly
    (same treedef, shapes, dtypes) — it is the contract bench.py relies
    on to AOT-compile the train step off-chip."""
    import jax

    from playablevideogeneration_tpu.cli.train import build_run
    from playablevideogeneration_tpu.data.video_dataset import collate

    model, datasets, trainer, evaluators, logger = build_run(synthetic_run)
    batch = collate([datasets["train"][0]])
    avals = trainer.abstract_state(batch)
    state = trainer.init_state(batch)

    flat_a = jax.tree_util.tree_leaves_with_path(avals)
    flat_s = jax.tree_util.tree_leaves_with_path(state)
    assert len(flat_a) == len(flat_s)
    for (pa, va), (ps, vs) in zip(flat_a, flat_s):
        assert str(pa) == str(ps)
        assert va.shape == vs.shape, str(pa)
        assert va.dtype == vs.dtype, str(pa)


@pytest.mark.slow
def test_aot_compiled_step_runs(synthetic_run):
    """bench.py's AOT path: lower the train step from abstract avals,
    compile, then execute with the real state."""
    import jax
    import jax.numpy as jnp

    from playablevideogeneration_tpu.cli.train import build_run
    from playablevideogeneration_tpu.data.video_dataset import collate

    model, datasets, trainer, evaluators, logger = build_run(synthetic_run)
    batch = collate([datasets["train"][0]])
    step_fn = trainer._get_train_step(4, pretraining=False)

    # Shardings attached to the avals, exactly like bench.py — keeps the
    # compiled executable valid for the placed state on any mesh shape.
    from playablevideogeneration_tpu.parallel import mesh as mesh_lib

    replicated = mesh_lib.replicated_sharding(trainer.mesh)

    def aval(x, sharding=None):
        return jax.ShapeDtypeStruct(np.shape(x), x.dtype,
                                    sharding=sharding or replicated)

    abstract = trainer.abstract_state(batch)
    abstract = jax.tree.map(
        aval, abstract,
        mesh_lib.state_shardings(trainer.mesh, abstract,
                                 trainer._tp_min_channels))
    compiled = step_fn.lower(
        abstract,
        jax.ShapeDtypeStruct(np.shape(batch.observations), jnp.float32,
                             sharding=trainer._batch_sharded),
        jax.ShapeDtypeStruct(np.shape(batch.actions), jnp.int32,
                             sharding=trainer._batch_sharded),
        jax.ShapeDtypeStruct((), jnp.int32, sharding=replicated),
        jax.ShapeDtypeStruct((), jnp.float32, sharding=replicated),
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=replicated),
        jax.tree.map(aval, trainer.vgg_variables),
    ).compile()

    state = trainer.init_state(batch)
    step0 = int(state.step)  # read BEFORE the call: state is donated
    obs = jax.device_put(np.asarray(batch.observations, np.float32),
                         trainer._batch_sharded)
    acts = jax.device_put(np.asarray(batch.actions, np.int32),
                          trainer._batch_sharded)
    new_state, metrics = compiled(
        state, obs, acts, jnp.asarray(1, jnp.int32),
        jnp.asarray(0.9, jnp.float32), jax.random.PRNGKey(0),
        trainer.vgg_variables)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == step0 + 1


def test_logger_histogram_wrapping():
    """Logger.histogram wraps device-computed (counts, edges) pairs as
    wandb Histograms when wandb is live, and degrades to None without it
    (the wandb.watch equivalent of reference train.py:70)."""
    from playablevideogeneration_tpu.utils.logging import Logger

    logger = Logger(use_wandb=False)
    assert logger.histogram((np.ones(4), np.arange(5.0))) is None

    class FakeWandb:
        def Histogram(self, np_histogram):
            counts, edges = np_histogram
            assert len(edges) == len(counts) + 1
            return ("hist", tuple(counts), tuple(edges))

    logger._wandb = FakeWandb()
    counts = np.array([1, 2, 3, 0])
    edges = np.linspace(-1.0, 1.0, 5)
    got = logger.histogram((counts, edges))
    assert got == ("hist", (1.0, 2.0, 3.0, 0.0), tuple(map(float, edges)))

"""Worker process for the 2-process multi-host smoke test.

Run via subprocess by tests/test_multihost.py.  In 'multi' mode the parent
sets JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID and
PVG_MULTIHOST=1, and this worker forms a real 2-process JAX cluster over
the CPU backend (gloo collectives), loads ITS shard of the synthetic
dataset through the sharded DataLoader, assembles the global batch with
mesh.put_batch (-> jax.make_array_from_process_local_data) and runs two
data-parallel train steps.  In 'single' mode the same global batch is
assembled locally (concatenating the two loader shards in process order)
and the same two steps run in one process — the parent asserts the two
modes produce equivalent losses and parameters.

This executes the one parallelism path nothing else covers: the
reference's parallelism tops out at single-process DataParallel
(reference train.py:67), so multi-host is new-framework surface defined
only by parallel/mesh.py:put_batch + utils/jax_setup.py:setup_multihost.
"""
import json
import os
import sys


def main():
    mode, data_root, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    devices_per_process = int(sys.argv[4]) if len(sys.argv) > 4 else 1

    os.environ["PVG_PLATFORM"] = "cpu"
    from playablevideogeneration_tpu.utils.jax_setup import setup_jax

    setup_jax()
    if devices_per_process > 1:
        import jax as _jax

        _jax.config.update("jax_num_cpu_devices", devices_per_process)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from playablevideogeneration_tpu.config.configuration import Configuration
    from playablevideogeneration_tpu.data.loader import DataLoader
    from playablevideogeneration_tpu.data.synthetic import make_synthetic_config
    from playablevideogeneration_tpu.data.transforms import make_train_transform
    from playablevideogeneration_tpu.data.video_dataset import Batch, VideoDataset
    from playablevideogeneration_tpu.models.caddy import Caddy
    from playablevideogeneration_tpu.parallel import mesh as mesh_lib
    from playablevideogeneration_tpu.training.smooth_mi import (
        make_smooth_mi_trainer,
    )
    from playablevideogeneration_tpu.utils.logging import Logger

    H = W = 16
    T, GLOBAL_B, SHARDS = 3, 4, 2
    pidx, pcount = jax.process_index(), jax.process_count()
    if mode == "multi":
        assert pcount == SHARDS, f"expected {SHARDS} processes, got {pcount}"
    else:
        assert pcount == 1

    config = make_synthetic_config(
        data_root=data_root, output_root=os.path.join(data_root, "out"),
        height=H, width=W, actions_count=3, batch_size=GLOBAL_B,
        observations_count=T, observation_stacking=1,
        hidden_state_size=8, state_features=8)
    Configuration(config=config).check_config(check_data_root=False)

    batching = {"observations_count": T, "observation_stacking": 1,
                "skip_frames": 0}
    transform = make_train_transform(None, (W, H))
    dataset = VideoDataset(os.path.join(data_root, "train"), batching,
                           transform)

    def shard_batch(shard_index: int, shard_count: int):
        loader = DataLoader(dataset, batch_size=GLOBAL_B // shard_count,
                            shuffle=False, drop_last=True, num_workers=1,
                            shard_index=shard_index, shard_count=shard_count)
        return next(iter(loader))

    if mode == "multi":
        local = shard_batch(pidx, SHARDS)
        local_obs, local_acts = local.observations, local.actions
    else:
        # The exact global array put_batch assembles across processes:
        # process-local shards concatenated in process order.
        shards = [shard_batch(i, SHARDS) for i in range(SHARDS)]
        local_obs = np.concatenate([s.observations for s in shards], axis=0)
        local_acts = np.concatenate([s.actions for s in shards], axis=0)

    mesh = mesh_lib.make_mesh(jax.devices())
    model = Caddy(actions_count=3, action_space_dimension=2, state_features=8,
                  state_resolution=(H // 8, W // 8), hidden_state_size=8,
                  observation_stacking=1)
    trainer = make_smooth_mi_trainer(config, model, dataset, Logger(),
                                     mesh=mesh)

    # Identical-by-construction init batch (zeros) so both processes — and
    # both modes — initialize the same state.
    init_batch = Batch(
        observations=np.zeros((GLOBAL_B, T, H, W, 3), np.float32),
        actions=np.zeros((GLOBAL_B, T), np.int32),
        rewards=np.zeros((GLOBAL_B, T), np.float32),
        dones=np.zeros((GLOBAL_B, T), bool), videos=[], initial_frames=[])
    trainer.init_state(init_batch)

    step_fn = trainer._get_train_step(T, pretraining=False)
    obs = mesh_lib.put_batch(mesh, np.asarray(local_obs, np.float32))
    acts = mesh_lib.put_batch(mesh, np.asarray(local_acts, np.int32))
    assert obs.shape[0] == GLOBAL_B, obs.shape

    # Input/init checksums: lets the parent distinguish "different inputs"
    # from "different step math" when equivalence fails.
    obs_sum = float(np.asarray(jax.jit(
        lambda x: jnp.sum(jnp.abs(x)),
        out_shardings=mesh_lib.replicated_sharding(mesh))(obs)))
    init_params_l1 = float(sum(
        np.abs(np.asarray(leaf.addressable_data(0))).sum()
        for leaf in jax.tree.leaves(trainer.state.params)))
    vgg_l1 = float(sum(
        np.abs(np.asarray(leaf)).sum()
        for leaf in jax.tree.leaves(trainer.vgg_variables)))

    state = trainer.state
    losses = []
    for i in range(2):
        state, metrics = step_fn(
            state, obs, acts, jnp.asarray(1, jnp.int32),
            jnp.asarray(0.9, jnp.float32), jax.random.PRNGKey(7 + i),
            trainer.vgg_variables)
        losses.append(float(np.asarray(metrics["loss"])))
        assert np.isfinite(losses[-1])

    params_l1 = float(sum(
        np.abs(np.asarray(leaf.addressable_data(0))).sum()
        for leaf in jax.tree.leaves(state.params)))

    if pidx == 0:
        with open(out_path, "w") as f:
            json.dump({"mode": mode, "process_count": pcount,
                       "devices": len(jax.devices()),
                       "loss1": losses[0], "loss2": losses[1],
                       "params_l1": params_l1, "obs_sum": obs_sum,
                       "init_params_l1": init_params_l1,
                       "vgg_l1": vgg_l1}, f)
    print(f"worker mode={mode} pidx={pidx} losses={losses}")


if __name__ == "__main__":
    main()

"""Test configuration.

Tests default to the CPU backend (fast compiles, deterministic numerics);
set PVG_TEST_PLATFORM=tpu to run the identical suite against the real TPU
backend — golden-value tolerances are platform-aware.  Multi-device
sharding is validated on a fake 8-device CPU mesh via
``--xla_force_host_platform_device_count`` (SURVEY.md §4) in a
*subprocess* (see test_parallel.py) so the rest of the suite is not slowed
down by virtual devices.
"""
import os

import jax  # noqa: E402

# Persistent compilation cache: repeated test runs skip XLA recompilation.
# Set through jax.config, NOT env vars: axon's sitecustomize imports jax
# at interpreter startup, so env-var defaults are captured before conftest
# runs (an os.environ.setdefault here silently does nothing).
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_compilation_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

if os.environ.get("PVG_TEST_PLATFORM", "cpu") == "cpu":
    # jax.config wins over environment-forced platform plugins (some hosts
    # pin JAX_PLATFORMS to a TPU tunnel in sitecustomize, where eager
    # many-op test workloads are pathologically slow).
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (long e2e runs)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: pass --runslow to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_model():
    """A tiny CADDY instance shared across tests (compile once)."""
    from playablevideogeneration_tpu.models.caddy import Caddy

    return Caddy(
        actions_count=3,
        action_space_dimension=2,
        state_features=8,
        state_resolution=(4, 4),
        hidden_state_size=8,
        observation_stacking=2,
    )


@pytest.fixture(scope="session")
def tiny_variables(tiny_model):
    """Init variables for the tiny CADDY, DISK-CACHED across test runs.

    Tracing + compiling `model.init` for the scan-based model costs
    ~100 s on this 1-core host (it dominated the whole fast tier), but
    the result is a pure function of the model code and jax version — so
    it is pickled under a key hashing `models/*.py`; any model-code edit
    invalidates the cache automatically."""
    import hashlib
    import pickle

    import jax
    import jax.numpy as jnp

    import playablevideogeneration_tpu.models as models_pkg
    from playablevideogeneration_tpu.models.caddy import init_model_variables

    h = hashlib.sha256(jax.__version__.encode())
    models_dir = os.path.dirname(models_pkg.__file__)
    for name in sorted(os.listdir(models_dir)):
        if name.endswith(".py"):
            with open(os.path.join(models_dir, name), "rb") as f:
                h.update(name.encode() + f.read())
    cache = f"/tmp/pvg_test_tiny_variables_{h.hexdigest()[:16]}.pkl"
    if os.path.isfile(cache):
        with open(cache, "rb") as f:
            return jax.tree.map(jnp.asarray, pickle.load(f))

    obs = jnp.zeros((2, 4, 32, 32, 6))
    acts = jnp.zeros((2, 4), jnp.int32)
    variables = init_model_variables(tiny_model, jax.random.PRNGKey(0), obs, acts)
    with open(cache + ".tmp", "wb") as f:
        pickle.dump(jax.device_get(variables), f)
    os.replace(cache + ".tmp", cache)
    return variables


@pytest.fixture(scope="session")
def synthetic_dataset_dir(tmp_path_factory):
    from playablevideogeneration_tpu.data.synthetic import build_synthetic_dataset

    root = tmp_path_factory.mktemp("synthetic_data")
    build_synthetic_dataset(str(root), videos_per_split=2, length=16,
                            height=32, width=32, actions_count=3)
    return str(root)

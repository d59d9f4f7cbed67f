import os
import pickle
import sys

# JAX tests run on a virtual 8-device CPU mesh (real-TPU runs use bench.py).
# NOTE: the axon sitecustomize force-registers the TPU platform, so the env
# var alone is not enough — override the config after import.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_cache")


def cached(name, builder):
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, name + ".pkl")
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    obj = builder()
    with open(path, "wb") as f:
        pickle.dump(obj, f)
    return obj


@pytest.fixture(scope="session")
def srs_1k():
    from zprize_tpu.ref.kzg import SRS

    def build():
        s = SRS.setup(1 << 10, tau=123456789)
        return (s.powers_of_g, s.h, s.beta_h)

    powers, h, beta_h = cached("srs_1k", build)
    from zprize_tpu.ref.kzg import SRS as S
    return S(powers, h, beta_h)

# NOTE: the persistent compilation cache is intentionally NOT enabled for
# CPU tests: jax 0.9.0's cache serializer segfaults on some CPU executables
# (observed in put_executable_and_time). TPU runs (bench.py) use .jax_cache.

import os
import sys

# Tests run on a virtual 8-device CPU mesh (the real-TPU bench path is
# bench.py).  This image's sitecustomize registers the axon TPU-tunnel
# PJRT plugin in every interpreter and pins jax_platforms to it; force
# the CPU backend and drop the tunnel factory before any backend
# initializes (initializing CPU with the axon factory present hangs).
if "--xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import jax

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xla_bridge

_xla_bridge._backend_factories.pop("axon", None)

import re

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/testdata"


@pytest.fixture(scope="session")
def ref_testdata():
    return REF


@pytest.fixture(scope="session")
def mat_de():
    from datok_tpu import load_matrix_file

    return load_matrix_file(f"{REF}/tokenizer_de.matok")


@pytest.fixture(scope="session")
def mat_en():
    from datok_tpu import load_matrix_file

    return load_matrix_file(f"{REF}/tokenizer_en.matok")


@pytest.fixture(scope="session")
def dat_de():
    from datok_tpu import load_datok_file

    return load_datok_file(f"{REF}/tokenizer_de.datok")


def split_collapse(out: str):
    """The reference's ttokenize: split on \\n+, drop last (datok_test.go:23-33)."""
    toks = re.split("\n+", out)
    return toks[:-1]

"""Two-process CPU smoke of the multi-host path (invoked by
test_distributed.py::test_multihost_two_process_smoke as subprocesses).

Each process owns 2 virtual CPU devices; jax.distributed.initialize joins
them into one 4-device runtime; the replicated sharded backend runs a few
steps over the global mesh.  Prints a coordinate checksum — the parent
asserts both processes agree (replicated state stays in lockstep across
process boundaries, collectives riding the cross-process transport)."""

import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# jax may already be imported by sitecustomize with the hardware platform
# pinned — override the live config like tests/conftest.py does
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from wembed_tpu.distributed.mesh import init_distributed, make_mesh  # noqa: E402

init_distributed(
    coordinator_address=f"localhost:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)

import jax
import numpy as np

assert len(jax.devices()) == 2 * num_procs, jax.devices()

from wembed_tpu.core import EmbedderOptions
from wembed_tpu.distributed.step import MultiChipEmbedder
from wembed_tpu.graphs import generators
from wembed_tpu.utils import set_seed

set_seed(7)
rng = np.random.default_rng(7)
g, _ = generators.geometric_graph(150, rng=rng)
opts = EmbedderOptions(
    embedding_dimension=2, dtype="float64", max_iterations=5,
    position_min_change=0.0,
)
mesh = make_mesh()  # all 4 global devices
emb = MultiChipEmbedder(g, opts, mesh=mesh, verbose=False)
emb.calculate_embedding()

coords = emb.get_coordinates()
assert np.isfinite(coords).all()
print(f"CHECKSUM {proc_id} {float(np.abs(coords).sum()):.12e} iters {emb.iteration}")

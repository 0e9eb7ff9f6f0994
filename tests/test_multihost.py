"""Real multi-process integration test: 2 CPU processes through
jax.distributed.initialize (core/mesh.py init_multihost), per-host disjoint
loader slices, and one sharded train step on the resulting 4-device global
mesh (SURVEY.md §2.4 multi-host runtime).

The reference has no distributed support at all (reference: utils.py:8-10 is
its entire device layer); this exercises the additive multi-host path with
process_count() == 2 for real — not just host_index arithmetic.

A third single-process run on the same global batch pins numerical
equivalence: the multi-host step must produce the same loss as the
single-process step (gradient psum over DCN-equivalent boundaries changes
nothing).
"""

import json
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # real 2-process jax.distributed suites (>40 s each)

from test_train import TINY

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(0)
    seg = TINY.data_loader.segment_size
    data = {
        f"u{i}": rng.standard_normal((64, TINY.model.speaker_encoder.c_in))
        .astype(np.float32)
        for i in range(6)
    }
    index = [[f"u{i % 6}", int(rng.integers(0, 64 - seg))] for i in range(256)]
    with open(d / "d.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(d / "i.json", "w") as f:
        json.dump(index, f)
    return str(d)


def _spawn(pid: int, nproc: int, port: int, art: str):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + HERE
    return subprocess.Popen(
        [sys.executable, os.path.join(HERE, "multihost_worker.py"),
         str(pid), str(nproc), str(port), art],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        text=True,
    )


def _parse(stdout: str) -> dict:
    out = {}
    for line in stdout.splitlines():
        if line.startswith("DEVICES "):
            out["devices"] = line.split()[1:]
        elif line.startswith("SLICE "):
            out["slice"] = line.split()[1]
        elif line.startswith("LOSS "):
            out["loss"] = [float(v) for v in line.split()[1:]]
    return out


def test_two_process_distributed_train_step(artifacts):
    port = _free_port()
    procs = [_spawn(pid, 2, port, artifacts) for pid in range(2)]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{stdout}\n{stderr}"
        outs.append(_parse(stdout))

    for o in outs:
        # 2 local devices, 4 global, process_count 2
        assert o["devices"] == ["2", "4", "2"], o
    # per-host slices are disjoint (different data -> different hashes)
    assert outs[0]["slice"] != outs[1]["slice"]
    # gradient psum makes the step identical on every host
    np.testing.assert_allclose(outs[0]["loss"], outs[1]["loss"], rtol=0, atol=0)

    # single-process run over the SAME global batch must agree numerically
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from adaptive_voice_conversion_tpu.core.mesh import make_mesh
    from adaptive_voice_conversion_tpu.data.dataset import SegmentDataset
    from adaptive_voice_conversion_tpu.data.loader import (
        as_wire_format,
        batch_iterator,
    )
    from adaptive_voice_conversion_tpu.models import init_ae
    from adaptive_voice_conversion_tpu.train import make_train_step

    ds = SegmentDataset(
        os.path.join(artifacts, "d.pkl"),
        os.path.join(artifacts, "i.json"),
        TINY.data_loader.segment_size,
    )
    full = next(
        batch_iterator(ds, 8, seed=1, host_index=0, host_count=1)
    )
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    x = jax.device_put(as_wire_format(full), NamedSharding(mesh, P("data")))
    params = init_ae(jax.random.PRNGKey(0), TINY.model)
    init_fn, step = make_train_step(TINY, mesh)
    _, _, m = step(params, init_fn(params), x, jax.random.PRNGKey(3),
                   jnp.float32(0.5))
    np.testing.assert_allclose(
        outs[0]["loss"][0], float(m["loss"]), rtol=0, atol=5e-6
    )

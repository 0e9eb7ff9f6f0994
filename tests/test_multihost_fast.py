"""Multi-host FAST data paths (round-2 verdict item 1): the production
device-resident / aggregate-HBM-sharded / chunked-streaming paths must run
under jax.distributed with 2 real processes, match the single-process
trajectory bit-for-bit (the data, shard plan, and RNG schedule are pure
functions of the seed — process topology must not change the math), and
resume deterministically across a full process restart.

The reference's ceiling is a single device fed per-batch from host RAM
(reference: data_utils.py:43-57, utils.py:8-10); round 2 matched that shape
under multi-process (input_mode="host" forced), which ran ~70x below the
single-chip headline. These tests pin the removal of that fallback.
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

from multihost_fast_worker import param_checksum, solver_config

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    d = tmp_path_factory.mktemp("mhf")
    rng = np.random.default_rng(0)
    cfg = solver_config("device")
    seg = cfg.data_loader.segment_size
    data = {
        f"u{i}": rng.standard_normal((64, cfg.model.speaker_encoder.c_in))
        .astype(np.float32)
        for i in range(6)
    }
    index = [[f"u{i % 6}", int(rng.integers(0, 64 - seg))] for i in range(256)]
    with open(d / "d.pkl", "wb") as f:
        pickle.dump(data, f)
    with open(d / "i.json", "w") as f:
        json.dump(index, f)
    return str(d)


def _run_pair(mode: str, artifacts: str, run_dir: str) -> list:
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + HERE
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_fast_worker.py"),
             str(pid), "2", str(port), artifacts, mode, run_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker({mode}) failed:\n{stdout}\n{stderr}"
        out = {}
        for line in stdout.splitlines():
            if line.startswith("DATA_MODE "):
                out["data_mode"] = line.split()[1]
            elif line.startswith("LOSS "):
                out["loss"] = [float(v) for v in line.split()[1:]]
            elif line.startswith("PSUM "):
                out["psum"] = float(line.split()[1])
            elif line.startswith("SERVE "):
                wav_part, mel_part = line[len("SERVE "):].split(" | ")
                out["serve"] = (
                    [float(v) for v in wav_part.split()],
                    [float(v) for v in mel_part.split()],
                )
            elif line.startswith("H2D_ROWS "):
                out["h2d_rows"], out["chunk_rows"] = (
                    int(line.split()[1]),
                    int(line.split()[2]),
                )
        outs.append(out)
    return outs


def _single_process_run(mode: str, artifacts: str, run_dir: str, n_steps=8):
    """The same Solver run on a single process over a 4-device mesh."""
    import jax

    from adaptive_voice_conversion_tpu.core.mesh import make_mesh
    from adaptive_voice_conversion_tpu.train.solver import Solver, SolverArgs

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    args = SolverArgs(
        data_dir=artifacts,
        train_set="d",
        train_index_file="i.json",
        logdir=os.path.join(run_dir, f"log_sp_{mode}"),
        store_model_path=os.path.join(run_dir, f"ckpt_sp_{mode}"),
        summary_steps=4,
        save_steps=1000,
        seed=0,
    )
    solver = Solver(solver_config(mode), args, mesh=mesh)
    m = solver.train(n_steps, log_every_print=False)
    return solver, m


@pytest.mark.parametrize("mode,expect", [
    ("device", "device"),
    ("sharded", "device_sharded"),
    ("chunked", "chunked"),
])
def test_two_process_fast_path_matches_single_process(
    mode, expect, artifacts, tmp_path
):
    outs = _run_pair(mode, artifacts, str(tmp_path))
    for o in outs:
        # the fast path actually ran — no host-streaming fallback
        assert o["data_mode"] == expect, o
    # both processes observe the identical (replicated) trajectory
    np.testing.assert_allclose(outs[0]["loss"], outs[1]["loss"], rtol=0, atol=0)
    assert outs[0]["psum"] == outs[1]["psum"]

    if mode == "chunked":
        # H2D sharding: each process transferred exactly half the chunk
        for o in outs:
            assert o["h2d_rows"] * 2 == o["chunk_rows"], o

    solver, m = _single_process_run(mode, artifacts, str(tmp_path))
    assert solver.data_mode == expect
    sp = [m[k] for k in ("loss", "loss_rec", "loss_kl", "grad_norm")]
    # same seed + same mesh shape -> same samples, same math, same result
    np.testing.assert_allclose(outs[0]["loss"], sp, rtol=0, atol=1e-6)
    # cross-process collectives may reduce in a different order than the
    # single-process program -> allow float-accumulation-level slack
    np.testing.assert_allclose(
        outs[0]["psum"], param_checksum(solver.params), rtol=1e-7
    )


def test_two_process_distributed_serving_matches_single_process(
    artifacts, tmp_path
):
    """Multi-process serving (round-4 verdict item 7): a 2x3 mixed-length
    grid through Inferencer(mesh=...) under 2-process jax.distributed —
    each process contributes its devices' shard of the pair batch
    (put_global_from_full) and reads the FULL result after the replicating
    all-gather — must match the single-process mesh serving per pair."""
    outs = _run_pair("serve", artifacts, str(tmp_path))
    # both processes see identical, complete results
    assert outs[0]["serve"] == outs[1]["serve"]
    assert len(outs[0]["serve"][0]) == 6  # all 2*3 pairs on every host

    import jax

    from adaptive_voice_conversion_tpu.core.mesh import make_mesh
    from multihost_fast_worker import serve_checksums

    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    wav_sums, mel_sums = serve_checksums(mesh)
    np.testing.assert_allclose(
        outs[0]["serve"][1], mel_sums, rtol=2e-5, atol=1e-6
    )
    # Griffin-Lim amplifies any representation-level noise; sums of |wav|
    # are aggregate enough that the pinned mel agreement bounds them
    np.testing.assert_allclose(
        outs[0]["serve"][0], wav_sums, rtol=1e-4
    )


def test_two_process_resume_across_process_restart(artifacts, tmp_path):
    """4 steps -> orbax checkpoint -> BOTH processes exit -> fresh pair
    restores and trains 4 more == one straight 8-step run."""
    outs_a = _run_pair("resume_a", artifacts, str(tmp_path))
    for o in outs_a:
        assert o["data_mode"] == "device"
    outs_b = _run_pair("resume_b", artifacts, str(tmp_path))
    straight = _run_pair("device", artifacts, str(tmp_path))
    assert outs_b[0]["psum"] == outs_b[1]["psum"]
    np.testing.assert_allclose(
        outs_b[0]["psum"], straight[0]["psum"], rtol=1e-12
    )
    np.testing.assert_allclose(
        outs_b[0]["loss"], straight[0]["loss"], rtol=0, atol=1e-6
    )

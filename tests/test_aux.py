"""Auxiliary-subsystem tests: Solver.evaluate, profiling utils, nan debug,
logger outputs."""

import json
import os
import pickle

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from adaptive_voice_conversion_tpu.train.logger import Logger
from adaptive_voice_conversion_tpu.utils import (
    enable_nan_debugging,
    profile_trace,
    step_timer,
)

from test_e2e import TINY, data_dir, make_args  # fixtures/helpers


@pytest.mark.slow
def test_solver_evaluate(data_dir):
    from adaptive_voice_conversion_tpu.train.solver import Solver

    s = Solver(TINY, make_args(data_dir))
    s.train(5, log_every_print=False)
    # reuse the train artifacts as a pseudo-eval split
    m = s.evaluate("train_128", "train_samples_128.json", max_batches=3)
    assert set(m) == {"loss", "loss_rec", "loss_kl"}
    assert all(np.isfinite(v) for v in m.values())


def test_logger_jsonl_and_tb(tmp_path):
    lg = Logger(str(tmp_path))
    lg.scalar_summary("a/x", 1.5, 0)
    lg.scalars_summary("a/grp", {"p": 1.0, "q": 2.0}, 1)
    lg.text_summary("a/t", "hello", 1)
    lg.audio_summary("a/wav", np.zeros(100, np.float32), 1, sr=24000)
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["a/x"] == 1.5
    assert lines[1]["a/grp/p"] == 1.0


def test_step_timer_collects():
    holder = {}
    with step_timer("op", holder):
        jnp.ones((8, 8)).sum().block_until_ready()
    assert holder["op"] > 0


def test_profile_trace_writes(tmp_path):
    with profile_trace(str(tmp_path)):
        jnp.ones((16, 16)).sum().block_until_ready()
    # a plugins/profile dir with at least one capture should exist
    found = any("profile" in r for r, d, f in os.walk(tmp_path) for _ in [0])
    assert found


def test_nan_debugging_flag_roundtrip():
    enable_nan_debugging(True)
    with pytest.raises((FloatingPointError, ZeroDivisionError, Exception)):
        jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)).block_until_ready()
    enable_nan_debugging(False)
    v = jax.jit(lambda x: x * 2)(jnp.float32(1.0))
    assert float(v) == 2.0

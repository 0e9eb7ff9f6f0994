"""Pallas TPU kernel: fused STFT-magnitude-mel-dB featurizer.

Computes the reference mel chain (preprocess/tacotron/utils.py:62-80) for a
block of frames in one kernel, without materializing the (T, 1025)
spectrum in HBM:

    mel[t] = dbnorm( |frames[t] @ (diag(w) W_dft)| @ M^T )

Design notes (see /opt/skills/guides/pallas_guide.md):
- The rFFT is a DFT *matmul*: frames (128, n_fft) x cos/sin matrices — MXU
  work instead of an FFT butterfly. n_fft=2048 makes the DFT matrices
  (2048, n_freq_pad) big, so the grid blocks over BOTH frame blocks and
  frequency blocks, accumulating partial mel sums over the frequency grid
  dimension (output revisited per f-step; initialized at f==0).
- The Hann window is folded into the DFT matrices (diag(w) @ W), so framing
  is the only preprocessing left outside the kernel.
- Frequencies are zero-padded 1025 -> 1152 (9x128 lanes); the pad columns
  have zero mel weight so they contribute nothing.
- dB + clip-normalize runs on the last frequency step, fused.

The public entry ``mel_from_wave_pallas`` matches ``dsp.mel_from_wave_jax``
(the XLA-rfft path) and is validated against it in tests; bench_kernels.py
compares their throughput.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SignalConfig
from ..dsp.mel import mel_filterbank
from ..dsp.stft import hann_window

FRAME_BLOCK = 128
FREQ_BLOCK = 256


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=4)
def _dft_mel_constants(sr: int, n_fft: int, win_length: int, n_mels: int):
    """(W_cos, W_sin) (n_fft, F_pad) with the window folded in, and the
    transposed mel matrix (F_pad, n_mels)."""
    n_freq = 1 + n_fft // 2
    f_pad = _round_up(n_freq, FREQ_BLOCK)
    w = hann_window(win_length, n_fft)  # (n_fft,)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    w_cos = (w[:, None] * np.cos(ang)).astype(np.float32)
    w_sin = (w[:, None] * np.sin(ang)).astype(np.float32)
    w_cos = np.pad(w_cos, ((0, 0), (0, f_pad - n_freq)))
    w_sin = np.pad(w_sin, ((0, 0), (0, f_pad - n_freq)))
    mel_t = mel_filterbank(sr, n_fft, n_mels).T.astype(np.float32)  # (n_freq, M)
    mel_t = np.pad(mel_t, ((0, f_pad - n_freq), (0, 0)))
    return jnp.asarray(w_cos), jnp.asarray(w_sin), jnp.asarray(mel_t)


def _kernel(frames_ref, wcos_ref, wsin_ref, melt_ref, out_ref, *, n_f_steps,
            ref_db, max_db):
    f_step = pl.program_id(1)
    frames = frames_ref[:]  # (FRAME_BLOCK, n_fft)
    # HIGHEST precision: the 2048-long DFT contraction in bf16 MXU passes
    # costs ~1e-1 mel error after the log; f32 (3-pass) keeps parity at ~1e-4
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, wcos_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    im = jnp.dot(frames, wsin_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    mag = jnp.sqrt(re * re + im * im)  # (FRAME_BLOCK, FREQ_BLOCK)
    partial_mel = jnp.dot(mag, melt_ref[:], preferred_element_type=jnp.float32,
                          precision=hi)

    @pl.when(f_step == 0)
    def _():
        out_ref[:] = partial_mel

    @pl.when(f_step > 0)
    def _():
        out_ref[:] = out_ref[:] + partial_mel

    @pl.when(f_step == n_f_steps - 1)
    def _():
        mel = out_ref[:]
        mel = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
        out_ref[:] = jnp.clip((mel - ref_db + max_db) / max_db, 1e-8, 1.0)


def stft_mel_pallas(
    frames: jnp.ndarray,
    cfg: SignalConfig = SignalConfig(),
    interpret: bool = None,
) -> jnp.ndarray:
    """frames (T, n_fft) float32 (unwindowed) -> normalized mel (T, n_mels).

    T must be a multiple of FRAME_BLOCK (pad with zero frames and slice).
    ``interpret`` defaults to True off-TPU (CPU tests) and False on TPU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, n_fft = frames.shape
    assert n_fft == cfg.n_fft
    assert t % FRAME_BLOCK == 0, "pad frames to a FRAME_BLOCK multiple"
    w_cos, w_sin, mel_t = _dft_mel_constants(
        cfg.sr, cfg.n_fft, cfg.win_length, cfg.n_mels
    )
    f_pad = w_cos.shape[1]
    n_f_steps = f_pad // FREQ_BLOCK
    grid = (t // FRAME_BLOCK, n_f_steps)
    kernel = partial(
        _kernel, n_f_steps=n_f_steps, ref_db=cfg.ref_db, max_db=cfg.max_db
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (FRAME_BLOCK, n_fft), lambda i, f: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_fft, FREQ_BLOCK), lambda i, f: (0, f),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_fft, FREQ_BLOCK), lambda i, f: (0, f),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (FREQ_BLOCK, cfg.n_mels), lambda i, f: (f, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (FRAME_BLOCK, cfg.n_mels), lambda i, f: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t, cfg.n_mels), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * t * n_fft * f_pad * 2 + 2 * t * f_pad * cfg.n_mels,
            bytes_accessed=(
                t * n_fft * 4
                + 2 * n_fft * f_pad * 4
                + f_pad * cfg.n_mels * 4
                + t * cfg.n_mels * 4
            ),
            transcendentals=t * cfg.n_mels,
        ),
    )(frames, w_cos, w_sin, mel_t)


def _frame_signal(y: jnp.ndarray, cfg: SignalConfig) -> jnp.ndarray:
    """Center-reflect-pad and slice into (n_frames, n_fft) raw frames."""
    from ..dsp.stft import frame_signal_jax

    return frame_signal_jax(y, cfg.n_fft, cfg.hop_length)


@partial(jax.jit, static_argnames=("cfg", "interpret"))
def mel_from_wave_pallas(
    y: jnp.ndarray, cfg: SignalConfig = SignalConfig(), interpret: bool = None
) -> jnp.ndarray:
    """Trimmed/preemphasized wave (n_samples,) -> normalized mel (T, n_mels).

    Drop-in fused-kernel variant of dsp.mel_from_wave_jax (mel only)."""
    frames = _frame_signal(y, cfg)
    t = frames.shape[0]
    t_pad = _round_up(t, FRAME_BLOCK)
    frames = jnp.pad(frames, ((0, t_pad - t), (0, 0)))
    mel = stft_mel_pallas(frames, cfg, interpret=interpret)
    return mel[:t]

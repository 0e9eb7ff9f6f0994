"""Pallas TPU kernel: fused Griffin-Lim phase-projection iterations.

The reference vocoder runs 100 ISTFT/STFT round trips per utterance on the
host CPU (reference: preprocess/tacotron/utils.py:136-155). The XLA serving
path (dsp/vocoder.py griffin_lim_jax) already batches a ``fori_loop`` over
XLA FFT ops; this kernel is the round-2-verdict-item-4 measurement of the
deferred "gridded fused ISTFT/STFT iteration" — one ``pallas_call`` holds
the ENTIRE 100-iteration loop with all state and DFT matrices resident in
VMEM, so per-iteration HBM traffic is zero.

Formulation (frame-space, no signal materialization):
- irfft is a DFT matmul over the window SUPPORT: the synthesis frame is
  ``w * irfft(X)``, and the Hann window (win 1200 centered in n_fft 2048)
  zeroes all but s_pad=1280 samples, so the synthesis matrices are
  (s_pad, F_pad) — the same support truncation the STFT-mel kernel proved
  (kernels/stft_mel.py).
- The ISTFT -> frame round trip is, in the signal INTERIOR, a banded linear
  map across neighboring frames: sample n of analysis frame t receives
  synthesis frames t+d at sample n - d*hop for d in [-4, 4] (|d*hop| <
  s_pad), and the window-sum-square normalizer is hop-periodic there, so
  it folds into the analysis window as a per-sample gain. One iteration is
      syn  = rowscale(re, c/N) @ Cos^T - rowscale(im, c/N) @ Sin^T  (MXU)
      acc  = sum_d shift(syn, rows d, cols -d*hop)                  (VPU)
      re'  = colscale(acc, g) @ Cos ;  im' = colscale(acc, g) @ Sin (MXU)
      X'   = mag * (re', im') / |(re', im')|                        (VPU)
  with Cos/Sin (s_pad, F_pad) stored ONCE in bf16 (f32 accumulation) and
  shared by synthesis (transposed contraction) and analysis.
- Edge frames (first/last 4) omit the reflect-pad contributions and the
  aperiodic edge of the wss normalizer that the exact ISTFT applies; GL is
  a fixed-point iteration, so this perturbs convergence only at the
  utterance boundary — the spectral-convergence parity bound vs the exact
  XLA path is pinned in tests/test_kernels.py.

The final waveform synthesis runs OUTSIDE the kernel via the exact
``istft_jax`` (correct edges), from the kernel's final (re, im).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.config import SignalConfig
from ..dsp.stft import hann_window, istft_jax

FREQ_PAD = 128  # lane alignment for the frequency axis

# VMEM budget bounds the frames one program can hold: shared DFT matrices
# ~5.9 MB (bf16) + per-frame state (re/im/mag f32 @ f_pad + syn/acc f32 @
# s_pad) ~24 KB/frame against ~16 MB/core -> cap t_pad at 384 (4.8 s of
# audio at hop 300 / 24 kHz). Longer utterances use the exact XLA path
# (dsp/vocoder.griffin_lim_jax auto-falls back).
MAX_KERNEL_FRAMES = 384


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@lru_cache(maxsize=4)
def _gl_constants(n_fft: int, win_length: int, hop_length: int):
    """Numpy constants for the fused iteration.

    Returns (cos_m, sin_m, ck_scale, g_scale, off, n_taps):
      cos_m/sin_m : (s_pad, f_pad) DFT bases over the window support
      ck_scale    : (f_pad,) irfft coefficient scaling c_k/N (0 on pad cols)
      g_scale     : (s_pad,) analysis window * hop-periodic 1/wss gain
      off         : first supported sample within the n_fft frame
      n_taps      : neighbor radius d_max with |d*hop| < s_pad
    """
    n_freq = 1 + n_fft // 2
    f_pad = _round_up(n_freq, FREQ_PAD)
    w = hann_window(win_length, n_fft)  # (n_fft,) float64
    support = np.nonzero(w != 0.0)[0]
    s_lo = int(support[0]) if support.size else 0
    s_hi = int(support[-1]) + 1 if support.size else n_fft
    s_pad = _round_up(s_hi - s_lo, 128)
    off = max(0, min(s_lo, n_fft - s_pad))

    n = np.arange(off, off + s_pad)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w_sup = w[off : off + s_pad, None]  # window folded into BOTH directions:
    # synthesis frames are w*irfft and analysis frames are rfft(w*signal)
    cos_m = (w_sup * np.cos(ang)).astype(np.float32)
    sin_m = (-w_sup * np.sin(ang)).astype(np.float32)  # rfft e^{-i.}
    cos_m = np.pad(cos_m, ((0, 0), (0, f_pad - n_freq)))
    sin_m = np.pad(sin_m, ((0, 0), (0, f_pad - n_freq)))

    ck = np.full(n_freq, 2.0 / n_fft)
    ck[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        ck[-1] = 1.0 / n_fft
    ck_scale = np.pad(ck, (0, f_pad - n_freq)).astype(np.float32)

    # hop-periodic interior window-sum-squares: tile enough frames that the
    # middle hop-period sees every overlapping window, then read it off
    reps = 2 * (n_fft // hop_length) + 4
    total = n_fft + hop_length * (reps - 1)
    wss = np.zeros(total)
    for t in range(reps):
        wss[t * hop_length : t * hop_length + n_fft] += w**2
    mid = total // 2
    phase0 = mid - (mid % hop_length)
    wss_per = wss[phase0 : phase0 + hop_length]

    sample_pos = np.arange(off, off + s_pad)
    # window is already inside cos_m/sin_m; the analysis gain is only the
    # hop-periodic interior 1/wss overlap-add normalizer
    g_scale = (1.0 / wss_per[sample_pos % hop_length]).astype(np.float32)

    n_taps = (s_pad - 1) // hop_length
    return cos_m, sin_m, ck_scale, g_scale, off, n_taps


def _kernel(mag_ref, cos_ref, sin_ref, ck_ref, g_ref, re_out, im_out,
            re_s, im_s, *, n_iter, hop, n_taps, t_pad, s_pad, mxu_dtype):
    mag = mag_ref[0]  # (t_pad, f_pad) f32
    cos_m = cos_ref[:]  # (s_pad, f_pad) bf16
    sin_m = sin_ref[:]
    ck = ck_ref[:]  # (1, f_pad) f32
    g = g_ref[:]  # (1, s_pad) f32

    re_s[:] = mag
    im_s[:] = jnp.zeros_like(mag)

    cdims_syn = (((1,), (1,)), ((), ()))  # contract F: (T,F)x(S,F) -> (T,S)

    def body(_, carry):
        re, im = re_s[:], im_s[:]
        # synthesis: windowed irfft as support-truncated DFT matmul
        re_c = (re * ck).astype(mxu_dtype)
        im_c = (im * ck).astype(mxu_dtype)
        # x_n = sum_k (c_k/N)(re cos(th) - im sin(th)); sin_m = -w*sin, so
        # the imaginary term ADDS with sin_m
        syn = jax.lax.dot_general(
            re_c, cos_m, cdims_syn, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            im_c, sin_m, cdims_syn, preferred_element_type=jnp.float32
        )  # (t_pad, s_pad) windowed synthesis frames over the support

        # interior overlap-add + re-frame: banded shift-accumulate.
        # Shifts are rotates + masks: Mosaic cannot concatenate vectors at
        # non-tile-aligned offsets (jnp.pad of a row/lane-sliced value
        # fails with "offset mismatch on non-concat dimension"), but
        # sublane/lane rotates are native VPU ops.
        rows = jax.lax.broadcasted_iota(jnp.int32, (t_pad, s_pad), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (t_pad, s_pad), 1)
        acc = syn
        for d in range(1, n_taps + 1):
            sh = d * hop
            # dest[t, n] += syn[t+d, n-sh]
            plus = pltpu.roll(pltpu.roll(syn, t_pad - d, 0), sh, 1)
            acc = acc + jnp.where(
                (rows < t_pad - d) & (cols >= sh), plus, 0.0
            )
            # dest[t, n] += syn[t-d, n+sh]
            minus = pltpu.roll(pltpu.roll(syn, d, 0), s_pad - sh, 1)
            acc = acc + jnp.where(
                (rows >= d) & (cols < s_pad - sh), minus, 0.0
            )

        # analysis: window*1/wss gain then DFT
        acc_g = (acc * g).astype(mxu_dtype)
        re2 = jnp.dot(acc_g, cos_m,
                      preferred_element_type=jnp.float32)
        im2 = jnp.dot(acc_g, sin_m,
                      preferred_element_type=jnp.float32)

        # magnitude projection
        denom = jnp.maximum(jnp.sqrt(re2 * re2 + im2 * im2), 1e-8)
        re_s[:] = mag * re2 / denom
        im_s[:] = mag * im2 / denom
        return carry

    jax.lax.fori_loop(0, n_iter, body, 0)
    re_out[0] = re_s[:]
    im_out[0] = im_s[:]


@partial(jax.jit, static_argnames=("cfg", "n_iter", "interpret", "mxu_dtype"))
def griffin_lim_phases_pallas(
    mag: jnp.ndarray,
    cfg: SignalConfig = SignalConfig(),
    n_iter: int = 100,
    interpret: Optional[bool] = None,
    mxu_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """mag (B, n_freq, T) f32 -> converged complex spectrum (B, n_freq, T).

    The fused-iteration kernel; final waveform synthesis is the caller's
    (griffin_lim_pallas below uses the exact istft_jax)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    cos_m, sin_m, ck, g, off, n_taps = _gl_constants(
        cfg.n_fft, cfg.win_length, cfg.hop_length
    )
    s_pad, f_pad = cos_m.shape
    b, n_freq, t = mag.shape
    t_pad = _round_up(max(t, 8), 128)
    # (B, T_pad, F_pad) layout: frames on sublanes, freqs on lanes
    m = jnp.swapaxes(mag, -1, -2)
    m = jnp.pad(m, ((0, 0), (0, t_pad - t), (0, f_pad - n_freq)))

    kern = partial(
        _kernel, n_iter=n_iter, hop=cfg.hop_length, n_taps=n_taps,
        t_pad=t_pad, s_pad=s_pad, mxu_dtype=mxu_dtype,
    )
    re, im = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t_pad, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, t_pad, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, f_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, t_pad, f_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((t_pad, f_pad), jnp.float32),
            pltpu.VMEM((t_pad, f_pad), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * n_iter * (4 * t_pad * s_pad * f_pad)
            + b * n_iter * 2 * n_taps * t_pad * s_pad,
            bytes_accessed=b * t_pad * f_pad * 4 * 3
            + 2 * s_pad * f_pad * 2,
            transcendentals=b * n_iter * t_pad * f_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        m,
        jnp.asarray(cos_m, mxu_dtype),
        jnp.asarray(sin_m, mxu_dtype),
        jnp.asarray(ck).reshape(1, f_pad),
        jnp.asarray(g).reshape(1, s_pad),
    )
    spec = re + 1j * im  # complex64
    spec = jnp.swapaxes(spec, -1, -2)[:, :n_freq, :t]
    return spec


@partial(
    jax.jit, static_argnames=("cfg", "n_iter", "interpret", "mxu_dtype")
)
def griffin_lim_pallas(
    mag: jnp.ndarray,
    cfg: SignalConfig = SignalConfig(),
    n_iter: Optional[int] = None,
    interpret: Optional[bool] = None,
    mxu_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Drop-in for dsp.vocoder.griffin_lim_jax via the fused kernel.

    mag: (n_freq, T) or (B, n_freq, T) float32 -> wav (..., hop*(T-1)).
    Jitted END TO END: the final exact-edge ISTFT must not run eagerly —
    its ~30 ops each pay the tunnel's 20-35 ms dispatch latency."""
    n_iter = cfg.n_iter if n_iter is None else n_iter
    squeeze = mag.ndim == 2
    if squeeze:
        mag = mag[None]
    spec = griffin_lim_phases_pallas(mag, cfg, n_iter=n_iter,
                                     interpret=interpret,
                                     mxu_dtype=mxu_dtype)
    wav = jnp.real(
        istft_jax(spec, cfg.n_fft, cfg.hop_length, cfg.win_length)
    ).astype(jnp.float32)
    return wav[0] if squeeze else wav

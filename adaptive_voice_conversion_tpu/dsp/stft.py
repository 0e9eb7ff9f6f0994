"""STFT / ISTFT — numpy oracle + TPU-friendly JAX implementation.

Reproduces librosa's conventions as used by the reference featurizer and
Griffin-Lim (reference: preprocess/tacotron/utils.py:62-66,151-155):
- periodic Hann window of ``win_length``, zero-padded centered to ``n_fft``
- center=True: the signal is reflect-padded by n_fft//2 on both sides
- ISTFT applies the window again and normalizes by the window-sum-squares

The JAX ISTFT does overlap-add without scatter: frames are split into
hop-size chunks and summed as a handful of statically shifted adds — a
TPU-friendly formulation (no dynamic scatter, all shapes static under jit).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=8)
def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann of ``win_length`` zero-padded centered to ``n_fft``."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[lpad : lpad + win_length] = w
    return out


def frame_count(n_samples: int, n_fft: int, hop_length: int) -> int:
    """Number of STFT frames with center=True padding."""
    return 1 + (n_samples + 2 * (n_fft // 2) - n_fft) // hop_length


# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------


def stft_np(
    y: np.ndarray, n_fft: int, hop_length: int, win_length: int
) -> np.ndarray:
    """(n_samples,) -> complex (1 + n_fft//2, n_frames), librosa layout."""
    w = hann_window(win_length, n_fft)
    pad = n_fft // 2
    yp = np.pad(y.astype(np.float64), pad, mode="reflect")
    n_frames = 1 + (len(yp) - n_fft) // hop_length
    idx = np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]
    frames = yp[idx] * w[None, :]
    return np.fft.rfft(frames, axis=1).T.astype(np.complex64)


def istft_np(
    S: np.ndarray, n_fft: int, hop_length: int, win_length: int
) -> np.ndarray:
    """complex (1 + n_fft//2, n_frames) -> (hop * (n_frames - 1),)."""
    w = hann_window(win_length, n_fft)
    n_frames = S.shape[1]
    frames = np.fft.irfft(S.T.astype(np.complex128), n=n_fft, axis=1) * w[None, :]
    total = n_fft + hop_length * (n_frames - 1)
    out = np.zeros(total, dtype=np.float64)
    wss = np.zeros(total, dtype=np.float64)
    for t in range(n_frames):
        s = t * hop_length
        out[s : s + n_fft] += frames[t]
        wss[s : s + n_fft] += w**2
    nz = wss > np.finfo(np.float64).tiny
    out[nz] /= wss[nz]
    pad = n_fft // 2
    return out[pad:-pad].astype(np.float32) if pad else out.astype(np.float32)


# ---------------------------------------------------------------------------
# JAX (static-shape, jit/vmap-able; leading batch dims allowed)
# ---------------------------------------------------------------------------


def frame_signal_jax(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-reflect-pad and frame WITHOUT a gather: pad to a hop multiple,
    view as (..., M, hop) chunks, and concatenate ceil(n_fft/hop) shifted
    contiguous chunk slices. Gathers with (T, n_fft) index matrices are the
    dominant cost of STFT on TPU; slices+concat are pure bandwidth."""
    pad = n_fft // 2
    pads = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    yp = jnp.pad(y, pads, mode="reflect")
    n = yp.shape[-1]
    n_frames = 1 + (n - n_fft) // hop_length
    n_chunks = -(-n_fft // hop_length)
    m = n_frames + n_chunks  # chunks needed so slices j..j+n_frames exist
    extra = m * hop_length - n
    if extra > 0:
        yp = jnp.pad(yp, [(0, 0)] * (y.ndim - 1) + [(0, extra)])
    chunks = yp.reshape(*yp.shape[:-1], m, hop_length)
    parts = [chunks[..., j : j + n_frames, :] for j in range(n_chunks)]
    frames = jnp.concatenate(parts, axis=-1)  # (..., n_frames, n_chunks*hop)
    return frames[..., :n_fft]


def stft_jax(
    y: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
) -> jnp.ndarray:
    """(..., n_samples) -> complex64 (..., 1 + n_fft//2, n_frames)."""
    w = jnp.asarray(hann_window(win_length, n_fft), dtype=jnp.float32)
    frames = frame_signal_jax(y, n_fft, hop_length) * w
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.swapaxes(spec, -1, -2)  # (..., n_freq, n_frames)


@lru_cache(maxsize=8)
def _wss_chunks(n_frames: int, n_fft: int, hop_length: int, win_length: int):
    """Precompute window-sum-squares inverse for the overlap-add (static)."""
    w = hann_window(win_length, n_fft)
    total = n_fft + hop_length * (n_frames - 1)
    wss = np.zeros(total, dtype=np.float64)
    for t in range(n_frames):
        wss[t * hop_length : t * hop_length + n_fft] += w**2
    inv = np.where(wss > np.finfo(np.float64).tiny, 1.0 / np.where(wss == 0, 1, wss), 1.0)
    return inv.astype(np.float32)


def overlap_add(frames: jnp.ndarray, hop_length: int) -> jnp.ndarray:
    """(..., n_frames, n_fft) -> (..., n_fft + hop*(n_frames-1)) via
    statically shifted chunk adds (no scatter)."""
    n_frames, n_fft = frames.shape[-2], frames.shape[-1]
    n_chunks = -(-n_fft // hop_length)  # ceil
    padded_len = n_chunks * hop_length
    pads = [(0, 0)] * (frames.ndim - 1) + [(0, padded_len - n_fft)]
    fp = jnp.pad(frames, pads)
    fp = fp.reshape(*frames.shape[:-1], n_chunks, hop_length)
    # out_chunk[c] = sum_j fp[c - j, j]; shift-and-add over j (static loop)
    out_chunks = jnp.zeros(
        (*frames.shape[:-2], n_frames + n_chunks - 1, hop_length), frames.dtype
    )
    for j in range(n_chunks):
        pads_t = [(0, 0)] * (frames.ndim - 2) + [(j, n_chunks - 1 - j), (0, 0)]
        out_chunks = out_chunks + jnp.pad(fp[..., :, j, :], pads_t)
    out = out_chunks.reshape(*frames.shape[:-2], (n_frames + n_chunks - 1) * hop_length)
    return out[..., : n_fft + hop_length * (n_frames - 1)]


def istft_jax(
    S: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
) -> jnp.ndarray:
    """complex (..., 1 + n_fft//2, n_frames) -> (..., hop*(n_frames-1))."""
    w = jnp.asarray(hann_window(win_length, n_fft), dtype=jnp.float32)
    n_frames = S.shape[-1]
    frames = jnp.fft.irfft(jnp.swapaxes(S, -1, -2), n=n_fft, axis=-1) * w
    out = overlap_add(frames, hop_length)
    inv = jnp.asarray(_wss_chunks(n_frames, n_fft, hop_length, win_length))
    out = out * inv
    pad = n_fft // 2
    return out[..., pad : out.shape[-1] - pad]

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


# ---------------------------------------------------------------------------
# Length-masked batched STFT/ISTFT (exact ragged-batch Griffin-Lim support)
#
# A conversion grid vocodes B spectrograms of different frame counts L_b in
# one (B, n_freq, T) array. Per-sample exactness vs the single-utterance
# path needs two corrections (dsp/vocoder.py griffin_lim_jax_masked):
# - ISTFT: the window-sum-squares normalizer must count only the L_b real
#   frames (zero-magnitude pad frames contribute no signal, but the plain
#   normalizer would still count their window energy near the tail);
# - STFT: the center=True reflect padding must reflect at the sample's own
#   signal end hop*(L_b - 1), not the padded buffer's physical end. Only
#   frames whose analysis window crosses the sample's end differ — the last
#   ceil((n_fft - n_fft//2) / hop) valid frames — and they are served by
#   mirroring each sample's signal tail in place (one contiguous dynamic
#   slice + update per sample; see stft_jax_masked) so the bulk framing
#   stays the fast slice-based path.
# ---------------------------------------------------------------------------


def istft_env_inv_masked(
    frame_lengths: jnp.ndarray,
    n_frames: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> jnp.ndarray:
    """Per-sample inverse window-sum-squares envelope for masked ISTFT.

    frame_lengths: (B,) valid frame counts. Returns (B, total) with
    total = n_fft + hop*(n_frames-1): 1/sum_{i<L_b} w^2(t - i*hop) where
    positive, 1 elsewhere — the ragged analogue of ``_wss_chunks``.
    """
    w2 = jnp.asarray(hann_window(win_length, n_fft) ** 2, dtype=jnp.float32)
    mask = (
        jnp.arange(n_frames)[None, :] < frame_lengths[:, None]
    ).astype(jnp.float32)
    frames = mask[:, :, None] * w2[None, None, :]  # (B, n_frames, n_fft)
    wss = overlap_add(frames, hop_length)
    tiny = jnp.float32(np.finfo(np.float32).tiny)
    return jnp.where(wss > tiny, 1.0 / jnp.where(wss == 0, 1.0, wss), 1.0)


def istft_jax_masked(
    S: jnp.ndarray, env_inv: jnp.ndarray, n_fft: int, hop_length: int,
    win_length: int,
) -> jnp.ndarray:
    """istft_jax with a precomputed per-sample envelope (B, total).

    S must have zero magnitude at frames >= L_b (griffin_lim_jax_masked
    maintains this), so the overlap-add signal is already per-sample exact;
    only the normalizer needs the masked envelope.
    """
    w = jnp.asarray(hann_window(win_length, n_fft), dtype=jnp.float32)
    frames = jnp.fft.irfft(jnp.swapaxes(S, -1, -2), n=n_fft, axis=-1) * w
    out = overlap_add(frames, hop_length) * env_inv
    pad = n_fft // 2
    return out[..., pad : out.shape[-1] - pad]


def n_edge_frames(n_fft: int, hop_length: int) -> int:
    """Frames whose analysis window crosses the signal end: the window of
    frame i spans samples [i*hop - pad, i*hop - pad + n_fft); it crosses
    N = hop*(L-1) iff i > L - 1 - (n_fft - pad)/hop. (Documentation
    helper: stft_jax_masked handles these frames by mirroring the signal
    tail rather than recomputing them individually.)"""
    pad = n_fft // 2
    return -(-(n_fft - pad) // hop_length)


def stft_jax_masked(
    y: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int,
) -> jnp.ndarray:
    """stft_jax of (B, n_samples) with per-sample reflect at each sample's
    own end hop*(L_b - 1). Frames >= L_b are garbage (masked out by the
    caller's magnitude multiply); frames < L_b are exactly the single-sample
    STFT of y[b, :hop*(L_b-1)].

    Formulation: mirror each sample's tail IN THE SIGNAL — y'(q) = y(q)
    for q < N_b, y(2*N_b - 2 - q) beyond — then run the plain slice-based
    framing. Valid frames' taps past N_b then read exactly the values the
    per-sample center=True reflection would supply (the physical buffer's
    own reflect pad is a no-op for the longest sample, where N_b equals
    the buffer end). Only taps in [N_b, N_b + n_fft - pad) are ever read
    by valid frames, so the mirror touches a fixed n_fft-pad window:
    per sample, ONE contiguous dynamic slice (the reversed tail source)
    and one contiguous dynamic update into a zero buffer, merged with an
    iota compare — measured 1.8 ms vs 14.5 ms for an elementwise
    (B, n_samples) take_along_axis on a v5e serving batch (TPU gathers
    with per-element indices along lanes are pathological; contiguous
    dynamic slices are not). Runs once per Griffin-Lim iteration.

    Requires hop*(L_b - 1) >= n_fft - pad, i.e. L_b >= ~5 frames at the
    production geometry — shorter items would need the reflect window
    clipped (clamped below, approximate only for sub-5-frame inputs).
    """
    w = n_fft - n_fft // 2  # mirror window: taps valid frames read past N_b
    n_frames_out = 1 + (y.shape[-1] + 2 * (n_fft // 2) - n_fft) // hop_length
    # extend by w so every sample's mirror window fits INSIDE the buffer —
    # without this, samples within ~w/hop frames of the longest would have
    # their update clipped/shifted; the extra trailing frames are cropped
    pads = [(0, 0)] * (y.ndim - 1) + [(0, w)]
    y = jnp.pad(y, pads)
    n_total = y.shape[-1]
    n_b = hop_length * (frame_lengths - 1)  # per-sample signal length

    def one(yb, nb):
        # sources y[N-1-w : N-1] reversed give y(2N-2-q) for q in [N, N+w)
        src_start = jnp.clip(nb - 1 - w, 0, n_total - w)
        tail = jax.lax.dynamic_slice(yb, (src_start,), (w,))
        mir = tail[::-1]
        z = jnp.zeros_like(yb)
        z = jax.lax.dynamic_update_slice(z, mir, (nb,))
        q = jnp.arange(n_total)
        return jnp.where(q < nb, yb, z)

    y2 = jax.vmap(one)(y, n_b)
    spec = stft_jax(y2, n_fft, hop_length, win_length)
    return spec[..., :n_frames_out]

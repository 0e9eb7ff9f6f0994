"""Pallas TPU kernels.

``griffin_lim``: the fused Griffin-Lim iteration kernel (the production
fast vocoder mode — spectral convergence at or below the exact XLA-FFT
path's at ~3.4x, KERNELS_r04.json).

A fused STFT-mel featurizer kernel lived here through round 4 and was
RETIRED in round 5 as a recorded negative (COMPONENTS.md,
KERNELS_r05.json): with the dB/clip epilogue fused, window-support-sliced
constants, and clean device-resident median-of-9 timing it reached 0.92x
of the XLA-rfft path (frame_block 256: 0.915x; Mosaic rejects the 3-pass
HIGH dot precision that was the remaining lever), and XLA's native rfft
is simply the better program for a 2048-point DFT. The ETL featurizer
(tools/etl.py) uses the XLA path.
"""

from .griffin_lim import griffin_lim_pallas

__all__ = ["griffin_lim_pallas"]

"""adaptive_voice_conversion_tpu — TPU-native one-shot voice conversion (AdaIN-VC).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
jjery2243542/adaptive_voice_conversion (AdaIN-VC, Interspeech 2019):

- ``dsp``     : self-contained mel featurizer + Griffin-Lim vocoder
                (reference: preprocess/tacotron/utils.py)
- ``ops``     : TPU-first functional building blocks (reflect-pad convs,
                fused conv bank, instance norm, AdaIN, pixel shuffle)
- ``models``  : SpeakerEncoder / ContentEncoder / Decoder / AE
                (reference: model.py:209-395)
- ``train``   : jitted VAE training step + Solver loop
                (reference: solver.py:16-118)
- ``infer``   : one-shot conversion (reference: inference.py:24-109)
- ``data``    : pickle-dataset loader compatible with the reference's
                preprocess artifacts (reference: data_utils.py)
- ``parallel``: mesh / data-parallel scaling over jax.sharding
- ``kernels`` : Pallas TPU kernels for the DSP hot loops
- ``tools``   : offline preprocessing ETL (reference: preprocess/)

Activation layout is channels-last ``(batch, time, channels)`` throughout —
the TPU-native layout (channels ride the 128-wide lane dimension) — unlike
the reference's torch ``(B, C, T)``.
"""

__version__ = "0.1.0"

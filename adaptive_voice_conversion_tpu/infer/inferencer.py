"""One-shot voice conversion (reference: inference.py:24-109).

Source wav -> content mu; target wav (one utterance of an unseen speaker) ->
speaker embedding; AdaIN decoder recombines; Griffin-Lim vocodes. Weights
come either from our orbax checkpoints or directly from the reference's
``vctk_model.ckpt`` (torch state_dict) via models.torch_import.

TPU-native additions over the reference:
- the neural pass is jitted once per (source-len, target-len) bucket
- ``convert_grid`` performs a batched speakers x contents cross-conversion
  with one padded batch through the model and one batched Griffin-Lim call
  (the serving configuration in BASELINE.json).
"""

from __future__ import annotations

import math
import pickle
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SignalConfig, TrainConfig
from ..dsp.audio import save_wav
from ..dsp.features import get_spectrograms
from ..dsp.vocoder import melspectrogram2wav, melspectrogram2wav_jax
from ..models.ae import ae_inference


def utt_make_frames(x: np.ndarray, frame_size: int) -> np.ndarray:
    """(T, n_mels) -> (1, T/frame_size, frame_size*n_mels).

    Reference ``utt_make_frames`` (inference.py:54-60) — with its
    mel-axis-padding bug fixed: when T % frame_size != 0 we pad TIME frames
    (the reference pads the mel-bin axis, harmless only because the shipped
    config uses frame_size=1; SURVEY.md §2.3).
    """
    t = x.shape[0]
    if t % frame_size:
        x = np.pad(x, ((0, frame_size - t % frame_size), (0, 0)))
    return x.reshape(1, x.shape[0] // frame_size, frame_size * x.shape[1])


class Inferencer:
    def __init__(
        self,
        config: TrainConfig,
        params: dict,
        attr_path: str,
        use_tpu_vocoder: bool = True,
        gl_method: str = "exact",
        mesh=None,
        precision: Optional[str] = None,
    ):
        """``precision``: matmul/conv precision for every jitted serving
        program (model inference AND vocode). None keeps the device default
        — on TPU that is one bf16 MXU pass per matmul, the fast serving
        configuration whose quality deviation vs the f32 reference is the
        mel-MAE block in SERVING artifacts. "highest" requests full-f32
        results (TPU: multi-pass bf16 emulation), buying reference-level
        numerics (PARITY max-abs ~7e-6 on TPU at HIGHEST, BASELINE.md) at a
        measured throughput cost (SERVING_r05.json records both points).
        The reference serves implicitly in f32 (inference.py:62-70);
        "highest" is the like-for-like quality point, None the speed point.

        ``mesh``: optional ``jax.sharding.Mesh`` for DISTRIBUTED serving
        — ``convert_grid`` shards its ns*nt pair batch over the 'data' axis
        (params replicated) so conversion throughput scales with chips; the
        grid batch is padded to a multiple of the data-axis size (the
        masked path is exact under any padding) and results gather on the
        single bulk D2H. The model is batch-parallel end to end (conv
        stacks, masked Griffin-Lim), so no cross-device communication runs
        inside the programs at all."""
        self.config = config
        self.mesh = mesh
        if precision not in (None, "default", "high", "highest"):
            raise ValueError(
                f"precision={precision!r}: expected None/'default'/'high'/"
                f"'highest' (jax matmul precision names)"
            )
        self.precision = None if precision == "default" else precision
        self._multiprocess = False
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            self._repl = repl
            self._batch_sh = NamedSharding(mesh, P("data"))
            self._multiprocess = jax.process_count() > 1
            if self._multiprocess:
                # multi-controller serving: every process runs this same
                # code on the same request and contributes its devices'
                # shard of the pair batch (core.mesh.put_global_from_full);
                # outputs reshard to replicated (one ICI all-gather) so
                # every host reads the full result. Params replicate the
                # multi-controller-legal way.
                from ..core.mesh import replicate_pytree

                params = replicate_pytree(params, mesh)
                self._jit_to_replicated = jax.jit(
                    lambda t: t, out_shardings=repl
                )
            else:
                params = jax.device_put(params, repl)
        self.params = params
        self.use_tpu_vocoder = use_tpu_vocoder
        # "pallas": opt-in fused Griffin-Lim kernel (dsp/vocoder.py
        # griffin_lim_jax docstring for the speed/quality tradeoff)
        self.gl_method = gl_method
        with open(attr_path, "rb") as f:
            self.attr = pickle.load(f)
        self._jit_inference = jax.jit(
            self._with_precision(
                lambda p, x, xc: ae_inference(p, self.config.model, x, xc)
            )
        )
        self._jit_inference_masked = None  # built lazily by convert_grid
        self._jit_vocode = {}  # (gl_method, gl_iters, uniform) -> jitted fn

    def _with_precision(self, fn):
        """Wrap a to-be-jitted callable so it traces under the requested
        matmul/conv precision. ``jax.default_matmul_precision`` is a
        trace-time scope — the precision is baked into the jaxpr, so each
        Inferencer compiles programs at exactly its configured precision
        with zero per-call overhead."""
        if self.precision is None:
            return fn
        prec = self.precision

        def wrapped(*args):
            with jax.default_matmul_precision(prec):
                return fn(*args)

        return wrapped

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_torch_checkpoint(
        cls, config: TrainConfig, ckpt_path: str, attr_path: str, **kw
    ) -> "Inferencer":
        """Load the reference's ``vctk_model.ckpt`` directly."""
        from ..models.torch_import import load_torch_checkpoint

        params = load_torch_checkpoint(ckpt_path, config.model)
        return cls(config, params, attr_path, **kw)

    @classmethod
    def from_orbax(
        cls, config: TrainConfig, store_model_path: str, attr_path: str, **kw
    ) -> "Inferencer":
        from ..models.ae import init_ae
        from ..train.checkpoint import CheckpointManager
        from ..train.optim import make_optimizer

        params = init_ae(jax.random.PRNGKey(0), config.model)
        mngr = CheckpointManager(f"{store_model_path}.orbax")
        step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {store_model_path}.orbax")
        # the template must match the TRAINING optimizer exactly — the
        # saved opt state's pytree structure and dtypes depend on sn,
        # opt_state_dtype (bf16 moments), and opt_fused (flattened /
        # bucketed trees)
        opt_like = make_optimizer(
            config.optimizer,
            sn=config.model.decoder.sn,
            state_dtype=config.opt_state_dtype,
            fused=config.opt_fused,
        ).init(params)
        params, _, _ = mngr.restore(step, params, opt_like)
        mngr.close()
        return cls(config, params, attr_path, **kw)

    # -- normalization (inference.py:72-80) -------------------------------

    def normalize(self, x: np.ndarray) -> np.ndarray:
        return (x - self.attr["mean"]) / self.attr["std"]

    def denormalize(self, x: np.ndarray) -> np.ndarray:
        return x * self.attr["std"] + self.attr["mean"]

    # -- conversion -------------------------------------------------------

    def convert_mel(self, src_mel: np.ndarray, tar_mel: np.ndarray) -> np.ndarray:
        """Normalized mels (T, n_mels) -> converted normalized mel (T', n_mels)."""
        f = self.config.data_loader.frame_size
        x = jnp.asarray(utt_make_frames(src_mel.astype(np.float32), f))
        xc = jnp.asarray(utt_make_frames(tar_mel.astype(np.float32), f))
        dec = self._jit_inference(self.params, x, xc)
        return np.asarray(dec[0])

    def inference_one_utterance(
        self, src_mel: np.ndarray, tar_mel: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (wav, converted denormalized mel) — inference.py:62-70."""
        dec = self.convert_mel(src_mel, tar_mel)
        dec = self.denormalize(dec)
        if self.use_tpu_vocoder:
            # the single-utterance vocode path honors the precision knob
            # too (the batched _jit_vocode programs are wrapped at trace
            # time; this one runs under the config scope at call time)
            import contextlib

            scope = (
                jax.default_matmul_precision(self.precision)
                if self.precision is not None
                else contextlib.nullcontext()
            )
            with scope:
                wav = melspectrogram2wav_jax(
                    jnp.asarray(dec), self.config.signal,
                    gl_method=self.gl_method,
                )
        else:
            wav = melspectrogram2wav(dec, self.config.signal)
        return wav, dec

    def inference_from_path(
        self, source_path: str, target_path: str, output_path: str
    ) -> np.ndarray:
        """inference.py:86-93: featurize both wavs, normalize, convert, write."""
        src_mel, _ = get_spectrograms(source_path, self.config.signal)
        tar_mel, _ = get_spectrograms(target_path, self.config.signal)
        src_mel = self.normalize(src_mel)
        tar_mel = self.normalize(tar_mel)
        wav, _ = self.inference_one_utterance(src_mel, tar_mel)
        save_wav(output_path, wav, self.config.signal.sr)
        return wav

    # -- batched serving --------------------------------------------------

    def _get_masked_jit(self):
        """The jitted length-masked inference (built lazily; mesh-sharded
        over the pair batch when serving distributed)."""
        from ..models.masked import ae_inference_masked

        if self._jit_inference_masked is None:
            mcfg = self.config.model
            fn = self._with_precision(
                lambda p, x, xl, xc, cl: ae_inference_masked(
                    p, mcfg, x, xl, xc, cl
                )
            )
            if self.mesh is not None:
                b, r = self._batch_sh, self._repl
                self._jit_inference_masked = jax.jit(
                    fn, in_shardings=(r, b, b, b, b), out_shardings=(b, b)
                )
            else:
                self._jit_inference_masked = jax.jit(fn)
        return self._jit_inference_masked

    def _get_vocode(self, gl_method, gl_iters, uniform):
        """One jitted program for the whole post-model chain — denormalize,
        mel->linear, Griffin-Lim, de-preemphasis: dec never visits the
        host, eager per-op dispatch (20-35 ms each through the tunnel)
        disappears, and there is a single bulk D2H of the finished wavs.
        Trim is the only host step left (the reference runs lfilter + trim
        per wav on the host, inference.py:62-93 / utils.py:106-109)."""
        from ..dsp.vocoder import griffin_lim_jax_masked, mel_to_mag_jax
        from ..dsp.audio import deemphasis_jax

        cfg = self.config.signal
        vkey = (gl_method, gl_iters, uniform)
        vocode = self._jit_vocode.get(vkey)
        if vocode is not None:
            return vocode
        mean = jnp.asarray(self.attr["mean"], jnp.float32)
        std = jnp.asarray(self.attr["std"], jnp.float32)

        def _vocode(dec, dec_lens):
            dec = dec * std + mean
            mag = mel_to_mag_jax(dec, cfg)
            if uniform:
                from ..dsp.vocoder import griffin_lim_jax

                w = griffin_lim_jax(
                    mag, cfg, n_iter=gl_iters, method=gl_method
                )
            else:
                # both modes are length-aware: "exact" is per-sample-
                # exact iterations; "pallas" the fused-kernel hybrid
                # with masked warm/polish (dsp/vocoder)
                w = griffin_lim_jax_masked(
                    mag, dec_lens, cfg, n_iter=gl_iters, method=gl_method
                )
            return deemphasis_jax(w, cfg.preemphasis)

        _vocode = self._with_precision(_vocode)
        if self.mesh is not None:
            vocode = jax.jit(
                _vocode,
                in_shardings=(self._batch_sh, self._batch_sh),
                out_shardings=self._batch_sh,
            )
        else:
            vocode = jax.jit(_vocode)
        self._jit_vocode[vkey] = vocode
        return vocode

    def convert_grid(
        self,
        src_mels: Sequence[np.ndarray],
        tar_mels: Sequence[np.ndarray],
        gl_iters: Optional[int] = None,
        gl_method: Optional[str] = None,
        trim: bool = True,
        return_mels: bool = False,
        len_bucket: int = 1,
    ):
        """All pairs (src_i, tar_j) in ONE padded batch through the model and
        one batched TPU Griffin-Lim call. Returns wavs row-major (i * n_t + j)
        (or ``(wavs, mels)`` with the denormalized converted mels when
        ``return_mels``, matching ``inference_one_utterance``'s second
        return).

        EXACT for mixed-length inputs: the model runs the length-masked
        applies (models/masked.py — per-sample reflect-pad convs, masked
        instance norm / global pool, reference IN semantics
        model.py:296,305,311,315), and the default vocoder runs the masked
        ragged Griffin-Lim (dsp/vocoder.py griffin_lim_jax_masked), so every
        pair computes what the one-at-a-time ``inference_one_utterance``
        chain computes at its true lengths: converted mels are pinned
        allclose 1e-5 and wavs peak-relative (Griffin-Lim conditioning
        bounds any cross-program comparison) in tests/test_masked.py.
        gl_method="pallas" swaps the vocoder for the fused-kernel hybrid
        with masked warm/polish — still length-aware, spectral convergence
        near the exact path's at a ~4x faster vocode (KERNELS_r04.json,
        SERVING_r04.json).
        """
        if gl_method is None:
            gl_method = self.gl_method  # honor the constructor/CLI choice
        if self.config.data_loader.frame_size != 1:
            raise NotImplementedError(
                "convert_grid assumes frame_size=1 (the reference's shipped "
                "config, config.yaml:39); reshape inputs via utt_make_frames "
                "for other frame sizes"
            )
        cfg = self.config.signal
        ns, nt = len(src_mels), len(tar_mels)
        src_lens = np.array([m.shape[0] for m in src_mels], np.int32)
        tar_lens = np.array([m.shape[0] for m in tar_mels], np.int32)
        # physical source frames: multiple of the content downsample product
        # so the strided chain keeps integral physical shapes (per-sample
        # valid lengths are handled by the masked ops). ``len_bucket`` > 1
        # additionally rounds the padded shapes up to bucket multiples so a
        # serving deployment compiles ONE program per bucket instead of one
        # per distinct length-set — the masked path is exact under ANY
        # padding, so bucketing trades a little padded compute for bounded
        # compile churn (results are unchanged; pinned in tests).
        sub = int(np.prod(self.config.model.content_encoder.subsample))
        bs = sub * max(len_bucket, 1) // math.gcd(sub, max(len_bucket, 1))
        ts = -(-int(src_lens.max()) // bs) * bs
        tt = -(-int(tar_lens.max()) // max(len_bucket, 1)) * max(len_bucket, 1)
        # uniform grids (every source already at the padded length, every
        # target equal) need no masking at all — padding is empty, so the
        # unmasked model and plain Griffin-Lim ARE the per-sample-exact
        # programs; they skip the masked ops' gather/mirror overhead
        # (~20% of the vocode; data-dependent, decided on the host)
        uniform = bool(
            (src_lens == ts).all() and (tar_lens == tt).all()
        ) and self.mesh is None  # mesh path always uses the masked programs

        def pad_to(m, t):
            return np.pad(m, ((0, t - m.shape[0]), (0, 0)))

        src = np.stack([pad_to(m.astype(np.float32), ts) for m in src_mels])
        tar = np.stack([pad_to(m.astype(np.float32), tt) for m in tar_mels])
        if self.mesh is None:
            # cross product ON DEVICE: only the ns + nt unique mels cross
            # the host->device link (the repeated ns*nt batch is ~ns x
            # larger and the tunnel H2D is the serving path's scarcest
            # resource)
            src_b = jnp.repeat(jnp.asarray(src), nt, axis=0)
            tar_b = jnp.tile(jnp.asarray(tar), (ns, 1, 1))
            sl_b = jnp.repeat(jnp.asarray(src_lens), nt, axis=0)
            tl_b = jnp.tile(jnp.asarray(tar_lens), (ns,))
        else:
            # mesh path: build the pair batch on the HOST and let
            # device_put place each shard directly — repeating on device
            # would materialize the full batch on one chip before the
            # reshard, capping grid size at single-chip HBM
            src_b = np.repeat(src, nt, axis=0)
            tar_b = np.tile(tar, (ns, 1, 1))
            sl_b = np.repeat(src_lens, nt, axis=0)
            tl_b = np.tile(tar_lens, ns)
        crop_lens = np.repeat(src_lens, nt)
        return self._serve_batch(
            src_b, sl_b, tar_b, tl_b, crop_lens, gl_method, gl_iters,
            uniform, trim, return_mels,
        )

    def _serve_batch(
        self, src_b, sl_b, tar_b, tl_b, crop_lens, gl_method, gl_iters,
        uniform, trim, return_mels,
    ):
        """Shared serving engine for convert_grid / convert_pairs: mesh
        padding + sharded placement, the (masked) model program, the
        vocode program, one bulk D2H, and the host-side crop/trim/mels
        epilogue. ``crop_lens[k]`` is pair k's true source frame count."""
        from ..dsp.audio import trim_silence

        cfg = self.config.signal
        n = len(crop_lens)
        pad_rows = 0
        if self.mesh is not None:
            # pad the pair batch to the data-axis multiple (extra rows are
            # copies of pair 0 and dropped after the gather; results for
            # real pairs are untouched — masked programs are per-sample)
            n_data = int(self.mesh.shape["data"])
            pad_rows = (-n) % n_data
            if pad_rows:
                rep = lambda a: np.concatenate(
                    [np.asarray(a)] + [np.asarray(a)[:1]] * pad_rows, axis=0
                )
                src_b, tar_b, sl_b, tl_b = map(rep, (src_b, tar_b, sl_b, tl_b))
            from jax.sharding import PartitionSpec as P

            from ..core.mesh import put_global_from_full

            put = lambda a: put_global_from_full(
                np.asarray(a), self.mesh, P("data")
            )
            src_b, tar_b, sl_b, tl_b = map(put, (src_b, tar_b, sl_b, tl_b))
        else:
            src_b, tar_b = jnp.asarray(src_b), jnp.asarray(tar_b)
            sl_b, tl_b = jnp.asarray(sl_b), jnp.asarray(tl_b)
        vocode = self._get_vocode(gl_method, gl_iters, uniform)
        if uniform:
            dec_dev = self._jit_inference(self.params, src_b, tar_b)
            dec_lens = jnp.full((n,), dec_dev.shape[1], jnp.int32)
        else:
            dec_dev, dec_lens = self._get_masked_jit()(
                self.params, src_b, sl_b, tar_b, tl_b
            )
        wavs_dev = vocode(dec_dev, dec_lens)
        if self._multiprocess:
            # reshard the data-sharded outputs to replicated (ICI
            # all-gather) so every process's host fetch sees all pairs
            wavs_dev = self._jit_to_replicated(wavs_dev)
            if return_mels:
                dec_dev = self._jit_to_replicated(dec_dev)
                dec_lens = self._jit_to_replicated(dec_lens)
        wavs = np.asarray(wavs_dev)
        out = []
        for k in range(n):
            n_samp = cfg.hop_length * (int(crop_lens[k]) - 1)
            w = wavs[k][:n_samp]
            if trim:
                w, _ = trim_silence(w, top_db=60.0)
            out.append(w.astype(np.float32))
        if not return_mels:
            return out
        dec_host = np.asarray(dec_dev)
        dl = np.asarray(dec_lens)
        return out, [
            self.denormalize(dec_host[k, : dl[k]]) for k in range(n)
        ]

    def convert_pairs(
        self,
        pairs,
        gl_iters: Optional[int] = None,
        gl_method: Optional[str] = None,
        trim: bool = True,
        return_mels: bool = False,
        len_bucket: int = 1,
    ):
        """Convert an explicit list of (source_mel, target_mel) PAIRS in one
        padded batch — the production-serving shape when requests are not a
        cross product. Same exactness guarantees and options as
        ``convert_grid`` (length-masked model + ragged Griffin-Lim; mesh
        sharding; ``len_bucket`` compile-churn control); reuses the same
        compiled programs.
        """
        if gl_method is None:
            gl_method = self.gl_method
        if self.config.data_loader.frame_size != 1:
            raise NotImplementedError(
                "convert_pairs assumes frame_size=1 (config.yaml:39)"
            )
        cfg = self.config.signal
        n = len(pairs)
        src_mels = [np.asarray(s_, np.float32) for s_, _ in pairs]
        tar_mels = [np.asarray(t_, np.float32) for _, t_ in pairs]
        src_lens = np.array([m.shape[0] for m in src_mels], np.int32)
        tar_lens = np.array([m.shape[0] for m in tar_mels], np.int32)
        sub = int(np.prod(self.config.model.content_encoder.subsample))
        bk = max(len_bucket, 1)
        bs = sub * bk // math.gcd(sub, bk)
        ts = -(-int(src_lens.max()) // bs) * bs
        tt = -(-int(tar_lens.max()) // bk) * bk

        def pad_to(m, t):
            return np.pad(m, ((0, t - m.shape[0]), (0, 0)))

        src_b = np.stack([pad_to(m, ts) for m in src_mels])
        tar_b = np.stack([pad_to(m, tt) for m in tar_mels])
        return self._serve_batch(
            src_b, src_lens, tar_b, tar_lens, src_lens, gl_method,
            gl_iters, False, trim, return_mels,
        )

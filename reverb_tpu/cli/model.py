"""Streaming/incremental recognition API.

Parity: asr/wenet/cli/model.py:25-158 — the runtime wrapper the reference
exports to TorchScript (`forward_encoder_chunk` + beam search + rescoring +
force-align mode).  Here the exported artifact is the jitted
`encoder_forward_chunk` program with static ring caches; decode modes reuse
the device searches.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.greedy import ctc_greedy_search
from reverb_tpu.decode.prefix_beam import ctc_prefix_beam_search
from reverb_tpu.decode.rescoring import attention_rescoring
from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.decode.streaming_beam import IncrementalBeam, \
    IncrementalGreedy
from reverb_tpu.frontend.fbank import (FbankConfig,
    compute_fbank_compiled, num_frames)
from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.models.asr_model import ModelConfig
from reverb_tpu.models.encoder import (encoder_forward_chunk,
                                       init_stream_caches)


class StreamingASR:
    """Chunk-incremental recognizer over a loaded ReverbASR model.

    Feed audio with `accept_waveform`; call `decode()` anytime for the
    current hypothesis (CTC greedy / prefix beam / rescoring over the
    accumulated encoder output)."""

    def __init__(self, reverb_model, decoding_chunk_size: int = 16,
                 num_left_chunks: int = 16, verbatimicity: float = 1.0,
                 beam_size: int = 10):
        self.model = reverb_model
        self.cfg: ModelConfig = reverb_model.model_config
        self.params = reverb_model.params
        ecfg = self.cfg.encoder
        self.sub = ecfg.subsampling_rate
        self.context = {1: 1, 4: 7, 6: 11, 8: 15}[self.sub]
        self.chunk = decoding_chunk_size
        self.window = (self.chunk - 1) * self.sub + self.context
        self.stride = self.sub * self.chunk
        self.cache_t = decoding_chunk_size * num_left_chunks
        self.cat = jnp.array([verbatimicity, 1 - verbatimicity], jnp.float32)
        self.fbank_cfg = reverb_model.fbank

        # Params MUST be jit ARGUMENTS, not closures: a closed-over pytree
        # is embedded into the HLO as literal constants, so the compile
        # payload carries all ~1.4 GB of flagship weights — XLA
        # constant-folds whole weight transposes at compile time and a
        # remote-compile link (axon) breaks its pipe after ~18 min shipping
        # the module.  As arguments they are runtime parameters and the
        # chunk program compiles in seconds.
        has_cmvn = self.params['encoder'].get('global_cmvn') is not None

        def _step_fn(p, cat, x, off, a, c):
            enc_p = p['encoder']
            g = enc_p.get('global_cmvn') if has_cmvn else None
            cmvn = (g['mean'], g['istd']) if g else None
            return encoder_forward_chunk(enc_p, x, off, ecfg, a, c,
                                         cat_embs=cat, cmvn=cmvn)

        blank = self.cfg.blank_id
        self._step = jax.jit(_step_fn)
        self._ctc = jax.jit(
            lambda p, enc: ctc_mod.ctc_logprobs(p, enc, 0.0, blank))
        # per-hop CTC log-probs + argmax for the incremental decoders (one
        # compiled program per chunk shape; top1 is the only host fetch)
        self._ctc_hop = jax.jit(
            lambda p, enc: (lambda lp: (lp, jnp.argmax(lp, axis=-1)))(
                ctc_mod.ctc_logprobs(p, enc, 0.0, blank)))
        self.beam_size = beam_size
        self.reset()

    def reset(self):
        self.att_cache, self.cnn_cache = init_stream_caches(
            self.cfg.encoder, self.cache_t)
        self._pcm = np.zeros((0,), np.float32)     # int16-scale samples
        self._feat_buf = np.zeros((0, self.fbank_cfg.num_mel_bins),
                                  np.float32)
        self._consumed_samples = 0
        self._offset = 0
        self._enc_chunks: List[np.ndarray] = []
        # hop-resumable decoders: per-hop decode cost is O(hop), not
        # O(stream) (decode/streaming_beam.py)
        self._inc_beam = IncrementalBeam(self.beam_size, self.cfg.blank_id)
        self._inc_greedy = IncrementalGreedy(self.cfg.blank_id)

    # ------------------------------ input ------------------------------

    def accept_waveform(self, samples: np.ndarray, sample_rate: int = 16000):
        """samples: float32 in [-1,1) (any chunk size)."""
        assert sample_rate == self.fbank_cfg.sample_rate
        self._pcm = np.concatenate([self._pcm,
                                    samples.astype(np.float32) * (1 << 15)])
        self._advance()

    def _advance(self):
        # compute any newly-available fbank frames
        total_frames = num_frames(len(self._pcm), self.fbank_cfg)
        have = self._feat_buf.shape[0]
        if total_frames > have:
            start = have * self.fbank_cfg.window_shift
            wave = self._pcm[start:]
            n_new = num_frames(len(wave), self.fbank_cfg)
            if n_new > 0:
                # one compiled program per padded shape (eager op-by-op
                # fbank costs a device round-trip PER OP — fatal over a
                # remote-TPU link)
                new = np.asarray(compute_fbank_compiled(
                    wave, self.fbank_cfg, n_frames=n_new))
                self._feat_buf = np.concatenate([self._feat_buf, new])
        # run encoder windows while enough frames are buffered
        while self._feat_buf.shape[0] - self._consumed_frames >= self.window:
            s = self._consumed_frames
            win = self._feat_buf[s:s + self.window]
            ys, self.att_cache, self.cnn_cache = self._step(
                self.params, self.cat, jnp.asarray(win[None]),
                jnp.asarray(self._offset), self.att_cache, self.cnn_cache)
            self._enc_chunks.append(np.asarray(ys[0]))
            self._offset += ys.shape[1]
            self._consumed_frames = s + self.stride
            # advance the incremental decoders over just this hop's frames
            lp, top1 = self._ctc_hop(self.params['ctc'], ys)
            self._inc_beam.accept(lp[0])
            self._inc_greedy.accept(top1[0])

    @property
    def _consumed_frames(self):
        return self._consumed_samples

    @_consumed_frames.setter
    def _consumed_frames(self, v):
        self._consumed_samples = v

    # ------------------------------ output ------------------------------

    def decode(self, mode: str = 'ctc_prefix_beam_search',
               beam_size: Optional[int] = None, ctc_weight: float = 0.1,
               reverse_weight: float = 0.0) -> DecodeResult:
        """Current-hypothesis decode.  Greedy and prefix-beam read the
        hop-resumable decoder state — O(1) / O(K·L) per call, no work
        proportional to the stream.  A beam_size different from the
        session's re-decodes from scratch (the carried beam is per-width).
        attention_rescoring necessarily touches the full encoder output
        (the decoder cross-attends to all of it) but reuses the carried
        beam for its nbest."""
        if not self._enc_chunks:
            return DecodeResult(tokens=[])
        if mode == 'ctc_greedy_search':
            return self._inc_greedy.result()
        from_scratch = beam_size is not None and beam_size != self.beam_size
        if mode == 'ctc_prefix_beam_search' and not from_scratch:
            return self._inc_beam.finalize()
        enc = jnp.asarray(np.concatenate(self._enc_chunks)[None])
        lens = jnp.array([enc.shape[1]], jnp.int32)
        if from_scratch:
            ctc_probs = self._ctc(self.params['ctc'], enc)
            prefix = ctc_prefix_beam_search(ctc_probs, lens,
                                            beam_size, self.cfg.blank_id)
            if mode == 'ctc_prefix_beam_search':
                return prefix[0]
        else:
            prefix = [self._inc_beam.finalize()]
        assert mode == 'attention_rescoring', mode
        return attention_rescoring(self.params, self.cfg, prefix, enc, lens,
                                   ctc_weight, reverse_weight,
                                   cat_embs=self.cat)[0]

    def text(self, **kwargs) -> str:
        res = self.decode(**kwargs)
        text, _ = self.model.tokenizer.detokenize(res.tokens)
        return text

"""Multi-stream streaming serving: B concurrent sessions, one device program.

A real streaming deployment does not run one utterance per chip — it batches
many concurrent streams through the chunked encoder.  The reference's runtime
holds one cache set per session and steps sessions one at a time
(asr/wenet/cli/model.py:74-128, asr/wenet/transformer/encoder.py:231-339);
single-stream stepping on a TPU is dispatch-latency-bound (measured 3.5-3.9x
realtime — PARITY.md round 4).  The TPU-native design stacks every session's
static att/cnn ring caches on a leading stream axis and advances ALL ready
streams with ONE `encoder_forward_chunk` call per hop:

  - per-stream absolute offsets ride through the batched program as an (B,)
    vector (rel-pos tables and cache-validity masks are per-stream — streams
    may join mid-flight);
  - slots that have not buffered a full window this hop are stepped with a
    zero window and every state update (caches, beams, offsets) is masked
    back to the old value with `jnp.where` — the compiled program is the
    same every hop regardless of which subset is ready;
  - the hop-resumable CTC prefix beams (decode/streaming_beam.py) are
    vmapped over the stream axis and live entirely on device: per hop the
    host fetches ONLY the (B, chunk) greedy argmax ids (int32) — no
    O(vocab) transfer per stream;
  - a slot whose stream ended is `reset_slot()` (scatter zeros at its index)
    and can be reassigned to a new caller without touching the other B-1.

`decode(slot, mode)` matches `StreamingASR.decode` semantics per slot;
equality with B independent single-stream sessions is pinned in
tests/test_stream_pool.py.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.prefix_beam import _init_state, _pack_results
from reverb_tpu.decode.rescoring import attention_rescoring
from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.decode.streaming_beam import (IncrementalGreedy,
                                              _beam_finalize, _beam_hop_impl)
from reverb_tpu.frontend.fbank import FbankConfig, _compute_fbank_jit, \
    num_frames
from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.models.asr_model import ModelConfig
from reverb_tpu.models.encoder import (encoder_forward_chunk,
                                       init_stream_caches)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _beam_hop_pool(state, pfx, ts_s, ts_ns, ctc_probs, K: int, blank_id: int,
                   L: int, offsets, ready):
    """Advance B stacked incremental beams by one hop; not-ready slots keep
    their old state bit-for-bit.  ctc_probs: (B, T_hop, V); offsets,
    ready: (B,)."""
    hop = functools.partial(_beam_hop_impl, K=K, blank_id=blank_id, L=L)
    new_state, new_pfx, new_ts_s, new_ts_ns, _ = jax.vmap(
        lambda st, pf, s, ns, cp, off: hop(st, pf, s, ns, cp, offset=off)
    )(state, pfx, ts_s, ts_ns, ctc_probs, offsets)

    def keep(new, old):
        r = ready.reshape((-1,) + (1,) * (new.ndim - 1))
        return jnp.where(r, new, old)

    state = jax.tree.map(keep, new_state, state)
    return (state, keep(new_pfx, pfx), keep(new_ts_s, ts_s),
            keep(new_ts_ns, ts_ns))


class MultiStreamASR:
    """Pool of `n_streams` chunk-incremental recognizers sharing one set of
    batched device programs.  API: `accept_waveform(slot, samples)` buffers
    audio; `step()` advances every slot with a full window buffered (call it
    after feeding a hop to each active slot); `decode(slot, mode)` reads the
    current hypothesis; `reset_slot(slot)` frees a slot for a new stream.

    keep_encoder_out=True accumulates each slot's encoder output on the host
    (needed for the attention_rescoring decode mode; off by default — the
    per-hop fetch is B·chunk·D floats).
    """

    def __init__(self, reverb_model, n_streams: int,
                 decoding_chunk_size: int = 16, num_left_chunks: int = 16,
                 verbatimicity: float = 1.0, beam_size: int = 10,
                 keep_encoder_out: bool = False):
        self.model = reverb_model
        self.cfg: ModelConfig = reverb_model.model_config
        self.params = reverb_model.params
        ecfg = self.cfg.encoder
        self.B = int(n_streams)
        self.sub = ecfg.subsampling_rate
        self.context = {1: 1, 4: 7, 6: 11, 8: 15}[self.sub]
        self.chunk = decoding_chunk_size
        self.window = (self.chunk - 1) * self.sub + self.context
        self.stride = self.sub * self.chunk
        self.cache_t = decoding_chunk_size * num_left_chunks
        self.cat = jnp.array([verbatimicity, 1 - verbatimicity], jnp.float32)
        self.fbank_cfg: FbankConfig = reverb_model.fbank
        self.beam_size = int(beam_size)
        self.keep_encoder_out = keep_encoder_out
        self.blank_id = self.cfg.blank_id

        has_cmvn = self.params['encoder'].get('global_cmvn') is not None

        def _step_fn(p, cat, x, offs, a, c, ready):
            enc_p = p['encoder']
            g = enc_p.get('global_cmvn') if has_cmvn else None
            cmvn = (g['mean'], g['istd']) if g else None
            ys, na, nc = encoder_forward_chunk(enc_p, x, offs, ecfg, a, c,
                                               cat_embs=cat, cmvn=cmvn)
            r = ready.reshape((1, -1) + (1,) * (na.ndim - 2))
            na = jnp.where(r, na, a)
            if nc is not None:
                nc = jnp.where(ready.reshape((1, -1, 1, 1)), nc, c)
            lp = ctc_mod.ctc_logprobs(p['ctc'], ys, 0.0, self.blank_id)
            return ys, na, nc, lp, jnp.argmax(lp, axis=-1)

        self._step = jax.jit(_step_fn)
        self._ctc = jax.jit(
            lambda p, enc: ctc_mod.ctc_logprobs(p, enc, 0.0, self.blank_id))
        self.reset()

    # ------------------------------ state ------------------------------

    def _init_beam_slot(self):
        return _init_state(self.beam_size)

    def reset(self):
        B, K, L = self.B, self.beam_size, 512
        self.att_cache, self.cnn_cache = init_stream_caches(
            self.cfg.encoder, self.cache_t, B)
        self._offsets = np.zeros((B,), np.int64)     # subsampled positions
        self._frame_off = np.zeros((B,), np.int64)   # ctc frame positions
        self._pcm = [np.zeros((0,), np.float32) for _ in range(B)]
        self._feat = [np.zeros((0, self.fbank_cfg.num_mel_bins), np.float32)
                      for _ in range(B)]
        self._consumed = np.zeros((B,), np.int64)    # frames fed to encoder
        self.L = L
        one = _init_state(K)
        self._bstate = jax.tree.map(
            lambda x: jnp.tile(x[None], (B,) + (1,) * x.ndim), one)
        self._pfx = jnp.zeros((B, K, L), jnp.int32)
        self._ts_s = jnp.zeros((B, K, L), jnp.int32)
        self._ts_ns = jnp.zeros((B, K, L), jnp.int32)
        self._plen_ub = np.zeros((B,), np.int64)
        self._greedy = [IncrementalGreedy(self.blank_id) for _ in range(B)]
        self._enc_chunks: List[List[np.ndarray]] = [[] for _ in range(B)]

    def reset_slot(self, b: int):
        """Zero one slot's caches/beam/buffers; the other slots' device
        state is untouched (index_update at b)."""
        z_att, z_cnn = init_stream_caches(self.cfg.encoder, self.cache_t, 1)
        self.att_cache = self.att_cache.at[:, b].set(z_att[:, 0])
        if self.cnn_cache is not None:
            self.cnn_cache = self.cnn_cache.at[:, b].set(z_cnn[:, 0])
        one = self._init_beam_slot()
        self._bstate = jax.tree.map(
            lambda big, st: big.at[b].set(st), self._bstate, one)
        self._pfx = self._pfx.at[b].set(0)
        self._ts_s = self._ts_s.at[b].set(0)
        self._ts_ns = self._ts_ns.at[b].set(0)
        self._offsets[b] = 0
        self._frame_off[b] = 0
        self._pcm[b] = np.zeros((0,), np.float32)
        self._feat[b] = np.zeros((0, self.fbank_cfg.num_mel_bins),
                                 np.float32)
        self._consumed[b] = 0
        self._plen_ub[b] = 0
        self._greedy[b].reset()
        self._enc_chunks[b] = []

    def _grow(self, new_len: int):
        pad = new_len - self.L
        self._pfx = jnp.pad(self._pfx, ((0, 0), (0, 0), (0, pad)))
        self._ts_s = jnp.pad(self._ts_s, ((0, 0), (0, 0), (0, pad)))
        self._ts_ns = jnp.pad(self._ts_ns, ((0, 0), (0, 0), (0, pad)))
        self.L = new_len

    # ------------------------------ input ------------------------------

    def accept_waveform(self, b: int, samples: np.ndarray,
                        sample_rate: int = 16000):
        """Buffer samples (float32 in [-1,1)) for slot b.  No device work —
        call `step()` once per hop after feeding all active slots."""
        assert sample_rate == self.fbank_cfg.sample_rate
        self._pcm[b] = np.concatenate(
            [self._pcm[b], samples.astype(np.float32) * (1 << 15)])

    def _advance_fbank(self):
        """Compute newly-available fbank frames for every slot, batching
        slots whose pending-wave padded length coincides (the synchronized-
        hop common case is ONE batched program for all B)."""
        cfg = self.fbank_cfg
        pend = []          # (slot, wave, n_new, padded_len)
        for b in range(self.B):
            have = self._feat[b].shape[0]
            total = num_frames(len(self._pcm[b]), cfg)
            if total <= have:
                continue
            start = have * cfg.window_shift
            wave = self._pcm[b][start:]
            n_new = num_frames(len(wave), cfg)
            if n_new <= 0:
                continue
            L = max(-(-max(len(wave), 1) // 16000) * 16000, 16000)
            pend.append((b, wave, n_new, L))
        by_len = {}
        for item in pend:
            by_len.setdefault(item[3], []).append(item)
        for L, items in by_len.items():
            waves = np.zeros((len(items), L), np.float32)
            for i, (_, w, _, _) in enumerate(items):
                waves[i, :len(w)] = w
            feats = np.asarray(jax.vmap(
                lambda w: _compute_fbank_jit(w, cfg, num_frames(L, cfg))
            )(jnp.asarray(waves)))
            for i, (b, w, n_new, _) in enumerate(items):
                self._feat[b] = np.concatenate(
                    [self._feat[b], feats[i, :n_new]])

    def step(self) -> np.ndarray:
        """Advance every slot with >= window buffered frames by ONE hop in a
        single batched device call.  Returns the boolean ready mask (who
        advanced).  Call repeatedly to drain multi-hop backlogs."""
        self._advance_fbank()
        ready = np.array([
            self._feat[b].shape[0] - self._consumed[b] >= self.window
            for b in range(self.B)])
        if not ready.any():
            return ready
        win = np.zeros((self.B, self.window, self.fbank_cfg.num_mel_bins),
                       np.float32)
        for b in np.nonzero(ready)[0]:
            s = int(self._consumed[b])
            win[b] = self._feat[b][s:s + self.window]
        ready_j = jnp.asarray(ready)
        ys, self.att_cache, self.cnn_cache, lp, top1 = self._step(
            self.params, self.cat, jnp.asarray(win),
            jnp.asarray(self._offsets.astype(np.int32)),
            self.att_cache, self.cnn_cache, ready_j)

        chunk_t = int(ys.shape[1])
        if self._plen_ub.max() + chunk_t >= self.L:
            self._grow(max(self.L * 2,
                           int(self._plen_ub.max()) + chunk_t + 1))
        (self._bstate, self._pfx, self._ts_s, self._ts_ns) = _beam_hop_pool(
            self._bstate, self._pfx, self._ts_s, self._ts_ns, lp,
            self.beam_size, self.blank_id, self.L,
            jnp.asarray(self._frame_off.astype(np.int32)), ready_j)

        top1_h = np.asarray(top1)                       # (B, chunk_t) int32
        if self.keep_encoder_out:
            ys_h = np.asarray(ys, np.float32)
        for b in np.nonzero(ready)[0]:
            self._greedy[b].accept(top1_h[b])
            if self.keep_encoder_out:
                self._enc_chunks[b].append(ys_h[b])
            self._consumed[b] += self.stride
            self._offsets[b] += chunk_t
            self._frame_off[b] += chunk_t
            self._plen_ub[b] += chunk_t
        return ready

    # ------------------------------ output ------------------------------

    def _finalize_slot(self, b: int) -> DecodeResult:
        state_b = jax.tree.map(lambda x: x[b], self._bstate)
        out = _beam_finalize(state_b, self._pfx[b], self._ts_s[b],
                             self._ts_ns[b])
        prefixes, plens, scores, times = (x[None] for x in out)
        return _pack_results(prefixes, plens, scores, times)[0]

    def decode(self, b: int, mode: str = 'ctc_prefix_beam_search',
               ctc_weight: float = 0.1,
               reverse_weight: float = 0.0) -> DecodeResult:
        if self._frame_off[b] == 0:
            return DecodeResult(tokens=[])
        if mode == 'ctc_greedy_search':
            return self._greedy[b].result()
        if mode == 'ctc_prefix_beam_search':
            return self._finalize_slot(b)
        assert mode == 'attention_rescoring', mode
        if not self.keep_encoder_out:
            raise ValueError('attention_rescoring decode needs '
                             'keep_encoder_out=True')
        enc = jnp.asarray(np.concatenate(self._enc_chunks[b])[None])
        lens = jnp.array([enc.shape[1]], jnp.int32)
        prefix = [self._finalize_slot(b)]
        return attention_rescoring(self.params, self.cfg, prefix, enc, lens,
                                   ctc_weight, reverse_weight,
                                   cat_embs=self.cat)[0]

    def text(self, b: int, **kwargs) -> str:
        res = self.decode(b, **kwargs)
        text, _ = self.model.tokenizer.detokenize(res.tokens)
        return text

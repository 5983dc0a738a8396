"""Paraformer serving wrapper — the `wenet --paraformer` runtime.

Parity: asr/wenet/cli/paraformer_model.py — load a wenet-converted
Ali-Paraformer model dir, fbank the audio, run the NAR forward
(encoder → CIF predictor → decoder), greedy-search with CIF-peak
timestamps, and return {text, confidence[, tokens]}.

TPU design: the whole forward (LFR, SANM encoder, CIF with tail handling,
decoder, log-softmax, tp α) is ONE jitted program per feature-length
bucket; only the small (B,U) winners and the tp α row come back to host.
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from reverb_tpu.frontend.audio import load_for_asr
from reverb_tpu.frontend.fbank import (FbankConfig, compute_fbank_compiled,
                                       num_frames)

# decoder token-buffer cap (static shape); ~20 tokens/s of speech headroom
_MAX_TOKENS = 512
_FEAT_BUCKET = 512   # feature frames round up to this to bound compiles


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _forward(params, scfg, cif_cfg, max_tokens, feats, feats_lens, cmvn):
    from reverb_tpu.models.sanm import sanm_forward_paraformer
    return sanm_forward_paraformer(params, feats, feats_lens, scfg, cif_cfg,
                                   max_tokens=max_tokens, cmvn=cmvn)


class Paraformer:

    def __init__(self, model_dir: str, gpu: int = -1,
                 resample_rate: int = 16000) -> None:
        del gpu  # accepted for API parity; device selection is JAX's
        from reverb_tpu.convert.torch_ckpt import (load_npz,
                                                   load_paraformer_checkpoint)
        from reverb_tpu.models.registry import sanm_configs
        from reverb_tpu.text.paraformer_tokenizer import ParaformerTokenizer

        model_dir = Path(model_dir)
        with open(model_dir / 'config.yaml') as f:
            self.configs = yaml.safe_load(f)
        units = model_dir / 'units.txt'
        self.tokenizer = ParaformerTokenizer(symbol_table=str(units))
        self.configs.setdefault('output_dim',
                                len(self.tokenizer.symbol_table))
        self.scfg, self.cif_cfg = sanm_configs(self.configs)
        ckpt = self._find_checkpoint(model_dir)
        if str(ckpt).endswith('.npz'):
            from reverb_tpu.convert.torch_ckpt import \
                fixup_paraformer_predictor
            self.params = fixup_paraformer_predictor(load_npz(str(ckpt))[0])
        else:
            self.params = load_paraformer_checkpoint(str(ckpt))
        self.cmvn = self._load_cmvn(model_dir)
        self.resample_rate = resample_rate
        self.fbank = FbankConfig(sample_rate=resample_rate)
        # 10 ms mel frames → LFR n → ×upsample_times tp frames
        lfr_n = self.scfg.lfr_n
        self.tp_frame_rate = 0.01 * lfr_n / self.cif_cfg.upsample_times

    @staticmethod
    def _find_checkpoint(model_dir: Path) -> Path:
        for name in ('final.pt', 'final.zip'):
            p = model_dir / name
            if p.exists() and name.endswith('.pt'):
                return p
        for pat in ('*.npz', '*.pt'):
            hits = sorted(model_dir.glob(pat))
            if hits:
                return hits[0]
        raise FileNotFoundError(f'no checkpoint (*.pt/*.npz) in {model_dir}')

    def _load_cmvn(self, model_dir: Path):
        cm = self.configs.get('cmvn_conf', {}) or {}
        cmvn_file = cm.get('cmvn_file')
        if cmvn_file and not os.path.isabs(cmvn_file):
            cmvn_file = str(model_dir / Path(cmvn_file).name)
        if not cmvn_file or not os.path.exists(cmvn_file):
            return None
        from reverb_tpu.frontend.cmvn import load_cmvn
        mean, istd = load_cmvn(cmvn_file, cm.get('is_json_cmvn', False))
        if np.asarray(mean).shape[-1] != self.scfg.input_size:
            return None      # stats not over the post-LFR stacked dim
        return (jnp.asarray(mean), jnp.asarray(istd))

    def transcribe(self, audio_file: str, tokens_info: bool = False) -> dict:
        from reverb_tpu.decode.paraformer_search import (
            gen_timestamps_from_peak, paraformer_beautify_result,
            paraformer_greedy_search)

        wave = load_for_asr(audio_file, self.resample_rate)
        T = num_frames(len(wave), self.fbank)
        feats = compute_fbank_compiled(wave, self.fbank, n_frames=T)
        Tb = -(-T // _FEAT_BUCKET) * _FEAT_BUCKET
        feats = jnp.pad(feats, ((0, Tb - T), (0, 0)))[None]
        lens = jnp.asarray([T], jnp.int32)
        logp, out_lens, tp_alphas = _forward(
            self.params, self.scfg, self.cif_cfg, _MAX_TOKENS, feats, lens,
            self.cmvn)
        from reverb_tpu.models.paraformer import cif_peaks_from_tp
        peaks = cif_peaks_from_tp(tp_alphas, out_lens,
                                  self.cif_cfg.threshold)
        res = paraformer_greedy_search(logp, out_lens, cif_peaks=peaks)[0]
        tokens = self.tokenizer.ids2tokens(res.tokens)
        result = {'confidence': res.confidence,
                  'text': paraformer_beautify_result(tokens)}
        if tokens_info:
            # valid tp frames: ⌈T/lfr_n⌉ encoder frames × upsample_times
            n_tp = (-(-T // self.scfg.lfr_n)) * self.cif_cfg.upsample_times
            times = gen_timestamps_from_peak(res.times,
                                             num_frames=max(n_tp, 1),
                                             frame_rate=self.tp_frame_rate)
            result['tokens'] = [
                {'token': tok, 'start': round(t[0], 3),
                 'end': round(t[1], 3), 'confidence': conf}
                for tok, t, conf in zip(tokens, times,
                                        res.tokens_confidence)]
        return result

    def align(self, audio_file: str, label: str) -> dict:
        raise NotImplementedError('Align is currently not supported')


def load_model(model_dir: str = None, gpu: int = -1) -> Paraformer:
    if model_dir is None:
        from reverb_tpu.cli.hub import Hub
        model_dir = Hub.get_model_by_lang('paraformer')
    return Paraformer(model_dir, gpu)

"""ReverbASR product API: load config+checkpoint, transcribe long-form audio.

Parity: asr/wenet/cli/reverb.py:40-372 — same public surface
(`load_model(name_or_path)` → `ReverbASR` with `.transcribe(...)` /
`.transcribe_modes(...)`), same flags and defaults (chunk_size=2051,
beam_size=10, ctc_weight=0.1, verbatimicity=1.0, timings_adjustment=230 ms),
same txt/CTM output bytes.

TPU redesign vs the reference:
  * fbank runs on device as one fused jitted program (frontend/fbank.py);
  * the whole file's chunks are batched together (static (B, 2051, 80)
    shapes) instead of the reference's one-chunk-at-a-time loop, so the MXU
    sees large batched matmuls and XLA compiles exactly one program per
    (chunk, batch) shape;
  * beam search happens on device (decode/prefix_beam.py), not in python.
"""

from __future__ import annotations

import logging
import math
import os
from itertools import chain
from pathlib import Path
from typing import Generator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from reverb_tpu.decode.align import (adjust_model_time_offset, ctc_align,
                                     hyps_to_ctm, hyps_to_txt)
from reverb_tpu.decode.api import decode as decode_modes_fn
from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.frontend.audio import load_for_asr
from reverb_tpu.frontend.cmvn import load_cmvn
from reverb_tpu.frontend.fbank import (FbankConfig,
    compute_fbank_compiled, num_frames)
from reverb_tpu.models.asr_model import ModelConfig, init_params
from reverb_tpu.convert.torch_ckpt import (check_param_compat,
                                           load_reverb_checkpoint, load_npz)
from reverb_tpu.text.tokenizer import init_tokenizer

_FRAME_DOWNSAMPLING_FACTOR = {'linear': 1, 'conv2d': 4, 'conv2d6': 6,
                              'conv2d8': 8}
CACHED_MODELS_DIR = Path.home() / '.cache/reverb'
_MODELS = {'reverb_asr_v1': 'https://huggingface.co/Revai/reverb-asr'}


def get_blank_id(configs, symbol_table):
    """utils/ctc_utils.py:164-178: blank from ctc_conf or '<blank>' or 0."""
    ctc_conf = configs.get('ctc_conf', {}) or {}
    if 'ctc_blank_id' in ctc_conf:
        blank_id = ctc_conf['ctc_blank_id']
        if '<blank>' in symbol_table:
            assert symbol_table['<blank>'] == blank_id
    else:
        blank_id = symbol_table.get('<blank>', 0)
    configs.setdefault('ctc_conf', {})['ctc_blank_id'] = blank_id
    return configs, blank_id


class ReverbASR:
    def __init__(self, config: str, checkpoint: str,
                 cmvn_path: Optional[str] = None,
                 tokenizer_symbols: Optional[str] = None,
                 bpe_path: Optional[str] = None,
                 compute_dtype: str = 'float32',
                 quantize: str = 'none',
                 data_parallel: int = 0,
                 gpu: int = -1):
        del gpu  # accepted for API parity; device selection is JAX's
        from reverb_tpu.export.aot import maybe_enable_default_cache
        maybe_enable_default_cache()
        self.checkpoint = checkpoint
        with open(config) as f:
            self.configs = yaml.safe_load(f)

        cm = self.configs.setdefault('cmvn_conf', {})
        if 'cmvn_file' in cm or cmvn_path:
            cm['cmvn_file'] = self._abspath(cm.get('cmvn_file'), cmvn_path)
        tk = self.configs.setdefault('tokenizer_conf', {})
        tk['symbol_table_path'] = self._abspath(
            tk.get('symbol_table_path'), tokenizer_symbols)
        if 'bpe_path' in tk or bpe_path:
            tk['bpe_path'] = self._abspath(tk.get('bpe_path'), bpe_path)

        self.tokenizer = init_tokenizer(self.configs)
        self.configs, self.blank_id = get_blank_id(
            self.configs, self.tokenizer.symbol_table)
        self.configs['output_dim'] = len(self.tokenizer.symbol_table)

        self.model_config = ModelConfig.from_config(self.configs)
        if compute_dtype == 'bfloat16':
            self.model_config = self.model_config.with_compute_dtype(
                jnp.bfloat16)

        self.params = self._load_params()
        if quantize == 'int8':
            # serving PTQ: per-channel int8 weights, dynamic per-token
            # activations on the MXU int8 pipe (ops/quant.py)
            from reverb_tpu.ops.quant import quantize_params_int8
            self.params = quantize_params_int8(self.params)
        self.mesh = None
        if data_parallel and data_parallel > 1:
            # Data-parallel serving: every decode program is row-independent
            # over the chunk batch, so sharding the (B, chunk, 80) batch
            # along a ('data',) mesh lets GSPMD partition the whole serving
            # pipeline — N chips decode one long-form file ~N× faster with
            # no algorithm changes. The reference has no multi-GPU serving
            # (cli/reverb.py runs on one device).
            from jax.sharding import Mesh, NamedSharding, PartitionSpec
            devs = jax.devices()
            if data_parallel > len(devs):
                raise ValueError(
                    f'data_parallel={data_parallel} but only {len(devs)} '
                    f'devices are visible')
            self.mesh = Mesh(np.asarray(devs[:data_parallel]), ('data',))
            self.params = jax.device_put(
                self.params, NamedSharding(self.mesh, PartitionSpec()))
            # Pallas serving kernels (flash attention, beam scan) have no
            # GSPMD partitioning rule of their own; registering the concrete
            # mesh lets them shard_map themselves over 'data' so every chip
            # runs the unchanged single-chip kernel on its local rows
            # (ops/pallas_mesh.py).  Shapes that don't divide the mesh fall
            # back to the XLA formulations automatically.
            from reverb_tpu.ops.pallas_mesh import set_pallas_mesh
            set_pallas_mesh(self.mesh)
        self.test_conf = self.configs.get('dataset_conf', {}) or {}
        fbank_conf = self.test_conf.get('fbank_conf', {}) or {}
        self.fbank = FbankConfig(
            num_mel_bins=fbank_conf.get('num_mel_bins', 80),
            frame_length_ms=fbank_conf.get('frame_length', 25),
            frame_shift_ms=fbank_conf.get('frame_shift', 10))
        self.input_frame_length = self.fbank.frame_shift_ms
        self.output_frame_length = (
            self.input_frame_length * _FRAME_DOWNSAMPLING_FACTOR.get(
                self.configs.get('encoder_conf', {}).get('input_layer',
                                                         'conv2d'), 4))

    def _abspath(self, config_path, alternate=None):
        if alternate:
            return str(alternate)
        if config_path is None:
            return None
        p = Path(config_path)
        if not p.is_absolute():
            p = Path(self.checkpoint).parent / p
        return p.as_posix()

    def _load_params(self):
        if str(self.checkpoint).endswith('.npz'):
            params, _ = load_npz(self.checkpoint)
        else:
            params = load_reverb_checkpoint(self.checkpoint)
        cmvn_file = self.configs.get('cmvn_conf', {}).get('cmvn_file')
        if 'global_cmvn' not in params.get('encoder', {}) and cmvn_file:
            mean, istd = load_cmvn(
                cmvn_file, self.configs['cmvn_conf'].get('is_json_cmvn', True))
            params.setdefault('encoder', {})['global_cmvn'] = {
                'mean': jnp.asarray(mean), 'istd': jnp.asarray(istd)}
        return params

    # ------------------------------ features ------------------------------

    def compute_feats(self, audio_file: str, resample_rate: int = 16000
                      ) -> np.ndarray:
        """Full-file fbank (T, M). Audio decode on host, fbank on device."""
        return np.asarray(self._compute_feats_device(audio_file,
                                                     resample_rate))

    def _compute_feats_device(self, audio_file: str,
                              resample_rate: int = 16000):
        """Device-resident full-file fbank: the serving path never fetches
        the (T, M) feature matrix — it is chunked/padded on device and fed
        straight to the decoder programs (a ~11-min file otherwise pays a
        ~21 MB fetch + ~21 MB re-upload through a remote-TPU link)."""
        wave = load_for_asr(audio_file, resample_rate)
        T = num_frames(len(wave), self.fbank)
        return compute_fbank_compiled(wave, self.fbank, n_frames=T)

    def feats_batcher(self, feats: np.ndarray, chunk_size: int,
                      batch_size: int
                      ) -> Generator[Tuple[np.ndarray, np.ndarray], None, None]:
        """Split (T, M) features into (B, chunk_size, M) batches, zero-padding
        the final chunk (cli/reverb.py:142-174).  Accepts a numpy OR a
        device array — device feats are sliced/padded/reshaped on device
        (values identical; the arrays never round-trip through the host)."""
        xp = jnp if isinstance(feats, jax.Array) else np
        T, M = feats.shape
        per_batch = chunk_size * batch_size
        n_batches = max(math.ceil(T / per_batch), 1)
        for b in range(n_batches):
            part = feats[b * per_batch:(b + 1) * per_batch]
            bs = batch_size if b < n_batches - 1 else \
                max(math.ceil(part.shape[0] / chunk_size), 1)
            lens = np.full((bs,), chunk_size, dtype=np.int32)
            pad = bs * chunk_size - part.shape[0]
            if pad > 0:
                lens[-1] = chunk_size - pad
                part = xp.pad(part, ((0, pad), (0, 0)))
            yield part.reshape(bs, chunk_size, M), lens

    def _shard_batch(self, feats_batch, feats_lens):
        """Pad the chunk batch to a multiple of the mesh size (extra rows are
        zero-length chunks, dropped from the results) and place it sharded
        along 'data'; row independence makes the padded rows dead weight on
        exactly one device each."""
        from jax.sharding import NamedSharding, PartitionSpec
        dp = self.mesh.devices.size
        pad = -feats_batch.shape[0] % dp
        if pad:
            xp = jnp if isinstance(feats_batch, jax.Array) else np
            feats_batch = xp.pad(feats_batch, ((0, pad), (0, 0), (0, 0)))
            feats_lens = np.pad(feats_lens, (0, pad))
        spec = NamedSharding(self.mesh, PartitionSpec('data'))
        return (jax.device_put(feats_batch, spec),
                jax.device_put(jnp.asarray(feats_lens), spec))

    # ------------------------------ transcribe ------------------------------

    def transcribe_modes(self, audio_file, modes: List[str],
                         format: str = 'txt',
                         verbatimicity: float = 1.0,
                         chunk_size: int = 2051,
                         batch_size: Optional[int] = None,
                         beam_size: int = 10,
                         decoding_chunk_size: int = -1,
                         num_decoding_left_chunks: int = -1,
                         ctc_weight: float = 0.1,
                         simulate_streaming: bool = False,
                         reverse_weight: float = 0.0,
                         blank_penalty: float = 0.0,
                         length_penalty: float = 0.0,
                         timings_adjustment: float = 230,
                         blank_skip_threshold: float = 0.0,
                         context_graph=None) -> List[str]:
        feats = self._compute_feats_device(audio_file)
        if not batch_size:
            # Auto-batch: run all of a file's chunks through the encoder in
            # one device program (capped to bound HBM) instead of the
            # reference's one-chunk-at-a-time loop (cli/reverb.py:142-174).
            # CTM output is unchanged vs batch_size=1 (test_e2e_cli.py).
            # Under a serving mesh the HBM cap is per-device, so it scales
            # with the mesh.
            cap = 8 * (self.mesh.devices.size if self.mesh is not None else 1)
            batch_size = min(max(math.ceil(feats.shape[0] / chunk_size), 1),
                             cap)
        cat_embs = np.asarray([verbatimicity, 1.0 - verbatimicity],
                              dtype=np.float32)
        results = []
        for feats_batch, feats_lens in self.feats_batcher(
                feats, chunk_size, batch_size):
            n_real = feats_batch.shape[0]
            if self.mesh is not None:
                feats_batch, feats_lens = self._shard_batch(
                    feats_batch, feats_lens)
            hyps = decode_modes_fn(
                self.params, self.model_config, modes, feats_batch, feats_lens,
                beam_size=beam_size,
                decoding_chunk_size=decoding_chunk_size,
                num_decoding_left_chunks=num_decoding_left_chunks,
                ctc_weight=ctc_weight,
                reverse_weight=reverse_weight,
                blank_penalty=blank_penalty,
                length_penalty=length_penalty,
                cat_embs=cat_embs,
                blank_skip_threshold=blank_skip_threshold,
                context_graph=context_graph)
            if self.mesh is not None:
                hyps = {m: v[:n_real] for m, v in hyps.items()}
            results.append(hyps)
        outputs = []
        for mode in modes:
            outputs.append(self.get_output(
                format, Path(audio_file).name,
                list(chain(*(r[mode] for r in results))),
                timings_adjustment, chunk_size))
        return outputs

    def transcribe(self, audio_file, mode: str = 'ctc_prefix_beam_search',
                   **kwargs) -> str:
        return self.transcribe_modes(audio_file, [mode], **kwargs)[0]

    def get_output(self, format: str, audio_name: str,
                   hyps: List[DecodeResult], timings_adjustment_ms: float,
                   chunk_size: int) -> str:
        """Per-chunk word alignment + time re-offset (cli/reverb.py:292-321)."""
        def id_to_token(tid):
            return self.tokenizer.detokenize([tid])[1][0]

        if format == 'txt':
            fmt, delim = hyps_to_txt, ' '
        elif format == 'ctm':
            fmt, delim = (lambda p: hyps_to_ctm(audio_name, p)), '\n'
        else:
            raise ValueError('Invalid output format.')
        out = []
        time_shift_ms = 0
        for hyp in hyps:
            times = hyp.times if hyp.times is not None else \
                list(range(len(hyp.tokens)))
            path = ctc_align(hyp.tokens, times, hyp.tokens_confidence,
                             id_to_token, self.output_frame_length,
                             time_shift_ms)
            path = adjust_model_time_offset(path, timings_adjustment_ms)
            time_shift_ms += chunk_size * self.input_frame_length
            out.extend(fmt(path))
        return delim.join(out)


def get_available_models():
    return list(_MODELS.keys())


def download_model(url: str, root):
    import subprocess
    os.makedirs(Path(root).parent, exist_ok=True)
    subprocess.run(['git', 'clone', url, str(root)], check=True)


def load_model(model: str, **kwargs) -> ReverbASR:
    """Load by local path (dir with config.yaml + *.pt/*.npz) or model name
    (downloads from HF on first use — cli/reverb.py:324-372)."""
    if Path(model).exists():
        model_dir = Path(model)
    elif model in _MODELS:
        model_dir = CACHED_MODELS_DIR / model
        config = model_dir / 'config.yaml'
        if not config.exists():
            import shutil
            shutil.rmtree(model_dir, ignore_errors=True)
            download_model(_MODELS[model], model_dir)
    else:
        raise ValueError(
            f"Specify a local model path or one of: "
            f"{','.join(get_available_models())}")
    config_path = (model_dir / 'config.yaml').resolve()
    ckpts = sorted(model_dir.glob('*.npz')) + sorted(model_dir.glob('*.pt'))
    if not ckpts:
        raise FileNotFoundError(f'no checkpoint (*.pt/*.npz) in {model_dir}')
    logging.info('Loading model: config=%s checkpoint=%s', config_path,
                 ckpts[0])
    return ReverbASR(str(config_path), str(ckpts[0]), **kwargs)

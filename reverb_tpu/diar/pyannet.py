"""PyanNet-compatible segmentation + wespeaker-ResNet34-compatible embedding.

Weight-compatible JAX implementations of the model families behind the
released `Revai/reverb-diarization-v{1,2}` checkpoints
(diarization/infer_pyannote3.0.py:33-42): the Revai diar models are
fine-tuned `pyannote/segmentation-3.0` PyanNet segmentation nets, and the
pyannote 3.0 pipeline pairs them with a wespeaker ResNet34 speaker-embedding
net.  `convert_pyannet` / `convert_wespeaker_resnet34` map the torch
state_dicts onto these forwards; tests/test_diar_pyannet.py round-trips
randomly-initialized torch oracles through the converters.

Architectures (public pyannote.audio / asteroid_filterbanks / wespeaker
sources):
  PyanNet: InstanceNorm1d(1) → Encoder(ParamSincFB(80, 251, stride=10)) →
    |·| → [MaxPool1d(3,3) → InstanceNorm1d → leaky_relu] → Conv1d(80,60,5)
    → pool/norm/lrelu → Conv1d(60,60,5) → pool/norm/lrelu → 4-layer
    monolithic BiLSTM(60→128) → 2×Linear(·,128)+lrelu →
    Linear(128, 7 powerset classes) → log_softmax.
  ParamSincFB: 40 (low_hz_, band_hz_) parameter pairs → 80 interleaved
    cos/sin analytic band-pass filters (Pariente et al. 2020).
  wespeaker ResNet34: 2D ResNet (blocks 3/4/6/3, base 32ch) over (1,F,T)
    fbank → temporal statistics pooling (mean‖std over time of the
    flattened channel×freq maps) → Linear → 256-d embedding.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.diar.models import lstm_forward
from reverb_tpu.models.modules import linear

LRELU_SLOPE = 0.01      # torch F.leaky_relu default


def _leaky(x):
    return jax.nn.leaky_relu(x, LRELU_SLOPE)


def instance_norm_1d(p, x, eps: float = 1e-5):
    """torch InstanceNorm1d(affine=True): per-(batch, channel) stats over
    time. x (B, C, T)."""
    mean = jnp.mean(x, axis=2, keepdims=True)
    var = jnp.var(x, axis=2, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p['weight'][None, :, None] + p['bias'][None, :, None]


def param_sinc_fb_filters(low_hz_, band_hz_, kernel_size: int = 251,
                          sample_rate: int = 16000,
                          min_low_hz: float = 50.0,
                          min_band_hz: float = 50.0):
    """asteroid_filterbanks.ParamSincFB filters: (2·n_params, 1, K) with
    interleaved cos/sin phases. low_hz_/band_hz_: (n_params, 1)."""
    low = min_low_hz + jnp.abs(low_hz_)                       # (P,1)
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz_),
                    min_low_hz, sample_rate / 2)
    band = (high - low)[:, 0]                                 # (P,)
    half = kernel_size // 2
    n_ = (2 * jnp.pi * jnp.arange(-half, 0, dtype=jnp.float32)
          / sample_rate)                                      # (half,)
    window = jnp.asarray(np.hamming(kernel_size)[:half].astype(np.float32))
    ft_low = low @ n_[None]                                   # (P, half)
    ft_high = high @ n_[None]

    cos_left = ((jnp.sin(ft_high) - jnp.sin(ft_low)) / (n_ / 2)) * window
    cos_center = 2 * band[:, None]
    cos_f = jnp.concatenate([cos_left, cos_center, cos_left[:, ::-1]],
                            axis=1) / (2 * band[:, None])
    sin_left = ((jnp.cos(ft_low) - jnp.cos(ft_high)) / (n_ / 2)) * window
    sin_center = jnp.zeros_like(cos_center)
    sin_f = jnp.concatenate([sin_left, sin_center, -sin_left[:, ::-1]],
                            axis=1) / (2 * band[:, None])
    filt = jnp.stack([cos_f, sin_f], axis=1)                  # (P, 2, K)
    return filt.reshape(-1, 1, kernel_size)                   # (2P, 1, K)


@dataclasses.dataclass(frozen=True)
class PyanNetConfig:
    sample_rate: int = 16000
    sinc_stride: int = 10
    sinc_kernel: int = 251
    num_classes: int = 7        # 3-speaker powerset

    @property
    def frame_stride(self):     # samples per output frame (3 pools of 3)
        return self.sinc_stride * 27


def pyannet_sincnet(p, wave, cfg: PyanNetConfig):
    """wave (B, T) → (B, 60, T') — pyannote.audio SincNet.forward."""
    x = instance_norm_1d(p['wav_norm1d'], wave[:, None, :])
    filt = param_sinc_fb_filters(p['sinc']['low_hz_'], p['sinc']['band_hz_'],
                                 cfg.sinc_kernel, cfg.sample_rate)
    x = jax.lax.conv_general_dilated(
        x, filt, window_strides=(cfg.sinc_stride,), padding='VALID',
        dimension_numbers=('NCH', 'OIH', 'NCH'),
        precision=jax.lax.Precision.HIGHEST)
    x = jnp.abs(x)
    for i in range(3):
        if i > 0:
            w = p[f'conv{i}']['weight']
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1,), padding='VALID',
                dimension_numbers=('NCH', 'OIH', 'NCH'),
                precision=jax.lax.Precision.HIGHEST)
            x = x + p[f'conv{i}']['bias'][None, :, None]
        x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                  (1, 1, 3), (1, 1, 3), 'VALID')
        x = _leaky(instance_norm_1d(p[f'norm{i}'], x))
    return x


def pyannet_forward(p, wave, cfg: PyanNetConfig = PyanNetConfig()):
    """wave (B, T) float32 → (B, T', C) powerset log-probs (PyanNet.forward)."""
    x = pyannet_sincnet(p['sincnet'], wave, cfg)              # (B,60,T')
    x = x.transpose(0, 2, 1)                                  # (B,T',60)
    for lp in p['lstm']:
        fwd = lstm_forward(lp['fwd'], x)
        bwd = lstm_forward(lp['bwd'], x[:, ::-1])[:, ::-1]
        x = jnp.concatenate([fwd, bwd], axis=-1)
    for lin in p['linear']:
        x = _leaky(linear(lin, x))
    return jax.nn.log_softmax(linear(p['classifier'], x), axis=-1)


def convert_pyannet(state: Dict[str, np.ndarray]) -> Dict:
    """pyannote PyanNet state_dict → param tree for `pyannet_forward`.

    Key map (pyannote/segmentation-3.0 checkpoint layout):
      sincnet.wav_norm1d.{weight,bias}
      sincnet.conv1d.0.filterbank.{low_hz_,band_hz_}
      sincnet.conv1d.{1,2}.{weight,bias}, sincnet.norm1d.{0,1,2}.{weight,bias}
      lstm.weight_ih_l{k}[_reverse], lstm.weight_hh_l{k}[_reverse],
      lstm.bias_ih_l{k}[_reverse], lstm.bias_hh_l{k}[_reverse]
      linear.{0,1}.{weight,bias}, classifier.{weight,bias}
    """
    g = {k: np.asarray(v) for k, v in state.items()}

    def ln(prefix):
        return {'weight': jnp.asarray(g[f'{prefix}.weight']),
                'bias': jnp.asarray(g[f'{prefix}.bias'])}

    sincnet = {
        'wav_norm1d': ln('sincnet.wav_norm1d'),
        'sinc': {'low_hz_': jnp.asarray(
                     g['sincnet.conv1d.0.filterbank.low_hz_']),
                 'band_hz_': jnp.asarray(
                     g['sincnet.conv1d.0.filterbank.band_hz_'])},
        'conv1': {'weight': jnp.asarray(g['sincnet.conv1d.1.weight']),
                  'bias': jnp.asarray(g['sincnet.conv1d.1.bias'])},
        'conv2': {'weight': jnp.asarray(g['sincnet.conv1d.2.weight']),
                  'bias': jnp.asarray(g['sincnet.conv1d.2.bias'])},
        'norm0': ln('sincnet.norm1d.0'),
        'norm1': ln('sincnet.norm1d.1'),
        'norm2': ln('sincnet.norm1d.2'),
    }
    n_layers = 1 + max(int(k.split('_l')[-1].replace('_reverse', ''))
                       for k in g if k.startswith('lstm.weight_ih_l'))
    lstm = []
    for k in range(n_layers):
        def one(direction):
            sfx = f'l{k}' + ('_reverse' if direction == 'bwd' else '')
            return {'w_ih': jnp.asarray(g[f'lstm.weight_ih_{sfx}']),
                    'w_hh': jnp.asarray(g[f'lstm.weight_hh_{sfx}']),
                    'b': jnp.asarray(g[f'lstm.bias_ih_{sfx}']
                                     + g[f'lstm.bias_hh_{sfx}'])}
        lstm.append({'fwd': one('fwd'), 'bwd': one('bwd')})
    n_lin = 1 + max(int(k.split('.')[1]) for k in g
                    if k.startswith('linear.'))
    lin = [{'weight': jnp.asarray(g[f'linear.{i}.weight']),
            'bias': jnp.asarray(g[f'linear.{i}.bias'])}
           for i in range(n_lin)]
    return {'sincnet': sincnet, 'lstm': lstm, 'linear': lin,
            'classifier': {'weight': jnp.asarray(g['classifier.weight']),
                           'bias': jnp.asarray(g['classifier.bias'])}}


def load_pyannet_checkpoint(path: str) -> Dict:
    """Load a pyannote .ckpt/.bin (lightning or bare state_dict)."""
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    state = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) else ckpt
    state = {k.replace('model.', '', 1) if k.startswith('model.') else k:
             v.numpy() if hasattr(v, 'numpy') else np.asarray(v)
             for k, v in state.items()}
    return convert_pyannet(state)


# --------------------- wespeaker ResNet34 embedding ---------------------

def _bn(p, x, eps: float = 1e-5):
    """Inference BatchNorm2d over (B, C, F, T)."""
    scale = (p['weight'] * jax.lax.rsqrt(p['running_var'] + eps))
    shift = p['bias'] - p['running_mean'] * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _conv2d(w, x, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
        precision=jax.lax.Precision.HIGHEST)


def _basic_block(p, x, stride: int):
    """wespeaker BasicBlock: conv3x3/bn/relu → conv3x3/bn + shortcut."""
    y = jax.nn.relu(_bn(p['bn1'], _conv2d(p['conv1']['weight'], x, stride)))
    y = _bn(p['bn2'], _conv2d(p['conv2']['weight'], y, 1))
    if 'shortcut' in p:
        x = _bn(p['shortcut']['bn'],
                jax.lax.conv_general_dilated(
                    x, p['shortcut']['conv']['weight'],
                    window_strides=(stride, stride), padding=[(0, 0), (0, 0)],
                    dimension_numbers=('NCHW', 'OIHW', 'NCHW'),
                    precision=jax.lax.Precision.HIGHEST))
    return jax.nn.relu(y + x)


@dataclasses.dataclass(frozen=True)
class ResNet34Config:
    feat_dim: int = 80
    m_channels: int = 32
    embed_dim: int = 256
    block_counts: tuple = (3, 4, 6, 3)


def resnet34_forward(p, feats, feat_lens=None,
                     cfg: ResNet34Config = ResNet34Config()):
    """feats (B, T, F) fbank → L2-normalized (B, E) embedding.

    wespeaker speaker_resnet: input (B,1,F,T), conv3x3 stem, 4 stages with
    strides (1,2,2,2), temporal-stats pooling (mean‖std over T of the
    (C·F') map), seg_1 linear → embedding.  feat_lens masks zero-padded
    frames out of the pooled statistics (batched variable-length windows)."""
    x = feats.transpose(0, 2, 1)[:, None]                    # (B,1,F,T)
    x = jax.nn.relu(_bn(p['bn1'], _conv2d(p['conv1']['weight'], x, 1)))
    for si, blocks in enumerate(p['layers']):
        for bi, bp in enumerate(blocks):
            stride = (1 if si == 0 else 2) if bi == 0 else 1
            x = _basic_block(bp, x, stride)
    B, C, F, T = x.shape
    flat = x.reshape(B, C * F, T)
    if feat_lens is not None:
        t_lens = jnp.maximum((feat_lens + 7) // 8, 1)         # 3 stride-2s
        mask = (jnp.arange(T)[None, :] < t_lens[:, None])[:, None, :]
        cnt = jnp.maximum(jnp.sum(mask, axis=2), 1)
        mean = jnp.sum(jnp.where(mask, flat, 0.0), axis=2) / cnt
        var = jnp.sum(jnp.where(mask, (flat - mean[:, :, None]) ** 2, 0.0),
                      axis=2) / cnt
    else:
        mean = jnp.mean(flat, axis=2)
        var = jnp.var(flat, axis=2)
    std = jnp.sqrt(jnp.clip(var, 1e-7, None))
    stats = jnp.concatenate([mean, std], axis=1)
    emb = linear(p['seg_1'], stats)
    return emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)


def convert_wespeaker_resnet34(state: Dict[str, np.ndarray]) -> Dict:
    """wespeaker ResNet34 state_dict → param tree for `resnet34_forward`.
    Keys: conv1.weight, bn1.*, layer{1..4}.{i}.conv1/bn1/conv2/bn2
    (+ .downsample.0/1 on stage-entry blocks), seg_1.{weight,bias}."""
    g = {k: np.asarray(v) for k, v in state.items()}

    def bn(prefix):
        return {k: jnp.asarray(g[f'{prefix}.{k}']) for k in
                ('weight', 'bias', 'running_mean', 'running_var')}

    def block(prefix):
        p = {'conv1': {'weight': jnp.asarray(g[f'{prefix}.conv1.weight'])},
             'bn1': bn(f'{prefix}.bn1'),
             'conv2': {'weight': jnp.asarray(g[f'{prefix}.conv2.weight'])},
             'bn2': bn(f'{prefix}.bn2')}
        if f'{prefix}.downsample.0.weight' in g:
            p['shortcut'] = {
                'conv': {'weight': jnp.asarray(
                    g[f'{prefix}.downsample.0.weight'])},
                'bn': bn(f'{prefix}.downsample.1')}
        return p

    layers = []
    for si in range(1, 5):
        blocks = []
        bi = 0
        while f'layer{si}.{bi}.conv1.weight' in g:
            blocks.append(block(f'layer{si}.{bi}'))
            bi += 1
        layers.append(blocks)
    return {'conv1': {'weight': jnp.asarray(g['conv1.weight'])},
            'bn1': bn('bn1'),
            'layers': layers,
            'seg_1': {'weight': jnp.asarray(g['seg_1.weight']),
                      'bias': jnp.asarray(g['seg_1.bias'])}}

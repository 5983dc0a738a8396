"""Model registry: config-driven model construction, the `init_model` API.

Parity: asr/wenet/utils/init_model.py:50-277 — a string registry dispatching
on configs['model'] / configs['encoder'] / configs['decoder'] so every model
family is reachable from a YAML config alone:

  model: asr_model (default) | transducer | paraformer | ctl_model |
         bestrq | whisper
  encoder: conformer | transformer | branchformer | e_branchformer |
           squeezeformer  (asr_model families)

Each entry returns a `ModelBundle` — (kind, cfg, params, loss_fn) — with a
uniform `loss_fn(params, batch, rng) → {'loss': ..., ...}` so the trainer is
model-agnostic, mirroring how the reference trains every family through
`ASRModel.forward(batch)`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.models.asr_model import (ModelConfig, compute_loss,
                                         init_decoder_params, init_params)
from reverb_tpu.models.decoder import DecoderConfig, decoder_forward
from reverb_tpu.models.modules import Rngs, init_linear
from reverb_tpu.utils.common import add_sos_eos, reverse_sequence, th_accuracy


@dataclasses.dataclass
class ModelBundle:
    kind: str
    cfg: Any
    params: Dict
    loss_fn: Callable        # (params, batch, rng) -> metrics dict w/ 'loss'


def _dataclass_kwargs(cls, conf: Dict) -> Dict:
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in conf.items() if k in fields}


# ------------------------- hybrid loss over alt encoders -------------------

def _hybrid_loss(encode_fn, mcfg: ModelConfig):
    """CTC + label-smoothed attention loss over a pluggable encoder — the
    asr_model.forward math (asr_model.py:131-208) with encode_fn swapped."""

    def loss(params, batch, rng=None):
        rngs = Rngs(rng) if rng is not None else None
        enc, mask = encode_fn(params, batch['feats'].astype(jnp.float32),
                              batch['feats_lengths'], rngs)
        enc_lens = jnp.sum(mask[:, 0, :], axis=-1)
        text, text_lens = batch['target'], batch['target_lengths']
        loss_ctc = ctc_mod.ctc_loss(
            params['ctc'], enc, enc_lens,
            jnp.where(text == mcfg.ignore_id, 0, text), text_lens,
            blank_id=mcfg.blank_id) if mcfg.ctc_weight != 0.0 else None
        loss_att, acc = None, None
        if mcfg.ctc_weight != 1.0:
            ys_in, ys_out = add_sos_eos(text, text_lens, mcfg.sos, mcfg.eos,
                                        mcfg.ignore_id)
            r_text = reverse_sequence(text, text_lens, mcfg.ignore_id)
            r_ys_in, _ = add_sos_eos(r_text, text_lens, mcfg.sos, mcfg.eos,
                                     mcfg.ignore_id)
            l_x, _ = decoder_forward(params['decoder'], enc, mask, ys_in,
                                     text_lens + 1, r_ys_in,
                                     mcfg.reverse_weight, mcfg.decoder,
                                     rngs=rngs)
            loss_att = ctc_mod.label_smoothing_loss(
                l_x, ys_out, text_lens + 1, mcfg.lsm_weight, mcfg.vocab_size,
                mcfg.ignore_id, mcfg.length_normalized_loss)
            acc = th_accuracy(l_x, ys_out, mcfg.ignore_id)
        if loss_ctc is None:
            total = loss_att
        elif loss_att is None:
            total = loss_ctc
        else:
            total = (mcfg.ctc_weight * loss_ctc
                     + (1 - mcfg.ctc_weight) * loss_att)
        return {'loss': total, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
                'th_accuracy': acc}

    return loss


def _alt_encoder_bundle(configs, rng, cmvn, kind: str) -> ModelBundle:
    from reverb_tpu.models import encoders_alt as alt
    enc_conf = dict(configs.get('encoder_conf', {}))
    enc_conf['input_size'] = configs.get('input_dim', 80)
    vocab = configs.get('output_dim') or configs['vocab_size']
    model_conf = configs.get('model_conf', {}) or {}

    if kind in ('branchformer', 'e_branchformer'):
        ecfg = alt.BranchformerConfig(
            e_branchformer=(kind == 'e_branchformer'),
            **_dataclass_kwargs(alt.BranchformerConfig, enc_conf))
        k1 = jax.random.fold_in(rng, 1)
        enc_params = alt.init_branchformer(k1, ecfg)

        def encode(params, feats, lens, rngs):
            return alt.branchformer_forward(params['encoder'], feats, lens,
                                            ecfg, cmvn=cmvn, rngs=rngs)
    elif kind == 'squeezeformer':
        ecfg = alt.SqueezeformerConfig(
            **_dataclass_kwargs(alt.SqueezeformerConfig, enc_conf))
        k1 = jax.random.fold_in(rng, 1)
        enc_params = alt.init_squeezeformer(k1, ecfg)

        def encode(params, feats, lens, rngs):
            return alt.squeezeformer_forward(params['encoder'], feats, lens,
                                             ecfg, cmvn=cmvn, rngs=rngs)
    elif kind == 'efficient_conformer':
        for k in ('stride_layer_idx', 'stride'):
            if k in enc_conf and isinstance(enc_conf[k], list):
                enc_conf[k] = tuple(enc_conf[k])
        ecfg = alt.EfficientConformerConfig(
            **_dataclass_kwargs(alt.EfficientConformerConfig, enc_conf))
        k1 = jax.random.fold_in(rng, 1)
        enc_params = alt.init_efficient_conformer(k1, ecfg)

        def encode(params, feats, lens, rngs):
            return alt.efficient_conformer_forward(
                params['encoder'], feats, lens, ecfg, cmvn=cmvn, rngs=rngs)
    else:
        raise ValueError(f'unknown alt encoder {kind!r}')

    dec_conf = dict(configs.get('decoder_conf', {}))
    dcfg = DecoderConfig(vocab_size=vocab,
                         encoder_output_size=ecfg.output_size,
                         decoder_type='bitransformer'
                         if 'bitransformer' in configs.get('decoder', '')
                         else 'transformer',
                         **_dataclass_kwargs(DecoderConfig, dec_conf))
    mcfg = ModelConfig(
        vocab_size=vocab,
        encoder=None, decoder=dcfg,
        ctc_weight=model_conf.get('ctc_weight', 0.3),
        lsm_weight=model_conf.get('lsm_weight', 0.1),
        reverse_weight=model_conf.get('reverse_weight', 0.0),
        sos=vocab - 1, eos=vocab - 1)
    k2, k3 = jax.random.split(jax.random.fold_in(rng, 2))
    params = {'encoder': enc_params,
              'decoder': init_decoder_params(k2, dcfg),
              'ctc': {'ctc_lo': init_linear(k3, ecfg.output_size, vocab)}}
    return ModelBundle(kind, (ecfg, mcfg), params, _hybrid_loss(encode, mcfg))


# ------------------------------ families ------------------------------

def _asr_bundle(configs, rng, cmvn) -> ModelBundle:
    cfg = ModelConfig.from_config(configs)
    ds_conf = configs.get('dataset_conf', {}) or {}
    with_adaptor = bool((ds_conf.get('deep_bias_conf') or {})
                        .get('deep_biasing', False))
    params = init_params(rng, cfg, cmvn=cmvn,
                         with_context_adaptor=with_adaptor)

    def loss(params, batch, rng=None):
        return compute_loss(params, cfg, batch, rng=rng)

    return ModelBundle('asr_model', cfg, params, loss)


def _k2_bundle(configs, rng, cmvn) -> ModelBundle:
    """K2Model (k2/model.py:27, init_model.py:93): ASRModel with the CTC
    term replaced by a TPU-native LF-MMI loss (models/k2_model.py)."""
    from reverb_tpu.models.k2_model import LfmmiResources, lfmmi_ctc_loss_fn
    cfg = ModelConfig.from_config(configs)
    model_conf = configs.get('model_conf', {}) or {}
    lfmmi_dir = model_conf.get('lfmmi_dir', '')
    params = init_params(rng, cfg, cmvn=cmvn)
    ctc_override = None
    if lfmmi_dir:                                  # k2/model.py:53-55
        res = LfmmiResources(lfmmi_dir, cfg.vocab_size, cfg.blank_id)
        ctc_override = lfmmi_ctc_loss_fn(res)

    def loss(params, batch, rng=None):
        return compute_loss(params, cfg, batch, rng=rng,
                            ctc_loss_fn=ctc_override)

    return ModelBundle('k2_model', cfg, params, loss)


def _transducer_bundle(configs, rng, cmvn) -> ModelBundle:
    """Transducer (transducer/transducer.py:19): conformer encoder +
    predictor + joint; loss = transducer_weight·rnnt + ctc_weight·ctc."""
    from reverb_tpu.models.asr_model import forward_encoder
    from reverb_tpu.models.transducer import (TransducerConfig,
                                              init_transducer,
                                              transducer_loss)
    acfg = ModelConfig.from_config(configs)
    model_conf = configs.get('model_conf', {}) or {}
    w_t = model_conf.get('transducer_weight', 0.75)
    w_ctc = model_conf.get('ctc_weight', 0.25)
    pred_conf = configs.get('predictor_conf', {}) or {}
    joint_conf = configs.get('joint_conf', {}) or {}
    tcfg = TransducerConfig(
        vocab_size=acfg.vocab_size,
        blank_id=acfg.blank_id,
        encoder_output_size=acfg.encoder.output_size,
        predictor=configs.get('predictor', 'rnn'),
        **_dataclass_kwargs(TransducerConfig,
                            {**pred_conf, **joint_conf}))
    # bidirectional transducer: second predictor+joint scores the
    # time-reversed encoder stream against reversed labels, combined
    # 0.7·L2R + 0.3·R2L (transducer_espnet/bitransducer.py:12-110)
    bi = (configs.get('model') == 'bitransducer'
          or bool(model_conf.get('use_bitransducer')))
    w_r = model_conf.get('bitransducer_r_weight', 0.3)
    k1, k2, k3 = jax.random.split(rng, 3)
    params = init_params(k1, acfg, cmvn=cmvn)
    params.update(init_transducer(k2, tcfg))
    if bi:
        rparams = init_transducer(k3, tcfg)
        params['predictor_r'] = rparams['predictor']
        params['joint_r'] = rparams['joint']

    def loss(params, batch, rng=None):
        from reverb_tpu.utils.common import reverse_sequence
        rngs = Rngs(rng) if rng is not None else None
        enc, mask = forward_encoder(params, acfg, batch['feats'],
                                    batch['feats_lengths'],
                                    batch.get('cat_embs')
                                    if acfg.lsl_enc else None, rngs)
        enc_lens = jnp.sum(mask[:, 0, :], axis=-1).astype(jnp.int32)
        text, text_lens = batch['target'], batch['target_lengths']
        labels = jnp.where(text == acfg.ignore_id, 0, text)
        l_rnnt = transducer_loss(params, enc, enc_lens, labels, text_lens,
                                 tcfg)
        if bi:
            enc_r = reverse_sequence(enc, enc_lens, 0.0)
            labels_r = reverse_sequence(labels, text_lens, 0)
            l_rnnt_r = transducer_loss(
                {'predictor': params['predictor_r'],
                 'joint': params['joint_r']},
                enc_r, enc_lens, labels_r, text_lens, tcfg)
            l_rnnt = (1.0 - w_r) * l_rnnt + w_r * l_rnnt_r
        l_ctc = ctc_mod.ctc_loss(params['ctc'], enc, enc_lens, labels,
                                 text_lens, blank_id=acfg.blank_id) \
            if w_ctc else 0.0
        return {'loss': w_t * l_rnnt + w_ctc * l_ctc, 'loss_rnnt': l_rnnt,
                'loss_ctc': l_ctc}

    return ModelBundle('bitransducer' if bi else 'transducer', (acfg, tcfg),
                       params, loss)


def sanm_configs(configs):
    """(SanmConfig, CifConfig) from a wenet-converted paraformer config.yaml
    — shared by the training bundle and the serving CLI wrapper."""
    from reverb_tpu.models.paraformer import CifConfig
    from reverb_tpu.models.sanm import SanmConfig

    enc_conf = dict(configs.get('encoder_conf', {}) or {})
    dec_conf = dict(configs.get('decoder_conf', {}) or {})
    vocab = configs.get('output_dim') or configs['vocab_size']
    lfr_conf = configs.get('lfr_conf', {}) or {}
    m = int(lfr_conf.get('lfr_m', 7))
    scfg = SanmConfig(
        input_size=configs.get('input_dim', 80) * m,
        output_size=enc_conf.get('output_size', 512),
        attention_heads=enc_conf.get('attention_heads', 4),
        linear_units=enc_conf.get('linear_units', 2048),
        num_blocks=enc_conf.get('num_blocks', 50),
        decoder_blocks=dec_conf.get('num_blocks', 16),
        vocab_size=vocab,
        kernel_size=enc_conf.get('kernel_size', 11),
        sanm_shift=enc_conf.get('sanm_shfit', enc_conf.get('sanm_shift', 0)),
        dropout_rate=enc_conf.get('dropout_rate', 0.1),
        lfr_m=m, lfr_n=int(lfr_conf.get('lfr_n', 6)))
    cif_kwargs = _dataclass_kwargs(
        CifConfig, dict(configs.get('cif_conf',
                                    configs.get('predictor_conf', {})) or {}))
    cif_kwargs['idim'] = scfg.output_size
    return scfg, CifConfig(**cif_kwargs)


def _sanm_paraformer_bundle(configs, rng, cmvn) -> ModelBundle:
    """Ali-Paraformer (paraformer/paraformer.py:105-293): LFR → SanmEncoder →
    CIF predictor → glancing sampler → SanmDecoder; loss = CE + quantity L1
    (+ optional CTC).  The tp (timestamp-predictor) branch is inference-only
    here (decode/paraformer_search.py); its quantity term duplicates the
    main one for non-timestamped training."""
    from reverb_tpu.models.paraformer import cif_alphas, cif_fire
    from reverb_tpu.models.sanm import (init_sanm_decoder,
                                        init_sanm_encoder,
                                        sanm_decoder_forward,
                                        sanm_encoder_forward)
    from reverb_tpu.utils.common import make_pad_mask

    scfg, cif = sanm_configs(configs)
    vocab = scfg.vocab_size
    model_conf = configs.get('model_conf', {}) or {}
    w_ctc = model_conf.get('ctc_weight', 0.0)
    sampling_ratio = model_conf.get('sampling_ratio', 0.75)
    use_sampler = model_conf.get('sampler', True)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    from reverb_tpu.models.paraformer import init_cif
    params = {'encoder': init_sanm_encoder(k1, scfg),
              'decoder': init_sanm_decoder(k2, scfg),
              'predictor': init_cif(k3, cif)}
    if w_ctc:
        params['ctc'] = {'ctc_lo': init_linear(k4, scfg.output_size, vocab)}
    cmvn_t = None
    if cmvn is not None:
        # CMVN stats are over the post-LFR stacked dim for sanm models
        mean, istd = cmvn
        if np.asarray(mean).shape[-1] == scfg.input_size:
            cmvn_t = (jnp.asarray(mean), jnp.asarray(istd))

    def loss(params, batch, rng=None):
        rngs = Rngs(rng) if rng is not None else None
        enc, mask = sanm_encoder_forward(params['encoder'], batch['feats'],
                                         batch['feats_lengths'], scfg,
                                         cmvn=cmvn_t, rngs=rngs)
        text, text_lens = batch['target'], batch['target_lengths']
        labels = jnp.where(text == -1, 0, text)
        B, U = labels.shape
        tgt_mask = ~make_pad_mask(text_lens, U)                  # (B,U)

        alphas = cif_alphas(params['predictor'], enc, mask, cif)
        token_num = jnp.sum(alphas, axis=1)
        scale = text_lens.astype(jnp.float32) / jnp.maximum(token_num, 1e-4)
        acoustic, _ = cif_fire(enc, alphas * scale[:, None], U,
                               cif.threshold)                    # (B,U,D)

        if use_sampler:
            # glancing sampler (paraformer.py:238-276): where the frozen
            # decoder errs, mix in GT embeddings at sampling_ratio
            emb_w = params['decoder']['embed']['0']['weight']
            gt_emb = emb_w[labels]                               # (B,U,D)
            dec0 = jax.lax.stop_gradient(sanm_decoder_forward(
                params['decoder'], enc, mask, acoustic, text_lens, scfg))
            pred = jnp.argmax(dec0, axis=-1)
            same = jnp.sum((pred == labels) & tgt_mask, axis=1)
            target_num = ((text_lens - same).astype(jnp.float32)
                          * sampling_ratio).astype(jnp.int32)
            r = jax.random.uniform(rng if rng is not None
                                   else jax.random.PRNGKey(0), (B, U))
            r = jnp.where(tgt_mask, r, jnp.inf)   # randperm over valid slots
            ranks = jnp.argsort(jnp.argsort(r, axis=1), axis=1)
            replace = (ranks < target_num[:, None]) & tgt_mask
            sematic = jnp.where(replace[:, :, None], gt_emb, acoustic)
            sematic = sematic * tgt_mask[:, :, None]
        else:
            sematic = acoustic * tgt_mask[:, :, None]

        dec_out = sanm_decoder_forward(params['decoder'], enc, mask, sematic,
                                       text_lens, scfg, rngs=rngs)
        loss_att = ctc_mod.label_smoothing_loss(
            dec_out, jnp.where(tgt_mask, labels, -1), text_lens,
            model_conf.get('lsm_weight', 0.1), vocab, -1,
            model_conf.get('length_normalized_loss', False))
        loss_quantity = (jnp.sum(jnp.abs(token_num
                                         - text_lens.astype(jnp.float32)))
                         / jnp.maximum(jnp.sum(text_lens), 1))
        total = loss_att + loss_quantity
        out = {'loss_decoder': loss_att, 'loss_quantity': loss_quantity}
        if w_ctc:
            enc_lens = jnp.sum(mask[:, 0, :], axis=-1)
            l_ctc = ctc_mod.ctc_loss(params['ctc'], enc, enc_lens, labels,
                                     text_lens)
            total = total + w_ctc * l_ctc
            out['loss_ctc'] = l_ctc
        out['loss'] = total
        return out

    return ModelBundle('paraformer', scfg, params, loss)


def _paraformer_bundle(configs, rng, cmvn) -> ModelBundle:
    from reverb_tpu.models.asr_model import forward_encoder
    from reverb_tpu.models.paraformer import (CifConfig, ParaformerConfig,
                                              init_paraformer_head,
                                              paraformer_loss)
    if configs.get('encoder') == 'sanm_encoder':
        return _sanm_paraformer_bundle(configs, rng, cmvn)
    acfg = ModelConfig.from_config(configs)
    pconf = dict(configs.get('paraformer_conf', {}) or {})
    cif_kwargs = _dataclass_kwargs(CifConfig, pconf.pop('cif_conf', {}) or {})
    cif_kwargs['idim'] = acfg.encoder.output_size
    cif = CifConfig(**cif_kwargs)
    pcfg = ParaformerConfig(
        vocab_size=acfg.vocab_size, cif=cif,
        **_dataclass_kwargs(ParaformerConfig,
                            dict(pconf,
                                 encoder_output_size=acfg.encoder.output_size)))
    k1, k2 = jax.random.split(rng)
    params = init_params(k1, acfg, cmvn=cmvn)
    params.update(init_paraformer_head(k2, pcfg))

    def loss(params, batch, rng=None):
        rngs = Rngs(rng) if rng is not None else None
        enc, mask = forward_encoder(params, acfg, batch['feats'],
                                    batch['feats_lengths'], None, rngs)
        text, text_lens = batch['target'], batch['target_lengths']
        return paraformer_loss(params, enc, mask,
                               jnp.where(text == acfg.ignore_id, 0, text),
                               text_lens, pcfg, ignore_id=acfg.ignore_id)

    return ModelBundle('paraformer', (acfg, pcfg), params, loss)


def _ctl_bundle(configs, rng, cmvn) -> ModelBundle:
    from reverb_tpu.models.ctl import ctl_compute_loss
    cfg = ModelConfig.from_config(configs)
    params = init_params(rng, cfg, cmvn=cmvn)
    model_conf = configs.get('model_conf', {}) or {}

    def loss(params, batch, rng=None):
        return ctl_compute_loss(
            params, cfg, batch, rng=rng,
            ctl_weight=model_conf.get('ctl_weight', 1.0),
            temperature=model_conf.get('logit_temp',
                                       model_conf.get('temperature', 0.1)),
            n_negatives=model_conf.get('n_negatives', 0))

    return ModelBundle('ctl_model', cfg, params, loss)


def _ssl_quantizer_window(acfg):
    """BestRQ stacks encoder.embed.right_context+1 frames with
    stride=subsampling_rate so the quantized-target length equals the
    encoder output length (bestrq_model.py __init__)."""
    stride = acfg.encoder.subsampling_rate
    return {1: 1, 4: 7, 6: 11, 8: 15}.get(stride, stride), stride


def _ssl_normalize(params, feats):
    """The reference applies signal CMVN itself and disables the encoder's
    (bestrq_model.py forward): normalize once, then encode without CMVN."""
    g = params.get('encoder', {}).get('global_cmvn')
    if g is None:
        return params, feats
    enc = {k: v for k, v in params['encoder'].items() if k != 'global_cmvn'}
    return dict(params, encoder=enc), (feats - g['mean']) * g['istd']


def _bestrq_bundle(configs, rng, cmvn) -> ModelBundle:
    from reverb_tpu.models.asr_model import forward_encoder
    from reverb_tpu.models.ssl import (BestRQConfig, bestrq_loss, init_bestrq)
    acfg = ModelConfig.from_config(configs)
    stack, stride = _ssl_quantizer_window(acfg)
    bcfg = BestRQConfig(
        **_dataclass_kwargs(BestRQConfig,
                            dict({'stack_frames': stack, 'stride': stride},
                                 **(configs.get('bestrq_conf', {}) or {}),
                                 input_dim=configs.get('input_dim', 80),
                                 encoder_output_size=acfg.encoder.output_size)))
    k1, k2 = jax.random.split(rng)
    params = init_params(k1, acfg, cmvn=cmvn)
    params.update(init_bestrq(k2, bcfg))

    def loss(params, batch, rng=None):
        enc_params, feats = _ssl_normalize(params, batch['feats'])

        def encoder_apply(feats, lens):
            return forward_encoder(enc_params, acfg, feats, lens, None, None)
        return bestrq_loss(params, encoder_apply, feats,
                           batch['feats_lengths'],
                           rng if rng is not None else jax.random.PRNGKey(0),
                           bcfg)

    return ModelBundle('bestrq', (acfg, bcfg), params, loss)


def _wav2vec2_bundle(configs, rng, cmvn) -> ModelBundle:
    from reverb_tpu.models.asr_model import _get_cmvn
    from reverb_tpu.models.ssl import (Wav2vec2Config, init_wav2vec2,
                                       wav2vec2_loss)
    acfg = ModelConfig.from_config(configs)
    wconf = dict(configs.get('wav2vec2_conf', {}) or {})
    wconf.setdefault('codebook_size', wconf.pop('num_embeddings',
                                                wconf.get('codebook_size',
                                                          320)))
    wconf.setdefault('embedding_dim', acfg.encoder.output_size)
    wcfg = Wav2vec2Config(
        **_dataclass_kwargs(Wav2vec2Config,
                            dict(wconf,
                                 encoder_output_size=acfg.encoder.output_size)))
    k1, k2 = jax.random.split(rng)
    params = init_params(k1, acfg, cmvn=cmvn)
    params.update(init_wav2vec2(k2, wcfg))

    def loss(params, batch, rng=None):
        return wav2vec2_loss(
            params, params['encoder'], batch['feats'],
            batch['feats_lengths'],
            rng if rng is not None else jax.random.PRNGKey(0), wcfg,
            acfg.encoder, steps=batch.get('steps', 0),
            cmvn=_get_cmvn(params))

    return ModelBundle('wav2vec2', (acfg, wcfg), params, loss)


def _w2vbert_bundle(configs, rng, cmvn) -> ModelBundle:
    from reverb_tpu.models.asr_model import _get_cmvn
    from reverb_tpu.models.ssl import (W2VBertConfig, Wav2vec2Config,
                                       init_w2vbert, w2vbert_loss)
    acfg = ModelConfig.from_config(configs)
    wconf = dict(configs.get('wav2vec2_conf', {}) or {},
                 **(configs.get('w2vbert_conf', {}) or {}))
    wconf.setdefault('codebook_size', wconf.pop('num_embeddings',
                                                wconf.get('codebook_size',
                                                          320)))
    wconf.setdefault('embedding_dim', acfg.encoder.output_size)
    wcfg = Wav2vec2Config(
        **_dataclass_kwargs(Wav2vec2Config,
                            dict(wconf,
                                 encoder_output_size=acfg.encoder.output_size)))
    nb = acfg.encoder.num_blocks
    bcfg = W2VBertConfig(
        **_dataclass_kwargs(W2VBertConfig,
                            dict({'contrastive_blocks': nb // 2,
                                  'masked_blocks': nb - nb // 2}, **wconf)))
    assert bcfg.contrastive_blocks + bcfg.masked_blocks == nb, \
        (bcfg.contrastive_blocks, bcfg.masked_blocks, nb)
    k1, k2 = jax.random.split(rng)
    params = init_params(k1, acfg, cmvn=cmvn)
    params.update(init_w2vbert(k2, wcfg, bcfg))

    def loss(params, batch, rng=None):
        return w2vbert_loss(
            params, params['encoder'], batch['feats'],
            batch['feats_lengths'],
            rng if rng is not None else jax.random.PRNGKey(0), wcfg, bcfg,
            acfg.encoder, steps=batch.get('steps', 0),
            cmvn=_get_cmvn(params))

    return ModelBundle('w2vbert', (acfg, wcfg, bcfg), params, loss)


def _whisper_bundle(configs, rng, cmvn) -> ModelBundle:
    del cmvn   # whisper uses log-mel without external CMVN
    from reverb_tpu.models.whisper import (WhisperConfig, init_whisper,
                                           whisper_decode, whisper_encode)
    wcfg = WhisperConfig(**_dataclass_kwargs(
        WhisperConfig, dict(configs.get('encoder_conf', {}) or {},
                            **(configs.get('whisper_conf', {}) or {}))))
    params = init_whisper(rng, wcfg)

    def loss(params, batch, rng=None):
        feats = whisper_encode(params['encoder'], batch['feats'], wcfg)
        if 'ys_in' in batch:
            # multitask sot/lang/task prompt targets, prebuilt host-side by
            # utils.common.add_whisper_tokens (utils/common.py:158-237)
            ys_in, ys_out = batch['ys_in'], batch['ys_out']
            logits = whisper_decode(params['decoder'], ys_in, feats, wcfg)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            valid = ys_out != -1
            tgt = jnp.where(valid, ys_out, 0)
            nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
            total = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
                jnp.sum(valid), 1)
            return {'loss': total}
        text, text_lens = batch['target'], batch['target_lengths']
        tokens = jnp.where(text == -1, 0, text)
        logits = whisper_decode(params['decoder'], tokens[:, :-1], feats,
                                wcfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        tgt = tokens[:, 1:]
        valid = (jnp.arange(tgt.shape[1])[None] < (text_lens - 1)[:, None])
        nll = -jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        total = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
            jnp.sum(valid), 1)
        return {'loss': total}

    return ModelBundle('whisper', wcfg, params, loss)


_MODEL_REGISTRY = {
    'asr_model': _asr_bundle,
    'k2_model': _k2_bundle,
    'transducer': _transducer_bundle,
    'bitransducer': _transducer_bundle,
    'paraformer': _paraformer_bundle,
    'ctl_model': _ctl_bundle,
    'bestrq': _bestrq_bundle,
    'wav2vec2': _wav2vec2_bundle,
    'w2vbert': _w2vbert_bundle,
    'whisper': _whisper_bundle,
}

_ALT_ENCODERS = ('branchformer', 'e_branchformer', 'squeezeformer',
                 'efficient_conformer')


def init_model(configs: Dict, rng=None, cmvn: Optional[tuple] = None
               ) -> ModelBundle:
    """Registry dispatch (init_model.py:99-277).  k2-style LF-MMI training
    is covered k2-free by `model: k2_model` (models/k2_model.py); HLG
    decoding by reverb_tpu.decode.hlg."""
    rng = rng if rng is not None else jax.random.PRNGKey(777)
    if cmvn is None:
        # init_model.py:102-104: the GlobalCMVN buffer is part of the model
        # from construction — training MUST normalize with the same stats
        # serving loads, or every trained checkpoint decodes garbage through
        # the CLI (caught by tools/train_smoke.py)
        from reverb_tpu.frontend.cmvn import load_cmvn_from_configs
        cmvn = load_cmvn_from_configs(configs)
    kind = configs.get('model', 'asr_model')
    enc = configs.get('encoder', 'conformer')
    if kind == 'asr_model' and enc in _ALT_ENCODERS:
        return _alt_encoder_bundle(configs, rng, cmvn, enc)
    if kind not in _MODEL_REGISTRY:
        raise ValueError(f'unknown model type {kind!r}; choose from '
                         f'{sorted(_MODEL_REGISTRY)}')
    return _MODEL_REGISTRY[kind](configs, rng, cmvn)

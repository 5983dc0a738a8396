"""ASRModel: hybrid CTC/attention conformer — config, init, loss, forwards.

Parity targets:
  - init_model registry dispatch   asr/wenet/utils/init_model.py:50-277
  - ASRModel.forward (train loss)  asr/wenet/transformer/asr_model.py:131-208
  - _calc_att_loss                 asr_model.py:248-286
  - forward_attention_decoder      asr_model.py:867-978
  - sos/eos = vocab_size-1 unless special_tokens (asr_model.py:79-82)

The model is a (config, params-pytree) pair; every forward is a pure function
so the whole train step jits/pjits cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.models.decoder import (DecoderConfig, decoder_forward)
from reverb_tpu.models.encoder import (EncoderConfig, encoder_forward,
                                       subsampled_len)
from reverb_tpu.models.modules import (Rngs, init_batch_norm, init_conv1d,
                                       init_conv2d, init_embedding,
                                       init_layer_norm, init_linear,
                                       xavier_uniform)
from reverb_tpu.utils.common import (IGNORE_ID, add_sos_eos, reverse_sequence,
                                     th_accuracy)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int
    encoder: EncoderConfig
    decoder: DecoderConfig
    ctc_weight: float = 0.5
    reverse_weight: float = 0.0
    lsm_weight: float = 0.0
    length_normalized_loss: bool = False
    ignore_id: int = IGNORE_ID
    blank_id: int = 0
    sos: int = -1   # resolved in from_config
    eos: int = -1
    lsl_enc: bool = False
    lsl_dec: bool = False
    # filter encoder frames whose CTC argmax is blank before the decoder
    # (asr_model.py:70, 180-184, 220-246); non_spike_loss_weight is accepted
    # but, as in the reference (stored at asr_model.py:89, never read), inert.
    apply_non_blank_embedding: bool = False
    focal_ctc: bool = False
    focal_alpha: float = 0.5
    focal_gamma: float = 2.0
    compute_dtype: Any = jnp.float32
    # joint-decoding lexicon constraint sources (asr_model.py:73-74, 112-127):
    # lexicon lines 'word sw1 sw2 ...' → words + cumulative-prefix set;
    # token file lines 'token id' → id→token map.  Loaded lazily at decode
    # time (decode/api.py) and fed to TimeSyncBeamSearch.
    lexicon_path: Optional[str] = None
    token_path: Optional[str] = None

    @staticmethod
    def from_config(configs: Dict) -> 'ModelConfig':
        """Build from a reference-schema config.yaml dict (SURVEY.md App. A)."""
        vocab_size = configs.get('output_dim') or configs['vocab_size']
        enc_conf = dict(configs.get('encoder_conf', {}))
        input_dim = configs.get('input_dim', 80)

        # LSL wiring: num_langs injected from dataset cat_emb_conf when the
        # pipeline passes cat embs (init_model.py:141-144, 1223-1239)
        num_langs = enc_conf.pop('num_langs', 0)
        ds_conf = configs.get('dataset_conf', {}) or {}
        cat_conf = ds_conf.get('cat_emb_conf', {}) or {}
        if ds_conf.get('pass_cat_emb') and not num_langs:
            num_langs = int(cat_conf.get('emb_len', 2))

        enc_type = configs.get('encoder', 'conformer')
        lsl_encoders = ('lsl_conformer', 'language_specific_conformer')
        if enc_type in lsl_encoders and not num_langs:
            num_langs = int(enc_conf.get('num_langs', 3) or 3)
        enc_fields = {f.name for f in dataclasses.fields(EncoderConfig)}
        enc_kwargs = {k: v for k, v in enc_conf.items() if k in enc_fields}
        encoder = EncoderConfig(
            input_size=input_dim,
            encoder_type='conformer' if 'conformer' in enc_type else 'transformer',
            num_langs=num_langs,
            **enc_kwargs)

        # AMP parity (train_utils.py:598-626): dtype bf16/fp16 → bf16 compute
        # on TPU (f32 master params; per-op weight casts inside linear/conv)
        dtype = str(configs.get('dtype', 'fp32')).lower()
        compute_dtype = jnp.bfloat16 if dtype in ('bf16', 'bfloat16',
                                                  'fp16', 'float16') \
            else jnp.float32

        dec_type = configs.get('decoder', 'bitransformer')
        dec_conf = dict(configs.get('decoder_conf', {}))
        dec_fields = {f.name for f in dataclasses.fields(DecoderConfig)}
        dec_num_langs = num_langs if 'lsl' in dec_type or 'language' in dec_type \
            else dec_conf.pop('num_langs', 0)
        dec_kwargs = {k: v for k, v in dec_conf.items() if k in dec_fields}
        dec_kwargs.setdefault('compute_dtype', compute_dtype)
        decoder = DecoderConfig(
            vocab_size=vocab_size,
            encoder_output_size=encoder.output_size,
            decoder_type='bitransformer' if 'bitransformer' in dec_type
            else 'transformer',
            num_langs=dec_num_langs,
            **dec_kwargs)

        model_conf = configs.get('model_conf', {}) or {}
        special = configs.get('tokenizer_conf', {}).get('special_tokens') or \
            model_conf.get('special_tokens')
        sos = vocab_size - 1
        eos = vocab_size - 1
        if special:
            sos = special.get('<sos>', sos)
            eos = special.get('<eos>', eos)
        focal = configs.get('focal_ctc', {}) or {}
        return ModelConfig(
            compute_dtype=compute_dtype,
            vocab_size=vocab_size,
            encoder=encoder,
            decoder=decoder,
            ctc_weight=model_conf.get('ctc_weight', 0.5),
            reverse_weight=model_conf.get('reverse_weight', 0.0),
            lsm_weight=model_conf.get('lsm_weight', 0.0),
            length_normalized_loss=model_conf.get('length_normalized_loss',
                                                  False),
            apply_non_blank_embedding=model_conf.get(
                'apply_non_blank_embedding', False),
            blank_id=(configs.get('ctc_conf', {}) or {}).get('ctc_blank_id', 0),
            sos=sos, eos=eos,
            lsl_enc=num_langs > 0,
            lsl_dec=dec_num_langs > 0,
            focal_ctc=bool(focal.get('enabled', False)),
            focal_alpha=focal.get('alpha', 0.5),
            focal_gamma=focal.get('gamma', 2.0),
            lexicon_path=model_conf.get('lexicon_path'),
            token_path=model_conf.get('token_path'))

    def with_compute_dtype(self, dtype) -> 'ModelConfig':
        """Replace the activation dtype everywhere it is consulted — the
        top-level config (encoder input cast) AND the nested decoder config
        (the decoder stack's dtype is set from the f32 embedding otherwise)."""
        return dataclasses.replace(
            self, compute_dtype=dtype,
            decoder=dataclasses.replace(self.decoder, compute_dtype=dtype)
            if self.decoder is not None else None)


# ------------------------------ init ------------------------------

def _init_mha(rng, d: int, key_bias: bool, rel_pos: bool, heads: int):
    ks = jax.random.split(rng, 6)
    p = {'linear_q': init_linear(ks[0], d, d),
         'linear_k': init_linear(ks[1], d, d, bias=key_bias),
         'linear_v': init_linear(ks[2], d, d),
         'linear_out': init_linear(ks[3], d, d)}
    if rel_pos:
        p['linear_pos'] = init_linear(ks[4], d, d, bias=False)
        dk = d // heads
        u, v = jax.random.split(ks[5])
        p['pos_bias_u'] = xavier_uniform(u, (heads, dk))
        p['pos_bias_v'] = xavier_uniform(v, (heads, dk))
    return p


def _init_ffn(rng, d: int, hidden: int):
    k1, k2 = jax.random.split(rng)
    return {'w_1': init_linear(k1, d, hidden), 'w_2': init_linear(k2, hidden, d)}


def _init_moe_ffn(rng, d: int, hidden: int, n_expert: int):
    """MoEFFNLayer params (positionwise_feed_forward.py:83-91)."""
    kg, ke = jax.random.split(rng)
    return {'gate': init_linear(kg, d, n_expert, bias=False),
            'experts': [_init_ffn(k, d, hidden)
                        for k in jax.random.split(ke, n_expert)]}


def _init_enc_ffn(rng, cfg: EncoderConfig):
    if cfg.positionwise_layer_type == 'moe':
        return _init_moe_ffn(rng, cfg.output_size, cfg.linear_units,
                             cfg.n_expert)
    return _init_ffn(rng, cfg.output_size, cfg.linear_units)


def _init_conv_module(rng, cfg: EncoderConfig):
    d = cfg.output_size
    ks = jax.random.split(rng, 3)
    return {
        'pointwise_conv1': init_conv1d(ks[0], d, 2 * d, 1),
        'depthwise_conv': init_conv1d(ks[1], d, d, cfg.cnn_module_kernel,
                                      groups=d),
        'pointwise_conv2': init_conv1d(ks[2], d, d, 1),
        'norm': (init_layer_norm(d) if cfg.cnn_module_norm == 'layer_norm'
                 else init_batch_norm(d)),
    }


def _init_conformer_layer(rng, cfg: EncoderConfig, is_lsl: bool):
    d = cfg.output_size
    ks = jax.random.split(rng, 8)
    p = {
        'self_attn': _init_mha(ks[0], d, cfg.key_bias,
                               cfg.selfattention_layer_type == 'rel_selfattn',
                               cfg.attention_heads),
        'feed_forward': _init_enc_ffn(ks[1], cfg),
        'norm_ff': init_layer_norm(d),
        'norm_mha': init_layer_norm(d),
    }
    if cfg.macaron_style:
        p['feed_forward_macaron'] = _init_enc_ffn(ks[2], cfg)
        p['norm_ff_macaron'] = init_layer_norm(d)
    if cfg.use_cnn_module:
        p.update(_init_conv_module(ks[3], cfg))
        p['norm_conv'] = init_layer_norm(d)
        p['norm_final'] = init_layer_norm(d)
    if is_lsl:
        lks = jax.random.split(ks[4], cfg.num_langs)
        p['language_layers'] = [init_linear(k, d, d) for k in lks]
    return p


def _init_transformer_enc_layer(rng, cfg: EncoderConfig):
    d = cfg.output_size
    ks = jax.random.split(rng, 2)
    return {'self_attn': _init_mha(ks[0], d, cfg.key_bias, False,
                                   cfg.attention_heads),
            'feed_forward': _init_enc_ffn(ks[1], cfg),
            'norm1': init_layer_norm(d), 'norm2': init_layer_norm(d)}


def init_encoder_params(rng, cfg: EncoderConfig):
    ks = jax.random.split(rng, cfg.num_blocks + 2)
    d = cfg.output_size
    f = cfg.input_size
    if cfg.input_layer == 'conv2d':
        k1, k2, k3 = jax.random.split(ks[0], 3)
        embed = {'conv': {'0': init_conv2d(k1, 1, d, 3, 3),
                          '2': init_conv2d(k2, d, d, 3, 3)},
                 'out': {'0': init_linear(k3, d * (((f - 1) // 2 - 1) // 2), d)}}
    elif cfg.input_layer == 'linear':
        k1, = jax.random.split(ks[0], 1)
        embed = {'out': {'0': init_linear(k1, f, d), '1': init_layer_norm(d)}}
    else:
        raise NotImplementedError(cfg.input_layer)
    if cfg.encoder_type == 'conformer':
        layers = [
            _init_conformer_layer(ks[i + 1], cfg,
                                  cfg.num_langs > 0 and
                                  (i == 0 or i == cfg.num_blocks - 1))
            for i in range(cfg.num_blocks)]
    else:
        layers = [_init_transformer_enc_layer(ks[i + 1], cfg)
                  for i in range(cfg.num_blocks)]
    return {'embed': embed, 'encoders': layers,
            'after_norm': init_layer_norm(d)}


def _init_decoder_layer(rng, cfg: DecoderConfig, is_lsl: bool):
    d = cfg.encoder_output_size
    ks = jax.random.split(rng, 4)
    p = {'self_attn': _init_mha(ks[0], d, cfg.key_bias, False,
                                cfg.attention_heads),
         'src_attn': _init_mha(ks[1], d, cfg.key_bias, False,
                               cfg.attention_heads),
         'feed_forward': _init_ffn(ks[2], d, cfg.linear_units),
         'norm1': init_layer_norm(d), 'norm2': init_layer_norm(d),
         'norm3': init_layer_norm(d)}
    if is_lsl:
        lks = jax.random.split(ks[3], cfg.num_langs)
        p['language_layers'] = [init_linear(k, d, d) for k in lks]
    return p


def _init_single_decoder(rng, cfg: DecoderConfig, n_blocks: int):
    d = cfg.encoder_output_size
    ks = jax.random.split(rng, n_blocks + 2)
    layers = [
        _init_decoder_layer(ks[i], cfg,
                            cfg.num_langs > 0 and
                            (i == 0 or i == n_blocks - 1))
        for i in range(n_blocks)]
    return {'embed': {'0': init_embedding(ks[-2], cfg.vocab_size, d)},
            'decoders': layers,
            'after_norm': init_layer_norm(d),
            'output_layer': init_linear(ks[-1], d, cfg.vocab_size)}


def init_decoder_params(rng, cfg: DecoderConfig):
    if cfg.decoder_type == 'bitransformer':
        k1, k2 = jax.random.split(rng)
        return {'left_decoder': _init_single_decoder(k1, cfg, cfg.num_blocks),
                'right_decoder': _init_single_decoder(k2, cfg,
                                                      cfg.r_num_blocks)}
    return _init_single_decoder(rng, cfg, cfg.num_blocks)


def init_params(rng, cfg: ModelConfig, cmvn: Optional[tuple] = None,
                with_context_adaptor: bool = False):
    """Full model param tree, torch-state_dict-shaped (SURVEY.md App. B)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    params = {
        'encoder': init_encoder_params(k1, cfg.encoder),
        'decoder': init_decoder_params(k2, cfg.decoder),
        'ctc': {'ctc_lo': init_linear(k3, cfg.encoder.output_size,
                                      cfg.vocab_size)},
    }
    if with_context_adaptor:
        from reverb_tpu.models.context_adaptor import (ContextAdaptorConfig,
                                                       init_context_adaptor)
        params['context_adaptor'] = init_context_adaptor(
            k4, ContextAdaptorConfig(vocab_size=cfg.vocab_size,
                                     output_size=cfg.encoder.output_size))
    if cmvn is not None:
        mean, istd = cmvn
        params['encoder']['global_cmvn'] = {
            'mean': jnp.asarray(mean, jnp.float32),
            'istd': jnp.asarray(istd, jnp.float32)}
    return params


# ------------------------------ forwards ------------------------------

def _get_cmvn(params):
    g = params['encoder'].get('global_cmvn')
    if g is None:
        return None
    return (g['mean'], g['istd'])


def forward_encoder(params, cfg: ModelConfig, feats, feats_lens,
                    cat_embs=None, rngs=None, chunk_rng=None,
                    decoding_chunk_size: int = -1,
                    num_decoding_left_chunks: int = -1,
                    enable_full_context: bool = True):
    """(B,T,F) → (encoder_out (B,T',D), masks (B,1,T'))."""
    feats = feats.astype(cfg.compute_dtype)
    out, masks = encoder_forward(
        params['encoder'], feats, feats_lens, cfg.encoder,
        cat_embs=cat_embs, cmvn=_get_cmvn(params),
        decoding_chunk_size=decoding_chunk_size,
        num_decoding_left_chunks=num_decoding_left_chunks,
        rngs=rngs, chunk_rng=chunk_rng,
        enable_full_context=enable_full_context)
    return out, masks


def filter_blank_embedding(cfg: ModelConfig, ctc_probs, encoder_out,
                           encoder_mask):
    """Keep only encoder frames whose CTC argmax is non-blank
    (asr_model.py:220-246).

    The reference builds python index lists per utterance and re-pads; here we
    compact with a static-shape stable argsort (valid non-blank frames sort to
    the front, everything else to the back), so the op stays jittable and the
    output keeps the (B, T, D) shape with a fresh mask.
    """
    B, T = encoder_out.shape[:2]
    top1 = jnp.argmax(ctc_probs, axis=-1)                      # (B, T)
    valid = encoder_mask[:, 0, :].astype(bool)
    keep = (top1 != cfg.blank_id) & valid                      # (B, T)
    pos = jnp.arange(T)[None, :]
    order = jnp.argsort(jnp.where(keep, pos, pos + T), axis=1)  # stable compact
    new_out = jnp.take_along_axis(encoder_out, order[:, :, None], axis=1)
    new_lens = jnp.sum(keep, axis=1)
    new_out = jnp.where((pos < new_lens[:, None])[:, :, None], new_out, 0.0)
    new_mask = (pos < new_lens[:, None])[:, None, :]
    return new_out, new_mask


def compute_loss(params, cfg: ModelConfig, batch, rng=None,
                 ctc_loss_fn=None):
    """Training loss (asr_model.py:131-208).

    batch: dict with feats (B,T,F), feats_lengths (B,), target (B,L) padded
    with ignore_id, target_lengths (B,), optional cat_embs (B,num_langs).
    Returns dict(loss, loss_att, loss_ctc, th_accuracy).

    ctc_loss_fn(params, encoder_out, encoder_out_lens, text, text_lens)
    optionally replaces the CTC term — the `_forward_ctc` override hook the
    k2 LF-MMI model uses (k2/model.py:58-65).
    """
    rngs = Rngs(rng) if rng is not None else None
    chunk_rng = rngs.next() if rngs else None
    cat_embs = batch.get('cat_embs')
    use_adaptor = 'context_adaptor' in params and 'cv_list' in batch
    if use_adaptor:
        # deep-biasing path (asr_model.py:162-165): encoder layer mix
        # cross-attends to encoded context phrases; result added to output
        from reverb_tpu.models.context_adaptor import (
            ContextAdaptorConfig, context_adaptor_forward, encode_cv)
        ca_cfg = ContextAdaptorConfig(
            vocab_size=cfg.vocab_size,
            output_size=cfg.encoder.output_size)
        feats = batch['feats'].astype(cfg.compute_dtype)
        encoder_out, encoder_mask, layer_outs = encoder_forward(
            params['encoder'], feats, batch['feats_lengths'], cfg.encoder,
            cat_embs=cat_embs if cfg.lsl_enc else None,
            cmvn=_get_cmvn(params), decoding_chunk_size=0, rngs=rngs,
            chunk_rng=chunk_rng, return_layers=True)
        cv_emb = encode_cv(params['context_adaptor'], batch['cv_list'],
                           batch['cv_list_lengths'], ca_cfg)
        encoder_out = encoder_out + context_adaptor_forward(
            params['context_adaptor'], layer_outs, cv_emb, ca_cfg)
    else:
        encoder_out, encoder_mask = forward_encoder(
            params, cfg, batch['feats'], batch['feats_lengths'], cat_embs,
            rngs, chunk_rng, decoding_chunk_size=0)
    return loss_from_encoder(params, cfg, encoder_out, encoder_mask, batch,
                             rngs=rngs, ctc_loss_fn=ctc_loss_fn)


def loss_from_encoder(params, cfg: ModelConfig, encoder_out, encoder_mask,
                      batch, rngs=None, ctc_loss_fn=None):
    """Hybrid CTC/attention loss given a precomputed encoder view.

    The post-encoder half of `compute_loss`; the CTL model
    (asr_model_ctl.py:115-216 forward_full/forward_chunk) runs it once per
    encoder view (full-context and chunk-masked) on the same batch.
    """
    cat_embs = batch.get('cat_embs')
    encoder_out_lens = jnp.sum(encoder_mask[:, 0, :], axis=-1)
    text, text_lens = batch['target'], batch['target_lengths']

    loss_ctc = None
    if ctc_loss_fn is not None and cfg.ctc_weight != 0.0:
        loss_ctc = ctc_loss_fn(params['ctc'], encoder_out, encoder_out_lens,
                               jnp.where(text == cfg.ignore_id, 0, text),
                               text_lens)
    elif cfg.ctc_weight != 0.0:
        loss_ctc = ctc_mod.ctc_loss(
            params['ctc'], encoder_out, encoder_out_lens,
            jnp.where(text == cfg.ignore_id, 0, text), text_lens,
            blank_id=cfg.blank_id, focal=cfg.focal_ctc,
            focal_alpha=cfg.focal_alpha, focal_gamma=cfg.focal_gamma)

    if cfg.apply_non_blank_embedding:
        # token-level embedding for the decoder (asr_model.py:180-184)
        ctc_probs = ctc_mod.ctc_logprobs(params['ctc'], encoder_out)
        encoder_out, encoder_mask = filter_blank_embedding(
            cfg, ctc_probs, encoder_out, encoder_mask)

    loss_att, acc_att = None, None
    if cfg.ctc_weight != 1.0:
        ys_in, ys_out = add_sos_eos(text, text_lens, cfg.sos, cfg.eos,
                                    cfg.ignore_id)
        r_text = reverse_sequence(text, text_lens, cfg.ignore_id)
        r_ys_in, r_ys_out = add_sos_eos(r_text, text_lens, cfg.sos, cfg.eos,
                                        cfg.ignore_id)
        dec_cat = cat_embs if cfg.lsl_dec else None
        l_x, r_x = decoder_forward(
            params['decoder'], encoder_out, encoder_mask, ys_in,
            text_lens + 1, r_ys_in, cfg.reverse_weight, cfg.decoder,
            cat_embs=dec_cat, rngs=rngs)
        loss_att = ctc_mod.label_smoothing_loss(
            l_x, ys_out, text_lens + 1, cfg.lsm_weight, cfg.vocab_size,
            cfg.ignore_id, cfg.length_normalized_loss)
        if cfg.reverse_weight > 0.0:
            r_loss = ctc_mod.label_smoothing_loss(
                r_x, r_ys_out, text_lens + 1, cfg.lsm_weight, cfg.vocab_size,
                cfg.ignore_id, cfg.length_normalized_loss)
            loss_att = (loss_att * (1 - cfg.reverse_weight)
                        + r_loss * cfg.reverse_weight)
        acc_att = th_accuracy(l_x, ys_out, cfg.ignore_id)

    if loss_ctc is None:
        loss = loss_att
    elif loss_att is None:
        loss = loss_ctc
    else:
        loss = cfg.ctc_weight * loss_ctc + (1 - cfg.ctc_weight) * loss_att
    return {'loss': loss, 'loss_att': loss_att, 'loss_ctc': loss_ctc,
            'th_accuracy': acc_att}


def forward_attention_decoder(params, cfg: ModelConfig, hyps_pad, hyps_lens,
                              encoder_out, reverse_weight: float = 0.0,
                              cat_embs=None, encoder_lens=None):
    """Batched rescoring decoder pass (asr_model.py:867-978).

    hyps_pad: (N, L) already sos-prefixed, eos/ignore padded; hyps_lens incl
    sos. encoder_out: (1, T, D) → broadcast to N.  encoder_lens (scalar or
    (1,)) masks padded frames so callers can keep a static full-T shape.
    Returns (log-softmax decoder_out (N,L,V), r_decoder_out (N,L,V) or zeros).
    """
    num_hyps = hyps_pad.shape[0]
    enc = jnp.broadcast_to(encoder_out,
                           (num_hyps,) + encoder_out.shape[1:])
    if encoder_lens is None:
        enc_mask = jnp.ones((num_hyps, 1, enc.shape[1]), dtype=bool)
    else:
        enc_mask = jnp.broadcast_to(
            (jnp.arange(enc.shape[1]) < jnp.reshape(encoder_lens, ()))[None,
                                                                       None],
            (num_hyps, 1, enc.shape[1]))
    # build reversed hyps (asr_model.py:902-953): drop sos, reverse valid
    # region, pad eos, re-prefix sos
    r_body = reverse_sequence(hyps_pad[:, 1:], hyps_lens - 1, cfg.eos)
    r_hyps = jnp.concatenate([hyps_pad[:, :1], r_body], axis=1)
    dec_cat = cat_embs if cfg.lsl_dec else None
    l_x, r_x = decoder_forward(params['decoder'], enc, enc_mask, hyps_pad,
                               hyps_lens, r_hyps, reverse_weight, cfg.decoder,
                               cat_embs=dec_cat)
    l_x = jax.nn.log_softmax(l_x.astype(jnp.float32), axis=-1)
    if reverse_weight > 0.0:
        r_x = jax.nn.log_softmax(r_x.astype(jnp.float32), axis=-1)
    else:
        r_x = jnp.zeros_like(l_x)
    return l_x, r_x

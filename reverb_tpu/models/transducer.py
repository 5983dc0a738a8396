"""Transducer (RNN-T) model family.

Capability parity with asr/wenet/transducer/ (SURVEY.md §2.4):
  - predictors: RNN (LSTM), Embedding (stateless n-gram), Conv1d
    (predictor.py:60-300)
  - TransducerJoint: enc_proj + pred_proj → activation → vocab (joint.py:8)
  - Transducer loss: exact α-recursion over the (T, U) lattice — scan over T
    with a log-semiring associative scan over U (one fused XLA program; the
    reference delegates to torchaudio's C++ rnnt_loss)
  - greedy search (device-side scan) + prefix beam search (host, batched
    joint evaluations)   (search/greedy_search.py, prefix_beam_search.py)
  - Transducer model: transducer loss + optional auxiliary CTC/attention
    losses (transducer.py:19-210)
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from reverb_tpu.decode.results import DecodeResult
from reverb_tpu.diar.models import init_lstm, lstm_forward
from reverb_tpu.models.modules import (ACTIVATIONS, embedding, init_conv1d,
                                       init_embedding, init_layer_norm,
                                       init_linear, layer_norm, linear,
                                       conv1d)

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class TransducerConfig:
    vocab_size: int = 1000
    blank_id: int = 0
    encoder_output_size: int = 256
    predictor: str = 'rnn'            # rnn | embedding | conv
    predictor_embed_size: int = 256
    predictor_hidden_size: int = 256
    predictor_layers: int = 2
    predictor_kernel: int = 3         # conv/embedding context
    join_dim: int = 512
    joint_activation: str = 'tanh'


# ------------------------------ predictors ------------------------------

def init_predictor(rng, cfg: TransducerConfig):
    ks = jax.random.split(rng, cfg.predictor_layers + 3)
    p = {'embed': init_embedding(ks[0], cfg.vocab_size,
                                 cfg.predictor_embed_size)}
    if cfg.predictor == 'rnn':
        d = cfg.predictor_embed_size
        p['rnn'] = []
        for i in range(cfg.predictor_layers):
            p['rnn'].append(init_lstm(ks[i + 1], d,
                                      cfg.predictor_hidden_size))
            d = cfg.predictor_hidden_size
        p['projection'] = init_linear(ks[-1], d, cfg.predictor_embed_size)
    elif cfg.predictor == 'conv':
        p['conv'] = init_conv1d(ks[1], cfg.predictor_embed_size,
                                cfg.predictor_embed_size,
                                cfg.predictor_kernel,
                                groups=cfg.predictor_embed_size)
        p['norm'] = init_layer_norm(cfg.predictor_embed_size)
    elif cfg.predictor == 'embedding':
        p['norm'] = init_layer_norm(cfg.predictor_embed_size)
    else:
        raise ValueError(cfg.predictor)
    return p


def predictor_forward(p, ys_in, cfg: TransducerConfig):
    """ys_in (B, U) with blank prepended → (B, U, E)."""
    x = embedding(p['embed'], jnp.maximum(ys_in, 0))
    if cfg.predictor == 'rnn':
        for lp in p['rnn']:
            x = lstm_forward(lp, x)
        return linear(p['projection'], x)
    if cfg.predictor == 'conv':
        # causal depthwise conv over the label sequence
        xc = x.transpose(0, 2, 1)
        xc = jnp.pad(xc, ((0, 0), (0, 0), (cfg.predictor_kernel - 1, 0)))
        xc = conv1d(p['conv'], xc, groups=xc.shape[1])
        return layer_norm(p['norm'], xc.transpose(0, 2, 1))
    # embedding predictor: stateless per-token embedding
    return layer_norm(p['norm'], x)


def predictor_init_state(cfg: TransducerConfig, batch: int):
    """Streaming predictor state for greedy decoding."""
    if cfg.predictor == 'rnn':
        return [(jnp.zeros((batch, cfg.predictor_hidden_size)),
                 jnp.zeros((batch, cfg.predictor_hidden_size)))
                for _ in range(cfg.predictor_layers)]
    # conv/embedding: short token history (-1 = before-start sentinel,
    # matching the forward path's zero-activation left padding)
    return jnp.full((batch, cfg.predictor_kernel), -1, jnp.int32)


def predictor_step(p, token, state, cfg: TransducerConfig):
    """One-token predictor step → ((B, E), new_state)."""
    x = embedding(p['embed'], jnp.maximum(token, 0))     # (B, E)
    if cfg.predictor == 'rnn':
        new_state = []
        h_in = x
        for lp, (h, c) in zip(p['rnn'], state):
            gates = h_in @ lp['w_ih'].T + lp['b'] + h @ lp['w_hh'].T
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            new_state.append((h, c))
            h_in = h
        return linear(p['projection'], h_in), new_state
    hist = jnp.concatenate([state[:, 1:], token[:, None]], axis=1)
    emb = embedding(p['embed'], jnp.maximum(hist, 0))    # (B, k, E)
    emb = jnp.where((hist >= 0)[..., None], emb, 0.0)
    if cfg.predictor == 'conv':
        xc = emb.transpose(0, 2, 1)
        w = p['conv']['weight'][:, 0, :]                 # (E, k)
        out = jnp.sum(xc * w[None], axis=2) + p['conv']['bias']
        return layer_norm(p['norm'], out), hist
    return layer_norm(p['norm'], emb[:, -1]), hist


# ------------------------------ joint ------------------------------

def init_joint(rng, cfg: TransducerConfig):
    k1, k2, k3 = jax.random.split(rng, 3)
    return {'enc_ffn': init_linear(k1, cfg.encoder_output_size, cfg.join_dim),
            'pred_ffn': init_linear(k2, cfg.predictor_embed_size,
                                    cfg.join_dim),
            'ffn_out': init_linear(k3, cfg.join_dim, cfg.vocab_size)}


def joint_forward(p, enc, pred, cfg: TransducerConfig):
    """enc (..., D), pred (..., E) broadcastable → logits (..., V)."""
    act = ACTIVATIONS[cfg.joint_activation]
    return linear(p['ffn_out'], act(linear(p['enc_ffn'], enc)
                                    + linear(p['pred_ffn'], pred)))


# ------------------------------ RNN-T loss ------------------------------

def _semiring_combine(a, b):
    """Linear log-semiring recurrence composition for associative_scan:
    alpha[u] = e_u + alpha[u-1]  ⊕  c_u."""
    e1, c1 = a
    e2, c2 = b
    return e1 + e2, jnp.logaddexp(c2, e2 + c1)


def rnnt_loss(logits, logit_lens, labels, label_lens, blank_id: int = 0):
    """Exact transducer loss.

    logits: (B, T, U+1, V) joint outputs; labels (B, U); lens per sequence.
    Returns per-sequence negative log-likelihood (B,).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    B, T, U1, V = logp.shape
    U = U1 - 1
    blank = logp[..., blank_id]                         # (B, T, U+1)
    lab = jnp.broadcast_to(labels[:, None, :], (B, T, U))
    emit = jnp.take_along_axis(logp[:, :, :U, :], lab[..., None],
                               axis=-1)[..., 0]          # (B, T, U)
    u_idx = jnp.arange(U1)
    valid_u = u_idx[None, :] <= label_lens[:, None]      # (B, U+1)

    def step(alpha_prev, t):
        # horizontal move: from alpha[t-1, u] via blank[t-1, u]
        c = jnp.where(t == 0,
                      jnp.where(u_idx[None, :] == 0, 0.0, NEG_INF),
                      alpha_prev + blank[:, jnp.maximum(t - 1, 0), :])
        # vertical move within frame t: alpha[t, u] ⊇ alpha[t, u-1]+emit[t,u-1]
        e = jnp.concatenate(
            [jnp.full((B, 1), NEG_INF), emit[:, t, :]], axis=1)  # (B, U+1)
        e = jnp.where(valid_u, e, NEG_INF)
        _, alpha = jax.lax.associative_scan(
            _semiring_combine, (e, jnp.where(valid_u, c, NEG_INF)), axis=1)
        alpha = jnp.where(valid_u, alpha, NEG_INF)
        return alpha, alpha

    alpha0 = jnp.full((B, U1), NEG_INF)
    _, alphas = jax.lax.scan(step, alpha0, jnp.arange(T))  # (T, B, U+1)
    alphas = alphas.transpose(1, 0, 2)                      # (B, T, U+1)
    t_last = jnp.maximum(logit_lens - 1, 0)
    final_alpha = jnp.take_along_axis(
        alphas, t_last[:, None, None] *
        jnp.ones((B, 1, U1), jnp.int32), axis=1)[:, 0]      # (B, U+1)
    final = jnp.take_along_axis(final_alpha, label_lens[:, None],
                                axis=1)[:, 0]
    final_blank = jnp.take_along_axis(
        jnp.take_along_axis(blank, t_last[:, None, None] *
                            jnp.ones((B, 1, U1), jnp.int32), axis=1)[:, 0],
        label_lens[:, None], axis=1)[:, 0]
    return -(final + final_blank)


# ------------------------------ model ------------------------------

def init_transducer(rng, cfg: TransducerConfig):
    k1, k2 = jax.random.split(rng)
    return {'predictor': init_predictor(k1, cfg), 'joint': init_joint(k2, cfg)}


def transducer_loss(params, encoder_out, encoder_lens, labels, label_lens,
                    cfg: TransducerConfig):
    """Joint over the full (T, U+1) lattice + exact loss; mean over batch."""
    B, U = labels.shape
    blank_col = jnp.full((B, 1), cfg.blank_id, labels.dtype)
    ys_in = jnp.concatenate([blank_col, jnp.maximum(labels, 0)], axis=1)
    pred = predictor_forward(params['predictor'], ys_in, cfg)  # (B, U+1, E)
    logits = joint_forward(params['joint'], encoder_out[:, :, None, :],
                           pred[:, None, :, :], cfg)           # (B,T,U+1,V)
    nll = rnnt_loss(logits, encoder_lens, jnp.maximum(labels, 0), label_lens,
                    cfg.blank_id)
    return jnp.mean(nll)


# ------------------------------ search ------------------------------

def transducer_greedy_device(params, encoder_out, encoder_lens,
                             cfg: TransducerConfig, n_steps: int = 2):
    """Batched greedy search: scan over frames, up to n_steps symbols per
    frame (search/greedy_search.py semantics), static shapes throughout.

    Returns (tokens (B, T·n_steps), mask of emitted positions)."""
    B, T, D = encoder_out.shape
    state0 = predictor_init_state(cfg, B)
    tok0 = jnp.full((B,), cfg.blank_id, jnp.int32)
    pred0, state0 = predictor_step(params['predictor'], tok0, state0, cfg)

    def frame(carry, t):
        pred, state, last_tok = carry
        emitted = []
        for _ in range(n_steps):
            logits = joint_forward(params['joint'], encoder_out[:, t], pred,
                                   cfg)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            valid = (nxt != cfg.blank_id) & (t < encoder_lens)
            new_pred, new_state = predictor_step(params['predictor'], nxt,
                                                 state, cfg)
            pred = jnp.where(valid[:, None], new_pred, pred)
            state = jax.tree.map(
                lambda n, o: jnp.where(
                    valid.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                new_state, state)
            emitted.append(jnp.where(valid, nxt, cfg.blank_id))
        return (pred, state, last_tok), jnp.stack(emitted, axis=1)

    (_, _, _), toks = jax.lax.scan(frame, (pred0, state0, tok0),
                                   jnp.arange(T))
    toks = toks.transpose(1, 0, 2).reshape(B, T * n_steps)
    return toks


def transducer_greedy_search(params, encoder_out, encoder_lens,
                             cfg: TransducerConfig) -> List[DecodeResult]:
    toks = np.asarray(transducer_greedy_device(params, encoder_out,
                                               jnp.asarray(encoder_lens),
                                               cfg))
    results = []
    for b in range(toks.shape[0]):
        results.append(DecodeResult(
            tokens=[int(t) for t in toks[b] if t != cfg.blank_id]))
    return results


def transducer_beam_search(params, encoder_out, encoder_lens,
                           cfg: TransducerConfig, beam_size: int = 4
                           ) -> List[DecodeResult]:
    """Host prefix-beam over frames with batched joint evaluation
    (transducer/search/prefix_beam_search.py behavior)."""
    encoder_out = np.asarray(encoder_out)
    results = []
    for b in range(encoder_out.shape[0]):
        T = int(encoder_lens[b])
        beams = [((), 0.0, None)]     # (prefix, logp, pred_state)
        pred_cache = {}

        def pred_of(prefix):
            if prefix not in pred_cache:
                ys = jnp.asarray([[cfg.blank_id] + list(prefix)])
                out = predictor_forward(params['predictor'], ys, cfg)
                pred_cache[prefix] = np.asarray(out[0, -1])
            return pred_cache[prefix]

        for t in range(T):
            cand = {}
            for prefix, score, _ in beams:
                pred = pred_of(prefix)
                logits = joint_forward(params['joint'],
                                       jnp.asarray(encoder_out[b, t]),
                                       jnp.asarray(pred), cfg)
                logp = np.asarray(jax.nn.log_softmax(logits))
                # blank: stay
                key = prefix
                cand[key] = np.logaddexp(cand.get(key, -np.inf),
                                         score + logp[cfg.blank_id])
                topk = np.argsort(logp)[-beam_size:]
                for u in topk:
                    if u == cfg.blank_id:
                        continue
                    key = prefix + (int(u),)
                    cand[key] = np.logaddexp(cand.get(key, -np.inf),
                                             score + logp[u])
            beams = [(p, s, None) for p, s in
                     sorted(cand.items(), key=lambda kv: -kv[1])[:beam_size]]
        best = beams[0]
        results.append(DecodeResult(tokens=list(best[0]),
                                    score=float(best[1])))
    return results

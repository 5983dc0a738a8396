"""K2Model: LF-MMI training without k2/icefall — TPU-native FSA scoring.

Parity target: asr/wenet/k2/model.py:27-120 (`K2Model`), registered as
`model: k2_model` (utils/init_model.py:93).  The reference subclasses
ASRModel and overrides `_forward_ctc` with an icefall LFMMILoss: numerator =
transcript graphs from a MmiTrainingGraphCompiler, denominator = a phone-LM
graph, both intersected with the dense CTC log-probs on GPU.

TPU-native redesign (no FSA toolkit):
  - numerator score = the exact CTC alignment-sum of the transcript, i.e.
    −optax.ctc_loss per utterance (identical math to intersecting the
    2L+1-state transcript trellis; SURVEY.md §2.9 'k2' row);
  - denominator score = a log-semiring forward recursion over a token-LM
    graph (ops/fsa.py):  a bigram CTC-topology composition when
    `lfmmi_dir/bigram.txt` provides LM scores (small token sets — phones/
    chars, the LF-MMI regime), else a dense O(T·V) unigram recursion that
    scales to full BPE vocabularies;
  - loss = Σ_b (den_b − num_b) / B, matching the reference's
    `lfmmi(...) / len(text)` batch normalization (k2/model.py:119).

`lfmmi_dir` contract (mirrors the icefall resource directory):
  tokens.txt   "symbol id" lines; '<sos/eos>' row consumed like
               k2/model.py:73-76 (id recorded, excluded from the den LM)
  words.txt    optional "word id" table (loaded for API parity)
  bigram.txt   optional "u v logprob" rows (token ids, natural log) →
               bigram denominator; absent → uniform unigram denominator
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from reverb_tpu.models import ctc as ctc_mod
from reverb_tpu.ops import fsa

# above this many modeled tokens the O(V²)-arc bigram graph is refused and
# the dense unigram recursion is used instead
MAX_BIGRAM_TOKENS = 1024


class LfmmiResources:
    """Host-side denominator graph + symbol tables from an lfmmi_dir."""

    def __init__(self, lfmmi_dir: str, vocab_size: int, blank_id: int = 0):
        self.lfmmi_dir = lfmmi_dir
        self.vocab_size = vocab_size
        self.blank_id = blank_id
        self.sos_eos_id: Optional[int] = None
        self.token_table: Dict[str, int] = {}
        self.word_table: Dict[int, str] = {}

        tok_path = os.path.join(lfmmi_dir, 'tokens.txt')
        if os.path.exists(tok_path):
            with open(tok_path) as f:
                for line in f:
                    arr = line.strip().split()
                    if len(arr) != 2:
                        continue
                    self.token_table[arr[0]] = int(arr[1])
                    if arr[0] == '<sos/eos>':          # k2/model.py:73-76
                        self.sos_eos_id = int(arr[1])
        word_path = os.path.join(lfmmi_dir, 'words.txt')
        if os.path.exists(word_path):                  # k2/model.py:91-96
            with open(word_path) as f:
                for line in f:
                    arr = line.strip().split()
                    if len(arr) == 2:
                        self.word_table[int(arr[1])] = arr[0]

        excluded = {blank_id}
        if self.sos_eos_id is not None:
            excluded.add(self.sos_eos_id)
        self.lm_tokens = np.array(
            [t for t in range(vocab_size) if t not in excluded], np.int32)

        self.bigram: Optional[np.ndarray] = None
        big_path = os.path.join(lfmmi_dir, 'bigram.txt')
        if os.path.exists(big_path):
            K = len(self.lm_tokens)
            if K > MAX_BIGRAM_TOKENS:
                raise ValueError(
                    f'bigram denominator graph needs O(K²) arcs; K={K} > '
                    f'{MAX_BIGRAM_TOKENS}. Use a phone/char token set or '
                    f'drop bigram.txt for the dense unigram denominator.')
            tok2row = {int(t): i for i, t in enumerate(self.lm_tokens)}
            big = np.full((K, K), -np.log(K), np.float32)
            with open(big_path) as f:
                for line in f:
                    arr = line.strip().split()
                    if len(arr) != 3:
                        continue
                    u, v, lp = int(arr[0]), int(arr[1]), float(arr[2])
                    if u in tok2row and v in tok2row:
                        big[tok2row[u], tok2row[v]] = lp
            self.bigram = big
            (self._src, self._dst, self._lab, self._wgt, self._S,
             self._final) = fsa.bigram_den_arcs(big, blank_id,
                                                tokens=self.lm_tokens)
        else:
            uni = np.full((vocab_size,), fsa.NEG_INF, np.float32)
            uni[self.lm_tokens] = -np.log(len(self.lm_tokens))
            self._unigram = uni

    # -------- device-side scoring closures (static graph constants) -------

    def den_score_fn(self):
        """(logp (T,V), t_len) → denominator forward score, vmappable."""
        blank = self.blank_id
        if self.bigram is not None:
            src = jnp.asarray(self._src)
            dst = jnp.asarray(self._dst)
            lab = jnp.asarray(self._lab)
            wgt = jnp.asarray(self._wgt)
            fin = jnp.asarray(self._final)
            S = self._S

            def score(logp, t_len):
                return fsa.fsa_forward_score(logp, t_len, src, dst, lab,
                                             wgt, S, fin)
        else:
            uni = jnp.asarray(self._unigram)

            def score(logp, t_len):
                return fsa.dense_unigram_den_score(logp, t_len, uni, blank)
        return score


def lfmmi_ctc_loss_fn(resources: LfmmiResources):
    """`ctc_loss_fn` override for compute_loss — the _forward_ctc hook
    (k2/model.py:58-65): returns Σ(den−num)/B instead of the CTC loss."""
    den_fn = resources.den_score_fn()
    blank_id = resources.blank_id

    def loss_fn(params, encoder_out, encoder_out_lens, text, text_lens):
        logits = ctc_mod.ctc_logits(params, encoder_out).astype(jnp.float32)
        B, T, V = logits.shape
        L = text.shape[1]
        logit_pad = (jnp.arange(T)[None] >= encoder_out_lens[:, None]
                     ).astype(jnp.float32)
        label_pad = (jnp.arange(L)[None] >= text_lens[:, None]
                     ).astype(jnp.float32)
        labels = jnp.where(label_pad > 0, 0, text).astype(jnp.int32)
        # numerator: CTC alignment-sum of the transcript (per-seq NLL)
        num_nll = optax.ctc_loss(logits, logit_pad, labels, label_pad,
                                 blank_id=blank_id)               # (B,)
        logp = jax.nn.log_softmax(logits, axis=-1)
        den = jax.vmap(den_fn)(logp, encoder_out_lens)            # (B,)
        return jnp.sum(den + num_nll) / B

    return loss_fn

"""Golden parity vs the ACTUAL reference implementation (SURVEY §7 step 1).

These tests import the reference's torch modules from /root/reference/asr,
copy their weights into our param trees via the checkpoint converter, and
compare forward activations / losses / nbest lists.  They are the strongest
possible parity instrument — skipped automatically when the reference tree
isn't mounted (CI outside this environment).

No reference code is copied; it is executed as an oracle only.
"""

import os
import sys

import numpy as np
import pytest

REF = '/root/reference/asr'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference tree not mounted')

_TINY_ENC = dict(input_size=80, output_size=32, attention_heads=2,
                 linear_units=64, num_blocks=4, dropout_rate=0.0,
                 positional_dropout_rate=0.0, attention_dropout_rate=0.0,
                 input_layer='conv2d', pos_enc_layer_type='rel_pos',
                 selfattention_layer_type='rel_selfattn',
                 activation_type='swish', macaron_style=True,
                 use_cnn_module=True, cnn_module_kernel=15)


def import_wenet():
    """Import the reference `wenet` package with compat shims, bypassing its
    CLI-heavy __init__ (torchaudio/whisper stubs; torch>=2.6 conv symbol
    re-exports). Plain function so other test modules can reuse it."""
    import importlib.machinery
    import importlib.util
    import types
    import typing
    import torch
    import torch.nn.modules.conv as _conv
    from torch.nn.common_types import _size_2_t
    from torch.nn.modules.utils import _pair
    _conv.Union = typing.Union
    _conv.Optional = typing.Optional
    _conv.Tensor = torch.Tensor
    _conv._size_2_t = _size_2_t
    _conv._pair = _pair
    for name in ('torchaudio', 'torchaudio.compliance',
                 'torchaudio.compliance.kaldi'):
        sys.modules.setdefault(name, types.ModuleType(name))
    wt = types.ModuleType('whisper.tokenizer')
    wt.LANGUAGES = {'en': 'english'}
    w = types.ModuleType('whisper')
    w.tokenizer = wt
    sys.modules.setdefault('whisper', w)
    sys.modules.setdefault('whisper.tokenizer', wt)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if 'wenet' not in sys.modules:
        spec = importlib.machinery.ModuleSpec('wenet', None, is_package=True)
        m = importlib.util.module_from_spec(spec)
        m.__path__ = [os.path.join(REF, 'wenet')]
        sys.modules['wenet'] = m
    return sys.modules['wenet']


@pytest.fixture(scope='module')
def wenet():
    return import_wenet()


def _to_ours(module):
    from reverb_tpu.convert.torch_ckpt import (convert_torch_state_dict,
                                               nest_state_dict)
    return nest_state_dict(convert_torch_state_dict(module.state_dict()))


def test_encoder_activation_parity(wenet):
    """Conformer+LSL encoder: same weights → same activations (<1e-4)."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.encoder import ConformerEncoder
    from reverb_tpu.models.asr_model import forward_encoder, ModelConfig
    from tests.test_model_forward import TINY

    torch.manual_seed(0)
    ref = ConformerEncoder(num_langs=2, **_TINY_ENC)
    ref.eval()
    x = torch.randn(2, 67, 80)
    lens = torch.tensor([67, 50])
    for v in (1.0, 0.3):
        cat = torch.tensor([v, 1.0 - v])
        with torch.no_grad():
            want, want_mask = ref(x, lens, cat_embs=cat)

        cfg = ModelConfig.from_config(TINY)
        params = {'encoder': _to_ours(ref), 'decoder': {}, 'ctc': {}}
        got, got_mask = forward_encoder(
            params, cfg, jnp.asarray(x.numpy()), jnp.asarray(lens.numpy()),
            jnp.asarray(cat.numpy()))
        got = np.asarray(got)
        want = want.numpy()
        assert got.shape == want.shape
        np.testing.assert_array_equal(np.asarray(got_mask)[:, 0, :],
                                      want_mask.numpy()[:, 0, :])
        T1 = int(want_mask[1].sum())
        np.testing.assert_allclose(got[0], want[0], atol=1e-4, rtol=1e-3)
        np.testing.assert_allclose(got[1, :T1], want[1, :T1], atol=1e-4,
                                   rtol=1e-3)


def test_full_model_loss_parity(wenet):
    """ASRModel training loss (CTC + bi-decoder attention, LSL decoder):
    same weights + batch → same loss values."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.asr_model import ASRModel
    from wenet.transformer.encoder import ConformerEncoder
    from wenet.transformer.decoder import (
        LanguageSpecificBiTransformerDecoder)
    from wenet.transformer.ctc import CTC
    from reverb_tpu.models.asr_model import ModelConfig, compute_loss
    from tests.test_model_forward import TINY

    torch.manual_seed(1)
    V = 50
    enc = ConformerEncoder(num_langs=2, **_TINY_ENC)
    dec = LanguageSpecificBiTransformerDecoder(
        vocab_size=V, encoder_output_size=32, attention_heads=2,
        linear_units=64, num_blocks=3, r_num_blocks=1, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0, num_langs=2)
    ctc = CTC(V, 32)
    ref = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc=ctc,
                   ctc_weight=0.3, lsm_weight=0.1, reverse_weight=0.3,
                   ignore_id=-1)
    # init_model.py:254-257 sets these post-construction
    ref.lsl_enc = True
    ref.lsl_dec = True
    ref.add_cat_embs = False
    ref.eval()
    feats = torch.randn(2, 67, 80)
    feats_lens = torch.tensor([67, 50])
    target = torch.tensor([[1, 2, 3, -1], [4, 5, -1, -1]])
    target_lens = torch.tensor([3, 2])
    cat = torch.tensor([1.0, 0.0])
    batch = {'feats': feats, 'feats_lengths': feats_lens, 'target': target,
             'target_lengths': target_lens, 'cat_embs': cat,
             'langs': None, 'tasks': None}
    with torch.no_grad():
        want = ref(batch, torch.device('cpu'))

    conf = {k: (dict(v) if isinstance(v, dict) else v) for k, v in
            TINY.items()}
    conf['model_conf'] = dict(conf['model_conf'], ctc_weight=0.3,
                              reverse_weight=0.3, lsm_weight=0.1)
    conf['decoder'] = 'lsl_bitransformer'
    cfg = ModelConfig.from_config(conf)
    params = {'encoder': _to_ours(ref.encoder),
              'decoder': _to_ours(ref.decoder),
              'ctc': _to_ours(ref.ctc)}
    got = compute_loss(params, cfg, {
        'feats': jnp.asarray(feats.numpy()),
        'feats_lengths': jnp.asarray(feats_lens.numpy()),
        'target': jnp.asarray(target.numpy()),
        'target_lengths': jnp.asarray(target_lens.numpy()),
        'cat_embs': jnp.asarray(np.tile(cat.numpy()[None], (2, 1)))})
    np.testing.assert_allclose(float(got['loss_ctc']),
                               float(want['loss_ctc']), rtol=2e-3)
    np.testing.assert_allclose(float(got['loss_att']),
                               float(want['loss_att']), rtol=2e-3)
    np.testing.assert_allclose(float(got['loss']), float(want['loss']),
                               rtol=2e-3)


def test_prefix_beam_search_parity(wenet):
    """Device lax.scan prefix beam == reference python-dict beam on the same
    log-prob tensor: same top-1 tokens, same nbest scores."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.search import ctc_prefix_beam_search as ref_search
    from reverb_tpu.decode.prefix_beam import ctc_prefix_beam_search

    rng = np.random.RandomState(0)
    B, T, V, K = 3, 25, 12, 5
    logits = rng.randn(B, T, V).astype(np.float32) * 2.0
    logp = torch.from_numpy(logits).log_softmax(-1)
    lens = torch.tensor([25, 17, 9])
    want = ref_search(logp, lens, K)

    got = ctc_prefix_beam_search(jnp.asarray(logp.numpy()),
                                 jnp.asarray(lens.numpy()), K)
    for b in range(B):
        assert list(got[b].tokens) == list(want[b].tokens), (
            b, got[b].tokens, want[b].tokens)
        np.testing.assert_allclose(got[b].score, want[b].score, rtol=1e-4)
        # nbest prefixes must agree as ordered lists
        assert [list(h) for h in got[b].nbest] == \
            [list(h) for h in want[b].nbest]
        # timestamps: the reference has a typo at search.py:178
        # (`next_score1.vs_ns = ...` never updates v_ns), so on paths through
        # the repeated-token branch its viterbi times collapse (often to []).
        # We implement the intended semantics; compare only when the
        # reference's own output is well-formed.
        assert len(got[b].times) == len(got[b].tokens)
        if len(want[b].times) == len(want[b].tokens):
            assert list(got[b].times) == list(want[b].times), (
                b, got[b].times, want[b].times)


def test_decode_modes_parity(wenet):
    """End-to-end decode parity on the same weights + audio features:
    greedy / prefix-beam / attention-rescoring / attention tokens match the
    reference's `ASRModel.decode` exactly; scores match numerically."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.asr_model import ASRModel
    from wenet.transformer.encoder import ConformerEncoder
    from wenet.transformer.decoder import (
        LanguageSpecificBiTransformerDecoder)
    from wenet.transformer.ctc import CTC
    from reverb_tpu.models.asr_model import ModelConfig
    from reverb_tpu.decode.api import decode
    from tests.test_model_forward import TINY

    torch.manual_seed(7)
    V = 50
    enc = ConformerEncoder(num_langs=2, **_TINY_ENC)
    dec = LanguageSpecificBiTransformerDecoder(
        vocab_size=V, encoder_output_size=32, attention_heads=2,
        linear_units=64, num_blocks=3, r_num_blocks=1, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0, num_langs=2)
    ctc = CTC(V, 32)
    ref = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc=ctc,
                   ctc_weight=0.3, reverse_weight=0.3, ignore_id=-1)
    ref.lsl_enc = True
    ref.lsl_dec = True
    ref.add_cat_embs = False
    ref.eval()

    feats = torch.randn(2, 131, 80)
    lens = torch.tensor([131, 90])
    cat = torch.tensor([1.0, 0.0])
    methods = ['ctc_greedy_search', 'ctc_prefix_beam_search',
               'attention_rescoring', 'attention']
    with torch.no_grad():
        want = ref.decode(methods, feats, lens, beam_size=5, ctc_weight=0.1,
                          reverse_weight=0.3, cat_embs=cat)

    conf = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in TINY.items()}
    conf['decoder'] = 'lsl_bitransformer'
    cfg = ModelConfig.from_config(conf)
    params = {'encoder': _to_ours(ref.encoder),
              'decoder': _to_ours(ref.decoder),
              'ctc': _to_ours(ref.ctc)}
    got = decode(params, cfg, methods, jnp.asarray(feats.numpy()),
                 jnp.asarray(lens.numpy()), beam_size=5, ctc_weight=0.1,
                 reverse_weight=0.3, cat_embs=cat.numpy())

    for m in methods:
        for b in range(2):
            assert list(got[m][b].tokens) == list(want[m][b].tokens), (
                m, b, got[m][b].tokens, want[m][b].tokens)
        if m in ('ctc_prefix_beam_search', 'attention_rescoring'):
            for b in range(2):
                np.testing.assert_allclose(got[m][b].score,
                                           want[m][b].score, rtol=1e-3,
                                           atol=1e-3)


def test_ctc_align_word_merge_parity(wenet):
    """Token→word merge + timestamp semantics == reference bin/ctc_align.py
    (gap heuristic, midpoint interpolation, 230 ms offset clamp)."""
    import importlib
    ref_mod = importlib.import_module('wenet.bin.ctc_align')
    from reverb_tpu.decode.align import adjust_model_time_offset, ctc_align

    class Tok:
        """minimal detokenizer: id → piece string."""
        pieces = ['<blank>', '▁the', '▁cat', 's', '▁sat',
                  '<unk>', '▁on', 'ne', '▁mat', '.']

        def detokenize(self, ids):
            toks = [self.pieces[i] for i in ids]
            return ''.join(toks).replace('▁', ' ').strip(), toks

    tok = Tok()
    hyp = [1, 2, 3, 4, 6, 1, 8, 9]
    times = [2, 10, 11, 30, 45, 60, 75, 76]
    conf = [0.9, 0.8, 0.7, 0.95, 0.5, 0.9, 0.85, 0.6]
    want = ref_mod.ctc_align(hyp, times, conf, tok, 40, 0)
    got = ctc_align(hyp, times, conf,
                    lambda i: tok.pieces[i],   # ours takes id→token callable
                    40, 0)
    assert [w['word'] for w in got] == [w['word'] for w in want]
    for g, w in zip(got, want):
        assert abs(g['start_time_ms'] - w['start_time_ms']) < 1e-6, (g, w)
        assert abs(g['end_time_ms'] - w['end_time_ms']) < 1e-6, (g, w)
        assert abs(g['confidence'] - w['confidence']) < 1e-9

    want_adj = ref_mod.adjust_model_time_offset(
        [dict(w) for w in want], 230)
    got_adj = adjust_model_time_offset([dict(g) for g in got], 230)
    for g, w in zip(got_adj, want_adj):
        assert abs(g['start_time_ms'] - w['start_time_ms']) < 1e-6
        assert abs(g['end_time_ms'] - w['end_time_ms']) < 1e-6


def test_lr_schedule_parity(wenet):
    """WarmupLR / NoamHoldAnnealing / SteadyLR curves match the reference's
    torch schedulers step-for-step."""
    import torch
    from wenet.utils.scheduler import (NoamHoldAnnealing, SteadyLR, WarmupLR)
    from reverb_tpu.train.scheduler import build_scheduler

    lr0 = 1e-3
    steps = [0, 1, 10, 99, 100, 500, 2500, 9999, 20000]

    def ref_curve(sched_cls, opt_kwargs, **kw):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=lr0, **opt_kwargs)
        sch = sched_cls(opt, **kw)
        out = {}
        for s in range(max(steps) + 1):
            if s in steps:
                out[s] = opt.param_groups[0]['lr']
            opt.step()
            sch.step()
        return out

    # WarmupLR (scheduler.py:28-73)
    want = ref_curve(WarmupLR, {}, warmup_steps=100)
    ours = build_scheduler('warmuplr', lr0, {'warmup_steps': 100})
    for s in steps:
        np.testing.assert_allclose(float(ours(s)), want[s], rtol=1e-6,
                                   err_msg=f'warmuplr step {s}')

    # NoamHoldAnnealing (scheduler.py:625-676)
    kw = dict(max_steps=10000, warmup_steps=100, hold_steps=400,
              decay_rate=0.5, min_lr=1e-5)
    want = ref_curve(NoamHoldAnnealing, {}, **kw)
    ours = build_scheduler('NoamHoldAnnealing', lr0, kw)
    # beyond max_steps the reference's torch scheduler returns
    # min_lr·warmup/(warmup+1) due to _LRScheduler warmup-chain bookkeeping;
    # we clamp to min_lr exactly — compare the in-schedule region
    for s in [x for x in steps if x <= kw['max_steps']]:
        np.testing.assert_allclose(float(ours(s)), want[s], rtol=1e-5,
                                   err_msg=f'noamhold step {s}')

    # SteadyLR (scheduler.py:721-756)
    want = ref_curve(SteadyLR, {}, warmup_steps=100)
    ours = build_scheduler('steadylr', lr0, {'warmup_steps': 100})
    for s in steps:
        np.testing.assert_allclose(float(ours(s)), want[s], rtol=1e-6,
                                   err_msg=f'steadylr step {s}')


def test_cmvn_loader_parity(wenet, tmp_path):
    """JSON and Kaldi-text CMVN stats → identical (mean, istd)."""
    import json
    from wenet.utils.cmvn import load_cmvn as ref_load
    from reverb_tpu.frontend.cmvn import load_cmvn

    rng = np.random.RandomState(0)
    D, n = 5, 1000.0
    sums = (rng.randn(D) * 100).tolist()
    sqs = (np.abs(rng.randn(D)) * 5000 + 3000).tolist()
    jf = tmp_path / 'cmvn.json'
    jf.write_text(json.dumps({
        'mean_stat': sums, 'var_stat': sqs, 'frame_num': n}))
    want_m, want_i = ref_load(str(jf), True)
    got_m, got_i = load_cmvn(str(jf), True)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-6)

    kf = tmp_path / 'cmvn.ark.txt'
    row1 = ' '.join(f'{v:.6f}' for v in sums) + f' {n} '
    row2 = ' '.join(f'{v:.6f}' for v in sqs) + ' 0 ]'
    kf.write_text(f' [\n {row1}\n {row2}\n')
    want_m, want_i = ref_load(str(kf), False)
    got_m, got_i = load_cmvn(str(kf), False)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               rtol=1e-6)


def test_joint_decoding_parity(wenet):
    """Time-synchronous joint CTC+attention search: our implementation's
    tokens match the reference espnet BeamSearchTimeSync via
    ASRModel.decode(['joint_decoding'])."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.asr_model import ASRModel
    from wenet.transformer.encoder import ConformerEncoder
    from wenet.transformer.decoder import (
        LanguageSpecificBiTransformerDecoder)
    from wenet.transformer.ctc import CTC
    from reverb_tpu.models.asr_model import ModelConfig
    from reverb_tpu.decode.api import decode
    from tests.test_model_forward import TINY

    torch.manual_seed(11)
    # the reference hardcodes sos=10000 inside joint_decoding
    # (search.py:478-480) — it only works for the flagship 10001-token
    # vocab, so the oracle comparison uses that size
    V = 10001
    enc = ConformerEncoder(num_langs=2, **_TINY_ENC)
    dec = LanguageSpecificBiTransformerDecoder(
        vocab_size=V, encoder_output_size=32, attention_heads=2,
        linear_units=64, num_blocks=3, r_num_blocks=1, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0, num_langs=2)
    ctc = CTC(V, 32)
    ref = ASRModel(vocab_size=V, encoder=enc, decoder=dec, ctc=ctc,
                   ctc_weight=0.3, reverse_weight=0.0, ignore_id=-1)
    ref.lsl_enc = True
    ref.lsl_dec = True
    ref.add_cat_embs = False
    ref.eval()

    feats = torch.randn(1, 131, 80)
    lens = torch.tensor([131])
    cat = torch.tensor([1.0, 0.0])
    with torch.no_grad():
        want = ref.decode(['joint_decoding'], feats, lens, beam_size=5,
                          ctc_weight=0.5, cat_embs=cat)

    conf = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in TINY.items()}
    conf['decoder'] = 'lsl_bitransformer'
    conf['output_dim'] = V
    cfg = ModelConfig.from_config(conf)
    params = {'encoder': _to_ours(ref.encoder),
              'decoder': _to_ours(ref.decoder),
              'ctc': _to_ours(ref.ctc)}
    # isolate the SEARCH: feed our joint decoder the reference's encoder
    # output and CTC log-probs (encoder parity is asserted separately;
    # 1e-5-level encoder deltas flip near-tie hypotheses in a beam search)
    from reverb_tpu.decode.joint import joint_decoding
    with torch.no_grad():
        eo, emask = ref.encoder(feats, lens, cat_embs=cat)
        probs = ref.ctc.log_softmax(eo)
    got = joint_decoding(params, cfg, jnp.asarray(eo.numpy()),
                         jnp.asarray([eo.shape[1]]),
                         jnp.asarray(probs.numpy()), ctc_weight=0.5,
                         beam_size=5, length_bonus=0.0,
                         cat_embs=cat.numpy())
    assert list(got[0].tokens) == list(want['joint_decoding'][0].tokens), (
        got[0].tokens, want['joint_decoding'][0].tokens)
    np.testing.assert_allclose(got[0].score,
                               want['joint_decoding'][0].score, rtol=1e-4)


def test_branchformer_activation_parity(wenet):
    """Branchformer encoder (parallel attn + cgMLP, concat merge,
    per-layer norm_final): same weights → same activations."""
    import torch
    import jax
    import jax.numpy as jnp
    from wenet.branchformer.encoder import BranchformerEncoder
    from reverb_tpu.models.encoders_alt import (BranchformerConfig,
                                                branchformer_forward)

    torch.manual_seed(3)
    ref = BranchformerEncoder(input_size=80, output_size=32,
                              attention_heads=2, cgmlp_linear_units=64,
                              cgmlp_conv_kernel=7, num_blocks=2,
                              dropout_rate=0.0, positional_dropout_rate=0.0,
                              attention_dropout_rate=0.0)
    ref.eval()
    x = torch.randn(2, 67, 80)
    lens = torch.tensor([67, 50])
    with torch.no_grad():
        want, want_mask = ref(x, lens)

    cfg = BranchformerConfig(input_size=80, output_size=32,
                             attention_heads=2, cgmlp_linear_units=64,
                             cgmlp_conv_kernel=7, num_blocks=2,
                             dropout_rate=0.0)
    params = _to_ours(ref)
    got, got_mask = branchformer_forward(params, jnp.asarray(x.numpy()),
                                         jnp.asarray(lens.numpy()), cfg)
    got = np.asarray(got)
    T1 = int(want_mask[1].sum())
    np.testing.assert_allclose(got[0], want.numpy()[0], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :T1], want.numpy()[1, :T1],
                               atol=1e-4, rtol=1e-3)


def test_e_branchformer_activation_parity(wenet):
    """E-Branchformer (macaron FFNs + depthwise conv fusion merge)."""
    import torch
    import jax.numpy as jnp
    from wenet.e_branchformer.encoder import EBranchformerEncoder
    from reverb_tpu.models.encoders_alt import (BranchformerConfig,
                                                branchformer_forward)

    torch.manual_seed(4)
    ref = EBranchformerEncoder(input_size=80, output_size=32,
                               attention_heads=2, linear_units=64,
                               cgmlp_linear_units=64, cgmlp_conv_kernel=7,
                               num_blocks=2, dropout_rate=0.0,
                               positional_dropout_rate=0.0,
                               attention_dropout_rate=0.0)
    ref.eval()
    x = torch.randn(2, 67, 80)
    lens = torch.tensor([67, 50])
    with torch.no_grad():
        want, want_mask = ref(x, lens)

    cfg = BranchformerConfig(input_size=80, output_size=32,
                             attention_heads=2, cgmlp_linear_units=64,
                             cgmlp_conv_kernel=7, num_blocks=2,
                             dropout_rate=0.0, e_branchformer=True,
                             ffn_units=64)
    params = _to_ours(ref)
    got, got_mask = branchformer_forward(params, jnp.asarray(x.numpy()),
                                         jnp.asarray(lens.numpy()), cfg)
    got = np.asarray(got)
    T1 = int(want_mask[1].sum())
    np.testing.assert_allclose(got[0], want.numpy()[0], atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :T1], want.numpy()[1, :T1],
                               atol=1e-4, rtol=1e-3)


def test_squeezeformer_activation_parity(wenet):
    """Squeezeformer (post-norm blocks, adaptive scales, rel_shift attention,
    depthwise subsampling, 2× time reduce/recover U): same weights → same
    activations."""
    import torch
    import jax.numpy as jnp
    from wenet.squeezeformer.encoder import SqueezeformerEncoder
    from reverb_tpu.models.encoders_alt import (SqueezeformerConfig,
                                                squeezeformer_forward)

    torch.manual_seed(5)
    ref = SqueezeformerEncoder(input_size=80, encoder_dim=32, output_size=32,
                               attention_heads=2,
                               feed_forward_expansion_factor=2,
                               num_blocks=4, reduce_idx=1, recover_idx=3,
                               cnn_module_kernel=7, dropout=0.0,
                               input_dropout_rate=0.0,
                               feed_forward_dropout_rate=0.0,
                               attention_dropout_rate=0.0)
    ref.eval()
    x = torch.randn(2, 67, 80)
    lens = torch.tensor([67, 50])
    with torch.no_grad():
        want, want_mask = ref(x, lens)

    cfg = SqueezeformerConfig(input_size=80, output_size=32,
                              attention_heads=2, linear_units=64,
                              num_blocks=4, reduce_idx=1, recover_idx=3,
                              cnn_module_kernel=7, dropout_rate=0.0)
    params = _to_ours(ref)
    got, got_mask = squeezeformer_forward(params, jnp.asarray(x.numpy()),
                                          jnp.asarray(lens.numpy()), cfg)
    got = np.asarray(got)
    T1 = int(want_mask[1].sum())
    np.testing.assert_allclose(got[0], want.numpy()[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :T1], want.numpy()[1, :T1],
                               atol=2e-4, rtol=1e-3)


def test_efficient_conformer_activation_parity(wenet):
    """Efficient-Conformer (grouped rel-pos attention with d_k·g head dims,
    strided conv module with AvgPool residual, kernel recompute k//s):
    same weights → same activations."""
    import torch
    import jax.numpy as jnp
    from wenet.efficient_conformer.encoder import EfficientConformerEncoder
    from reverb_tpu.models.encoders_alt import (EfficientConformerConfig,
                                                efficient_conformer_forward)

    torch.manual_seed(6)
    ref = EfficientConformerEncoder(
        input_size=80, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=4, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, stride_layer_idx=[1], stride=[2],
        group_layer_idx=[0, 1, 2, 3], group_size=2, cnn_module_kernel=7)
    ref.eval()
    x = torch.randn(2, 67, 80)
    lens = torch.tensor([67, 50])
    with torch.no_grad():
        want, want_mask = ref(x, lens)

    cfg = EfficientConformerConfig(
        input_size=80, output_size=32, attention_heads=2, linear_units=64,
        num_blocks=4, dropout_rate=0.0, stride_layer_idx=(1,), stride=(2,),
        group_layer_idx=(0, 1, 2, 3), group_size=2, cnn_module_kernel=7)
    params = _to_ours(ref)
    got, got_mask = efficient_conformer_forward(
        params, jnp.asarray(x.numpy()), jnp.asarray(lens.numpy()), cfg)
    got = np.asarray(got)
    assert got.shape == tuple(want.shape), (got.shape, want.shape)
    np.testing.assert_array_equal(np.asarray(got_mask)[:, 0, :],
                                  want_mask.numpy()[:, 0, :])
    T1 = int(want_mask[1].sum())
    np.testing.assert_allclose(got[0], want.numpy()[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(got[1, :T1], want.numpy()[1, :T1],
                               atol=2e-4, rtol=1e-3)


def test_sanm_encoder_decoder_parity(wenet):
    """Ali-Paraformer SANM encoder/decoder + LFR frontend: same weights →
    same activations (layers.py:23-495, attention.py:8-217)."""
    import torch
    import jax.numpy as jnp
    from wenet.paraformer.layers import LFR, SanmDecoder, SanmEncoder
    from reverb_tpu.models.sanm import (SanmConfig, lfr,
                                        sanm_decoder_forward,
                                        sanm_encoder_forward)

    torch.manual_seed(8)
    m, n = 3, 2
    ref_lfr = LFR(m=m, n=n)
    x = torch.randn(2, 25, 8)
    lens = torch.tensor([25, 13])
    with torch.no_grad():
        want_l, want_lens = ref_lfr(x, lens)
    got_l, got_lens = lfr(jnp.asarray(x.numpy()), jnp.asarray(lens.numpy()),
                          m, n)
    np.testing.assert_array_equal(np.asarray(got_lens),
                                  want_lens.numpy())
    for b in range(2):
        L = int(want_lens[b])
        np.testing.assert_allclose(np.asarray(got_l)[b, :L],
                                   want_l.numpy()[b, :L], rtol=1e-6)

    enc = SanmEncoder(input_size=8 * m, output_size=16, attention_heads=2,
                      linear_units=32, num_blocks=2, dropout_rate=0.0,
                      positional_dropout_rate=0.0,
                      attention_dropout_rate=0.0, kernel_size=5)
    dec = SanmDecoder(vocab_size=30, encoder_output_size=16,
                      attention_heads=2, linear_units=32, num_blocks=2,
                      dropout_rate=0.0, positional_dropout_rate=0.0,
                      self_attention_dropout_rate=0.0,
                      src_attention_dropout_rate=0.0, att_layer_num=2,
                      kernel_size=5)
    enc.eval()
    dec.eval()
    from wenet.utils.mask import make_pad_mask as ref_make_pad_mask
    with torch.no_grad():
        feats, feats_lens = ref_lfr(x, lens)
        # BaseEncoder.forward in this fork passes cat_embs the Ali layer
        # rejects — drive embed + forward_layers + after_norm directly
        want_mask = ~ref_make_pad_mask(feats_lens,
                                       feats.size(1)).unsqueeze(1)
        xs_t, pos_t, want_mask = enc.embed(feats, want_mask)
        xs_t = enc.forward_layers(xs_t, want_mask, pos_t, want_mask)
        want_enc = enc.after_norm(xs_t)
        sem = torch.randn(2, 5, 16)
        ys_lens = torch.tensor([5, 3])
        want_dec, _, _ = dec(want_enc, want_mask, sem, ys_lens)

    cfg = SanmConfig(input_size=8 * m, output_size=16, attention_heads=2,
                     linear_units=32, num_blocks=2, decoder_blocks=2,
                     vocab_size=30, kernel_size=5, dropout_rate=0.0,
                     lfr_m=m, lfr_n=n)
    enc_p = _to_ours(enc)
    got_enc, got_mask = sanm_encoder_forward(enc_p, jnp.asarray(x.numpy()),
                                             jnp.asarray(lens.numpy()), cfg)
    T1 = int(want_mask[1].sum())
    np.testing.assert_allclose(np.asarray(got_enc)[0],
                               want_enc.numpy()[0], atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_enc)[1, :T1],
                               want_enc.numpy()[1, :T1], atol=2e-4,
                               rtol=1e-3)

    dec_p = _to_ours(dec)
    got_dec = sanm_decoder_forward(dec_p, jnp.asarray(got_enc), got_mask,
                                   jnp.asarray(sem.numpy()),
                                   jnp.asarray(ys_lens.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got_dec)[0],
                               want_dec.numpy()[0], atol=5e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got_dec)[1, :3],
                               want_dec.numpy()[1, :3], atol=5e-4,
                               rtol=2e-3)


def test_moe_ffn_parity(wenet):
    """MoEFFNLayer (positionwise_feed_forward.py:58-121): stacked-einsum
    dense MoE == reference gather/scatter token dispatch."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.positionwise_feed_forward import MoEFFNLayer
    from reverb_tpu.models.encoder import EncoderConfig, moe_feed_forward

    torch.manual_seed(9)
    ref = MoEFFNLayer(n_expert=4, n_expert_per_token=2, idim=16,
                      hidden_units=32, dropout_rate=0.0,
                      activation=torch.nn.SiLU())
    ref.eval()
    x = torch.randn(2, 7, 16)
    with torch.no_grad():
        want = ref(x)
    cfg = EncoderConfig(output_size=16, linear_units=32, n_expert=4,
                        n_expert_per_token=2, dropout_rate=0.0,
                        positionwise_layer_type='moe',
                        activation_type='swish')
    p = _to_ours(ref)
    got = moe_feed_forward(p, jnp.asarray(x.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5,
                               rtol=1e-4)


def _torch_lstm_to_ours(sd, prefix, layer, reverse):
    suf = f'l{layer}' + ('_reverse' if reverse else '')
    return {'w_ih': sd[f'{prefix}weight_ih_{suf}'].numpy(),
            'w_hh': sd[f'{prefix}weight_hh_{suf}'].numpy(),
            'b': (sd[f'{prefix}bias_ih_{suf}']
                  + sd[f'{prefix}bias_hh_{suf}']).numpy()}


def test_context_adaptor_parity(wenet):
    """Deep-biasing context adaptor (transformer/context_adaptor.py): BiLSTM
    phrase encoder + 1-head cross attention + blank-term zeroing — same
    weights → same outputs."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.context_adaptor import ContextAdaptor
    from reverb_tpu.models.context_adaptor import (ContextAdaptorConfig,
                                                   context_adaptor_forward,
                                                   encode_cv)

    torch.manual_seed(10)
    V, D = 30, 16
    ref = ContextAdaptor(vocab_size=V, embedding_dim=8, output_size=D,
                         attention_heads=1, num_layers=1)
    ref.eval()
    cv = torch.randint(1, V, (3, 5))
    cv_lens = torch.tensor([5, 3, 2])
    layers = [torch.randn(2, 9, D) for _ in range(15)]
    with torch.no_grad():
        cv_emb = ref.encode_cv(cv, cv_lens)
        want = ref(layers, cv_emb)

    cfg = ContextAdaptorConfig(vocab_size=V, embedding_dim=8, output_size=D,
                               num_layers=1)
    sd = ref.state_dict()
    p = {'embed': {'weight': sd['embed.weight'].numpy()},
         'lstm': [{'fwd': _torch_lstm_to_ours(sd, 'encoder.', 0, False),
                   'bwd': _torch_lstm_to_ours(sd, 'encoder.', 0, True)}],
         'attention': {
             'linear_q': {'weight': sd['attention.in_proj_weight'][:D].numpy(),
                          'bias': sd['attention.in_proj_bias'][:D].numpy()},
             'linear_k': {'weight':
                          sd['attention.in_proj_weight'][D:2 * D].numpy(),
                          'bias':
                          sd['attention.in_proj_bias'][D:2 * D].numpy()},
             'linear_v': {'weight':
                          sd['attention.in_proj_weight'][2 * D:].numpy(),
                          'bias': sd['attention.in_proj_bias'][2 * D:].numpy()},
             'linear_out': {'weight': sd['attention.out_proj.weight'].numpy(),
                            'bias': sd['attention.out_proj.bias'].numpy()}}}
    got_cv = encode_cv(p, jnp.asarray(cv.numpy()),
                       jnp.asarray(cv_lens.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got_cv), cv_emb.numpy()[None]
                               if cv_emb.ndim == 2 else cv_emb.numpy(),
                               atol=2e-5, rtol=1e-4)
    got = context_adaptor_forward(p, [jnp.asarray(l.numpy())
                                      for l in layers],
                                  jnp.asarray(np.asarray(got_cv)), cfg)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=5e-5,
                               rtol=1e-3)


def test_transducer_predictor_joint_parity(wenet):
    """RNNPredictor (embed→LSTM→projection) and TransducerJoint
    (prejoin FFNs → tanh → vocab FFN): same weights → same outputs
    (transducer/predictor.py:60-207, joint.py:8-100)."""
    import torch
    import jax.numpy as jnp
    from wenet.transducer.predictor import RNNPredictor
    from wenet.transducer.joint import TransducerJoint
    from reverb_tpu.models.transducer import (TransducerConfig,
                                              joint_forward,
                                              predictor_forward)

    torch.manual_seed(12)
    V, E, H = 30, 12, 16
    pred = RNNPredictor(voca_size=V, embed_size=E, output_size=E,
                        embed_dropout=0.0, hidden_size=H, num_layers=2,
                        dropout=0.0)
    joint = TransducerJoint(vocab_size=V, enc_output_size=20,
                            pred_output_size=E, join_dim=24)
    pred.eval()
    joint.eval()
    ys = torch.randint(0, V, (2, 6))
    enc = torch.randn(2, 9, 20)
    with torch.no_grad():
        want_pred = pred(ys)
        want_joint = joint(enc, want_pred)

    sd = pred.state_dict()
    cfg = TransducerConfig(vocab_size=V, encoder_output_size=20,
                           predictor='rnn', predictor_embed_size=E,
                           predictor_hidden_size=H, predictor_layers=2,
                           join_dim=24)
    p_pred = {'embed': {'weight': sd['embed.weight'].numpy()},
              'rnn': [_torch_lstm_to_ours(sd, 'rnn.', i, False)
                      for i in range(2)],
              'projection': {'weight': sd['projection.weight'].numpy(),
                             'bias': sd['projection.bias'].numpy()}}
    got_pred = predictor_forward(p_pred, jnp.asarray(ys.numpy()), cfg)
    np.testing.assert_allclose(np.asarray(got_pred), want_pred.numpy(),
                               atol=2e-5, rtol=1e-4)

    jd = joint.state_dict()
    p_joint = {k.split('.')[0]: {} for k in jd}
    for k, v in jd.items():
        mod, leaf = k.split('.')
        p_joint.setdefault(mod, {})[leaf] = v.numpy()
    got_joint = joint_forward(p_joint, jnp.asarray(enc.numpy())[:, :, None],
                              jnp.asarray(np.asarray(got_pred))[:, None],
                              cfg)
    np.testing.assert_allclose(np.asarray(got_joint), want_joint.numpy(),
                               atol=5e-5, rtol=1e-4)


def test_bestrq_targets_mask_loss_parity(wenet):
    """BestRQ quantizer semantics vs ssl/bestrq/bestrq_model.py: frame
    stacking, affine-free LN + random-projection + euclidean nearest-code
    targets, window-min subsampled mask, per-codebook head algebra, and the
    masked-CE normalization (VERDICT r1 item 9)."""
    import torch
    import jax.numpy as jnp
    from wenet.ssl.bestrq.bestrq_model import BestRQModel
    from wenet.transformer.encoder import ConformerEncoder
    from wenet.transformer.cmvn import GlobalCMVN
    from reverb_tpu.models.modules import linear
    from reverb_tpu.models.ssl import (BestRQConfig, bestrq_ce,
                                       bestrq_targets, stack_features,
                                       subsampled_mask)

    torch.manual_seed(5)
    mean, istd = torch.randn(80), torch.rand(80) + 0.5
    enc = ConformerEncoder(global_cmvn=GlobalCMVN(mean, istd), **_TINY_ENC)
    G, C, Dc = 2, 32, 8
    ref = BestRQModel(encoder=enc, num_mel_bins=80, embedding_dim=Dc,
                      num_embeddings=C, num_codebooks=G)
    cfg = BestRQConfig(input_dim=80, encoder_output_size=32,
                       num_codebooks=G, codebook_size=C, codebook_dim=Dc,
                       stack_frames=ref.stack_frames, stride=ref.stride)
    assert (cfg.stack_frames, cfg.stride) == (7, 4)
    params = {
        'projection': jnp.asarray(ref.projection.detach().numpy()),
        # reference embeddings are (C, G, Dc); ours (G, C, Dc)
        'codebook': jnp.asarray(
            ref.embeddings.detach().numpy().transpose(1, 0, 2)),
    }

    x = torch.randn(2, 67, 80)
    xs = (x - mean) * istd          # post-CMVN signal, as the reference uses

    with torch.no_grad():
        want_stack = ref._stack_features(xs)
        want_tgt = ref._nearest_embedding_idx(want_stack)
    got_stack = stack_features(jnp.asarray(xs.numpy()), cfg.stack_frames,
                               cfg.stride)
    np.testing.assert_allclose(np.asarray(got_stack), want_stack.numpy(),
                               atol=1e-5, rtol=1e-5)
    got_tgt = bestrq_targets(params, jnp.asarray(xs.numpy()), cfg)
    assert got_tgt.shape == tuple(want_tgt.shape)
    np.testing.assert_array_equal(np.asarray(got_tgt), want_tgt.numpy())

    # window-min subsampled mask (forward step 1)
    m = torch.rand(2, 67) > 0.5
    want_m, _ = torch.min(
        m.unfold(1, ref.stack_frames, ref.stride).int(), 2)
    got_m = subsampled_mask(jnp.asarray(m.numpy()), cfg.stack_frames,
                            cfg.stride)
    np.testing.assert_array_equal(np.asarray(got_m).astype(np.int32),
                                  want_m.numpy())

    # per-codebook head: matmul against (G, D, C) + bias == one flat linear
    Tq = int(want_tgt.shape[1])
    enc_out = torch.randn(2, Tq, 32)
    with torch.no_grad():
        want_logits = torch.matmul(enc_out.unsqueeze(1),
                                   ref.encoder_top_n_out.unsqueeze(0))
        want_logits = (want_logits +
                       ref.encoder_top_n_out_bias.unsqueeze(0).unsqueeze(2))
    head = {'weight': jnp.asarray(ref.encoder_top_n_out.detach().numpy()
                                  .transpose(0, 2, 1).reshape(G * C, 32)),
            'bias': jnp.asarray(
                ref.encoder_top_n_out_bias.detach().numpy().reshape(-1))}
    got_logits = linear(head, jnp.asarray(enc_out.numpy())).reshape(
        2, Tq, G, C)
    np.testing.assert_allclose(
        np.asarray(got_logits),
        want_logits.numpy().transpose(0, 2, 1, 3), atol=1e-5, rtol=1e-5)

    # masked-CE normalization (_compute_loss)
    valid = got_m[:, :Tq]
    with torch.no_grad():
        want_loss = ref._compute_loss(
            torch.from_numpy(np.asarray(got_logits)).permute(0, 2, 1, 3),
            want_tgt, mask=torch.from_numpy(np.asarray(valid)).float())
    got_loss, _ = bestrq_ce(got_logits, got_tgt, valid, G)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)


def test_wenet_whisper_forward_parity(wenet):
    """Whisper-as-wenet wrapper forward (whisper/whisper.py:28 +
    convert_whisper_to_wenet_config_and_ckpt.py encoder/decoder configs):
    same weights → same encoder activations and decoder logits through our
    whisper module via convert_wenet_whisper (VERDICT r1 item 9)."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.encoder import TransformerEncoder
    from wenet.transformer.decoder import TransformerDecoder
    from reverb_tpu.models.whisper import (WhisperConfig,
                                           convert_wenet_whisper,
                                           whisper_decode, whisper_encode)

    torch.manual_seed(7)
    enc = TransformerEncoder(
        input_size=80, output_size=64, attention_heads=2, linear_units=256,
        num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
        attention_dropout_rate=0.0, input_layer='conv1d2',
        pos_enc_layer_type='abs_pos_whisper', normalize_before=True,
        static_chunk_size=-1, key_bias=False, activation_type='gelu')
    dec = TransformerDecoder(
        vocab_size=50, encoder_output_size=64, attention_heads=2,
        linear_units=256, num_blocks=2, dropout_rate=0.0,
        positional_dropout_rate=0.0, self_attention_dropout_rate=0.0,
        src_attention_dropout_rate=0.0, input_layer='embed_learnable_pe',
        use_output_layer=True, normalize_before=True, src_attention=True,
        key_bias=False, activation_type='gelu')
    with torch.no_grad():
        dec.embed[1].pe.normal_(0.0, 0.02)   # Parameter(torch.empty) init
    enc.eval()
    dec.eval()

    state = {**{f'encoder.{k}': v.numpy() for k, v in
                enc.state_dict().items()},
             **{f'decoder.{k}': v.numpy() for k, v in
                dec.state_dict().items()}}
    params = convert_wenet_whisper(state)
    assert 'output_layer' in params['decoder']   # wenet head is untied
    cfg = WhisperConfig(n_mels=80, n_audio_state=64, n_audio_head=2,
                        n_audio_layer=2, n_vocab=50, n_text_ctx=448,
                        n_text_state=64, n_text_head=2, n_text_layer=2)

    mel = torch.randn(2, 40, 80)
    lens = torch.tensor([40, 40])
    with torch.no_grad():
        want_enc, want_mask = enc(mel, lens)
    got_enc = whisper_encode(params['encoder'], jnp.asarray(mel.numpy()), cfg)
    assert got_enc.shape == tuple(want_enc.shape)
    np.testing.assert_allclose(np.asarray(got_enc), want_enc.numpy(),
                               atol=1e-4, rtol=1e-3)

    ys = torch.randint(0, 50, (2, 7))
    with torch.no_grad():
        want_dec, _, _ = dec(want_enc, want_mask, ys, torch.tensor([7, 7]))
    got_dec = whisper_decode(params['decoder'],
                             jnp.asarray(ys.numpy().astype(np.int32)),
                             got_enc, cfg)
    np.testing.assert_allclose(np.asarray(got_dec), want_dec.numpy(),
                               atol=1e-4, rtol=1e-3)


def test_in_beam_context_biasing_parity(wenet, tmp_path):
    """In-beam context biasing == reference ctc_prefix_beam_search with a
    ContextGraph: same nbest order, tokens, and (finalize-overwritten)
    scores (VERDICT r1 item 6; search.py:169-218, utils/context_graph.py)."""
    import torch
    import jax.numpy as jnp
    from wenet.transformer.search import ctc_prefix_beam_search as ref_search
    from wenet.utils.context_graph import ContextGraph as RefGraph
    from reverb_tpu.decode.context_graph import ContextGraph
    from reverb_tpu.decode.prefix_beam import ctc_prefix_beam_search

    # char symbol table; phrases share prefixes to exercise fail arcs
    syms = {ch: i for i, ch in enumerate('.abcdefgh', start=1)}
    phrases = ['abc', 'abd', 'bcd', 'cab', 'dd']
    ctx_file = tmp_path / 'ctx.txt'
    ctx_file.write_text('\n'.join(phrases) + '\n')
    ref_graph = RefGraph(str(ctx_file), syms, context_score=2.5)
    our_graph = ContextGraph(symbol_table=syms, context_list=phrases,
                             context_score=2.5)

    rng = np.random.RandomState(11)
    B, T, V, K = 2, 30, 10, 6
    # peaky logits over the phrase alphabet so biased paths compete; the
    # jitter breaks exact ties (tie order in the per-frame top-k is
    # unspecified in both implementations)
    logits = np.full((B, T, V), -4.0, np.float32)
    logits += rng.uniform(0.0, 0.01, logits.shape).astype(np.float32)
    logits[:, :, 0] = 1.0
    for b in range(B):
        for t in range(1, T, 2):
            logits[b, t, rng.randint(1, V)] = 3.0 + rng.rand()
    logp = torch.from_numpy(logits).log_softmax(-1)
    lens = torch.tensor([T, T - 7])

    want = ref_search(logp, lens, K, context_graph=ref_graph)
    got = ctc_prefix_beam_search(jnp.asarray(logp.numpy()),
                                 jnp.asarray(lens.numpy()), K,
                                 context_graph=our_graph)
    for b in range(B):
        assert [list(h) for h in got[b].nbest] == \
            [list(h) for h in want[b].nbest], b
        np.testing.assert_allclose(got[b].nbest_scores,
                                   want[b].nbest_scores, rtol=1e-4,
                                   atol=1e-4)
    # biasing changed the outcome vs the unbiased search (non-vacuous)
    plain = ctc_prefix_beam_search(jnp.asarray(logp.numpy()),
                                   jnp.asarray(lens.numpy()), K)
    assert any(list(got[b].tokens) != list(plain[b].tokens) or
               abs(got[b].score - plain[b].score) > 1e-6 for b in range(B))


def test_wav2vec2_forward_parity(wenet):
    """Full Wav2vec2Model.forward parity (ssl/wav2vec2/wav2vec2_model.py:
    220-283) on shared weights with injected mask / negative / gumbel draws:
    contrastive loss, perplexity, diversity, features-L2 and the total."""
    import torch
    import jax.numpy as jnp
    import wenet.ssl.wav2vec2.wav2vec2_model as wm
    import wenet.ssl.wav2vec2.quantizer as wq
    from wenet.transformer.encoder import ConformerEncoder
    import jax
    from reverb_tpu.models.asr_model import ModelConfig
    from reverb_tpu.models.ssl import Wav2vec2Config, wav2vec2_loss
    from tests.test_model_forward import TINY

    torch.manual_seed(13)
    G, C, N = 2, 16, 5
    enc = ConformerEncoder(**_TINY_ENC)
    ref = wm.Wav2vec2Model(
        encoder=enc, embedding_dim=32, num_embeddings=C, num_codebooks=G,
        mask_prob=0.3, mask_length=4, min_masks=2, num_negatives=N,
        features_regularization_weight=0.01, diversity_weight=0.2,
        contrastive_logits_temperature=0.1)
    ref.eval()

    rng = np.random.RandomState(1)
    B, T = 2, 67
    feats = rng.randn(B, T, 80).astype(np.float32)
    lens = np.array([T, T - 15], np.int64)
    Tz = ((T - 1) // 2 - 1) // 2                 # conv2d subsampling4
    steps = 100

    # shared draws
    span = rng.rand(B, Tz) < 0.4
    span[:, :2] = True                           # ≥2 masked per utt
    valid_np = np.arange(Tz)[None, :] < (((lens - 1) // 2 - 1) // 2)[:, None]
    span &= valid_np
    cnt = span.sum(1)
    rank = np.cumsum(span, 1) - 1
    i = rng.randint(0, np.maximum(cnt - 1, 1)[:, None, None], (B, Tz, N))
    i = np.where(i >= rank[..., None], i + 1, i)
    i = np.minimum(i, np.maximum(cnt, 1)[:, None, None] - 1)
    order = np.argsort(np.where(span, np.arange(Tz), np.arange(Tz) + Tz),
                       axis=1, kind='stable')
    neg_pos = np.take_along_axis(order, i.reshape(B, -1),
                                 axis=1).reshape(B, Tz, N)
    gumbels = rng.gumbel(size=(B, Tz, G, C)).astype(np.float32)

    # inject the draws into the reference
    orig = (wm.compute_mask_indices_v2, wm._sample_negative_indices,
            wq.gumbel)
    try:
        wm.compute_mask_indices_v2 = \
            lambda *a, **k: torch.from_numpy(span)
        flat = torch.from_numpy(
            (neg_pos + (np.arange(B) * Tz)[:, None, None]).reshape(B, -1))
        wm._sample_negative_indices = lambda *a, **k: flat
        wq.gumbel = lambda shape, dtype, device: torch.from_numpy(
            gumbels.reshape(shape))
        with torch.no_grad():
            want = ref({'feats': torch.from_numpy(feats),
                        'feats_lengths': torch.from_numpy(lens),
                        'steps': steps}, torch.device('cpu'))
    finally:
        wm.compute_mask_indices_v2, wm._sample_negative_indices, \
            wq.gumbel = orig

    conf = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in TINY.items()}
    del conf['dataset_conf']                     # plain (non-LSL) encoder
    conf['encoder_conf'] = dict(conf['encoder_conf'], dropout_rate=0.0,
                                positional_dropout_rate=0.0)
    ecfg = ModelConfig.from_config(conf).encoder
    cfg = Wav2vec2Config(encoder_output_size=32, num_codebooks=G,
                         codebook_size=C, embedding_dim=32, mask_prob=0.3,
                         mask_length=4, num_negatives=N,
                         features_regularization_weight=0.01,
                         diversity_weight=0.2)
    d = cfg.embedding_dim // G
    params = {
        'vq_proj': {'weight': jnp.asarray(
            ref.quantizer.weight_proj.weight.detach().numpy()),
            'bias': jnp.asarray(
                ref.quantizer.weight_proj.bias.detach().numpy())},
        'vq_codebook': jnp.asarray(
            ref.quantizer.embeddings.detach().numpy().reshape(G, C, d)),
        'mask_emb': jnp.asarray(ref.mask_emb.detach().numpy()),
    }
    got = wav2vec2_loss(
        params, _to_ours(ref.encoder), jnp.asarray(feats),
        jnp.asarray(lens.astype(np.int32)), jax.random.PRNGKey(0), cfg,
        ecfg, steps=steps, span_mask=jnp.asarray(span),
        neg_pos=jnp.asarray(neg_pos), gumbels=jnp.asarray(gumbels))

    np.testing.assert_allclose(float(got['code_ppl']),
                               float(want['code_ppl']), rtol=1e-4)
    np.testing.assert_allclose(float(got['features_l2']),
                               float(want['features_l2']), rtol=1e-4)
    np.testing.assert_allclose(float(got['loss_contrastive']),
                               float(want['loss_contrastive']), rtol=2e-4)
    np.testing.assert_allclose(float(got['loss_diversity']),
                               float(want['loss_diversity']), rtol=2e-4)
    np.testing.assert_allclose(float(got['loss']), float(want['loss']),
                               rtol=2e-4)
    print(f"wav2vec2 parity: loss {float(got['loss']):.5f} "
          f"ppl {float(got['code_ppl']):.3f}")


def test_w2vbert_forward_parity(wenet):
    """Full W2VBERTModel.forward parity (ssl/w2vbert/w2vbert_model.py:
    161-251): split-stack contrastive + mlm branches, quantizer-id targets,
    warmup-weighted total, on shared weights and injected draws."""
    import torch
    import jax.numpy as jnp
    import wenet.ssl.w2vbert.w2vbert_model as wb
    import wenet.ssl.wav2vec2.quantizer as wq
    from wenet.transformer.encoder import ConformerEncoder
    from reverb_tpu.models.asr_model import ModelConfig
    import jax
    from reverb_tpu.models.ssl import (W2VBertConfig, Wav2vec2Config,
                                       w2vbert_loss)
    from tests.test_model_forward import TINY

    torch.manual_seed(17)
    G, C, N = 1, 16, 4
    enc = ConformerEncoder(**_TINY_ENC)          # 4 blocks → split 2+2
    ref = wb.W2VBERTModel(
        encoder=enc, embedding_dim=32, num_embeddings=C, num_codebooks=G,
        mask_prob=0.3, mask_length=4, min_masks=2, num_negatives=N,
        features_regularization_weight=0.01, diversity_weight=0.1,
        contrastive_blocks=2, masked_blocks=2, contrastive_weight=1.0,
        mlm_weight=1.0, warmup_steps=1000)
    ref.eval()

    rng = np.random.RandomState(2)
    B, T = 2, 67
    feats = rng.randn(B, T, 80).astype(np.float32)
    lens = np.array([T, T - 15], np.int64)
    Tz = ((T - 1) // 2 - 1) // 2
    steps = 300                                  # inside warmup

    span = rng.rand(B, Tz) < 0.4
    span[:, :2] = True
    valid_np = np.arange(Tz)[None, :] < (((lens - 1) // 2 - 1) // 2)[:, None]
    span &= valid_np
    cnt = span.sum(1)
    rank = np.cumsum(span, 1) - 1
    i = rng.randint(0, np.maximum(cnt - 1, 1)[:, None, None], (B, Tz, N))
    i = np.where(i >= rank[..., None], i + 1, i)
    i = np.minimum(i, np.maximum(cnt, 1)[:, None, None] - 1)
    order = np.argsort(np.where(span, np.arange(Tz), np.arange(Tz) + Tz),
                       axis=1, kind='stable')
    neg_pos = np.take_along_axis(order, i.reshape(B, -1),
                                 axis=1).reshape(B, Tz, N)
    gumbels = rng.gumbel(size=(B, Tz, G, C)).astype(np.float32)
    noise = (rng.randn(B, Tz, 32) * 0.1).astype(np.float32)

    orig = (wb.compute_mask_indices_v2, wb._sample_negative_indices,
            wq.gumbel, wb.W2VBERTModel._apply_mask)
    try:
        flat = torch.from_numpy(
            (neg_pos + (np.arange(B) * Tz)[:, None, None]).reshape(B, -1))
        wb._sample_negative_indices = lambda *a, **k: flat
        wq.gumbel = lambda shape, dtype, device: torch.from_numpy(
            gumbels.reshape(shape))

        def _apply_mask(self, xs, xs_masks):
            m = torch.from_numpy(span)
            return torch.where(m.unsqueeze(-1), torch.from_numpy(noise),
                               xs), m
        wb.W2VBERTModel._apply_mask = _apply_mask
        with torch.no_grad():
            want = ref({'feats': torch.from_numpy(feats),
                        'feats_lengths': torch.from_numpy(lens),
                        'steps': steps}, torch.device('cpu'))
    finally:
        wb.compute_mask_indices_v2, wb._sample_negative_indices, \
            wq.gumbel, wb.W2VBERTModel._apply_mask = orig

    conf = {k: (dict(v) if isinstance(v, dict) else v)
            for k, v in TINY.items()}
    del conf['dataset_conf']
    conf['encoder_conf'] = dict(conf['encoder_conf'], dropout_rate=0.0,
                                positional_dropout_rate=0.0)
    ecfg = ModelConfig.from_config(conf).encoder
    cfg = Wav2vec2Config(encoder_output_size=32, num_codebooks=G,
                         codebook_size=C, embedding_dim=32, mask_prob=0.3,
                         mask_length=4, num_negatives=N,
                         features_regularization_weight=0.01,
                         diversity_weight=0.1)
    bcfg = W2VBertConfig(contrastive_blocks=2, masked_blocks=2,
                         contrastive_weight=1.0, mlm_weight=1.0,
                         warmup_steps=1000)
    d = cfg.embedding_dim // G
    params = {
        'vq_proj': {'weight': jnp.asarray(
            ref.quantizer.weight_proj.weight.detach().numpy()),
            'bias': jnp.asarray(
                ref.quantizer.weight_proj.bias.detach().numpy())},
        'vq_codebook': jnp.asarray(
            ref.quantizer.embeddings.detach().numpy().reshape(G, C, d)),
        'top_n_out': jnp.asarray(ref.encoder_top_n_out.detach().numpy()),
        'top_n_out_bias': jnp.asarray(
            ref.encoder_top_n_out_bias.detach().numpy()),
    }
    got = w2vbert_loss(
        params, _to_ours(ref.encoder), jnp.asarray(feats),
        jnp.asarray(lens.astype(np.int32)), jax.random.PRNGKey(0), cfg,
        bcfg, ecfg, steps=steps, span_mask=jnp.asarray(span),
        neg_pos=jnp.asarray(neg_pos), gumbels=jnp.asarray(gumbels),
        mask_noise=jnp.asarray(noise))

    np.testing.assert_allclose(float(got['code_ppl']),
                               float(want['code_ppl']), rtol=1e-4)
    np.testing.assert_allclose(float(got['loss_contrastive']),
                               float(want['loss_contrastive']), rtol=2e-4)
    np.testing.assert_allclose(float(got['loss_mlm']),
                               float(want['loss_mlm']), rtol=2e-4)
    np.testing.assert_allclose(float(got['codes_acc']),
                               float(want['codes_acc']), rtol=1e-5)
    np.testing.assert_allclose(float(got['loss']), float(want['loss']),
                               rtol=2e-4)
    print(f"w2vbert parity: loss {float(got['loss']):.5f} mlm "
          f"{float(got['loss_mlm']):.5f}")

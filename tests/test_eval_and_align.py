"""WER harness + forced alignment tests."""

import json

import numpy as np
import jax.numpy as jnp

from reverb_tpu.decode.ctc_utils import (force_align, gen_ctc_peak_time,
                                         gen_timestamps_from_peak)
from reverb_tpu.eval.wer import (WERAggregator, align_words,
                                 fstalign_commands, score_pair)


def test_align_words():
    ins, dels, subs, ops = align_words('a b c d'.split(), 'a x c'.split())
    assert (ins, dels, subs) == (0, 1, 1)
    assert [o for o, _, _ in ops] == ['ok', 'sub', 'ok', 'del']


def test_score_and_aggregate(tmp_path):
    r1 = score_pair('the cat sat', 'the cat sat')
    assert r1['wer']['bestWER']['numErrors'] == 0
    r2 = score_pair('the cat sat on a mat', 'the bat sat on mat yeah')
    agg = WERAggregator()
    agg.update(r1['wer']['bestWER'])
    agg.update(r2['wer']['bestWER'])
    assert agg.reference_count == 9
    assert agg.num_errors == 3     # sub(bat) + del(a) + ins(yeah)
    assert 'TOTAL WER' in agg.summary()
    # aggregate_dir over JSON files
    for i, r in enumerate([r1, r2]):
        with open(tmp_path / f'f{i}.log.json', 'w') as f:
            json.dump(r, f)
    agg2 = WERAggregator().aggregate_dir(tmp_path)
    assert agg2.num_errors == 3


def test_fstalign_commands(tmp_path):
    hyp_dir = tmp_path / 'hyp'
    hyp_dir.mkdir()
    (hyp_dir / 'file1.ctm').write_text('x 0 0.0 0.1 hello 1.0\n')
    cmds = fstalign_commands('fstalign', tmp_path / 'ref', hyp_dir,
                             tmp_path / 'out',
                             synonyms_file=tmp_path / 'syn.txt')
    assert len(cmds) == 1
    assert '--ref' in cmds[0] and 'file1.nlp' in cmds[0]
    assert '--syn' in cmds[0]


def test_force_align_simple():
    # logits that strongly prefer: blank a a blank b blank
    V = 4
    T = 6
    logits = np.full((T, V), -5.0, dtype=np.float32)
    path = [0, 1, 1, 0, 2, 0]
    for t, tok in enumerate(path):
        logits[t, tok] = 0.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ali = force_align(jnp.asarray(logp), [1, 2])
    assert ali == path
    peaks = gen_ctc_peak_time(ali)
    assert peaks == [1, 4]
    ts = gen_timestamps_from_peak(peaks, max_duration=0.24)
    assert len(ts) == 2
    assert ts[0][0] < ts[0][1] <= ts[1][0] < ts[1][1]


def test_force_align_repeat_token():
    # y = [1, 1] requires a blank between the two 1s
    V = 3
    T = 5
    logits = np.full((T, V), -4.0, dtype=np.float32)
    path = [1, 0, 1, 0, 0]
    for t, tok in enumerate(path):
        logits[t, tok] = 0.0
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ali = force_align(jnp.asarray(logp), [1, 1])
    assert ali == path


def test_wder_basic_and_permutation():
    """WDER (Shafey et al. 2019): wrong-speaker fraction over sub+correct
    words under the best global speaker mapping."""
    from reverb_tpu.eval.wder import wder
    ref = [('hello', 'A'), ('world', 'A'), ('how', 'B'), ('are', 'B'),
           ('you', 'B')]
    # hyp uses different label names (spk1<->B, spk0<->A), one word wrong spk
    hyp = [('hello', 'spk0'), ('world', 'spk1'), ('how', 'spk1'),
           ('are', 'spk1'), ('you', 'spk1')]
    m = wder(ref, hyp)
    assert m['total'] == 5
    assert m['wder'] == 1 / 5        # only 'world' attributed to wrong spk

    # perfect diarization under permuted labels → 0
    hyp2 = [(w, {'A': 'x', 'B': 'y'}[s]) for w, s in ref]
    assert wder(ref, hyp2)['wder'] == 0.0

    # ASR errors don't count as speaker errors when speaker is right
    hyp3 = [('hello', 'A'), ('wrld', 'A'), ('how', 'B'), ('are', 'B'),
            ('you', 'B')]
    m3 = wder(ref, hyp3)
    assert m3['sub'] == 1 and m3['wder'] == 0.0


def test_wder_stm_roundtrip(tmp_path):
    from reverb_tpu.eval.wder import read_stm_words, wder
    ref = tmp_path / 'ref.stm'
    hyp = tmp_path / 'hyp.stm'
    ref.write_text('f 1 A 0.0 1.0 hello world\nf 1 B 1.0 2.0 bye\n')
    hyp.write_text('f 1 s0 0.0 1.0 hello world\nf 1 s0 1.0 2.0 bye\n')
    m = wder(read_stm_words(ref), read_stm_words(hyp))
    assert m['total'] == 3
    assert m['wder'] == 1 / 3        # 'bye' collapses into s0


def test_asr_diarization_example_smoke(tmp_path):
    """End-to-end §3.4 workload on a tiny model + synthetic wav."""
    import sys
    import wave as wave_mod
    import numpy as np
    sys.path.insert(0, 'tests')
    sys.path.insert(0, 'examples')
    from helpers import build_tiny_model_dir
    mdir = build_tiny_model_dir(tmp_path / 'model')
    wav = tmp_path / 'a.wav'
    sr = 16000
    pcm = (np.random.RandomState(0).randn(2 * sr) * 3000).astype('<i2')
    with wave_mod.open(str(wav), 'wb') as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    import asr_diarization
    asr_diarization.main([str(wav), '--asr_model', str(mdir),
                          '--out_dir', str(tmp_path / 'out')])
    assert (tmp_path / 'out' / 'a.rttm').exists()
    assert (tmp_path / 'out' / 'a.ctm').exists()
    assert (tmp_path / 'out' / 'a.stm').exists()


def test_der_hermetic():
    """eval/der.py: perfect match → 0; known constructions give exact
    md-eval rates (miss / false alarm / confusion with optimal speaker
    mapping and collar)."""
    from reverb_tpu.eval.der import der
    ref = [(0.0, 10.0, 'A'), (10.0, 20.0, 'B')]
    # identical but renamed speakers: optimal mapping → DER 0
    hyp = [(0.0, 10.0, 'X'), (10.0, 20.0, 'Y')]
    s = der(ref, hyp, collar=0.0)
    assert s['der'] == 0.0 and s['total_s'] == 20.0

    # miss: hyp silent over the second half of B
    hyp = [(0.0, 10.0, 'X'), (10.0, 15.0, 'Y')]
    s = der(ref, hyp, collar=0.0)
    assert abs(s['miss'] - 5.0 / 20.0) < 1e-6
    assert s['false_alarm'] == 0.0 and s['confusion'] == 0.0

    # false alarm: hyp speaks into silence
    hyp = [(0.0, 10.0, 'X'), (10.0, 20.0, 'Y'), (20.0, 25.0, 'Z')]
    s = der(ref, hyp, collar=0.0)
    assert abs(s['false_alarm'] - 5.0 / 20.0) < 1e-6

    # confusion: one hyp speaker covers both ref speakers
    hyp = [(0.0, 20.0, 'X')]
    s = der(ref, hyp, collar=0.0)
    assert abs(s['confusion'] - 10.0 / 20.0) < 1e-4
    assert s['miss'] < 1e-6 and s['false_alarm'] < 1e-6

    # overlap counts per speaker: A and B simultaneously, hyp misses B
    ref_o = [(0.0, 10.0, 'A'), (0.0, 10.0, 'B')]
    hyp_o = [(0.0, 10.0, 'X')]
    s = der(ref_o, hyp_o, collar=0.0)
    assert abs(s['miss'] - 10.0 / 20.0) < 1e-4
    assert s['total_s'] == 20.0      # 2 speakers x 10 s of reference

    # collar forgives boundary jitter
    hyp_j = [(0.1, 10.1, 'X'), (9.9, 20.2, 'Y')]
    s = der(ref, hyp_j, collar=0.25)
    assert s['der'] < 0.02, s

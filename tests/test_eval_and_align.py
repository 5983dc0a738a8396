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

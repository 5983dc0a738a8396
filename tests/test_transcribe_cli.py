"""transcribe CLI (hub-style), paraformer tokenizer, fixed-list averaging."""

import numpy as np
import pytest

from tests.helpers import build_tiny_model_dir, write_wav


def test_paraformer_tokenizer(tmp_path):
    from reverb_tpu.text.paraformer_tokenizer import (ParaformerTokenizer,
                                                      beautify_result,
                                                      tokenize_by_seg_dict)
    seg = {'HELLO': 'HE@@ LLO', 'OK': 'OK'}
    toks = tokenize_by_seg_dict(seg, '你好 HELLO OK')
    assert toks == ['你', '好', 'HE@@', 'LLO', 'OK']
    assert beautify_result(toks) == '你好 HELLO OK'
    # via the class + file loading + factory
    sd = tmp_path / 'seg_dict'
    sd.write_text('HELLO\tHE@@ LLO\nOK\tOK\n')
    st = tmp_path / 'units.txt'
    st.write_text('<blank> 0\n<unk> 1\n你 2\n好 3\nHE@@ 4\nLLO 5\nOK 6\n')
    from reverb_tpu.text.tokenizer import init_tokenizer
    tok = init_tokenizer({'tokenizer': 'paraformer',
                          'tokenizer_conf': {'symbol_table_path': str(st),
                                             'seg_dict_path': str(sd)}})
    tokens, ids = tok.tokenize('你好 HELLO')
    assert ids == [2, 3, 4, 5]
    text, _ = tok.detokenize(ids)
    assert text == '你好 HELLO'
    # OOV word → <unk>
    assert tok.tokenize('BOGUS')[1] == [1]


def test_average_model_fixed_list(tmp_path):
    import numpy as np

    from reverb_tpu.train.checkpoint import load_npz, save_npz
    a = {'w': np.ones((3,), np.float32)}
    b = {'w': np.full((3,), 3.0, np.float32)}
    save_npz(str(tmp_path / 'a.npz'), a)
    save_npz(str(tmp_path / 'b.npz'), b)
    from reverb_tpu.bin.average_model import main
    main(['--dst_model', str(tmp_path / 'avg.npz'),
          '--models', str(tmp_path / 'a.npz'), str(tmp_path / 'b.npz')])
    avg, _ = load_npz(str(tmp_path / 'avg.npz'))
    np.testing.assert_allclose(np.asarray(avg['w']), 2.0)


@pytest.fixture(scope='module')
def model_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp('m')
    return build_tiny_model_dir(d), d


def test_transcribe_cli_decode(model_dir, capsys):
    mdir, d = model_dir
    wav = write_wav(d / 'x.wav', seconds=0.5, freq=440)
    from reverb_tpu.cli.transcribe import main
    out = main([str(wav), '-m', str(mdir), '--beam', '3'])
    assert isinstance(out, str)


def test_transcribe_cli_align(model_dir):
    mdir, d = model_dir
    wav = write_wav(d / 'y.wav', seconds=0.5, freq=330)
    from reverb_tpu.cli.transcribe import main
    res = main([str(wav), '-m', str(mdir), '--align', '--label', 'a b'])
    assert res['text'] == 'a b'
    assert len(res['tokens']) >= 1
    for t in res['tokens']:
        assert 0.0 <= t['start'] <= t['end']


def test_transcribe_cli_context(model_dir, tmp_path):
    mdir, d = model_dir
    wav = write_wav(d / 'z.wav', seconds=0.4, freq=500)
    ctx = tmp_path / 'context.txt'
    ctx.write_text('ab\n')
    from reverb_tpu.cli.transcribe import main
    out = main([str(wav), '-m', str(mdir), '--context_path', str(ctx)])
    assert isinstance(out, str)
